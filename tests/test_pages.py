"""Page parse units with injected fake responses (mirrors reference
tests/test_pages.py: no network, assert postprocess + process_page output)."""

import pytest

from spatula_ray import (
    CsvListPage,
    ExcelListPage,
    HtmlListPage,
    HtmlPage,
    JsonListPage,
    JsonPage,
    PdfPage,
    XmlListPage,
    XmlPage,
    XPath,
)
from spatula_ray.client import Response
from spatula_ray.origins import URL


def attach(page_cls, body, url="https://example.com", **kwargs):
    p = page_cls(**kwargs) if kwargs else page_cls()
    if url:
        p.source = URL(url)
    if isinstance(body, str):
        body = body.encode()
    p.response = Response(url, 200, body)
    p.postprocess_response()
    return p


def test_html_page_link_absolutization():
    class P(HtmlPage):
        def process_page(self):
            return self.root.xpath("//a/@href")

    p = attach(P, "<html><a href='/test'>link</a></html>", url="https://example.com")
    assert p.process_page() == ["https://example.com/test"]


def test_xml_page():
    class P(XmlPage):
        def process_page(self):
            return self.root.xpath("//item/text()")

    p = attach(P, "<resp><item>one</item><item>two</item><item>three</item></resp>")
    assert p.process_page() == ["one", "two", "three"]


def test_json_page():
    class P(JsonPage):
        def process_page(self):
            return self.data

    p = attach(P, '{"a": 1}')
    assert p.process_page() == {"a": 1}


def test_csv_list_page():
    class P(CsvListPage):
        def process_item(self, item):
            return item

    p = attach(P, "a,b,c\n1,2,3\n4,5,6")
    items = list(p.process_page())
    assert len(items) == 2
    assert items[0] == {"a": "1", "b": "2", "c": "3"}


def test_html_list_page():
    class P(HtmlListPage):
        selector = XPath("//li/text()")

        def process_item(self, item):
            return item

    p = attach(P, "<ul><li>one</li><li>two</li><li>three</li></ul>")
    assert list(p.process_page()) == ["one", "two", "three"]


def test_xml_list_page():
    class P(XmlListPage):
        selector = XPath("//item/text()")

        def process_item(self, item):
            return item

    p = attach(P, "<resp><item>one</item><item>two</item><item>three</item></resp>")
    assert list(p.process_page()) == ["one", "two", "three"]


def test_json_list_page():
    class P(JsonListPage):
        def process_item(self, item):
            return item

    p = attach(P, '["one", "two", "three"]')
    assert list(p.process_page()) == ["one", "two", "three"]


def test_lxml_list_page_requires_selector():
    class P(HtmlListPage):
        def process_item(self, item):
            return item

    p = attach(P, "<ul><li>one</li></ul>")
    with pytest.raises(NotImplementedError):
        list(p.process_page())


def test_pdf_page_fake_path():
    class P(PdfPage):
        def process_page(self):
            return self.text

    p = attach(P, b"%FAKEPDF\nhello pdf world")
    assert p.process_page() == "hello pdf world"


def test_excel_list_page():
    # build a minimal xlsx in-memory
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", "<workbook/>")
        zf.writestr(
            "xl/sharedStrings.xml",
            '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<si><t>name</t></si><si><t>alice</t></si><si><t>bob</t></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<sheetData>"
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>0</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>30</v></c></row>'
            '<row r="3"><c r="A3" t="s"><v>2</v></c><c r="B3"><v>40.5</v></c></row>'
            "</sheetData></worksheet>",
        )

    class P(ExcelListPage):
        def process_item(self, item):
            return item

    p = attach(P, buf.getvalue())
    rows = list(p.process_page())
    assert rows == [("name", 0), ("alice", 30), ("bob", 40.5)]


def test_html_spans_interleaved():
    class P(HtmlPage):
        def process_page(self):
            return None

    body = ("<html><body><h1>Title</h1><p>hello <a href='/x'>link</a> world</p>"
            "<img src='/i.png'></body></html>")
    p = attach(P, body, url="https://h.test/")
    spans = p.to_spans()
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans] == [
        ("text", "Title", ""),
        ("text", "hello", ""),
        ("media", "", "https://h.test/x"),
        ("text", "link", ""),
        ("text", "world", ""),
        ("media", "", "https://h.test/i.png"),
    ]
    assert [s["offset"] for s in spans] == list(range(6))
