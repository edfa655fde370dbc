"""Unit tests for the stdlib DOM + selector subset engines."""

from spatula_ray.dom import cssselect, fromstring_html, fromstring_xml, xpath

HTML = """
<html><body>
<div id="main" class="content wide">
  <ul>
    <li>one</li>
    <li class="sel">two</li>
    <li>three</li>
  </ul>
  <a href="/rel">rel link</a>
  <a href="https://other.test/abs">abs link</a>
  <img src="/img/x.png">
  <table id="employees">
    <tbody>
      <tr><td>Alice</td><td><a href="/staff/1">details</a></td></tr>
      <tr><td>Bob</td><td><a href="/staff/2">details</a></td></tr>
    </tbody>
  </table>
</div>
</body></html>
"""


def test_html_parse_structure():
    root = fromstring_html(HTML)
    assert root.tag == "html"
    lis = root.xpath("//li")
    assert [li.text for li in lis] == ["one", "two", "three"]


def test_html_fragment_single_root():
    root = fromstring_html("<ul><li>one</li><li>two</li></ul>")
    assert root.tag == "ul"
    assert len(root.xpath("//li")) == 2


def test_html_fragment_multi_root_wrapped():
    root = fromstring_html("<p>a</p><p>b</p>")
    assert root.tag == "div"
    assert [p.text for p in root.xpath("//p")] == ["a", "b"]


def test_xpath_text_terminal():
    root = fromstring_html(HTML)
    assert root.xpath("//li/text()") == ["one", "two", "three"]


def test_xpath_attr_terminal():
    root = fromstring_html(HTML)
    hrefs = root.xpath("//a/@href")
    assert hrefs == ["/rel", "https://other.test/abs", "/staff/1", "/staff/2"]


def test_xpath_predicates():
    root = fromstring_html(HTML)
    assert root.xpath("//li[@class='sel']/text()") == ["two"]
    assert root.xpath("//li[2]/text()") == ["two"]
    assert len(root.xpath("//div[contains(@class,'wide')]")) == 1
    assert root.xpath("//li[text()='three']")[0].text == "three"


def test_xpath_nested_and_relative():
    root = fromstring_html(HTML)
    table = root.xpath("//table")[0]
    rows = table.xpath(".//tr")
    assert len(rows) == 2
    assert rows[0].xpath(".//td")[0].text == "Alice"


def test_css_basic():
    root = fromstring_html(HTML)
    assert len(cssselect(root, "li")) == 3
    assert cssselect(root, "#employees")[0].tag == "table"
    assert cssselect(root, ".sel")[0].text == "two"
    assert cssselect(root, "li.sel")[0].text == "two"


def test_css_descendant_child():
    root = fromstring_html(HTML)
    assert len(cssselect(root, "#employees tbody tr")) == 2
    assert len(cssselect(root, "ul > li")) == 3
    assert len(cssselect(root, "table a")) == 2


def test_css_attr():
    root = fromstring_html(HTML)
    assert len(cssselect(root, "a[href]")) == 4
    assert len(cssselect(root, "a[href=/rel]")) == 1


def test_css_group_doc_order():
    root = fromstring_html(HTML)
    els = cssselect(root, "img, li")
    assert [e.tag for e in els] == ["li", "li", "li", "img"]


def test_make_links_absolute():
    root = fromstring_html(HTML)
    root.make_links_absolute("https://example.test/base/")
    hrefs = root.xpath("//a/@href")
    assert hrefs[0] == "https://example.test/rel"
    assert hrefs[1] == "https://other.test/abs"
    assert root.xpath("//img/@src") == ["https://example.test/img/x.png"]


def test_text_content_and_itertext():
    root = fromstring_html("<div>a<span>b</span>c</div>")
    assert root.text_content() == "abc"


def test_tail_handling():
    root = fromstring_html("<div><b>bold</b> tail text</div>")
    b = root.xpath("//b")[0]
    assert b.tail == " tail text"


def test_void_elements():
    root = fromstring_html("<div>a<br>b<img src='x'>c</div>")
    assert root.text_content() == "abc"
    assert len(root.xpath("//img")) == 1


def test_loose_end_tags():
    root = fromstring_html("<div><p>one<p>two</div>")
    # HTMLParser doesn't imply p-closing; both ps nest but tree stays usable
    assert "one" in root.text_content() and "two" in root.text_content()


def test_xml_parse():
    root = fromstring_xml("<resp><item>one</item><item>two</item><item>three</item></resp>")
    assert root.tag == "resp"
    assert root.xpath("//item/text()") == ["one", "two", "three"]


def test_xml_attributes_and_lines():
    root = fromstring_xml('<a>\n<b id="x">t</b></a>')
    b = root.xpath("//b")[0]
    assert b.get("id") == "x"
    assert b.sourceline == 2


def test_entity_handling():
    root = fromstring_html("<p>a &amp; b</p>")
    assert root.text == "a & b"
