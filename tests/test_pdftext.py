"""Unit tests for the stdlib PDF text extractor (spatula_ray/pdftext.py)
and its wiring into PdfPage as the in-sandbox fallback when the
``pdftotext`` binary (the reference's real path, pages.py:376-417) is
absent. These run unconditionally in this container — unlike the
skipif-gated real-pdftotext test in test_stages.py.
"""
import shutil
import zlib

import pytest

from spatula_ray.pdftext import PdfTextError, extract_pdf_text


def mini_pdf(content: bytes, flate: bool = False) -> bytes:
    """Wrap a content stream in just enough PDF structure for the
    xref-free scanner (and for pdftotext, where installed)."""
    filt = b"/Filter /FlateDecode " if flate else b""
    data = zlib.compress(content) if flate else content
    return (
        b"%PDF-1.1\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 200 200] "
        b"/Contents 4 0 R >> endobj\n"
        b"4 0 obj << " + filt + b"/Length " + str(len(data)).encode() +
        b" >> stream\n" + data + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


def test_simple_tj():
    pdf = mini_pdf(b"BT /F1 12 Tf 20 100 Td (hello pdf) Tj ET")
    assert extract_pdf_text(pdf) == "hello pdf\n"


def test_flate_stream():
    pdf = mini_pdf(b"BT 20 100 Td (compressed text) Tj ET", flate=True)
    assert extract_pdf_text(pdf) == "compressed text\n"


def test_tj_array_with_kerning_and_hex():
    # TJ arrays interleave strings with kerning numbers; hex strings too
    pdf = mini_pdf(b"BT 20 100 Td [(Wor) -20 (ld) 5 <20414243>] TJ ET")
    assert extract_pdf_text(pdf) == "World ABC\n"


def test_escapes_octal_and_continuation():
    # \( \) escapes, octal \101 = 'A', backslash-newline = continuation
    content = (b"BT 0 0 Td (a\\(b\\)c \\101 line\\\ncont \\t tab) Tj ET")
    pdf = mini_pdf(content)
    out = extract_pdf_text(pdf)
    assert "a(b)c A" in out
    assert "linecont" in out  # continuation joins the two halves
    assert "\t tab" in out


def test_balanced_unescaped_parens():
    pdf = mini_pdf(b"BT 0 0 Td (outer (inner) tail) Tj ET")
    assert extract_pdf_text(pdf) == "outer (inner) tail\n"


def test_td_and_tstar_newlines():
    content = (b"BT 0 700 Td (line one) Tj "
               b"0 -14 Td (line two) Tj T* (line three) Tj ET")
    pdf = mini_pdf(content)
    assert extract_pdf_text(pdf) == "line one\nline two\nline three\n"


def test_quote_operators_break_lines():
    # ' and " show-with-newline operators
    content = b"BT 0 0 Td (first) Tj (second) ' 2 3 (third) \" ET"
    pdf = mini_pdf(content)
    assert extract_pdf_text(pdf) == "first\nsecond\nthird\n"


def test_multiple_streams_in_order():
    one = mini_pdf(b"BT 0 0 Td (page one) Tj ET")
    # append a second content object the way incremental updates do
    extra = (b"5 0 obj << /Length 30 >> stream\n"
             b"BT 0 0 Td (page two) Tj ET\nendstream endobj\n")
    pdf = one.replace(b"trailer", extra + b"trailer")
    assert extract_pdf_text(pdf) == "page one\npage two\n"


def test_non_text_streams_skipped():
    # a stream without BT (e.g. an image XObject) contributes nothing,
    # even if it contains bytes that look like ops
    img = (b"5 0 obj << /Subtype /Image /Length 12 >> stream\n"
           b"(noise) Tj x\nendstream endobj\n")
    base = mini_pdf(b"BT 0 0 Td (real) Tj ET")
    # image stream has no BT -> skipped entirely? It has "Tj" but no BT.
    pdf = base.replace(b"trailer", img + b"trailer")
    assert extract_pdf_text(pdf) == "real\n"


def test_unsupported_filter_skipped_not_garbled():
    dct = (b"5 0 obj << /Filter /DCTDecode /Length 20 >> stream\n"
           b"\xff\xd8(fake) Tj BT\xff\xd9\nendstream endobj\n")
    base = mini_pdf(b"BT 0 0 Td (kept) Tj ET")
    pdf = base.replace(b"trailer", dct + b"trailer")
    assert extract_pdf_text(pdf) == "kept\n"


def test_not_a_pdf_raises():
    with pytest.raises(PdfTextError):
        extract_pdf_text(b"GIF89a not a pdf")


def test_no_text_ops_raises():
    # image-only / CID PDFs must fail loudly, never return empty-quietly
    pdf = mini_pdf(b"q 1 0 0 1 0 0 cm /Im0 Do Q")
    with pytest.raises(PdfTextError):
        extract_pdf_text(pdf)


@pytest.mark.skipif(shutil.which("pdftotext") is not None,
                    reason="pdftotext present: PdfPage uses the real binary")
def test_pdfpage_stdlib_fallback():
    """Real (non-%FAKEPDF) PDF bytes flow through the stdlib extractor
    when the binary is missing — the path this container exercises."""
    from spatula_ray.model import PdfPage, Response

    class P(PdfPage):
        def process_page(self):
            return {"text": self.text}

    p = P()
    p.response = Response(
        "https://x.test/doc.pdf", 200,
        mini_pdf(b"BT 20 100 Td (stdlib fallback works) Tj ET", flate=True))
    p.postprocess_response()
    assert "stdlib fallback works" in p.text
