"""Pure-stdlib PDF text extraction — the in-sandbox fallback for
:class:`spatula_ray.model.PdfPage` (round-4; same spirit as the stdlib PNG
codec in ``stages/multimodal.py``): the reference shells out to
``pdftotext`` (``/root/reference/src/spatula/pages.py:376-417``), which is
absent in this container, so real PDF bytes would otherwise be untestable
here.

Scope (documented subset, loud failure outside it):

* object/stream scan over the raw body (no xref table needed — works on
  both well-formed and streamed/appended files),
* ``/FlateDecode`` (zlib) and unfiltered content streams,
* text operators ``Tj``, ``'``, ``"`` and ``TJ`` arrays, literal
  ``(...)`` strings with the full escape set and balanced parens, and
  hex ``<...>`` strings,
* newline heuristics on ``Td/TD/T*`` line moves and ``ET`` — the
  pdftotext-like reading order for simple single-column PDFs.

Strings are decoded latin-1 (simple-font assumption). PDFs using CID /
Identity-H encodings need a real PDF library; the extractor raises
``PdfTextError`` when a document yields no text-showing operators rather
than returning something silently wrong.
"""

from __future__ import annotations

import re
import zlib
from typing import List

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_TEXT_OP_RE = re.compile(
    rb"(\((?:\\.|[^\\()])*(?:\((?:\\.|[^\\()])*\)(?:\\.|[^\\()])*)*\))"
    rb"\s*(Tj|'|\")"
    rb"|(\[.*?\])\s*TJ"
    rb"|(T\*|TD|Td|ET)",
    re.S)
_STR_IN_ARRAY_RE = re.compile(
    rb"\((?:\\.|[^\\()])*(?:\((?:\\.|[^\\()])*\)(?:\\.|[^\\()])*)*\)"
    rb"|<[0-9A-Fa-f\s]*>")
_HEX_STR_RE = re.compile(rb"^<([0-9A-Fa-f\s]*)>$")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


class PdfTextError(ValueError):
    pass


def _unescape_literal(raw: bytes) -> bytes:
    """PDF literal string body (without outer parens) -> bytes."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1:i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < min(i + 4, n) and raw[j:j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):
            i += 2          # line continuation
        else:
            out += nxt
            i += 2
    return bytes(out)


def _decode_string_token(tok: bytes) -> str:
    m = _HEX_STR_RE.match(tok)
    if m:
        hx = re.sub(rb"\s", b"", m.group(1))
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode()).decode("latin-1")
    return _unescape_literal(tok[1:-1]).decode("latin-1")


def _content_streams(body: bytes) -> List[bytes]:
    """Every decodable stream in the document (xref-free scan)."""
    out = []
    for m in _STREAM_RE.finditer(body):
        start = m.end()
        end = body.find(b"endstream", start)
        if end < 0:
            continue
        data = body[start:end]
        # strip the optional EOL before 'endstream'
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n") or data.endswith(b"\r"):
            data = data[:-1]
        if b"/FlateDecode" in m.group(1):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        elif b"/Filter" in m.group(1):
            continue        # unsupported filter: skip, never garble
        out.append(data)
    return out


def extract_pdf_text(body: bytes) -> str:
    """Text of a simple PDF in content-stream order. Raises
    :class:`PdfTextError` when the body is not a PDF or no text-showing
    operator is found (scanned/CID documents)."""
    if not body.startswith(b"%PDF"):
        raise PdfTextError("not a PDF")
    lines: List[str] = []
    cur: List[str] = []
    found_op = False
    for stream in _content_streams(body):
        if b"BT" not in stream:
            continue
        for m in _TEXT_OP_RE.finditer(stream):
            lit, op, arr, brk = m.group(1), m.group(2), m.group(3), m.group(4)
            if lit is not None:
                found_op = True
                if op in (b"'", b'"') and cur:
                    lines.append("".join(cur))
                    cur = []
                cur.append(_decode_string_token(lit))
            elif arr is not None:
                found_op = True
                cur.extend(_decode_string_token(t)
                           for t in _STR_IN_ARRAY_RE.findall(arr))
            elif brk is not None and cur:
                lines.append("".join(cur))
                cur = []
    if cur:
        lines.append("".join(cur))
    if not found_op:
        raise PdfTextError(
            "no text-showing operators found (image-only or CID-encoded "
            "PDF; install pdftotext for those)")
    return "\n".join(lines) + "\n"
