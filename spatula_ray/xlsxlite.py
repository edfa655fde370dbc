"""Tiny xlsx (Office Open XML) reader on zipfile + ElementTree.

openpyxl is not available in this environment; ``ExcelListPage`` only needs
"rows of the active worksheet as tuples" (reference
``/root/reference/src/spatula/pages.py:475-486`` uses
``workbook.active`` + ``worksheet.values``), which this provides for
straightforward files: shared strings, inline strings, numbers, booleans.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Any, Iterator, List, Optional, Tuple
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    m = _CELL_REF.match(ref)
    if not m:
        return 0
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


class Worksheet:
    def __init__(self, rows: List[Tuple[Any, ...]]):
        self._rows = rows

    @property
    def values(self) -> Iterator[Tuple[Any, ...]]:
        return iter(self._rows)


def load_worksheet(content: bytes) -> Worksheet:
    """Parse the first worksheet of an xlsx file into rows of python values."""
    zf = zipfile.ZipFile(io.BytesIO(content))

    shared: List[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{_NS}si"):
            text = "".join(t.text or "" for t in si.iter(f"{_NS}t"))
            shared.append(text)

    sheet_name = None
    for name in zf.namelist():
        if re.match(r"xl/worksheets/sheet1\.xml$", name):
            sheet_name = name
            break
    if sheet_name is None:
        cands = sorted(n for n in zf.namelist() if n.startswith("xl/worksheets/"))
        if not cands:
            raise ValueError("no worksheet found in xlsx file")
        sheet_name = cands[0]

    root = ET.fromstring(zf.read(sheet_name))
    rows: List[Tuple[Any, ...]] = []
    for row in root.iter(f"{_NS}row"):
        vals: List[Any] = []
        for c in row.findall(f"{_NS}c"):
            idx = _col_index(c.get("r", ""))
            while len(vals) < idx:
                vals.append(None)
            ctype = c.get("t", "n")
            v_el = c.find(f"{_NS}v")
            value: Any = None
            if ctype == "s" and v_el is not None and v_el.text is not None:
                value = shared[int(v_el.text)]
            elif ctype == "inlineStr":
                is_el = c.find(f"{_NS}is")
                if is_el is not None:
                    value = "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
            elif ctype == "b" and v_el is not None:
                value = v_el.text == "1"
            elif ctype == "str" and v_el is not None:
                value = v_el.text
            elif v_el is not None and v_el.text is not None:
                txt = v_el.text
                value = float(txt) if ("." in txt or "e" in txt.lower()) else int(txt)
            vals.append(value)
        rows.append(tuple(vals))
    return Worksheet(rows)
