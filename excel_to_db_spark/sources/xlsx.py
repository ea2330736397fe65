"""Pure-Python .xlsx reader (stdlib zipfile + ElementTree only).

Replaces the reference's calamine-based Excel scan (reference
src/main.rs:49-85) — no Excel library or POI jar exists in this
environment, and the format is just a zip of XML parts:

- ``xl/workbook.xml``       sheet name -> relationship id
- ``xl/_rels/workbook.xml.rels``  relationship id -> worksheet part path
- ``xl/sharedStrings.xml``  shared-string table (``t="s"`` cells index it)
- ``xl/worksheets/sheetN.xml``  rows of ``<c r="A1" t="..."><v>..</v></c>``

Cell value decoding:

- ``t="s"``         shared string (index into sharedStrings)
- ``t="inlineStr"`` inline ``<is><t>`` runs
- ``t="str"``       formula string result
- ``t="b"``         boolean (kept as Python bool)
- ``t="e"``         error -> None
- default           number -> int when integral-looking else float

Sparse cells: xlsx omits empty cells entirely; we re-densify from the
``r`` attribute so positional column mapping (the reference's semantics,
src/main.rs:69-75) stays correct.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from typing import Any, Iterator

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_CELL_REF_RE = re.compile(r"([A-Z]+)([0-9]+)")

Cell = Any  # str | int | float | bool | None


def _col_index(ref: str) -> int:
    """'A'->0, 'B'->1, ..., 'AA'->26."""
    m = _CELL_REF_RE.match(ref)
    if not m:
        return -1
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _load_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out: list[str] = []
    for si in root.findall(f"{_NS}si"):
        # A shared string is either one <t> or a list of rich-text <r><t> runs.
        parts = [t.text or "" for t in si.iter(f"{_NS}t")]
        out.append("".join(parts))
    return out


def _sheet_rel_map(zf: zipfile.ZipFile) -> dict[str, str]:
    """sheet name -> worksheet part path inside the zip."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.findall(f"{_REL_NS}Relationship")
    }
    out: dict[str, str] = {}
    for sheet in wb.iter(f"{_NS}sheet"):
        rid = sheet.get(
            "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
        )
        target = rid_to_target.get(rid, "")
        if target.startswith("/"):
            target = target[1:]
        elif not target.startswith("xl/"):
            target = "xl/" + target
        out[sheet.get("name", "")] = target
    return out


def _decode_cell(c: ET.Element, shared: list[str]) -> Cell:
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if ctype == "s":
        return shared[int(raw)]
    if ctype == "str":
        return raw
    if ctype == "b":
        return raw == "1"
    if ctype == "e":
        return None
    # numeric: keep ints as ints so the reference's i64 coercion is exact
    try:
        f = float(raw)
    except ValueError:
        return raw
    if f.is_integer() and "e" not in raw.lower() and "." not in raw:
        return int(raw)
    return f


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return list(_sheet_rel_map(zf))


def iter_xlsx_rows(path: str, sheet: str | None = None) -> Iterator[list[Cell]]:
    """Yield dense rows (list of cells, gaps as None) from one sheet.

    ``sheet=None`` selects the first sheet. Unknown sheet -> KeyError
    (the reference logs an XlsxError, src/main.rs:207).
    """
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_rel_map(zf)
        if not sheets:
            return
        if sheet is None:
            target = next(iter(sheets.values()))
        else:
            if sheet not in sheets:
                raise KeyError(f"sheet {sheet!r} not found; have {list(sheets)}")
            target = sheets[sheet]
        shared = _load_shared_strings(zf)
        # iterparse keeps memory O(row), not O(sheet) — a 100k-row sheet
        # streams through instead of materializing the DOM.
        with zf.open(target) as fh:
            row: list[Cell] = []
            for event, el in ET.iterparse(fh, events=("end",)):
                if el.tag == f"{_NS}c":
                    ci = _col_index(el.get("r", ""))
                    val = _decode_cell(el, shared)
                    if ci < 0:
                        row.append(val)
                    else:
                        while len(row) < ci:
                            row.append(None)
                        if len(row) == ci:
                            row.append(val)
                        else:
                            row[ci] = val
                elif el.tag == f"{_NS}row":
                    yield row
                    row = []
                    el.clear()


def read_xlsx_rows(path: str, sheet: str | None = None) -> list[list[Cell]]:
    return list(iter_xlsx_rows(path, sheet))
