"""Dependency-free XLSX reader (S9 — reference: Excel → CSV converter,
lib_profiler discovery/excel handling).

The container has no xlrd/openpyxl, but .xlsx is just a ZIP of
well-known XML parts — stdlib ``zipfile`` + ``xml.etree`` cover the
subset a data converter needs:

- ``xl/workbook.xml``        sheet names → part relationships
- ``xl/sharedStrings.xml``   the shared-string table (<si><t>…)
- ``xl/worksheets/sheetN.xml`` rows of <c r="A1" t="s|str|inlineStr|b">

Supported cell types: shared strings (t="s"), inline strings, formula
string results (t="str"), booleans, and numbers. Dates are left as
their raw Excel serial numbers (caller-controlled interpretation, same
policy as the reference's profiler which re-detects temporal columns
downstream). The first row is the header.

This is a DRIVER-side converter (an .xlsx file is single-node data by
construction — the format cannot exceed ~1M rows); the parquet it
writes then enters the distributed pipeline like any other table.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa
import pyarrow.parquet as pq

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    """'A' → 0, 'Z' → 25, 'AA' → 26 …"""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # rich-text runs: concatenate every <t> under the <si>
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_PKG_REL_NS = (
    "{http://schemas.openxmlformats.org/package/2006/relationships}"
)


def _first_sheet_part(z: zipfile.ZipFile) -> str:
    """Resolve the FIRST sheet in tab order: workbook.xml's first
    <sheet r:id=…> → workbook.xml.rels Target. Part numbering does not
    track tab order (deleting sheet1 leaves the first tab in
    sheet2.xml), so the rels walk is authoritative; the lowest-numbered
    part is only a fallback for malformed archives."""
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        first = next(iter(wb.iter(f"{_NS}sheet")))
        rid = first.get(f"{_REL_NS}id")
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        for rel in rels.iter(f"{_PKG_REL_NS}Relationship"):
            if rel.get("Id") == rid:
                target = rel.get("Target", "").lstrip("/")
                if not target.startswith("xl/"):
                    target = "xl/" + target
                z.getinfo(target)  # raises KeyError if absent
                return target
    except (KeyError, StopIteration, ET.ParseError):
        pass
    names = [
        n
        for n in z.namelist()
        if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")
    ]
    if not names:
        raise ValueError("xlsx has no worksheet parts")

    def sheet_no(n: str) -> int:
        m = re.search(r"sheet(\d+)\.xml$", n)
        return int(m.group(1)) if m else 1 << 30

    return sorted(names, key=sheet_no)[0]


def read_xlsx_rows(path: str) -> tuple[list[str], list[list]]:
    """(header, rows) of the first worksheet; cells typed as
    str/float/bool/None."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        sheet = ET.fromstring(z.read(_first_sheet_part(z)))
    rows: list[list] = []
    for row in sheet.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r", "")
            m = _CELL_REF.match(ref)
            idx = _col_index(m.group(1)) if m else len(cells)
            ctype = c.get("t", "n")
            v = c.find(f"{_NS}v")
            if ctype == "inlineStr":
                is_el = c.find(f"{_NS}is")
                cells[idx] = (
                    "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
                    if is_el is not None
                    else None
                )
            elif v is None or v.text is None:
                cells[idx] = None
            elif ctype == "s":
                cells[idx] = shared[int(v.text)]
            elif ctype == "str":
                cells[idx] = v.text
            elif ctype == "b":
                cells[idx] = v.text == "1"
            else:  # numeric
                cells[idx] = float(v.text)
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i) for i in range(width)])
    if not rows:
        return [], []
    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    header = [
        str(h) if h is not None else f"col{i}"
        for i, h in enumerate(rows[0])
    ]
    # uniquify duplicate header names ('value', 'value' → 'value',
    # 'value_2') — a dict keyed by name would silently drop columns
    seen: set[str] = set()
    for i, h in enumerate(header):
        name, n = h, 1
        while name in seen:
            n += 1
            name = f"{h}_{n}"
        seen.add(name)
        header[i] = name
    return header, rows[1:]


def convert_xlsx_to_parquet(src: str, out_dir: str) -> str:
    """First worksheet → one parquet file under `out_dir`. Columns where
    every non-null value is numeric become float64; all-bool columns
    become bool; anything mixed falls back to string (the reference's
    Excel→CSV conversion loses types the same way — profiling re-types
    downstream)."""
    import os

    header, rows = read_xlsx_rows(src)
    cols: dict[str, pa.Array] = {}
    for i, name in enumerate(header):
        vals = [r[i] for r in rows]
        nn = [v for v in vals if v is not None]
        if nn and all(isinstance(v, float) for v in nn):
            cols[name] = pa.array(vals, type=pa.float64())
        elif nn and all(isinstance(v, bool) for v in nn):
            cols[name] = pa.array(vals, type=pa.bool_())
        else:
            cols[name] = pa.array(
                [None if v is None else str(v) for v in vals],
                type=pa.string(),
            )
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "data.parquet")
    pq.write_table(pa.table(cols), out)
    return out_dir
