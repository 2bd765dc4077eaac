"""Minimal self-contained .xlsx codec — stdlib zipfile + XML only.

The sandbox ships no Excel engine (openpyxl/xlrd), but .xlsx is just a
zip of ECMA-376 SpreadsheetML parts; the subset the reference's Excel
connector needs (rectangular tables, first row = header, multiple
sheets — d22d/utils/db/__init__.py:839-982) fits in a small writer and
reader:

  - writer emits inline-string cells (``t="inlineStr"``) so no
    sharedStrings table is needed; numbers are plain ``<v>`` cells.
  - reader handles both our own output AND the common forms real
    producers emit: shared strings (``t="s"``), inline strings,
    numeric cells, booleans; styles/formats/formula results beyond
    their cached value are ignored (values, not presentation).

`ExcelConnector` prefers openpyxl/pandas when installed (full fidelity
with styles, dates, etc.) and falls back to this codec otherwise — the
connector is functional, not gated, everywhere.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_ref(idx: int) -> str:
    """0-based column index -> A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_sheets(sheets: list[tuple[str, "pd.DataFrame"]], buf) -> None:
    """Write (sheet_name, frame) pairs as a workbook to a file-like or
    path. First row of each sheet = column names; strings are inline,
    numeric types are numeric cells, None/NaN cells are omitted."""
    if not sheets:
        raise ValueError("a workbook needs at least one sheet")
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        overrides = "\n".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheets))
        )
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "\n".join(
            # attribute context: double quotes must be entity-escaped too
            f'<sheet name="{escape(name, {chr(34): "&quot;"})}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, (name, _) in enumerate(sheets)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "\n".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{rels}</Relationships>",
        )
        for i, (_, pdf) in enumerate(sheets):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(pdf))


def _cell_xml(ref: str, value) -> str:
    if hasattr(value, "item") and type(value).__module__ == "numpy":
        value = value.item()  # numpy scalars are not int/float/bool subclasses
    if value is None or (not isinstance(value, (str, bytes)) and pd.isna(value)):
        return ""  # pd.isna is scalar-safe for NaN/NaT/pd.NA alike
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    # XML parsers normalize a literal '\r' (and '\r\n') to '\n' in
    # content — a carriage return only round-trips as a char reference
    text = escape(str(value)).replace("\r", "&#13;")
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def _sheet_xml(pdf: "pd.DataFrame") -> str:
    rows = ['<row r="1">' + "".join(
        _cell_xml(f"{_col_ref(c)}1", str(name)) for c, name in enumerate(pdf.columns)
    ) + "</row>"]
    col_refs = [_col_ref(c) for c in range(len(pdf.columns))]
    # itertuples, not iterrows: no per-row Series construction — the
    # 500k-rows-per-sheet default makes the row walk the hot path
    for r, row in enumerate(pdf.itertuples(index=False, name=None), start=2):
        cells = "".join(_cell_xml(f"{col_refs[c]}{r}", v) for c, v in enumerate(row))
        rows.append(f'<row r="{r}">{cells}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows)}</sheetData></worksheet>"
    )


_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_idx(ref: str) -> int:
    """A1-style cell ref -> 0-based column index."""
    letters = _CELL_REF.match(ref).group(1)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_sheets(data: bytes) -> dict[str, "pd.DataFrame"]:
    """Workbook bytes -> {sheet_name: frame} (first row = header).
    Understands shared strings, inline strings, numbers, booleans."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = {}
        if "xl/_rels/workbook.xml.rels" in z.namelist():
            rel_root = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
            for rel in rel_root:
                rels[rel.get("Id")] = rel.get("Target").lstrip("/")
        out: dict[str, pd.DataFrame] = {}
        for i, sheet in enumerate(wb.find(f"{_NS}sheets")):
            name = sheet.get("name")
            target = rels.get(sheet.get(f"{_REL_NS}id"), f"worksheets/sheet{i + 1}.xml")
            part = target if target.startswith("xl/") else f"xl/{target}"
            out[name] = _parse_sheet(z.read(part), shared)
        return out


def _parse_sheet(xml: bytes, shared: list[str]) -> "pd.DataFrame":
    root = ET.fromstring(xml)
    grid: list[dict[int, object]] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row.findall(f"{_NS}c"):
            ref, ctype = c.get("r"), c.get("t")
            col = _col_idx(ref) if ref else len(cells)
            if ctype == "inlineStr":
                is_el = c.find(f"{_NS}is")
                cells[col] = "".join(t.text or "" for t in is_el.iter(f"{_NS}t")) if is_el is not None else ""
                continue
            v = c.find(f"{_NS}v")
            if v is None or v.text is None:
                continue
            if ctype == "s":
                cells[col] = shared[int(v.text)]
            elif ctype == "b":
                cells[col] = bool(int(v.text))
            elif ctype == "str":  # cached formula result
                cells[col] = v.text
            else:
                # SpreadsheetML numbers are IEEE doubles with no int
                # granularity — parse as float ALWAYS. Collapsing
                # integral values to int per cell would let one
                # workbook part infer a long schema while a sibling
                # part holds 1.5, crashing a distributed read.
                cells[col] = float(v.text)
        grid.append(cells)
    if not grid:
        return pd.DataFrame()
    width = max((max(r) + 1 for r in grid if r), default=0)
    header = [grid[0].get(c, f"col{c}") for c in range(width)]
    body = [[r.get(c) for c in range(width)] for r in grid[1:]]
    return pd.DataFrame(body, columns=[str(h) for h in header])
