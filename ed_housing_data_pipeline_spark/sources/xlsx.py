"""Vendored minimal .xlsx reader — pure stdlib (zipfile + ElementTree).

The reference ingests a hand-maintained Excel workbook
(bronze_to_silver.py:52-55, ``pd.read_excel(engine="openpyxl")``);
this container has no openpyxl, so S3 would otherwise be a gated
``NotImplementedError``. An .xlsx file is just a zip of XML parts, and
the subset a config-sized workbook needs — sharedStrings, inline
strings, numbers, booleans — is small enough to parse directly.

Scope (documented contract, matching the reference's usage):
- values come back as **strings** (the repo-wide reader stance: read
  strings, cast deliberately in the clean operators);
- dates arrive as their raw Excel serial-number text (the reference's
  workbook carries no date columns; a full date bridge needs the
  styles table and is out of scope);
- formulas yield their cached ``<v>`` result, not a re-computation.

This is a driver-side path for configuration-sized workbooks only;
the 100 TB fact stream is parquet/CSV (splittable, distributed).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile

_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str | None) -> int | None:
    """'BC12' -> 54 (0-based column). None when the cell has no ref."""
    if not ref:
        return None
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1 if n else None


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    name = "xl/sharedStrings.xml"
    if name not in z.namelist():
        return []
    out = []
    for si in ET.fromstring(z.read(name)):
        if _local(si.tag) != "si":
            continue
        # plain <t> or rich-text runs <r><t>..</t></r> — concat all <t>
        out.append(
            "".join(t.text or "" for t in si.iter() if _local(t.tag) == "t")
        )
    return out


def _sheet_target(z: zipfile.ZipFile, sheet: int | str) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        el.get("Id"): el.get("Target")
        for el in rels.iter()
        if _local(el.tag) == "Relationship"
    }
    sheets = [el for el in wb.iter() if _local(el.tag) == "sheet"]
    if not sheets:
        raise ValueError("xlsx has no sheets")
    if isinstance(sheet, int):
        if sheet >= len(sheets):
            raise ValueError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
        chosen = sheets[sheet]
    else:
        by_name = {el.get("name"): el for el in sheets}
        if sheet not in by_name:
            raise ValueError(f"sheet {sheet!r} not found; have {sorted(by_name)}")
        chosen = by_name[sheet]
    target = rid_to_target[chosen.get(f"{_REL_NS}id")]
    if target.startswith("/"):
        return target.lstrip("/")
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_value(cell: ET.Element, shared: list[str]) -> str | None:
    t = cell.get("t", "n")
    if t == "inlineStr":
        return "".join(x.text or "" for x in cell.iter() if _local(x.tag) == "t")
    v = next((x for x in cell if _local(x.tag) == "v"), None)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return "True" if v.text.strip() == "1" else "False"
    return v.text  # n / str / e: raw text through, cast downstream


def read_xlsx_grid(path: str, sheet: int | str = 0) -> list[list[str | None]]:
    """Parse one worksheet into a dense row-major grid of
    string-or-None cells (sparse cells padded with None)."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        root = ET.fromstring(z.read(_sheet_target(z, sheet)))
        rows: dict[int, dict[int, str | None]] = {}
        width = 0
        for ri, row in enumerate(
            el for el in root.iter() if _local(el.tag) == "row"
        ):
            rnum = int(row.get("r", ri + 1)) - 1
            cells: dict[int, str | None] = {}
            next_col = 0
            for cell in (el for el in row if _local(el.tag) == "c"):
                ci = _col_index(cell.get("r"))
                ci = next_col if ci is None else ci
                next_col = ci + 1
                cells[ci] = _cell_value(cell, shared)
                width = max(width, ci + 1)
            rows[rnum] = cells
    if not rows:
        return []
    grid = []
    for rnum in range(max(rows) + 1):
        cells = rows.get(rnum, {})
        grid.append([cells.get(c) for c in range(width)])
    return grid


def read_xlsx_table(
    path: str, sheet: int | str = 0
) -> tuple[list[str], list[list[str | None]]]:
    """First grid row as header (empty header cells named
    ``Unnamed: {i}``, pandas-style), rest as data rows."""
    grid = read_xlsx_grid(path, sheet)
    if not grid:
        raise ValueError(f"xlsx sheet {sheet!r} in {path!r} is empty")
    header = [
        h if h not in (None, "") else f"Unnamed: {i}"
        for i, h in enumerate(grid[0])
    ]
    return header, grid[1:]
