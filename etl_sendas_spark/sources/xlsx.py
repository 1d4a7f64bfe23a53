"""Dependency-free xlsx codec (stdlib ``zipfile`` + ``ElementTree``).

The reference's primary dimension ingest is a real ``.xlsx`` workbook
(``capital_sendas.py:54`` ``pd.read_excel``; ``:600`` writes xlsx), but
this container has no openpyxl. An xlsx file is just a zip of XML parts,
so a minimal codec needs nothing beyond the stdlib:

- :func:`read_xlsx` — parse a workbook (path or bytes) into a pandas
  DataFrame of strings, mirroring the reference's
  ``pd.read_excel(..., dtype=str)`` contract: every value stringified,
  blank cells → NA, blank header cells → ``Unnamed: <i>``, ``header=None``
  → integer column labels. Handles shared strings, inline strings,
  numeric, and boolean cells; sheets addressed by index or name.
- :func:`write_xlsx` — emit a workbook with one sheet, every cell an
  inline string (the reference consumes its own exports with
  ``dtype=str``, so string cells are faithful round-trip form).

Dims are KB-sized driver-side tables by design (facts belong in
Parquet); nothing here touches the distributed path.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'BC7' → 54: base-26 column letters of an A1 reference."""
    n = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _fmt_number(raw: str) -> str:
    """Numeric cell → the string pandas' dtype=str yields: integral
    floats print without the trailing '.0' ('125000', not '125000.0')."""
    try:
        v = float(raw)
    except ValueError:
        return raw
    if v.is_integer() and "e" not in raw.lower() and abs(v) < 1e16:
        return str(int(v))
    return raw


def _sheet_names(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, zip part path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_target = {}
    for rel in rels:
        t = rel.get("Target")
        if t.startswith("/"):  # package-absolute target
            t = t[1:]
        elif not t.startswith("xl/"):
            t = f"xl/{t}"
        rel_target[rel.get("Id")] = t
    out = []
    for sh in wb.find(f"{_NS}sheets"):
        out.append((sh.get("name"), rel_target[sh.get(f"{_NS_REL}id")]))
    return out


def _cell_value(c: ET.Element, shared: list[str]) -> str | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        node = c.find(f"{_NS}is")
        return "".join(x.text or "" for x in node.iter(f"{_NS}t")) if node is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return "True" if v.text == "1" else "False"
    if t == "str":  # formula cached string result
        return v.text
    return _fmt_number(v.text)


def read_xlsx(path_or_bytes, sheet: str | int = 0, header_row: int | None = 0):
    """Parse one worksheet into a pandas DataFrame of strings.

    Mirrors ``pd.read_excel(..., sheet_name=sheet, header=header_row,
    dtype=str)``: values are strings or NA; with ``header_row=None``
    columns are 0..n-1; blank header cells become ``Unnamed: <i>`` and
    duplicate headers get ``.1``, ``.2`` suffixes.
    """
    import pandas as pd

    if isinstance(path_or_bytes, (bytes, bytearray)):
        fh = io.BytesIO(path_or_bytes)
    elif hasattr(path_or_bytes, "read"):
        fh = path_or_bytes
    else:
        fh = path_or_bytes  # filesystem path

    with zipfile.ZipFile(fh) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheets = _sheet_names(zf)
        if isinstance(sheet, int):
            part = sheets[sheet][1]
        else:
            matches = [p for n, p in sheets if n == sheet]
            if not matches:
                raise KeyError(f"no sheet named {sheet!r}; have {[n for n, _ in sheets]}")
            part = matches[0]
        ws = ET.fromstring(zf.read(part))

        rows: dict[int, dict[int, str]] = {}
        ncols = 0
        for row in ws.iter(f"{_NS}row"):
            r = int(row.get("r", len(rows) + 1)) - 1
            cells = {}
            next_col = 0
            for c in row:
                ref = c.get("r")
                ci = _col_index(ref) if ref else next_col
                next_col = ci + 1
                val = _cell_value(c, shared)
                if val is not None and val != "":
                    cells[ci] = val
                    ncols = max(ncols, ci + 1)
            rows[r] = cells

    nrows = max(rows) + 1 if rows else 0
    grid = [
        [rows.get(r, {}).get(c) for c in range(ncols)] for r in range(nrows)
    ]
    # pandas' excel parser runs with skip_blank_lines: fully-empty rows
    # vanish before header selection — mirror that so both backends of
    # _pandas_read_excel see identical frames
    grid = [row for row in grid if any(v is not None for v in row)]

    if header_row is None:
        cols: list = list(range(ncols))
        data = grid
    else:
        header = grid[header_row] if grid else []
        cols = []
        seen: dict[str, int] = {}
        for i in range(ncols):
            h = header[i] if i < len(header) else None
            name = f"Unnamed: {i}" if h is None else str(h)
            if name in seen:  # pandas-style dedup: x, x.1, x.2
                seen[name] += 1
                name = f"{name}.{seen[name]}"
            else:
                seen[name] = 0
            cols.append(name)
        data = grid[header_row + 1 :]

    pdf = pd.DataFrame(data, columns=cols, dtype=object)
    return pdf.where(pd.notna(pdf), None)


_XLSX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_XLSX_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_XLSX_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _wb_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name, {chr(34): "&quot;"})}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )


def _col_letter(i: int) -> str:
    """0 → 'A', 54 → 'BC'."""
    s = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def write_xlsx(pdf, path_or_buf, sheet_name: str = "Sheet1") -> None:
    """Write a pandas DataFrame as a real .xlsx workbook (one sheet,
    header row + data, all cells inline strings, NA cells omitted) —
    byte-stream compatible with Excel/openpyxl/pandas and with
    :func:`read_xlsx`.
    """
    import pandas as pd

    out = io.StringIO()
    out.write(
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
    )
    all_rows = [list(map(str, pdf.columns))] + [
        [None if pd.isna(v) else str(v) for v in rec]
        for rec in pdf.itertuples(index=False, name=None)
    ]
    for r, row in enumerate(all_rows, start=1):
        out.write(f'<row r="{r}">')
        for ci, val in enumerate(row):
            if val is None:
                continue
            out.write(
                f'<c r="{_col_letter(ci)}{r}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(val)}</t></is></c>"
            )
        out.write("</row>")
    out.write("</sheetData></worksheet>")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        zf.writestr("_rels/.rels", _XLSX_ROOT_RELS)
        zf.writestr("xl/workbook.xml", _wb_xml(sheet_name))
        zf.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", out.getvalue())
    payload = buf.getvalue()
    if hasattr(path_or_buf, "write"):
        path_or_buf.write(payload)
    else:
        with open(path_or_buf, "wb") as fh:
            fh.write(payload)
