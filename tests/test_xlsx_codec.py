"""The dependency-free xlsx codec must read/write REAL .xlsx byte
streams (zip-of-XML), matching the pandas `read_excel(dtype=str)`
contract the reference relies on (capital_sendas.py:54,600)."""

from __future__ import annotations

import io
import zipfile

import pandas as pd
import pytest

from etl_sendas_spark.sources.xlsx import read_xlsx, write_xlsx


def test_roundtrip_through_real_xlsx_bytes(tmp_path):
    src = pd.DataFrame(
        {
            "CODIGO": ["890201", "890301", None],
            "DESCRIPCION": ["Consulta", 'Quote"&<tag>', "acentós ñ"],
            "VALOR": ["125000", "98000.5", None],
        }
    )
    path = str(tmp_path / "dim.xlsx")
    write_xlsx(src, path, sheet_name="Hoja1")

    # it is a genuine zip with the xlsx part layout
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    assert {"[Content_Types].xml", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml"} <= names

    got = read_xlsx(path)
    assert list(got.columns) == ["CODIGO", "DESCRIPCION", "VALOR"]
    assert got.values.tolist() == src.values.tolist()

    # also readable from raw bytes (the HTTP ingest path hands bytes)
    with open(path, "rb") as fh:
        got2 = read_xlsx(fh.read())
    assert got2.values.tolist() == src.values.tolist()


def test_shared_strings_numeric_and_bool_cells():
    """Workbooks written by Excel/openpyxl use sharedStrings and typed
    cells — the reader must handle all of them, not just its own
    inline-string output."""
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="s"><v>2</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>125000</v></c>'
        '<c r="C2" t="b"><v>1</v></c></row>'
        '<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3"><v>98000.5</v></c>'
        '<c r="C3" t="b"><v>0</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><t>code</t></si><si><t>value</t></si><si><t>flag</t></si>"
        "<si><t>a</t></si><si><r><t>b</t></r><r><t>1</t></r></si>"  # rich text runs
        "</sst>"
    )
    from etl_sendas_spark.sources.xlsx import (
        _XLSX_CONTENT_TYPES,
        _XLSX_ROOT_RELS,
        _XLSX_WB_RELS,
        _wb_xml,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        zf.writestr("_rels/.rels", _XLSX_ROOT_RELS)
        zf.writestr("xl/workbook.xml", _wb_xml("S"))
        zf.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)

    got = read_xlsx(buf.getvalue())
    assert list(got.columns) == ["code", "value", "flag"]
    # numeric → pandas dtype=str form (no trailing .0); bool → True/False;
    # rich-text shared string concatenates its runs
    assert got.values.tolist() == [
        ["a", "125000", "True"],
        ["b1", "98000.5", "False"],
    ]


def test_header_none_blank_rows_and_duplicate_headers(tmp_path):
    src = pd.DataFrame({"x": ["1", None], "x.1": ["2", "3"]})
    path = str(tmp_path / "h.xlsx")
    write_xlsx(src, path)

    # header=None → integer columns, header row becomes data
    raw = read_xlsx(path, header_row=None)
    assert list(raw.columns) == [0, 1]
    assert raw.values.tolist() == [["x", "x.1"], ["1", "2"], [None, "3"]]

    # duplicate header names get pandas-style .N suffixes
    dup = pd.DataFrame([["a", "b"]], columns=["k", "k"])
    p2 = str(tmp_path / "dup.xlsx")
    write_xlsx(dup, p2)
    got = read_xlsx(p2)
    assert list(got.columns) == ["k", "k.1"]


def test_sheet_by_name_and_missing_sheet(tmp_path):
    src = pd.DataFrame({"a": ["1"]})
    path = str(tmp_path / "s.xlsx")
    write_xlsx(src, path, sheet_name="Datos")
    assert read_xlsx(path, sheet="Datos").values.tolist() == [["1"]]
    with pytest.raises(KeyError, match="no sheet named"):
        read_xlsx(path, sheet="Otra")


def test_read_excel_dim_ingests_real_xlsx(spark, tmp_path):
    """End-to-end S1: a real .xlsx through the production ingest path
    (read_excel_dim → dtype=str → header promotion → NULLs)."""
    from etl_sendas_spark.sources.readers import read_excel_dim

    src = pd.DataFrame(
        [["CODIGO", "DESCRIPCION"], ["890201", "Consulta"], [None, "Sin dato"]],
        columns=["REPORTE", "Unnamed: 1"],
    )
    path = str(tmp_path / "dim.xlsx")
    write_xlsx(src, path)
    out = read_excel_dim(spark, path, promote_first_row=True)
    assert out.columns == ["CODIGO", "DESCRIPCION"]
    assert sorted(
        [tuple(r) for r in out.collect()], key=lambda t: (t[0] is None, t)
    ) == [("890201", "Consulta"), (None, "Sin dato")]


def test_write_excel_sink_roundtrip(spark, tmp_path):
    """The S5 Excel sink writes a workbook the reader (and Excel) can
    open — the reference's own export/import cycle, in-container."""
    from etl_sendas_spark.sources.sinks import write_excel

    df = spark.createDataFrame(
        [("890201", 125000.0), ("890301", None)], ["codigo", "valor"]
    )
    path = str(tmp_path / "audit.xlsx")
    write_excel(df, path)
    got = read_xlsx(path)
    assert list(got.columns) == ["codigo", "valor"]
    assert got.values.tolist() == [["890201", "125000.0"], ["890301", None]]


def test_http_excel_source_end_to_end(spark, tmp_path):
    """S1's network hop (reference capital_sendas.py:30-61), exercised
    offline against a loopback HTTP server: the share-URL rewrite
    (query dropped, ?download=1 appended), the byte-stream download,
    the xlsx parse, and the dim normalization — the full
    read_excel_dim path with a real HTTP round-trip."""
    import http.server
    import threading

    import pandas as pd

    from etl_sendas_spark.sources.readers import read_excel_dim
    from etl_sendas_spark.sources.xlsx import write_xlsx

    pdf = pd.DataFrame(
        {"SERVICIO": ["1", "2", "3"], "CONCEPTO": ["a", None, "c"]}
    )
    path = tmp_path / "dim.xlsx"
    write_xlsx(pdf, str(path))
    blob = path.read_bytes()

    seen = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            seen["path"] = self.path
            self.send_response(200)
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def log_message(self, *a):  # silence
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/dim.xlsx?e=abc&share=1"
        df = read_excel_dim(spark, url)
        rows = {r["SERVICIO"]: r["CONCEPTO"] for r in df.collect()}
        assert rows == {"1": "a", "2": None, "3": "c"}
        # the reference's rewrite: query params dropped, ?download=1 added
        assert seen["path"] == "/dim.xlsx?download=1"
    finally:
        srv.shutdown()
        srv.server_close()
