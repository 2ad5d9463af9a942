"""XLSX scan (stdlib zip+XML parser, ECMA-376): header discovery below
preamble rows, shared/inline strings, numeric typing, multi-sheet, and the
distributed binaryFile+mapInPandas shape (reference: spreadsheet ingest
with header discovery)."""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import functions as F

from data_services_spark.sources.xlsx import (
    discover_header,
    read_xlsx_cells,
    xlsx_table,
)

_CT = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="xml" ContentType="application/xml"/>
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
</Types>"""
_WB = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="obs" sheetId="1" r:id="rId1"/>
  <sheet name="meta" sheetId="2" r:id="rId2"/>
 </sheets>
</workbook>"""
_WB_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""
_SST = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
 <si><t>Station Report</t></si><si><t>site</t></si><si><t>temp</t></si><si><t>alpha</t></si>
</sst>"""
# preamble title row, then header (site, temp), then data rows; one inline str
_SHEET1 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c></row>
  <row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="s"><v>2</v></c></row>
  <row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>21.5</v></c></row>
  <row r="4"><c r="A4" t="inlineStr"><is><t>beta</t></is></c><c r="B4"><v>19.25</v></c></row>
 </sheetData>
</worksheet>"""
_SHEET2 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>1</v></c></row>
 </sheetData>
</worksheet>"""


@pytest.fixture()
def xlsx_path(tmp_path):
    p = tmp_path / "report.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("xl/workbook.xml", _WB)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/sharedStrings.xml", _SST)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        zf.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(p)


def test_cells_long_format(spark, xlsx_path):
    cells = read_xlsx_cells(spark, xlsx_path)
    got = {(r["sheet"], r["row_num"], r["col"]): (r["cell_type"], r["value"])
           for r in cells.collect()}
    assert got[("obs", 1, "A")] == ("s", "Station Report")
    assert got[("obs", 3, "B")] == ("n", "21.5")
    assert got[("obs", 4, "A")] == ("s", "beta")  # inline string
    assert ("meta", 1, "A") in got  # second sheet present


def test_header_discovery_skips_preamble(spark, xlsx_path):
    cells = read_xlsx_cells(spark, xlsx_path)
    hrow, mapping = discover_header(cells, sheet="obs")
    # row 1 is a single-cell title -> row 2 is the first all-string row
    # at least 2 columns wide
    assert hrow == 2
    assert mapping == {"A": "site", "B": "temp"}


def test_typed_table(spark, xlsx_path):
    t = xlsx_table(spark, xlsx_path, sheet="obs", numeric_cols=["temp"])
    rows = {r["site"]: r["temp"] for r in t.collect()}
    assert rows == {"alpha": 21.5, "beta": 19.25}
    assert dict(t.dtypes)["temp"] == "double"


def test_per_path_header_discovery_differing_preambles(spark, tmp_path):
    """Two files in one glob with DIFFERENT preamble lengths: header rows
    are discovered per path, so neither file's header leaks into the data
    and no leading data row is dropped."""
    # file B: 2 preamble rows, header at row 3 (file A's header is row 2)
    sheet_b = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c></row>
  <row r="2"><c r="A2" t="s"><v>0</v></c></row>
  <row r="3"><c r="A3" t="s"><v>1</v></c><c r="B3" t="s"><v>2</v></c></row>
  <row r="4"><c r="A4" t="inlineStr"><is><t>gamma</t></is></c><c r="B4"><v>17.0</v></c></row>
 </sheetData>
</worksheet>"""

    def write(p, sheet1):
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr("[Content_Types].xml", _CT)
            zf.writestr("xl/workbook.xml", _WB)
            zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
            zf.writestr("xl/sharedStrings.xml", _SST)
            zf.writestr("xl/worksheets/sheet1.xml", sheet1)
            zf.writestr("xl/worksheets/sheet2.xml", _SHEET2)

    write(tmp_path / "a.xlsx", _SHEET1)   # header at row 2
    write(tmp_path / "b.xlsx", sheet_b)   # header at row 3
    t = xlsx_table(spark, f"{tmp_path}/*.xlsx", sheet="obs", numeric_cols=["temp"])
    rows = {r["site"]: r["temp"] for r in t.collect()}
    assert rows == {"alpha": 21.5, "beta": 19.25, "gamma": 17.0}
    # no header value ever shows up as data
    assert "site" not in rows and "temp" not in rows.values()
