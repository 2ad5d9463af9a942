"""XLSX scan with header discovery — stdlib-only (zipfile + ElementTree).

The reference ingests spreadsheet submissions with a header-discovery pass
(find the real header row below title/preamble rows) before typing the
columns. No spreadsheet library ships in this environment, but XLSX is a
PUBLIC, stable format: a ZIP of XML parts (ECMA-376 / ISO 29500 —
``xl/workbook.xml``, ``xl/sharedStrings.xml``, ``xl/worksheets/*.xml``),
so the reader parses it from spec with the standard library only.

Spark shape: ``spark.read.format("binaryFile")`` distributes whole files
to executors; one ``mapInPandas`` pass unzips + XML-parses each file and
emits LONG-format cells ``(path, sheet, row_num, col, cell_type, value)``
— schema-on-read without knowing the column set up front. Header
discovery + widening to a typed table happens on that cell frame with
ordinary DataFrame ops (``pivot`` over the discovered header). Per-file
parallelism matches the reference's file-at-a-time pipelines; at 100 TB
the unit of work is the file, exactly like the multimodal payloads.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

CELL_SCHEMA = (
    "path string, sheet string, row_num int, col string, "
    "cell_type string, value string"
)


def _col_letters(ref: str) -> str:
    """'BC12' -> 'BC' (column letters of an A1-style cell reference)."""
    m = re.match(r"([A-Z]+)\d+$", ref or "")
    return m.group(1) if m else ""


def _parse_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """(sheet display name, zip member) pairs in workbook order."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    except KeyError:
        return [
            (m.split("/")[-1].removesuffix(".xml"), m)
            for m in zf.namelist()
            if m.startswith("xl/worksheets/") and m.endswith(".xml")
        ]
    rns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    rid_to_target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(f"{rns}Relationship")
    }
    rid_attr = (
        "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    )
    out = []
    for sh in wb.iter(f"{_NS}sheet"):
        target = rid_to_target.get(sh.get(rid_attr), "")
        member = target if target.startswith("xl/") else f"xl/{target}"
        out.append((sh.get("name"), member))
    return out


def _iter_cells(content: bytes, path: str) -> Iterator[tuple]:
    zf = zipfile.ZipFile(io.BytesIO(content))
    shared = _parse_shared_strings(zf)
    for sheet_name, member in _sheet_parts(zf):
        try:
            root = ET.fromstring(zf.read(member))
        except KeyError:
            continue
        for row in root.iter(f"{_NS}row"):
            rnum = int(row.get("r", "0"))
            for c in row.iter(f"{_NS}c"):
                ctype = c.get("t", "n")
                v = c.find(f"{_NS}v")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    text = "".join(
                        t.text or "" for t in is_el.iter(f"{_NS}t")
                    ) if is_el is not None else None
                    ctype = "s"
                elif v is None:
                    continue
                elif ctype == "s":
                    text = shared[int(v.text)]
                else:  # n (numeric), str (formula string), b (bool)
                    text = v.text
                yield (path, sheet_name, rnum, _col_letters(c.get("r", "")),
                       "s" if ctype in ("s", "str") else ctype, text)


def read_xlsx_cells(spark: SparkSession, path: str) -> DataFrame:
    """All cells of all sheets as a long-format DataFrame (distributed:
    one executor task per file via binaryFile + mapInPandas)."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["path", "sheet", "row_num", "col", "cell_type", "value"]
        for pdf in batches:
            rows = [
                cell
                for p, content in zip(pdf["path"], pdf["content"])
                for cell in _iter_cells(bytes(content), p)
            ]
            yield pd.DataFrame(rows, columns=cols)

    return raw.select("path", "content").mapInPandas(parse, schema=CELL_SCHEMA)


def discover_header(cells: DataFrame, sheet: str | None = None,
                    min_cols: int = 2) -> tuple[int, dict[str, str]]:
    """Header discovery (the reference's scan-down-for-the-header idiom):
    the first row whose cells are ALL strings and at least ``min_cols``
    wide is the header. Returns (header_row_num, {col_letter: name}).
    Single-file form; multi-file globs use :func:`discover_headers`."""
    headers = discover_headers(cells, sheet, min_cols)
    if len(headers) > 1:
        raise ValueError(
            "discover_header() saw cells from multiple files; use "
            "discover_headers() for per-path discovery"
        )
    return next(iter(headers.values()))


def discover_headers(
    cells: DataFrame, sheet: str | None = None, min_cols: int = 2
) -> dict[str, tuple[int, dict[str, str]]]:
    """Per-path header discovery: files matched by one glob may carry
    different preamble lengths, so the header row is found independently
    for each path. Returns {path: (header_row_num, {col_letter: name})}.
    Driver footprint is O(files × header cells) — two small collects."""
    c = cells if sheet is None else cells.where(F.col("sheet") == sheet)
    per_path = (
        c.groupBy("path", "row_num")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("cell_type") != "s").cast("int")).alias("non_str"),
        )
        .where((F.col("n") >= min_cols) & (F.col("non_str") == 0))
        .groupBy("path")
        .agg(F.min("row_num").alias("hrow"))
        .collect()
    )
    if not per_path:
        raise ValueError("no header row found")
    hrows = {r["path"]: int(r["hrow"]) for r in per_path}
    hdf = c.sparkSession.createDataFrame(
        list(hrows.items()), "path string, _hrow int"
    )
    hcells = (
        c.join(F.broadcast(hdf), "path")
        .where(F.col("row_num") == F.col("_hrow"))
        .select("path", "col", "value")
        .collect()
    )
    out: dict[str, tuple[int, dict[str, str]]] = {
        p: (h, {}) for p, h in hrows.items()
    }
    for r in hcells:
        out[r["path"]][1][r["col"]] = r["value"]
    return out


def xlsx_table(
    spark: SparkSession,
    path: str,
    sheet: str | None = None,
    numeric_cols: list[str] | None = None,
) -> DataFrame:
    """Typed table from an XLSX: parse cells, discover the header PER FILE
    (preamble lengths may differ across a glob), widen (groupBy row +
    first(value) per column — no pivot-column inference job), cast
    ``numeric_cols`` to double. All files must share one column layout
    (letter -> name); differing layouts raise rather than silently mixing
    header rows into the data."""
    cells = read_xlsx_cells(spark, path)
    if sheet is not None:
        cells = cells.where(F.col("sheet") == sheet)
    headers = discover_headers(cells, sheet)
    layouts = {tuple(sorted(m.items())) for _, m in headers.values()}
    if len(layouts) > 1:
        raise ValueError(
            f"xlsx files under {path!r} have differing header layouts: "
            f"{sorted(layouts)}"
        )
    mapping = next(iter(headers.values()))[1]
    hdf = spark.createDataFrame(
        [(p, h) for p, (h, _) in headers.items()], "path string, _hrow int"
    )
    body = (
        cells.join(F.broadcast(hdf), "path")
        .where(F.col("row_num") > F.col("_hrow"))
    )
    wide = body.groupBy("path", "row_num").agg(
        *[
            F.first(F.when(F.col("col") == letter, F.col("value")), ignorenulls=True)
            .alias(name)
            for letter, name in sorted(mapping.items())
        ]
    )
    for col in numeric_cols or []:
        wide = wide.withColumn(col, F.col(col).cast("double"))
    return wide
