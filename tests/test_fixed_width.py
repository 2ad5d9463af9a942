"""Fixed-width scan with versioned layouts (reference: dual-vintage
station files dispatched on line shape, process_MHLwave_from_txt.py:44-78):
layout selection, typed parsing, additive columns, unmatched quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_services_spark.sources.fixed_width import (
    FixedWidthField,
    FixedWidthLayout,
    read_fixed_width,
)

# v1: STATION(4) DATE(8) TEMP(5);  v2 adds SALINITY(5) and a 'V2' prefix
V1 = FixedWidthLayout(
    "v1", r"^S\d{3}\d{8}", [
        FixedWidthField("station", 1, 4),
        FixedWidthField("date_raw", 5, 8),
        FixedWidthField("temp", 13, 5, "double"),
    ],
)
V2 = FixedWidthLayout(
    "v2", r"^V2", [
        FixedWidthField("station", 3, 4),
        FixedWidthField("date_raw", 7, 8),
        FixedWidthField("temp", 15, 5, "double"),
        FixedWidthField("salinity", 20, 5, "double"),
    ],
)


def _write(tmp_path):
    p = tmp_path / "station.txt"
    p.write_text(
        "S00120240101 21.5\n"       # v1
        "V2S00220240102 19.0 35.1\n"  # v2 with salinity
        "garbage line\n"             # no layout
        "S00320240103  bad\n"        # v1 shape, unparseable temp -> NULL
    )
    return str(p)


def test_versioned_layouts(spark, tmp_path):
    df = read_fixed_width(spark, _write(tmp_path), [V2, V1])
    rows = {r["station"]: r for r in df.where(F.col("layout").isNotNull()).collect()}
    assert rows["S001"]["layout"] == "v1" and rows["S001"]["temp"] == 21.5
    assert rows["S001"]["salinity"] is None  # additive col NULL for old vintage
    assert rows["S002"]["layout"] == "v2" and rows["S002"]["salinity"] == 35.1
    assert rows["S003"]["temp"] is None  # try_cast, not a scan abort


def test_unmatched_lines_quarantine(spark, tmp_path):
    df = read_fixed_width(spark, _write(tmp_path), [V2, V1], keep_raw=True)
    bad = df.where(F.col("layout").isNull()).collect()
    assert len(bad) == 1 and bad[0]["raw_line"] == "garbage line"


def test_map_only_plan(spark, tmp_path):
    df = read_fixed_width(spark, _write(tmp_path), [V2, V1])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
