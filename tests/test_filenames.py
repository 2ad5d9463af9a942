"""Filename-convention parser: full/partial/junk names, field typing,
validity flag (reference: IMOSfilename.py:137-245 parse + validation)."""

from __future__ import annotations

from data_services_spark.sources.filenames import FilenameConvention

FULL = ("site/sub/PROJ_AB-1_TZV_20240131T010203Z_PLAT-01_FV01_prod-x"
        "_END-20240201T010203Z_C-20240202T000000Z.nc")
MINIMAL = "x/PROJ_FAC_T_20230101T000000_BUOY7_FV00.csv"
JUNK = "junk/file.txt"


def test_parse_fields(spark):
    df = spark.createDataFrame([(FULL,), (MINIMAL,), (JUNK,)], "path string")
    rows = {r["file_name"]: r for r in FilenameConvention().parse(df).collect()}
    full = rows[FULL.rsplit("/", 1)[1]]
    assert full["project"] == "PROJ" and full["facility"] == "AB-1"
    assert full["data_code_list"] == ["T", "Z", "V"]
    assert full["platform_code"] == "PLAT-01"
    assert full["file_version_int"] == 1 and full["product"] == "prod-x"
    assert full["coverage_sec"] == 86400  # END - start = 1 day
    assert full["creation_time"] is not None and full["convention_ok"]

    minimal = rows["PROJ_FAC_T_20230101T000000_BUOY7_FV00.csv"]
    assert minimal["convention_ok"] and minimal["end_time"] is None
    assert minimal["coverage_sec"] is None and minimal["extension"] == "csv"

    junk = rows["file.txt"]
    assert not junk["convention_ok"] and junk["start_time"] is None


def test_parse_is_map_only(spark):
    df = spark.createDataFrame([(FULL,)], "path string")
    out = FilenameConvention().parse(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
