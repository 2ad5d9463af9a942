"""End-to-end reference-shaped pipeline: NetCDF files -> from-spec scan ->
schema mapping -> QC flags -> snapshot-diff change capture -> the SAME CDC
applier on a CUSTOM-keyed measurement table (site, record_idx). This is
the reference's dominant pipeline (per-site NetCDF time series, e.g.
FAIMMS/ANMN) run through one engine: bootstrap, incremental update,
redelivery no-op."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_services_spark.cdc.apply import CdcApplier
from data_services_spark.cdc.qc import FLAG_GOOD, FLAG_MISSING, QcRule, with_qc_flags
from data_services_spark.sources.change_capture import snapshot_diff
from data_services_spark.sources.netcdf3 import read_netcdf3_timeseries

from tests.test_netcdf3_source import _attrs, _name  # spec-writer helpers


def _nc_bytes(times, temps):
    numrecs = len(times)
    header = b"CDF\x01" + struct.pack(">i", numrecs)
    header += struct.pack(">ii", 0x0A, 1) + _name("TIME") + struct.pack(">i", 0)
    header += _attrs({})

    def varlist(begin_rec):
        vl = struct.pack(">ii", 0x0B, 2)
        vl += _name("TIME") + struct.pack(">ii", 1, 0) + _attrs({}) \
            + struct.pack(">iii", 6, 8, begin_rec)
        vl += _name("TEMP") + struct.pack(">ii", 1, 0) \
            + _attrs({"_FillValue": (5, struct.pack(">f", -999.0))}) \
            + struct.pack(">iii", 5, 4, begin_rec + 8)
        return vl

    begin = len(header + varlist(0))
    body = header + varlist(begin)
    for t, v in zip(times, temps):
        body += struct.pack(">d", t) + struct.pack(">f", v)
    return body


TARGET_SCHEMA = T.StructType([
    T.StructField("site", T.StringType(), False),
    T.StructField("record_idx", T.IntegerType(), False),
    T.StructField("temperature", T.DoubleType(), True),
    T.StructField("temperature_qc", T.IntegerType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("lsn", T.LongType(), True),
])


def _ingest(spark, path):
    """scan -> map provider names -> site from filename -> QC flags."""
    raw = read_netcdf3_timeseries(spark, path, ["TEMP"])
    mapped = raw.select(
        F.regexp_extract("path", r"site-([A-Za-z0-9]+)\.nc", 1).alias("site"),
        F.col("record_idx").cast("int"),
        F.col("TEMP").alias("temperature"),
        F.timestamp_seconds(F.col("TIME") * 86400).alias("ts"),
    )
    flagged = with_qc_flags(
        mapped, [QcRule("temperature", hard_min=-5.0, hard_max=45.0)]
    )
    return flagged.select("site", "record_idx", "temperature",
                          "temperature_qc", "ts")


def test_netcdf_to_lake_pipeline(spark, tmp_path):
    v1 = tmp_path / "v1" / "site-A.nc"
    v1.parent.mkdir()
    v1.write_bytes(_nc_bytes([100.0, 101.0, 102.0], [21.5, -999.0, 19.0]))

    applier = CdcApplier.bootstrap_custom(
        spark, str(tmp_path / "lake"), TARGET_SCHEMA,
        merge_keys=["site", "record_idx"], bucket_count=4,
    )
    assert applier.keys == ["site", "record_idx"]

    cur = _ingest(spark, str(v1))
    empty = spark.createDataFrame([], cur.schema)
    boot = snapshot_diff(empty, cur, keys=["site", "record_idx"], lsn_start=0)
    applier.replay(boot, chunk_size=100)

    table = applier.target.read()
    got = {(r["site"], r["record_idx"]): (r["temperature"], r["temperature_qc"])
           for r in table.collect()}
    assert got[("A", 0)] == (21.5, FLAG_GOOD)
    assert got[("A", 1)] == (None, FLAG_MISSING)  # fill value -> NULL + flag 9
    committed = applier.committed_lsn()

    # v2 arrives: record 2 corrected, two new records appended
    v2 = tmp_path / "v2" / "site-A.nc"
    v2.parent.mkdir()
    v2.write_bytes(_nc_bytes(
        [100.0, 101.0, 102.5, 103.0, 104.0], [21.5, -999.0, 19.5, 18.0, 50.0]
    ))
    cur2 = _ingest(spark, str(v2))
    delta = snapshot_diff(cur, cur2, keys=["site", "record_idx"],
                          lsn_start=committed + 1)
    ops = {r["record_idx"]: r["op"] for r in delta.collect()}
    assert ops == {2: "U", 3: "I", 4: "I"}  # unchanged rows emit nothing
    applier.replay(delta, chunk_size=100)

    final = {(r["site"], r["record_idx"]): (r["temperature"], r["temperature_qc"])
             for r in applier.target.read().collect()}
    assert final[("A", 2)][0] == 19.5
    assert final[("A", 4)] == (50.0, 4)  # 50 > hard_max 45 -> FLAG_BAD
    # redelivery of the same delta chunk is a no-op
    stats = applier.replay(delta, chunk_size=100)
    assert all(s.skipped for s in stats) or stats == []
    again = {(r["site"], r["record_idx"]): (r["temperature"], r["temperature_qc"])
             for r in applier.target.read().collect()}
    assert again == final


def test_custom_applier_quarantines_null_keys(spark, tmp_path):
    applier = CdcApplier.bootstrap_custom(
        spark, str(tmp_path / "lake"), TARGET_SCHEMA,
        merge_keys=["site", "record_idx"], bucket_count=4,
    )
    import datetime as dt

    chunk = spark.createDataFrame(
        [
            (0, "U", dt.datetime(2024, 1, 1), "A", 0, 20.0, 1),
            (1, "U", dt.datetime(2024, 1, 1), None, 1, 21.0, 1),  # null key
        ],
        "lsn long, op string, ts timestamp, site string, record_idx int, "
        "temperature double, temperature_qc int",
    )
    stats = applier.apply_chunk(chunk, lo=-1, hi=1, batch_id=0)
    assert stats.n_events == 1 and stats.n_quarantined == 1
    q = applier.quarantine.read().collect()
    assert len(q) == 1 and q[0]["reason"] == "null_site"


def test_custom_schema_missing_order_cols_rejected(spark, tmp_path):
    bad = T.StructType([T.StructField("site", T.StringType(), False)])
    with pytest.raises(ValueError, match="lacks key/order"):
        CdcApplier.bootstrap_custom(
            spark, str(tmp_path / "lake"), bad, merge_keys=["site"]
        )
