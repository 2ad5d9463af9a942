"""Incremental aggregate view maintenance (counting algorithm) vs full
recompute — including the hairy cases: updates that MOVE a row between
groups (retraction must land on the OLD group), groups whose count reaches
zero (tombstoned out of the view), NULL-valued measures, no-op refreshes,
and crash-like re-creation of the maintainer object between refreshes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_services_spark.lake import LakeTable
from data_services_spark.operators.incremental_view import IncrementalAggView

SRC_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("v", T.IntegerType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TS = dt.datetime(2024, 1, 1)


def _src(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "src"), SRC_SCHEMA, ["k"], bucket_count=4,
        props={"merge_keys": ["k"]},
    )


def _rows(spark, rows):
    return spark.createDataFrame([(k, g, v, TS) for k, g, v in rows], SRC_SCHEMA)


def _recompute(source):
    return (
        source.read()
        .groupBy("grp")
        .agg(F.count("*").alias("n_rows"), F.sum("v").cast("long").alias("sum_v"))
    )


def _assert_view_matches(view, source):
    cols = view.read().columns  # count-only views carry no sum_v
    got = {tuple(r) for r in view.read().select(*cols).collect()}
    want = {tuple(r) for r in _recompute(source).select(*cols).collect()}
    assert got == want, f"view {sorted(got)} != recompute {sorted(want)}"


def test_incremental_refresh_matches_recompute(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.overwrite(_rows(spark, [
        ("k1", "A", 1), ("k2", "A", 2), ("k3", "A", 3),
        ("k4", "B", 4), ("k5", "B", 5), ("k6", "C", 6),
    ]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, ["grp"], ["v"]
    )
    out = view.refresh()  # initial load IS an incremental step from empty
    assert out["refreshed"] and out["groups_touched"] == 3
    _assert_view_matches(view, src)

    # v2: k2 MOVES A->B, k6 deleted (C empties out), k7 inserted into B,
    # k1's value changes in place, k5 gets a NULL value
    src.overwrite(_rows(spark, [
        ("k1", "A", 10), ("k2", "B", 2), ("k3", "A", 3),
        ("k4", "B", 4), ("k5", "B", None), ("k7", "B", 7),
    ]))
    out = view.refresh()
    assert out["refreshed"]
    _assert_view_matches(view, src)
    grps = {r.grp for r in view.read().collect()}
    assert grps == {"A", "B"}  # C tombstoned out

    # v3: source untouched -> refresh is a pure no-op (no new view snapshot)
    before = view.table.current_snapshot_id()
    out = view.refresh()
    assert out == {"refreshed": False, "source_snapshot": out["source_snapshot"]}
    assert view.table.current_snapshot_id() == before


def test_refresh_survives_maintainer_restart(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.overwrite(_rows(spark, [("k1", "A", 1), ("k2", "B", 2)]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, ["grp"], ["v"]
    )
    view.refresh()
    src.overwrite(_rows(spark, [("k1", "A", 5), ("k2", "B", 2), ("k3", "B", 3)]))
    # new object, no in-memory state: watermark comes from the view commit
    view2 = IncrementalAggView.load(spark, str(tmp_path / "view"), src)
    assert view2.last_source_snapshot() > 0
    view2.refresh()
    _assert_view_matches(view2, src)


def test_count_only_view_and_touched_groups_bound(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.overwrite(_rows(spark, [(f"k{i}", f"g{i % 5}", i) for i in range(50)]))
    view = IncrementalAggView.create(spark, str(tmp_path / "view"), src, ["grp"])
    view.refresh()
    assert {(r.grp, r.n_rows) for r in view.read().collect()} == {
        (f"g{j}", 10) for j in range(5)
    }
    # touch ONE group only: the refresh writes one group's row, not five
    src.overwrite(_rows(
        spark,
        [(f"k{i}", f"g{i % 5}", i) for i in range(50)] + [("extra", "g0", 1)],
    ))
    out = view.refresh()
    assert out["groups_touched"] == 1
    _assert_view_matches(view, src)
