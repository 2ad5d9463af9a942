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


# ---------------------------------------------------------------- MIN/MAX

def _recompute_mm(source):
    return (
        source.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


def _assert_mm_matches(view, source):
    cols = ["grp", "n_rows", "min_v", "max_v"]
    got = {tuple(r) for r in view.read().select(*cols).collect()}
    want = {tuple(r) for r in _recompute_mm(source).select(*cols).collect()}
    assert got == want, f"view {sorted(got)} != recompute {sorted(want)}"


def test_minmax_append_only_never_recomputes(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.overwrite(_rows(spark, [("k1", "A", 5), ("k2", "A", 9), ("k3", "B", 1)]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, ["grp"], minmax_cols=["v"]
    )
    out = view.refresh()
    assert out["groups_recomputed"] == 0  # pure inserts: monotonic fast path
    _assert_mm_matches(view, src)
    # more inserts, one tightening each extreme
    src.append(_rows(spark, [("k4", "A", 2), ("k5", "A", 11), ("k6", "B", 0)]))
    out = view.refresh()
    assert out["groups_recomputed"] == 0
    _assert_mm_matches(view, src)


def test_minmax_retracting_the_extreme_recomputes(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.overwrite(_rows(spark, [
        ("k1", "A", 1), ("k2", "A", 5), ("k3", "A", 9),
        ("k4", "B", 4), ("k5", "B", 6),
    ]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, ["grp"], minmax_cols=["v"]
    )
    view.refresh()
    # k1 held A's min and k3 its max: raise the min-holder, delete the
    # max-holder — both extremes are stranded, the group must recompute
    src.overwrite(_rows(spark, [
        ("k1", "A", 5), ("k2", "A", 5),
        ("k4", "B", 4), ("k5", "B", 6),
    ]))
    out = view.refresh()
    assert out["groups_recomputed"] == 1  # A only; B untouched
    _assert_mm_matches(view, src)


def test_minmax_duplicate_extreme_survives_single_retraction(spark, tmp_path):
    src = _src(spark, tmp_path)
    # TWO rows share the min value: deleting one must keep min=1 (the
    # stored scalar cannot know the multiplicity — recompute proves it out)
    src.overwrite(_rows(spark, [("k1", "A", 1), ("k2", "A", 1), ("k3", "A", 7)]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, ["grp"], minmax_cols=["v"]
    )
    view.refresh()
    src.overwrite(_rows(spark, [("k2", "A", 1), ("k3", "A", 7)]))
    out = view.refresh()
    assert out["groups_recomputed"] == 1
    _assert_mm_matches(view, src)  # min still 1


def test_minmax_group_move_and_nulls(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.overwrite(_rows(spark, [
        ("k1", "A", 3), ("k2", "A", None), ("k3", "B", 8),
    ]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, ["grp"], ["v"], minmax_cols=["v"]
    )
    view.refresh()
    _assert_mm_matches(view, src)
    # k1 (A's only non-null value, both extremes) MOVES to B with a new
    # value; A is left all-NULL (min/max NULL, group survives via k2)
    src.overwrite(_rows(spark, [
        ("k1", "B", 2), ("k2", "A", None), ("k3", "B", 8),
    ]))
    view.refresh()
    _assert_mm_matches(view, src)
    a = view.read().where(F.col("grp") == "A").collect()[0]
    assert a.min_v is None and a.max_v is None and a.n_rows == 1


def test_minmax_with_sums_combined_and_restart(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.overwrite(_rows(spark, [(f"k{i}", f"g{i % 3}", i) for i in range(30)]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, ["grp"], ["v"], minmax_cols=["v"]
    )
    view.refresh()
    # delete each group's current max (k27..k29), update each min (k0..k2)
    src.overwrite(_rows(
        spark,
        [(f"k{i}", f"g{i % 3}", i + 100 if i < 3 else i) for i in range(27)],
    ))
    view2 = IncrementalAggView.load(spark, str(tmp_path / "view"), src)
    out = view2.refresh()
    assert out["groups_recomputed"] == 3
    _assert_mm_matches(view2, src)
    # sums stay exact alongside
    got = {(r.grp, r.sum_v) for r in view2.read().collect()}
    want = {
        (r.grp, r.sum_v)
        for r in src.read().groupBy("grp")
        .agg(F.sum("v").cast("long").alias("sum_v")).collect()
    }
    assert got == want


def test_null_group_key_is_one_stable_group(spark, tmp_path):
    src = _src(spark, tmp_path)
    # grp=NULL rows form ONE group (SQL GROUP BY semantics) and must keep
    # matching their stored view row across refreshes — a plain equi-join
    # would re-create the NULL group every window
    src.overwrite(_rows(spark, [
        ("k1", None, 4), ("k2", None, 9), ("k3", "A", 1),
    ]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, ["grp"], ["v"], minmax_cols=["v"]
    )
    view.refresh()
    _assert_mm_matches(view, src)
    # second window touches the NULL group: one insert, and the deletion
    # of its current max (strands the extreme -> recompute on a NULL key)
    src.overwrite(_rows(spark, [
        ("k1", None, 4), ("k4", None, 6), ("k3", "A", 1),
    ]))
    out = view.refresh()
    assert out["groups_recomputed"] == 1
    _assert_mm_matches(view, src)
    null_row = [r for r in view.read().collect() if r.grp is None][0]
    assert (null_row.n_rows, null_row.min_v, null_row.max_v) == (2, 4, 6)


def test_reserved_changelog_columns_rejected(spark, tmp_path):
    import pytest as _pytest

    from data_services_spark.cdc.generator import generate_changes
    from data_services_spark.cdc.apply import CdcApplier

    applier = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=4)
    applier.replay(
        generate_changes(spark, 500, n_convs=40, max_turns=6, seed=3),
        chunk_size=500,
    )
    # the changelog re-stamps 'lsn' as its transport ordering column: the
    # stored after-image is unrecoverable, so aggregating it is an error
    with _pytest.raises(ValueError, match="transport ordering column"):
        IncrementalAggView.create(
            spark, str(tmp_path / "v1"), applier.target, ["role"],
            minmax_cols=["lsn"],
        )
    with _pytest.raises(ValueError, match="transport ordering column"):
        IncrementalAggView.create(
            spark, str(tmp_path / "v2"), applier.target, ["role"],
            sum_cols=["lsn"],
        )


def test_load_rejects_wrong_source(spark, tmp_path):
    import pytest as _pytest

    src = _src(spark, tmp_path)
    src.overwrite(_rows(spark, [("k1", "A", 1)]))
    other = LakeTable.create(
        spark, str(tmp_path / "other"), SRC_SCHEMA, ["k"], bucket_count=2,
        props={"merge_keys": ["k"]},
    )
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, ["grp"], ["v"]
    )
    view.refresh()
    with _pytest.raises(ValueError, match="was created over source"):
        IncrementalAggView.load(spark, str(tmp_path / "view"), other)


def test_read_with_avg_is_sql_avg(spark, tmp_path):
    src = _src(spark, tmp_path)
    # A: values (2, 4, NULL) -> AVG 3.0 (NULL doesn't dilute); B: all-NULL
    # -> AVG NULL; C: single value
    src.overwrite(_rows(spark, [
        ("k1", "A", 2), ("k2", "A", 4), ("k3", "A", None),
        ("k4", "B", None), ("k5", "C", 7),
    ]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, ["grp"], ["v"]
    )
    view.refresh()
    got = {(r.grp, r.avg_v) for r in view.read(with_avg=True).collect()}
    want = {
        (r.grp, r.avg_v)
        for r in src.read().groupBy("grp")
        .agg(F.avg("v").alias("avg_v")).collect()
    }
    assert got == want == {("A", 3.0), ("B", None), ("C", 7.0)}
