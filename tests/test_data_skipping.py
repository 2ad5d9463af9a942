"""Manifest-level data skipping (Iceberg lower/upper-bound pruning analogue).

The table prop ``stats_cols`` makes every commit record per-file column
min/max in the snapshot manifest (footers read ONCE per file, at commit).
``read(prune={col: (lo, hi)})`` then drops clean-bucket files whose ranges
cannot intersect — no footer open, no task scheduled — while applying the
same predicate as a row filter so correctness never rests on the stats.

Covers: pruned result == filtered full read; the pruned scan really opens
fewer files; delta-bearing buckets are never file-pruned (a stale in-range
delta row must still LOSE to an out-of-range base winner); stats survive
compaction and rebucket; tables without stats_cols are unaffected.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_services_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _month_rows(month: int, n: int = 40, lsn0: int = 0):
    return [
        (f"k{month}_{i}", dt.datetime(2024, month, 1 + i % 27), lsn0 + i, f"m{month}")
        for i in range(n)
    ]


def _mk(spark, path, **props):
    return LakeTable.create(
        spark, path, SCHEMA, ["k"], bucket_count=4,
        props={"merge_keys": ["k"], "order_cols": ["ts", "lsn"], **props},
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_pruned_read_equals_filtered_and_skips_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, stats_cols=["ts", "lsn"])
    for m in (1, 2, 3):  # three time-disjoint commits -> disjoint file ranges
        t.append(_df(spark, _month_rows(m, lsn0=m * 1000)))
    snap = t.snapshot()
    n_files = sum(len(fs) for fs in snap.bucket_files.values())
    assert len(snap.file_col_stats) == n_files  # every base file has stats
    lo, hi = dt.datetime(2024, 2, 1), dt.datetime(2024, 2, 28)
    pruned = t.read(prune={"ts": (lo, hi)})
    full = t.read().where(F.col("ts").between(F.lit(lo), F.lit(hi)))
    assert pruned.count() == full.count() == 40
    assert sorted(r.k for r in pruned.collect()) == sorted(
        r.k for r in full.collect()
    )
    # the scan itself opens strictly fewer files than the table holds
    assert 0 < len(pruned.inputFiles()) < n_files


def test_open_bounds_and_no_stats_table(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)  # stats_cols NOT set
    t.append(_df(spark, _month_rows(1)))
    t.append(_df(spark, _month_rows(2, lsn0=1000)))
    assert t.snapshot().file_col_stats == {}
    # pruning still works as a plain filter (conservative keep everywhere)
    out = t.read(prune={"ts": (dt.datetime(2024, 2, 1), None)})
    assert out.count() == 40
    out2 = t.read(prune={"lsn": (None, 999)})
    assert out2.count() == 40


def test_delta_buckets_never_file_pruned(spark, tmp_table_dir):
    """A key's base row sits OUTSIDE the prune range but wins LWW against a
    stale in-range delta row: if the base file were pruned, the stale row
    would wrongly surface. The delta-bearing bucket must resolve fully."""
    t = _mk(spark, tmp_table_dir, stats_cols=["ts"])
    # base: the newer version (March) of key kx, plus March filler
    base = [("kx", dt.datetime(2024, 3, 15), 100, "new")] + _month_rows(3, 20)
    t.append(_df(spark, base))
    # delta layer: a STALE February row for kx (loses LWW on ts)
    stale = spark.createDataFrame(
        [("kx", dt.datetime(2024, 2, 10), 5, "stale", None)],
        T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType(), True)]),
    )
    t.append_delta(stale)
    # prune to February: kx's winner is the March base row -> kx excluded
    out = t.read(prune={"ts": (dt.datetime(2024, 2, 1), dt.datetime(2024, 2, 28))})
    assert out.where(F.col("k") == "kx").count() == 0
    # and the full read still returns the NEW version
    assert t.read().where(F.col("k") == "kx").collect()[0].v == "new"


def test_stats_survive_compaction_and_rebucket(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, stats_cols=["ts"])
    for m in (1, 2):
        t.append(_df(spark, _month_rows(m, lsn0=m * 1000)))
    t.compact()
    snap = t.snapshot()
    base = {f for fs in snap.bucket_files.values() for f in fs}
    assert base and base <= set(snap.file_col_stats)
    t.rebucket(8)
    snap2 = t.snapshot()
    base2 = {f for fs in snap2.bucket_files.values() for f in fs}
    assert base2 and base2 <= set(snap2.file_col_stats)
    # post-evolution pruned read still correct
    lo, hi = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31)
    assert t.read(prune={"ts": (lo, hi)}).count() == 40


def test_prune_unknown_column_rejected(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, stats_cols=["ts"])
    t.append(_df(spark, _month_rows(1)))
    import pytest

    with pytest.raises(ValueError, match="prune columns"):
        t.read(prune={"nope": (1, 2)})
