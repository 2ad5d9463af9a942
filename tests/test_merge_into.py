"""SQL MERGE INTO over the bucket-pruned CoW path: matched-update,
not-matched-insert, conditional delete, batch-wins dominance over the
LWW order, tombstone interplay."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_services_spark.lake import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.StringType(), False),
    T.StructField("v", T.StringType(), True),
    T.StructField("n", T.IntegerType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("lsn", T.LongType(), True),
])


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, v, n, _ts(m), lsn) for k, v, n, m, lsn in rows], SCHEMA)


def _table(spark, path):
    t = LakeTable.create(
        spark, path, SCHEMA, ["k"], bucket_count=4,
        props={"merge_keys": ["k"], "order_cols": ["ts", "lsn"]},
    )
    t.append(_df(spark, [
        ("a", "old-a", 1, 10, 0),
        ("b", "old-b", 2, 10, 1),
        ("c", "old-c", 3, 10, 2),
    ]))
    return t


def _state(t):
    return {r["k"]: (r["v"], r["n"]) for r in t.read().collect()}


def test_merge_update_insert_delete(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    source = _df(spark, [
        ("a", "new-a", 10, 20, 100),   # matched -> update
        ("b", "ignored", 0, 20, 101),  # matched + delete_when -> delete
        ("d", "new-d", 40, 20, 102),   # not matched -> insert
    ])
    res = t.merge_into(
        source,
        update_set="all",
        delete_when=F.col("s.k") == "b",
    )
    assert (res["updated"], res["inserted"], res["deleted"]) == (1, 1, 1)
    assert _state(t) == {
        "a": ("new-a", 10), "c": ("old-c", 3), "d": ("new-d", 40)}


def test_merge_expression_update_and_update_only(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    source = _df(spark, [
        ("a", "x", 100, 20, 100),
        ("z", "zz", 1, 20, 101),       # unmatched, insert=False -> dropped
    ])
    res = t.merge_into(
        source,
        update_set={"n": "t.n + s.n"},  # expression over both aliases
        insert=False,
    )
    assert (res["updated"], res["inserted"], res["deleted"]) == (1, 0, 0)
    got = _state(t)
    assert got["a"] == ("old-a", 101)  # v untouched, n = 1 + 100
    assert "z" not in got


def test_merge_batch_wins_over_stale_source_order(spark, tmp_table_dir):
    """SQL MERGE overwrites even when the source row's event time is
    OLDER than the target's — the dominance stamp; later genuine events
    still beat the merge."""
    t = _table(spark, tmp_table_dir)
    stale = _df(spark, [("a", "merged", 9, 1, 0)])  # ts BEFORE target's
    t.merge_into(stale, update_set="all")
    assert _state(t)["a"] == ("merged", 9)
    # a genuinely newer event applied through the CDC path wins
    from data_services_spark.cdc.apply import CdcApplier

    applier = CdcApplier(
        spark, t, with_lineage=False, compact_threshold=None)
    newer = _df(spark, [("a", "after-merge", 1, 99, 500)]).withColumn(
        "op", F.lit("U"))
    applier.apply_chunk(newer, lo=-1, hi=None, batch_id=1, epoch=1)
    assert _state(t)["a"] == ("after-merge", 1)


def test_merge_delete_is_durable_and_reinsert_works(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    t.merge_into(
        _df(spark, [("a", "x", 0, 20, 100)]),
        update_set="all", delete_when="s.k = 'a'",
    )
    assert "a" not in _state(t)
    # stale straggler (older ts) bounces off the tombstone
    from data_services_spark.cdc.apply import CdcApplier

    applier = CdcApplier(
        spark, t, with_lineage=False, compact_threshold=None)
    stale = _df(spark, [("a", "ghost", 1, 5, 600)]).withColumn(
        "op", F.lit("U"))
    applier.apply_chunk(stale, lo=-1, hi=None, batch_id=1, epoch=1)
    assert "a" not in _state(t)
    # a second MERGE can re-insert the dead key (tombstone dropped)
    res = t.merge_into(_df(spark, [("a", "reborn", 7, 30, 700)]))
    assert res["inserted"] == 1
    assert _state(t)["a"] == ("reborn", 7)


def test_merge_guards(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    with pytest.raises(ValueError, match="key/order"):
        t.merge_into(t.spark.createDataFrame([("a",)], "k string"))
    with pytest.raises(ValueError, match="non-payload"):
        t.merge_into(
            _df(spark, [("a", "x", 1, 20, 9)]), update_set={"lsn": "s.lsn"})


def test_delete_where_and_update_where(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    res = t.delete_where("n >= 3")          # deletes c
    assert res["deleted"] == 1
    assert "c" not in _state(t)
    res2 = t.update_where("k = 'a'", {"n": "t.n * 10", "v": "upper(t.v)"})
    assert res2["updated"] == 1
    got = _state(t)
    assert got["a"] == ("OLD-A", 10)
    assert got["b"] == ("old-b", 2)         # untouched
    # the predicate delete is durable: a stale straggler bounces
    from data_services_spark.cdc.apply import CdcApplier

    applier = CdcApplier(
        spark, t, with_lineage=False, compact_threshold=None)
    stale = _df(spark, [("c", "ghost", 1, 5, 900)]).withColumn(
        "op", F.lit("U"))
    applier.apply_chunk(stale, lo=-1, hi=None, batch_id=1, epoch=1)
    assert "c" not in _state(t)


def test_merge_reinsert_outranks_the_dropped_tombstone(spark, tmp_table_dir):
    """An insert over a dead key must dominate the dropped tombstone:
    events staler than the ORIGINAL DELETE (which the tombstone bounced)
    must not resurrect dead-era content over the fresh insert."""
    t = _table(spark, tmp_table_dir)
    # delete a at rank (ts=20, lsn=100)
    t.merge_into(_df(spark, [("a", "x", 0, 20, 100)]),
                 update_set="all", delete_when="s.k = 'a'")
    # re-insert with a stamp OLDER than the delete
    t.merge_into(_df(spark, [("a", "reborn", 7, 15, 50)]))
    assert _state(t)["a"] == ("reborn", 7)
    # straggler between the insert's own stamp and the old delete rank:
    # previously bounced by the tombstone, must STILL lose to the insert
    from data_services_spark.cdc.apply import CdcApplier

    applier = CdcApplier(spark, t, with_lineage=False, compact_threshold=None)
    stale = _df(spark, [("a", "GHOST", 1, 18, 60)]).withColumn(
        "op", F.lit("U"))
    applier.apply_chunk(stale, lo=-1, hi=None, batch_id=1, epoch=1)
    assert _state(t)["a"] == ("reborn", 7)


def test_merge_null_order_target_row_is_not_silently_dropped(spark, tmp_table_dir):
    """Match detection must not key off a NULLABLE order column: a target
    row with NULL lsn is still a matched row."""
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, ["k"], bucket_count=4,
        props={"merge_keys": ["k"], "order_cols": ["ts", "lsn"]},
    )
    t.append(spark.createDataFrame(
        [("a", "old", 1, _ts(10), None)], SCHEMA))
    res = t.merge_into(
        _df(spark, [("a", "new", 2, 20, 100)]),
        update_set={"n": "s.n"}, insert=False,
    )
    assert res["updated"] == 1
    assert _state(t)["a"] == ("old", 2)  # v kept, n updated — row intact


def test_predicate_dml_no_match_is_metadata_free(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    before = t.current_snapshot_id()
    assert t.delete_where("n > 99")["deleted"] == 0
    assert t.update_where("n > 99", {"n": "t.n"})["updated"] == 0
    assert t.current_snapshot_id() == before  # no no-op commits minted
