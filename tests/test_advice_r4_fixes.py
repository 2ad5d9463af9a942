"""Round-4 ADVICE items: in-flight-commit safety of expire_snapshots,
snapshot-id high-watermark persistence, and update_where's `s` alias."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_services_spark.lake.table import LakeTable, Snapshot

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("n", T.LongType(), True),
        T.StructField("lsn", T.LongType(), True),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _mk(spark, path, props=None):
    t = LakeTable.create(
        spark, path, SCHEMA, ["k"], bucket_count=4,
        props={"merge_keys": ["k"], "order_cols": ["lsn"], **(props or {})},
    )
    return t


def _orphan(t: LakeTable, parent: int) -> int:
    """Simulate a concurrent writer between _write_snapshot and
    _commit_flip: a manifest exists, no ref points at it."""
    base = t.snapshot(parent)
    sid = t._next_snapshot_id()
    snap = Snapshot(
        snapshot_id=sid,
        parent_id=parent,
        operation="append",
        schema_json=base.schema_json,
        bucket_count=base.bucket_count,
        bucket_keys=base.bucket_keys,
        bucket_files=dict(base.bucket_files),
        summary={},
        props=dict(base.props),
    )
    LakeTable._write_snapshot(t._lake, snap)
    return sid


def test_expiry_retains_inflight_commit(spark, tmp_path):
    """An unreachable manifest whose parent is STILL the head is a
    possible in-flight commit: expiry must retain it inside the grace
    window — deleting it would let the writer's CAS land on a deleted
    manifest (round-4 ADVICE, medium)."""
    t = _mk(spark, str(tmp_path / "t"))
    for i in range(7):
        t.append(_df(spark, [(f"k{i}", i, i)]))
    head = t.current_snapshot_id()
    inflight = _orphan(t, head)
    removed = t.expire_snapshots(keep_last=2)
    assert inflight not in removed  # fresh + parent==head: protected
    assert os.path.exists(os.path.join(t._lake, t._snap_name(inflight)))
    # the writer can still complete its commit
    t._commit_flip(inflight, head)
    assert t.current_snapshot_id() == inflight


def test_expiry_sweeps_doomed_cas_loser_immediately(spark, tmp_path):
    """An orphan whose parent is NOT any ref head can never CAS in —
    garbage, swept with no age requirement."""
    t = _mk(spark, str(tmp_path / "t"))
    for i in range(4):
        t.append(_df(spark, [(f"k{i}", i, i)]))
    loser = _orphan(t, t.current_snapshot_id())
    t.append(_df(spark, [("z", 99, 99)]))  # head moves: the CAS is doomed
    removed = t.expire_snapshots(keep_last=2)
    assert loser in removed


def test_expiry_sweeps_aged_inflight_orphan(spark, tmp_path):
    """Past the grace period even a parent==head orphan is swept (the
    abandoned-writer case); grace=0 makes that immediate."""
    t = _mk(spark, str(tmp_path / "t"))
    for i in range(4):
        t.append(_df(spark, [(f"k{i}", i, i)]))
    stale = _orphan(t, t.current_snapshot_id())
    removed = t.expire_snapshots(keep_last=2, orphan_grace_sec=0.0)
    assert stale in removed


def test_snapshot_id_never_reminted_after_expiry(spark, tmp_path):
    """The persisted high-watermark survives deletion of the highest-id
    manifest, so an operator-held id can never resolve to a different
    snapshot later (round-4 ADVICE, low)."""
    t = _mk(spark, str(tmp_path / "t"))
    for i in range(4):
        t.append(_df(spark, [(f"k{i}", i, i)]))
    loser = _orphan(t, t.current_snapshot_id())
    t.append(_df(spark, [("z", 9, 9)]))
    assert loser in t.expire_snapshots(keep_last=2)
    # the expired orphan held the then-highest id; the next allocation
    # must still be strictly above it
    assert t._next_snapshot_id() > loser


def test_update_where_s_alias_references_payload(spark, tmp_path):
    """set_exprs may reference the matched row through the s alias — the
    source frame carries the payload columns (round-4 ADVICE, low)."""
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", 10, 1), ("b", 20, 2), ("c", 30, 3)]))
    res = t.update_where("n >= 20", {"n": "s.n + t.n"})
    assert res["updated"] == 2
    got = {r["k"]: r["n"] for r in t.read().collect()}
    assert got == {"a": 10, "b": 40, "c": 60}
