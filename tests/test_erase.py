"""Right-to-be-forgotten erasure: physical removal + anti-resurrection
tombstones on the target, quarantine purge, and the block-the-past /
allow-the-future LWW contract."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_services_spark.cdc.apply import CdcApplier
from data_services_spark.cdc.schemas import CHANGES_SCHEMA


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def _changes(spark, rows):
    """rows: (lsn, op, minute, conv_id, turn_idx, role, text)"""
    return spark.createDataFrame(
        [(lsn, op, _ts(m), cid, ti, role, text, None)
         for (lsn, op, m, cid, ti, role, text) in rows],
        CHANGES_SCHEMA,
    )


@pytest.fixture()
def applied(spark, tmp_path):
    applier = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=8)
    stream = _changes(spark, [
        (0, "U", 0, "keep", 0, "user", "k0"),
        (1, "U", 1, "gone", 0, "user", "secret-a"),
        (2, "U", 2, "gone", 1, "user", "secret-b"),
        (3, "U", 3, "keep", 1, "user", "k1"),
        # invalid role -> quarantined, carries the subject's payload
        (4, "U", 4, "gone", 2, "robot", "secret-q"),
    ])
    applier.replay(stream, chunk_size=10**9)
    return applier


def test_erase_subject_removes_target_and_quarantine(applied):
    res = applied.erase_subject({"conv_id": ["gone"]})
    assert res["target_erased"] == 2
    assert res["quarantine_purged"] == 1
    # target: subject gone, others intact
    rows = applied.target.read().select("conv_id", "turn_idx", "text").collect()
    assert sorted((r[0], r[1]) for r in rows) == [("keep", 0), ("keep", 1)]
    # quarantine: subject's raw events scrubbed
    assert applied.quarantine.read().where(
        F.col("conv_id") == "gone").count() == 0
    # no payload byte survives in any CURRENT data file
    import glob as _glob
    import json as _json
    import os

    snap = applied.target.snapshot()
    for rel in snap.all_files():
        with open(os.path.join(applied.target.path, rel), "rb") as f:
            assert b"secret-a" not in f.read()


def test_erase_blocks_past_allows_future(applied):
    applied.erase_subject({"conv_id": ["gone"]})
    late = _changes(spark=applied.spark, rows=[
        # stale straggler: OLDER event time than the erased row, higher lsn
        (10, "U", 0, "gone", 0, "user", "stale-resurrection"),
        # genuinely new data: NEWER event time
        (11, "U", 99, "gone", 1, "user", "fresh-after-erasure"),
    ])
    applied.replay(late, chunk_size=10**9)
    rows = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in applied.target.read().collect()}
    assert ("gone", 0) not in rows          # tombstone outranks the stale event
    assert rows[("gone", 1)] == "fresh-after-erasure"  # future still writes


def test_erase_guards(spark, tmp_path, applied):
    with pytest.raises(ValueError, match="not merge keys"):
        applied.erase_subject({"role": ["user"]})
    # non-LWW engines refuse (tombstones cannot durably win under FWW)
    frow = CdcApplier.bootstrap(
        spark, str(tmp_path / "frow"), bucket_count=4,
        target_props={"merge_engine": "first_row"},
    )
    with pytest.raises(ValueError, match="merge_engine"):
        frow.target.erase([{"conv_id": "x", "turn_idx": 0}])


def test_erase_explicit_keys_and_noop_purge(applied):
    # erasing one explicit (conv, turn) leaves the conv's other turns
    res = applied.target.erase([{"conv_id": "gone", "turn_idx": 0}])
    assert res["erased"] == 1
    left = applied.target.read().where(F.col("conv_id") == "gone").collect()
    assert [(r["turn_idx"]) for r in left] == [1]
    # purge with no matches is a metadata no-op
    res_q = applied.quarantine.purge(
        [{"conv_id": "nobody"}], key_cols=["conv_id"])
    assert res_q["purged"] == 0 and res_q["buckets"] == []


def test_noop_erase_does_not_resurrect_other_keys_delta_tombstones(spark, tmp_path):
    """A no-match erase rewrites the affected buckets (migrating OTHER
    keys' delta-layer delete tombstones into base); the op-aware read
    flag must flip with the table state, not this call's victim count."""
    applier = CdcApplier.bootstrap(
        spark, str(tmp_path / "lake"), bucket_count=1, compact_threshold=None)
    applier.replay(_changes(spark, [
        (0, "U", 0, "a", 0, "user", "doomed"),
        (1, "D", 5, "a", 0, None, None),       # delta-layer tombstone
        (2, "U", 1, "b", 1, "user", "kept"),
    ]), chunk_size=10**9)
    assert applier.target.snapshot().props.get("base_tombstones") is None
    res = applier.target.erase([{"conv_id": "zz", "turn_idx": 9}])
    assert res["erased"] == 0
    rows = [(r["conv_id"], r["turn_idx"])
            for r in applier.target.read().collect()]
    assert rows == [("b", 1)]  # the deleted key must NOT come back


def test_erase_of_deleted_key_keeps_its_tombstone(spark, tmp_path):
    """Erasing a key that was already deleted must keep (payload-scrub)
    its tombstone — dropping it would un-guard the key against its own
    stale redeliveries."""
    applier = CdcApplier.bootstrap(
        spark, str(tmp_path / "lake"), bucket_count=1)
    applier.replay(_changes(spark, [
        (0, "U", 10, "a", 0, "user", "v1"),
        (1, "D", 20, "a", 0, None, None),
    ]), chunk_size=10**9)
    res = applier.target.erase([{"conv_id": "a", "turn_idx": 0}])
    assert res["erased"] == 0  # nothing live, but the guard must survive
    # stale straggler: older event time, fresh lsn
    applier.replay(_changes(spark, [
        (10, "U", 15, "a", 0, "user", "stale"),
    ]), chunk_size=10**9)
    assert applier.target.read().count() == 0
