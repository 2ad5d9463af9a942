"""Quarantine re-drive: re-validate quarantined events under the current
rules and apply the newly-valid ones through the normal LWW path.

Pins the three safety properties the method documents:
* relaxed-rule requeue converges to the same final state as replaying the
  full stream under the relaxed rules from scratch;
* a requeued OLD event can never override a NEWER already-applied row
  (LWW order, not arrival order);
* offsets never move and a second requeue is a commit-free no-op.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_services_spark.cdc.apply import CdcApplier
from data_services_spark.cdc.schemas import CHANGES_SCHEMA
from data_services_spark.cdc.validate import validation_reason


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(lsn, op, _ts(sec), conv, ti, role, text, None)
         for (lsn, op, sec, conv, ti, role, text) in rows],
        CHANGES_SCHEMA,
    )


def relaxed_reason(df):
    """The default ladder minus the role gate — 'a rule was relaxed'."""
    ok_role = F.lit(None).cast("string")
    base = validation_reason(df)
    return F.when(base == "bad_role", ok_role).otherwise(base)


@pytest.fixture()
def lake(spark, tmp_path):
    root = str(tmp_path / "lake")
    applier = CdcApplier.bootstrap(spark, root, bucket_count=4)
    stream = _events(spark, [
        # valid rows
        (0, "I", 0, "c1", 0, "user", "hello"),
        (1, "I", 1, "c1", 1, "assistant", "hi"),
        (2, "I", 2, "c2", 0, "user", "q"),
        # bad_role -> quarantined under the default ladder
        (3, "I", 3, "c3", 0, "robot", "beep"),
        (4, "I", 4, "c1", 2, "droid", "boop"),
        # NEWER valid event for the same key a stale quarantined row targets
        (5, "U", 50, "c2", 0, "user", "q-newest"),
        # STALE event (older ts than lsn 5's) that only fails on role:
        # after requeue it must LOSE to lsn 5's row
        (6, "U", 10, "c2", 0, "cyborg", "q-stale"),
        # null conv_id: invalid under BOTH ladders, must stay quarantined
        (7, "I", 7, None, 0, "user", "orphan"),
    ])
    applier.replay(stream, chunk_size=4, source_hi=7)
    return root, applier


def test_requeue_applies_newly_valid_and_respects_lww(spark, lake):
    root, strict = lake
    assert strict.quarantine.read().count() == 4  # lsn 3,4,6,7
    committed_before = strict.committed_lsn()

    relaxed = CdcApplier.load(spark, root, validator=relaxed_reason)
    res = relaxed.requeue_quarantine()
    assert res["requeued"] == 3            # lsn 3, 4, 6 now pass
    assert res["still_quarantined"] == 1   # lsn 7 (null key) stays

    rows = {(r["conv_id"], r["turn_idx"]): r
            for r in relaxed.target.read().collect()}
    assert rows[("c3", 0)]["text"] == "beep"       # newly applied
    assert rows[("c1", 2)]["text"] == "boop"
    # LWW: the stale requeued event (ts=10) lost to the applied ts=50 row
    assert rows[("c2", 0)]["text"] == "q-newest"
    assert rows[("c2", 0)]["lsn"] == 5

    # offsets untouched: resume position is exactly where replay left it
    assert relaxed.committed_lsn() == committed_before == 7

    # still-invalid row keeps its (re-evaluated) reason
    left = relaxed.quarantine.read().collect()
    assert len(left) == 1 and left[0]["lsn"] == 7
    assert left[0]["reason"] == "null_conv_id"


def test_requeue_matches_from_scratch_replay(spark, lake, tmp_path):
    """Requeue(relaxed) over a strict-replayed lake == one-shot replay of
    the identical stream under the relaxed rules (minus rows invalid under
    both)."""
    root, strict = lake
    relaxed = CdcApplier.load(spark, root, validator=relaxed_reason)
    relaxed.requeue_quarantine()

    root2 = str(tmp_path / "lake2")
    fresh = CdcApplier.bootstrap(
        spark, root2, bucket_count=4, validator=relaxed_reason
    )
    stream = _events(spark, [
        (0, "I", 0, "c1", 0, "user", "hello"),
        (1, "I", 1, "c1", 1, "assistant", "hi"),
        (2, "I", 2, "c2", 0, "user", "q"),
        (3, "I", 3, "c3", 0, "robot", "beep"),
        (4, "I", 4, "c1", 2, "droid", "boop"),
        (5, "U", 50, "c2", 0, "user", "q-newest"),
        (6, "U", 10, "c2", 0, "cyborg", "q-stale"),
        (7, "I", 7, None, 0, "user", "orphan"),
    ])
    fresh.replay(stream, chunk_size=4, source_hi=7)

    got = sorted(tuple(r) for r in relaxed.target.read().collect())
    want = sorted(tuple(r) for r in fresh.target.read().collect())
    assert got == want


def test_second_requeue_is_commit_free_noop(spark, lake):
    root, _ = lake
    relaxed = CdcApplier.load(spark, root, validator=relaxed_reason)
    relaxed.requeue_quarantine()
    snap_target = relaxed.target.current_snapshot_id()
    snap_q = relaxed.quarantine.current_snapshot_id()

    res = relaxed.requeue_quarantine()
    assert res == {"requeued": 0, "still_quarantined": 1}
    assert relaxed.target.current_snapshot_id() == snap_target
    assert relaxed.quarantine.current_snapshot_id() == snap_q


def test_requeue_under_unchanged_rules_is_noop(spark, lake):
    root, strict_applier = lake
    res = strict_applier.requeue_quarantine()
    assert res["requeued"] == 0
    assert res["still_quarantined"] == 4
