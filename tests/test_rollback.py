"""Snapshot rollback — the recovery verb for a bad batch that LANDED.

(The WAP audit gate catches bad batches before publish; rollback un-does
one the audit missed.) Pins:

* rollback restores the target snapshot's exact visible state AND its
  resume watermark in one atomic commit — the next replay re-applies the
  rolled-back events and converges to the full-stream oracle (no
  duplicates, no gaps);
* it is metadata-only: zero data files are written or removed, and the
  rolled-back-over commits stay readable via time travel until expiry;
* guards: rolling forward / to current refuses, an expired target refuses
  with a clear error;
* the maintain_job CLI exposes it as --rollback-to.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_services_spark.cdc.apply import CdcApplier
from data_services_spark.cdc.generator import generate_changes
from data_services_spark.cdc.oracle import expected_final_state, table_state_matches


@pytest.fixture(scope="module")
def changes_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("rb_changes") / "changes.parquet")
    generate_changes(
        spark, 6000, n_convs=150, max_turns=20, n_hot=2, hot_pct=25,
        invalid_one_in=0, seed=31,
    ).write.parquet(p)
    return p


def _halves(spark, changes_path):
    changes = spark.read.parquet(changes_path)
    hi = changes.agg(F.max("lsn")).collect()[0][0]
    return changes, hi // 2, hi


def _data_files(table):
    return sorted(table.snapshot().all_files())


def test_rollback_restores_state_then_replay_converges(
    spark, changes_path, tmp_path
):
    applier = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=8)
    changes, mid, hi = _halves(spark, changes_path)
    applier.replay(changes, chunk_size=hi, source_hi=mid)
    good_sid = applier.target.current_snapshot_id()
    good_files = _data_files(applier.target)
    applier.replay(changes, chunk_size=hi)  # the "bad" batch lands
    bad_sid = applier.target.current_snapshot_id()
    assert bad_sid > good_sid

    snap = applier.target.rollback(good_sid)
    # state, watermark, and files are the good snapshot's — metadata only
    assert snap.summary["rollback_to"] == good_sid
    assert applier.committed_lsn() == mid
    assert _data_files(applier.target) == good_files
    ok, msg = table_state_matches(
        applier.target.read().toPandas(),
        expected_final_state(changes_path, hi_lsn=mid),
    )
    assert ok, f"rollback did not restore the good state: {msg}"
    # the rolled-back-over commit is still time-travelable (until expiry)
    ok, msg = table_state_matches(
        applier.target.read(snapshot_id=bad_sid).toPandas(),
        expected_final_state(changes_path),
    )
    assert ok, msg

    # recovery loop: a fresh applier resumes from the regressed watermark
    # and re-applies the rolled-back events — idempotent under LWW
    resumed = CdcApplier.load(spark, str(tmp_path / "lake"))
    resumed.replay(changes, chunk_size=hi)
    assert resumed.committed_lsn() == hi
    ok, msg = table_state_matches(
        resumed.target.read().toPandas(), expected_final_state(changes_path)
    )
    assert ok, msg


def test_rollback_guards(spark, changes_path, tmp_path):
    applier = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=8)
    changes, mid, hi = _halves(spark, changes_path)
    applier.replay(changes, chunk_size=(hi - 0) // 6)
    cur = applier.target.current_snapshot_id()
    with pytest.raises(ValueError, match="only moves backwards"):
        applier.target.rollback(cur)
    with pytest.raises(ValueError, match="only moves backwards"):
        applier.target.rollback(cur + 5)
    expired = applier.target.expire_snapshots(keep_last=2)
    assert expired
    with pytest.raises(ValueError, match="expired"):
        applier.target.rollback(expired[0])


def test_rollback_via_maintain_job_cli(spark, changes_path, tmp_path, capsys):
    from data_services_spark.jobs import maintain_job

    root = str(tmp_path / "root")
    applier = CdcApplier.bootstrap(spark, root, bucket_count=8)
    changes, mid, hi = _halves(spark, changes_path)
    applier.replay(changes, chunk_size=hi, source_hi=mid)
    good_sid = applier.target.current_snapshot_id()
    applier.replay(changes, chunk_size=hi)

    rc = maintain_job.main(
        ["--root", root, "--tables", "transcripts",
         "--rollback-to", str(good_sid), "--describe"]
    )
    assert rc == 0
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()][-1]
    assert out["rolled_back"]["to"] == good_sid
    assert out["rolled_back"]["committed_lsn"] == mid
    assert out["describe"]["committed_lsn"] == mid
    ok, msg = table_state_matches(
        applier.target.read().toPandas(),
        expected_final_state(changes_path, hi_lsn=mid),
    )
    assert ok, msg
