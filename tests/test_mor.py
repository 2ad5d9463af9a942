"""Merge-on-read (delta-layer) semantics of the lake table + apply loop.

The MOR write path is the engine's at-scale answer to copy-on-write's
O(table x chunks) rewrite cost (Iceberg v2 equality-delete analogue; same
shape as Flink's Iceberg upsert sink). These tests pin down:

* delta layers accumulate without touching base files;
* reads resolve LWW across base + deltas, dropping op='D' tombstones;
* compaction materialises the same state and carries offsets forward;
* threshold auto-compaction bounds layer counts during replay;
* MOR and COW replays of the same stream produce identical final state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_services_spark.cdc.apply import CdcApplier
from data_services_spark.cdc.generator import generate_changes
from data_services_spark.cdc.oracle import expected_final_state, table_state_matches

N_EVENTS = 6000


@pytest.fixture(scope="module")
def changes_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("mor_changes") / "changes.parquet")
    generate_changes(
        spark, N_EVENTS, n_convs=150, max_turns=20, n_hot=2, hot_pct=25,
        delete_pct=8, seed=23,
    ).write.parquet(p)
    return p


def test_delta_layers_accumulate_then_read_resolves(spark, changes_path, tmp_path):
    applier = CdcApplier.bootstrap(
        spark, str(tmp_path / "lake"), bucket_count=8, mode="mor",
        compact_threshold=None,
    )
    changes = spark.read.parquet(changes_path)
    applier.replay(changes, chunk_size=2000)  # 3 chunks, no compaction
    snap = applier.target.snapshot()
    assert snap.delta_buckets(), "expected uncompacted delta layers"
    assert not snap.bucket_files, "MOR replay must not write base files"
    ok, msg = table_state_matches(
        applier.target.read().toPandas(), expected_final_state(changes_path)
    )
    assert ok, msg


def test_compaction_preserves_state_and_offsets(spark, changes_path, tmp_path):
    applier = CdcApplier.bootstrap(
        spark, str(tmp_path / "lake"), bucket_count=8, mode="mor",
        compact_threshold=None,
    )
    changes = spark.read.parquet(changes_path)
    applier.replay(changes, chunk_size=2000)
    before = applier.committed_lsn()
    applier.target.compact()
    snap = applier.target.snapshot()
    assert snap.operation == "compact"
    assert not snap.delta_buckets(), "compaction must clear all delta layers"
    assert applier.committed_lsn() == before, "offsets must survive compaction"
    ok, msg = table_state_matches(
        applier.target.read().toPandas(), expected_final_state(changes_path)
    )
    assert ok, msg
    # compacted read takes the plain-scan fast path: no op column resolution
    assert "op" not in applier.target.read().columns


def test_threshold_auto_compaction_bounds_layers(spark, changes_path, tmp_path):
    applier = CdcApplier.bootstrap(
        spark, str(tmp_path / "lake"), bucket_count=4, mode="mor",
        compact_threshold=2,
    )
    changes = spark.read.parquet(changes_path)
    applier.replay(changes, chunk_size=1000)  # 6 chunks vs threshold 2
    snap = applier.target.snapshot()
    layer_counts = [len(fs) for fs in snap.delta_files.values()]
    assert max(layer_counts, default=0) < 2 + 1, layer_counts
    ok, msg = table_state_matches(
        applier.target.read().toPandas(), expected_final_state(changes_path)
    )
    assert ok, msg


def test_mor_equals_cow_final_state(spark, changes_path, tmp_path):
    changes = spark.read.parquet(changes_path)
    mor = CdcApplier.bootstrap(spark, str(tmp_path / "mor"), bucket_count=8, mode="mor")
    cow = CdcApplier.bootstrap(spark, str(tmp_path / "cow"), bucket_count=8, mode="cow")
    mor.replay(changes, chunk_size=2500, compact_at_end=True)
    cow.replay(changes, chunk_size=2500)
    ok, msg = table_state_matches(
        mor.target.read().toPandas(), cow.target.read().toPandas()
    )
    assert ok, msg


def test_delete_then_reinsert_across_layers(spark, tmp_path):
    """A key deleted in one delta layer and re-inserted in a later one must
    survive with the newer payload; deleted-and-never-reinserted keys must
    not resurface after compaction."""
    from datetime import datetime, timezone

    from data_services_spark.cdc.schemas import CHANGES_SCHEMA

    def at(s):
        return datetime(2025, 1, 1, 0, 0, s, tzinfo=timezone.utc)

    rows = [
        (0, "I", at(0), "c1", 0, "user", "hello", None),
        (1, "I", at(1), "c1", 1, "assistant", "hi", None),
        (2, "D", at(2), "c1", 1, None, None, None),
        (3, "D", at(3), "c1", 0, None, None, None),
        (4, "I", at(4), "c1", 0, "user", "hello again", None),
    ]
    df = spark.createDataFrame(rows, CHANGES_SCHEMA)

    applier = CdcApplier.bootstrap(
        spark, str(tmp_path / "lake"), bucket_count=4, mode="mor",
        compact_threshold=None,
    )
    # one event per chunk -> 5 delta layers, maximal layering
    applier.replay(df, chunk_size=1, source_hi=4)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in applier.target.read().collect()
    }
    assert got == {("c1", 0): "hello again"}
    applier.target.compact()
    got2 = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in applier.target.read().collect()
    }
    assert got2 == got


def test_co_partitioned_write_one_file_per_bucket(spark, changes_path, tmp_path):
    """The murmur3 bucket fn matches Spark's shuffle hash, so the winners
    write must skip its repartition AND still produce exactly one file per
    touched bucket per chunk (no file explosion — the failure mode if the
    co-partitioning assertion ever breaks)."""
    applier = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=8)
    assert applier.target.co_partitioned_write_ok(["conv_id", "turn_idx"])
    changes = spark.read.parquet(changes_path)
    applier.replay(changes, chunk_size=4000)  # 2 chunks
    snap = applier.target.snapshot()
    for b, fs in snap.delta_files.items():
        assert len(fs) <= 2, (b, fs)  # at most 1 file per chunk per bucket


def test_local_and_shuffle_compaction_identical(spark, changes_path, tmp_path):
    """The zero-shuffle per-bucket local rewrite (default) and the
    groupBy-shuffle fallback must produce the SAME table state — rows,
    schema, and per-bucket file structure discipline (one file per
    compacted bucket). Covers deletes + additive schema evolution (the
    generator's tool column is sparse, so some files lack values)."""
    import pandas as pd

    changes = spark.read.parquet(changes_path)
    states = {}
    for strategy in ("local", "shuffle"):
        applier = CdcApplier.bootstrap(
            spark, str(tmp_path / f"lake_{strategy}"), bucket_count=8,
            mode="mor", compact_threshold=None,
        )
        applier.replay(changes, chunk_size=2000)
        applier.target.compact(strategy=strategy)
        snap = applier.target.snapshot()
        assert not snap.delta_buckets()
        pdf = (
            applier.target.read()
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        states[strategy] = (pdf, snap)
    a, sa = states["local"]
    b, sb = states["shuffle"]
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    # local rewrite writes exactly one file per delta-bearing bucket
    for bkt, fs in sa.bucket_files.items():
        assert len(fs) == 1, (bkt, fs)


def test_crash_between_delta_write_and_commit_is_invisible(spark, changes_path, tmp_path):
    """Two-phase commit crash probe: phase 1 written, process dies before
    phase 2. The orphaned dir must be invisible to reads, the chunk must
    replay cleanly (no duplicates, no gaps), and snapshot expiry must sweep
    the orphan."""
    import os

    from data_services_spark.cdc.apply import CdcApplier

    changes = spark.read.parquet(changes_path)
    a = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=8)
    a.replay(changes, chunk_size=4000, source_hi=3999)
    snap_before = a.target.current_snapshot_id()
    rows_before = a.target.read().count()

    # simulate the crash: phase 1 only
    from data_services_spark.cdc.dedup import lww_dedup

    chunk = changes.where((F.col("lsn") > 3999) & (F.col("lsn") <= 7999))
    winners = lww_dedup(chunk.where(F.col("conv_id").isNotNull()),
                        keys=a.keys, order=a.order)
    orphan_dir, _ = a.target.write_delta_files(winners, sort_cols=a.keys)
    assert os.path.isdir(orphan_dir)
    # never committed: reads and snapshot state unchanged
    assert a.target.current_snapshot_id() == snap_before
    assert a.target.read().count() == rows_before

    # resume replays the chunk through the normal path; final state matches
    a.replay(changes, chunk_size=4000)
    from data_services_spark.cdc.oracle import (
        expected_final_state,
        table_state_matches,
    )

    ok, msg = table_state_matches(
        a.target.read().toPandas(), expected_final_state(changes_path)
    )
    assert ok, msg

    # maintenance sweeps the orphan (referenced by NO snapshot — only
    # remove_orphan_files can see it; expire_snapshots sweeps only files
    # some expired snapshot referenced). Age threshold 0 for the test;
    # production keeps the default margin so in-flight phase-1 dirs of
    # concurrent writers are never mistaken for debris.
    removed = a.target.remove_orphan_files(older_than_sec=0)
    assert removed, "orphan files not detected"
    assert not os.path.isdir(orphan_dir)
    # and the sweep broke nothing
    assert a.target.read().count() > 0
