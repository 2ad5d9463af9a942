"""Hot-bucket shard-split local compaction: oversized buckets split into
key-hash shards (each shard LWW-resolves its own keys — per-key exactness
preserved), removing the whole-bucket task ceiling that held the
compaction wall above the apply wall at high core counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_services_spark.cdc.apply import CdcApplier
from data_services_spark.cdc.generator import generate_changes
from data_services_spark.cdc.oracle import expected_final_state, table_state_matches


@pytest.fixture(scope="module")
def hot_changes(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("shard") / "changes.parquet")
    generate_changes(
        spark, 30000, n_convs=300, max_turns=20, n_hot=1, hot_pct=50,
        invalid_one_in=0, seed=13,
    ).write.parquet(p)
    return p


def test_sharded_compaction_matches_oracle(spark, hot_changes, tmp_path):
    applier = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=8)
    applier.replay(spark.read.parquet(hot_changes), chunk_size=10000)
    # force sharding: tiny ceiling => every bucket splits, the hot bucket
    # (50% of all events on one conv) splits hardest
    applier.target.compact(max_task_bytes=64 << 10)
    snap = applier.target.snapshot()
    files_per_bucket = {b: len(fs) for b, fs in snap.bucket_files.items()}
    assert max(files_per_bucket.values()) > 1, files_per_bucket
    assert not any(fs for fs in snap.delta_files.values())
    ok, msg = table_state_matches(
        applier.target.read().toPandas(), expected_final_state(hot_changes)
    )
    assert ok, msg
    # idempotent follow-up reads + another compact stay correct
    applier.target.compact()
    ok, msg = table_state_matches(
        applier.target.read().toPandas(), expected_final_state(hot_changes)
    )
    assert ok, msg


def test_default_ceiling_keeps_uniform_tables_single_file(
    spark, tmp_path
):
    """Uniform buckets stay one task / one file under the adaptive default
    (2x median, floor 32 MiB) — sharding only engages on genuine skew."""
    p = str(tmp_path / "uniform.parquet")
    generate_changes(
        spark, 8000, n_convs=400, max_turns=10, n_hot=0, hot_pct=0,
        invalid_one_in=0, seed=14,
    ).write.parquet(p)
    applier = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=8)
    applier.replay(spark.read.parquet(p), chunk_size=4000)
    applier.target.compact()
    snap = applier.target.snapshot()
    assert all(len(fs) == 1 for fs in snap.bucket_files.values())
    ok, msg = table_state_matches(
        applier.target.read().toPandas(), expected_final_state(p)
    )
    assert ok, msg


def test_sharded_tombstone_gc(spark, hot_changes, tmp_path):
    """expire_tombstones runs through the same sharded rewrite."""
    applier = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=8)
    applier.replay(spark.read.parquet(hot_changes), chunk_size=10000)
    applier.target.compact(max_task_bytes=64 << 10)
    applier.target.expire_tombstones()
    ok, msg = table_state_matches(
        applier.target.read().toPandas(), expected_final_state(hot_changes)
    )
    assert ok, msg
