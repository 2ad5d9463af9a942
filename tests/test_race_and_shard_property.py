"""Final hardening: the ack_consumer flock under a real thread race, and
shard-split compaction ≡ whole-bucket compaction over randomized streams."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_services_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("lsn", T.LongType(), True),
    ]
)


def test_ack_consumer_race_never_rewinds(spark, tmp_path):
    """Zombie + live acks from many threads: the position must end at the
    maximum acked snapshot, never a stale one (the check-then-write race
    the per-consumer flock closes)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["k"], bucket_count=4,
        props={"merge_keys": ["k"], "order_cols": ["lsn"]},
    )
    sids = []
    for i in range(6):
        t.append(spark.createDataFrame([(f"k{i}", i, i)], SCHEMA))
        sids.append(t.current_snapshot_id())
    t.register_consumer("mart", snapshot_id=0)

    errs = []

    def ack(sid):
        try:
            t.ack_consumer("mart", sid)
        except ValueError:
            pass  # stale ack correctly rejected
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    # two waves of racing acks, shuffled stale/fresh
    threads = [
        threading.Thread(target=ack, args=(s,))
        for s in (sids[3], sids[0], sids[5], sids[1], sids[4], sids[2]) * 3
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert t.consumers()["mart"] == max(sids)


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_shard_split_equals_whole_bucket_compaction(spark, tmp_path, seed):
    """For a randomized keyed stream (dup keys, out-of-order lsn), a
    heavily sharded local compaction produces exactly the same resolved
    state as the whole-bucket one."""
    import random

    rng = random.Random(seed)
    rows = [
        (f"k{rng.randrange(40)}", rng.randrange(1000), lsn)
        for lsn in rng.sample(range(10000), 600)
    ]
    df = spark.createDataFrame(rows, SCHEMA)

    def build(path, **compact_kw):
        t = LakeTable.create(
            spark, path, SCHEMA, ["k"], bucket_count=4,
            props={"merge_keys": ["k"], "order_cols": ["lsn"]},
        )
        # three delta layers so compaction has real folding to do
        for i in range(3):
            t.append_delta(df.where(F.pmod("lsn", F.lit(3)) == i))
        t.compact(**compact_kw)
        return t

    a = build(str(tmp_path / "whole"), max_task_bytes=1 << 40)  # never split
    b = build(str(tmp_path / "shard"), max_task_bytes=1 << 10)  # split hard
    pa_ = a.read().orderBy("k").toPandas()
    pb = b.read().orderBy("k").toPandas()
    assert pa_.equals(pb), f"seed {seed}: sharded state diverged"
    assert max(len(fs) for fs in b.snapshot().bucket_files.values()) > 1
