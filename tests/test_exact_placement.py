"""Exact bucket->task placement for bucketed writes and local compaction.

Hash-repartitioning n distinct bucket ids into n partitions is
balls-in-bins: the fullest task carries 3-4 buckets while ~1/e of the
slots run empty — invisible at 1 core, a straggler tax on the N->4N
scaling pair. The preimage routing (_exact_partition_salt) and the
one-slice-per-bucket parallelize in the local rewrite remove it; these
tests pin the mechanism so a Spark-internal hashing change can never
silently reintroduce the skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_services_spark.lake.table import (
    _exact_partition_salt,
    _murmur3_int,
    _partition_preimages,
)


def test_murmur3_matches_spark_hash(spark):
    vals = [0, 1, 2, 5, 63, 100, 4095, 123456789]
    row = spark.range(1).select(
        *[F.hash(F.lit(v).cast("int")).alias(f"h{i}") for i, v in enumerate(vals)]
    ).collect()[0]
    for i, v in enumerate(vals):
        assert row[f"h{i}"] == _murmur3_int(v), v


def test_preimages_cover_every_partition():
    for n in (4, 16, 64, 257):
        pre = _partition_preimages(n)
        assert len(pre) == n
        assert sorted(_murmur3_int(x) % n for x in pre) == list(range(n))


def test_exact_salt_places_one_bucket_per_partition(spark):
    n = 32
    df = spark.range(0, 8000).select(
        (F.col("id") % n).cast("int").alias("bucket"), F.col("id")
    )
    placed = (
        df.repartition(n, _exact_partition_salt(F.col("bucket"), n))
        .withColumn("pid", F.spark_partition_id())
    )
    stats = placed.groupBy("pid").agg(
        F.countDistinct("bucket").alias("n_buckets")
    ).collect()
    # every one of the n partitions holds exactly one bucket
    assert len(stats) == n
    assert all(r["n_buckets"] == 1 for r in stats)
    # and bucket b really lands in partition b
    mapping = placed.select("bucket", "pid").distinct().collect()
    assert all(r["bucket"] == r["pid"] for r in mapping)


def test_write_path_one_file_per_bucket(spark, tmp_path):
    from pyspark.sql import types as T

    from data_services_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, ["k"], bucket_count=16
    )
    df = spark.range(0, 5000).select(
        F.format_string("k%05d", "id").alias("k"), F.col("id").alias("v")
    )
    t.append(df)
    snap = t.snapshot()
    files = [f for fs in snap.bucket_files.values() for f in fs]
    assert len(snap.bucket_files) == 16
    assert len(files) == 16  # exactly one file per bucket, no task split any
    assert t.read().count() == 5000
