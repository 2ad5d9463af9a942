"""Multi-table CDC routing: one multiplexed change stream fanned out to
independent lake tables (Debezium topic-per-table / Paimon database-sync
combined mode — the reference's one-cron-per-feed fleet as one job)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_services_spark.cdc.apply import CdcApplier
from data_services_spark.cdc.router import CdcRouter, TableSpec, UnroutedTables

CONV_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("lsn", T.LongType(), True),
])

SENSOR_SCHEMA = T.StructType([
    T.StructField("site", T.StringType(), False),
    T.StructField("obs_idx", T.IntegerType(), False),
    T.StructField("temperature", T.DoubleType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("lsn", T.LongType(), True),
])

SPECS = {
    "conv": TableSpec(CONV_SCHEMA, ["conv_id", "turn_idx"], bucket_count=4),
    "sensor": TableSpec(SENSOR_SCHEMA, ["site", "obs_idx"], bucket_count=4),
}


def _mux_stream(spark, n=600, stray=False):
    """Deterministic multiplexed stream: even lsn -> conv rows, odd ->
    sensor rows; columns are the UNION of both schemas (absent side null),
    with updates and deletes mixed in."""
    df = spark.range(n).select(
        F.col("id").alias("lsn"),
        F.when(F.col("id") % 2 == 0, "conv").otherwise("sensor").alias("_table"),
        F.when(F.col("id") % 17 == 0, "D").otherwise("U").alias("op"),
        F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") * 7) % 1000).alias("ts"),
        F.concat(F.lit("c"), (F.col("id") % 23).cast("string")).alias("conv_id"),
        ((F.col("id") / 2).cast("int") % 11).alias("turn_idx"),
        F.concat(F.lit("t-"), F.col("id").cast("string")).alias("text"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("site"),
        ((F.col("id") / 2).cast("int") % 13).alias("obs_idx"),
        (F.col("id").cast("double") / 10.0).alias("temperature"),
    )
    df = df.withColumn(
        "conv_id", F.when(F.col("_table") == "conv", F.col("conv_id")))
    df = df.withColumn(
        "turn_idx", F.when(F.col("_table") == "conv", F.col("turn_idx")))
    df = df.withColumn(
        "text", F.when(F.col("_table") == "conv", F.col("text")))
    df = df.withColumn(
        "site", F.when(F.col("_table") == "sensor", F.col("site")))
    df = df.withColumn(
        "obs_idx", F.when(F.col("_table") == "sensor", F.col("obs_idx")))
    df = df.withColumn(
        "temperature", F.when(F.col("_table") == "sensor", F.col("temperature")))
    if stray:
        df = df.withColumn(
            "_table",
            F.when(F.col("lsn") % 97 == 0, "orphan_tbl").otherwise(F.col("_table")),
        )
    return df


def _single_table_final(spark, root, stream, name):
    """Ground truth: the same slice through a standalone single-table
    applier."""
    spec = SPECS[name]
    applier = CdcApplier.bootstrap_custom(
        spark, root, spec.schema, spec.merge_keys,
        bucket_count=spec.bucket_count,
    )
    cols = [f.name for f in spec.schema.fields] + ["op"]
    applier.replay(
        stream.where(F.col("_table") == name).select(*cols), chunk_size=10**9
    )
    return applier.target.read()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_router_matches_single_table_appliers(spark, tmp_path):
    stream = _mux_stream(spark)
    router = CdcRouter.bootstrap(spark, str(tmp_path / "routed"), SPECS)
    stats = router.replay(stream, chunk_size=250)
    assert set(stats) == {"conv", "sensor"}
    assert all(len(s) >= 2 for s in stats.values())  # actually chunked

    for name in SPECS:
        want = _single_table_final(
            spark, str(tmp_path / f"solo_{name}"), stream, name)
        got = router.appliers[name].target.read()
        assert _rows(got.select(*want.columns)) == _rows(want)


def test_router_slices_project_out_other_tables_columns(spark, tmp_path):
    stream = _mux_stream(spark, n=100)
    router = CdcRouter.bootstrap(spark, str(tmp_path / "routed"), SPECS)
    conv_slice = router._slice(stream, "conv")
    assert "site" not in conv_slice.columns
    assert "temperature" not in conv_slice.columns
    assert "_table" not in conv_slice.columns
    assert {"conv_id", "turn_idx", "text", "op", "lsn", "ts"} <= set(
        conv_slice.columns
    )


def test_router_per_table_offsets_resume_independently(spark, tmp_path):
    stream = _mux_stream(spark)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    router = CdcRouter.bootstrap(spark, str(tmp_path / "routed"), SPECS)

    # first window: only events with lsn <= hi//2
    router.replay(stream.where(F.col("lsn") <= hi // 2), chunk_size=10**9)
    d = router.describe()
    assert d["conv"]["committed_lsn"] <= hi // 2
    # reattach (driver restart) and replay the full stream: each table
    # resumes from ITS committed offset; re-delivered prefix is a no-op
    router2 = CdcRouter.load(spark, str(tmp_path / "routed"))
    assert set(router2.appliers) == {"conv", "sensor"}
    router2.replay(stream, chunk_size=10**9)

    for name in SPECS:
        want = _single_table_final(
            spark, str(tmp_path / f"solo_{name}"), stream, name)
        got = router2.appliers[name].target.read()
        assert _rows(got.select(*want.columns)) == _rows(want)

    # full redelivery -> every table no-ops
    stats = router2.replay(stream, chunk_size=10**9)
    assert all(all(c.skipped for c in s) for s in stats.values())


def test_router_strict_raises_on_unrouted(spark, tmp_path):
    stream = _mux_stream(spark, stray=True)
    router = CdcRouter.bootstrap(spark, str(tmp_path / "routed"), SPECS)
    with pytest.raises(UnroutedTables) as exc:
        router.replay(stream, chunk_size=10**9, strict=True)
    assert "orphan_tbl" in str(exc.value)
    # non-strict: stray rows are simply not consumed, visible via unrouted()
    n_stray = router.unrouted(stream).count()
    assert n_stray > 0


def test_router_staged_layout_prunes_partitions(spark, tmp_path):
    stream = _mux_stream(spark, stray=True)
    router = CdcRouter.bootstrap(spark, str(tmp_path / "routed"), SPECS)
    staged = router.stage(stream, str(tmp_path / "staged"))
    # unrouted audit is a directory listing, no job
    assert router.staged_tables(str(tmp_path / "staged")) == [
        "conv", "orphan_tbl", "sensor"]
    # the per-table slice over the staged layout reads ONLY its partition:
    # the table filter must land in the scan's PartitionFilters (pruned
    # before any task is scheduled), not as a post-scan Filter
    plan = router._slice(staged, "conv")._sc._jvm.PythonSQLUtils.explainString(
        router._slice(staged, "conv")._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "_table" in pf[0] and "conv" in pf[0]
    # and replay over the staged stream matches the un-staged ground truth
    router.replay(staged, chunk_size=10**9)
    want = _single_table_final(
        spark, str(tmp_path / "solo_conv"), _mux_stream(spark, stray=True), "conv")
    got = router.appliers["conv"].target.read()
    assert _rows(got.select(*want.columns)) == _rows(want)


# -------------------------------------------------------------- streaming


def test_router_streaming_matches_batch(spark, tmp_path):
    """Database-sync in streaming mode: one readStream drives both tables
    per micro-batch; final states equal the batch router's."""
    stream = _mux_stream(spark)
    src = str(tmp_path / "mux_src")
    # three lsn-ordered file segments, like a tailed binlog directory
    for lo, hi in ((0, 200), (200, 400), (400, 600)):
        (stream.where((F.col("lsn") >= lo) & (F.col("lsn") < hi))
               .coalesce(1).write.mode("append").parquet(src))

    router = CdcRouter.bootstrap(spark, str(tmp_path / "routed"), SPECS)
    mux_schema = stream.schema
    q = router.start_apply_stream(
        spark.readStream.schema(mux_schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    for name in SPECS:
        want = _single_table_final(
            spark, str(tmp_path / f"solo_{name}"), stream, name)
        got = router.appliers[name].target.read()
        assert _rows(got.select(*want.columns)) == _rows(want)
        # per-table epoch recorded in each table's own summary
        assert router.appliers[name].target.snapshot().summary.get(
            "epoch") is not None


def test_router_streaming_restart_no_duplicates(spark, tmp_path):
    stream = _mux_stream(spark, n=400)
    src = str(tmp_path / "mux_src")
    (stream.where(F.col("lsn") < 200)
           .coalesce(1).write.mode("append").parquet(src))

    router = CdcRouter.bootstrap(spark, str(tmp_path / "routed"), SPECS)
    ckpt = str(tmp_path / "ckpt")
    mux_schema = stream.schema

    def run():
        q = router.start_apply_stream(
            spark.readStream.schema(mux_schema)
            .option("maxFilesPerTrigger", 1).parquet(src),
            checkpoint_dir=ckpt,
        )
        q.processAllAvailable()
        q.stop()

    run()
    # second segment lands; restart from the same checkpoint
    (stream.where(F.col("lsn") >= 200)
           .coalesce(1).write.mode("append").parquet(src))
    run()
    # a third restart with nothing new must change no table
    heads = {n: a.target.current_snapshot_id()
             for n, a in router.appliers.items()}
    run()
    assert heads == {n: a.target.current_snapshot_id()
                     for n, a in router.appliers.items()}

    for name in SPECS:
        want = _single_table_final(
            spark, str(tmp_path / f"solo_{name}"), stream, name)
        got = router.appliers[name].target.read()
        assert _rows(got.select(*want.columns)) == _rows(want)
