"""Reporting views over the engine's lineage table.

The reference's reporting stack is a PostgreSQL view cascade over harvested
file metadata: row-level view -> GROUP BY deployments view (conditional
aggs, min/max extents) -> CTE re-aggregation with derived percent ->
HAVING reports (``ANMN/data_report/views/report_db.anmn_*.sql``,
``reports/*.sql``). The engine reproduces the same shapes over its own
per-(batch, partition) lineage rows — operational observability as SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def batches_view(lineage: DataFrame) -> DataFrame:
    """Per-batch rollup (deployments_view shape: multi-key GROUP BY +
    conditional agg + min/max extents; report_db.anmn_deployments_view.sql:6-33)."""
    return (
        lineage.groupBy("batch_id")
        .agg(
            F.countDistinct("source_partition").alias("n_partitions"),
            F.sum("n_events").alias("n_events"),
            F.sum("n_upserts").alias("n_upserts"),
            F.sum("n_deletes").alias("n_deletes"),
            F.sum("n_quarantined").alias("n_quarantined"),
            F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("n_failed_partitions"),
            F.min("min_lsn").alias("min_lsn"),
            F.max("max_lsn").alias("max_lsn"),
            F.min("min_ts").alias("min_ts"),
            F.max("max_ts").alias("max_ts"),
            F.max("duration_ms").alias("duration_ms"),
        )
    )


def partition_health_view(lineage: DataFrame) -> DataFrame:
    """Re-aggregation with derived percent (datastreams_view shape:
    agg-of-agg + percent_coverage; report_db.anmn_datastreams_view.sql:6-33)."""
    per = lineage.groupBy("source_partition", "batch_id").agg(
        F.sum("n_events").alias("ev"),
        F.sum("n_quarantined").alias("quar"),
        F.max("max_lsn").alias("hi"),
    )
    return (
        per.groupBy("source_partition")
        .agg(
            F.count("*").alias("n_batches"),
            F.sum("ev").alias("total_events"),
            F.round(F.avg("ev"), 2).alias("avg_events_per_batch"),
            F.max("hi").alias("watermark_lsn"),
            F.round(
                100.0 * F.sum(F.when(F.col("quar") > 0, 1).otherwise(0)) / F.count("*"), 2
            ).alias("pct_batches_with_quarantine"),
        )
    )


def stale_partitions_report(lineage: DataFrame, lag_threshold: int) -> DataFrame:
    """HAVING report (platforms_with_no_new_data shape,
    reports/anmn_platforms_with_no_new_data.sql:3-8): partitions whose
    watermark trails the global high-water by more than ``lag_threshold``."""
    global_hi = lineage.agg(F.max("max_lsn")).collect()[0][0]
    return (
        lineage.groupBy("source_partition")
        .agg(F.max("max_lsn").alias("watermark_lsn"))
        .where(F.lit(global_hi) - F.col("watermark_lsn") > lag_threshold)
        .withColumn("lag", F.lit(global_hi) - F.col("watermark_lsn"))
    )


def quarantine_summary(quarantine: DataFrame) -> DataFrame:
    """bool_or-flag rollup (deployments_with_new_data shape,
    reports/anmn_deployments_with_new_data.sql:1-8)."""
    return (
        quarantine.groupBy("reason")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("batch_id").alias("n_batches"),
            F.bool_or(F.col("op") == "D").alias("any_delete"),
            F.min("lsn").alias("first_lsn"),
            F.max("lsn").alias("last_lsn"),
        )
    )


def throughput_view(metrics: DataFrame) -> DataFrame:
    """AVG + derived-rate rollup over the batch-level metrics table (mean
    processing-time shape, reports/anmn_all_deployments_with_data.sql:1-9):
    per-batch events/sec plus running totals."""
    return metrics.select(
        "batch_id",
        "epoch",
        "n_events",
        "n_winner_rows",
        "n_affected_buckets",
        "duration_ms",
        F.round(
            F.col("n_events") * 1000.0 / F.greatest("duration_ms", F.lit(1)), 1
        ).alias("events_per_sec"),
        F.round(
            100.0 * F.col("n_winner_rows") / F.greatest("n_events", F.lit(1)), 2
        ).alias("pct_effective"),
    )


def register_report_views(
    spark: SparkSession,
    lineage: DataFrame,
    quarantine: DataFrame,
    metrics: DataFrame | None = None,
) -> None:
    """Expose the cascade as Spark SQL views (CREATE VIEW analogue)."""
    lineage.createOrReplaceTempView("cdc_lineage")
    quarantine.createOrReplaceTempView("cdc_quarantine")
    batches_view(lineage).createOrReplaceTempView("cdc_batches")
    partition_health_view(lineage).createOrReplaceTempView("cdc_partition_health")
    quarantine_summary(quarantine).createOrReplaceTempView("cdc_quarantine_summary")
    if metrics is not None:
        metrics.createOrReplaceTempView("cdc_metrics")
        throughput_view(metrics).createOrReplaceTempView("cdc_throughput")
