"""Structured Streaming front-end for the CDC apply loop.

The reference's cron-driven incremental polls (RSS head -> delta ranges ->
fetch -> commit, ``faimms.py:232-252``) become a streaming query: a file
source tails the change-event directory, each micro-batch goes through the
SAME applier (validate -> LWW dedup -> bucket merge -> atomic snapshot) via
``foreachBatch``, and exactly-once comes from the epoch id recorded in the
snapshot summary — a redelivered micro-batch (after a streaming-checkpoint
replay) is skipped, and partially-overlapping events lose LWW against the
rows they already wrote.

Also here: the watermark + tumbling-window throughput aggregation (the
reference's monthly-pane batching, ``aims_realtime_util.py:300-350``) and a
custom stateful operator via ``applyInPandasWithState`` (running per-
conversation turn counter — the per-channel checkpoint dict of
``save_channel_info``, kept as streaming state instead of pickles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..cdc.apply import CdcApplier
from ..cdc.schemas import CHANGES_SCHEMA


def stream_changes(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 8,
    schema=None,
) -> DataFrame:
    """Tail a directory of change-event parquet files as a stream.

    ``schema`` overrides the read schema for an EVOLVED stream: a
    Structured Streaming file source fixes its schema per query run, so
    upstream schema evolution (new column, int -> long widen) is a stream
    REDEPLOY with the widened schema — the standard Debezium/Kafka
    procedure. Files written before the evolution read as null (new
    column) or upcast (widened column) under the wider schema; the sink
    side evolves the lake table via the same ``_evolve_schema`` rules as
    batch replay, and the streaming checkpoint carries across the restart
    unchanged (source offsets are file positions, not schema-bound)."""
    return (
        spark.readStream.schema(schema or CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def start_apply_stream(
    applier: CdcApplier,
    changes_stream: DataFrame,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    transform=None,
    views=None,
    audit_suite=None,
) -> StreamingQuery:
    """Run the CDC apply loop as a streaming query (foreachBatch sink).

    ``transform`` (DataFrame -> DataFrame, optional) runs on every
    micro-batch BEFORE validation/apply — the hook where the ingest-side
    layers compose (schema mapping ``cdc/mapping.py``, QC flag synthesis
    ``cdc/qc.py``), exactly where the reference applies its lookup +
    default-flag pass per fetched file (``lookup.py:147-165``,
    ``netcdf.py:71-83``). Must be a pure projection for the exactly-once
    epoch skip to stay valid (it is re-run on redelivery).

    ``views`` (optional list of IncrementalAggView over this applier's
    target) refresh after each micro-batch commit — the streaming mart:
    every reporting aggregate is at most one micro-batch behind the
    table. Crash-safe without coordination: each view's watermark is the
    source snapshot id riding its OWN atomic commit, so a crash between
    table commit and view refresh just means the next batch's refresh
    covers two changelog windows (the refresh is incremental either way).

    ``audit_suite`` (optional ContractSuite) turns every micro-batch into a
    write-audit-publish cycle: the batch is STAGED (reader-invisible), the
    suite runs over the staged state, and only a passing batch publishes —
    files + epoch offsets in one commit. A failing batch FAILS the query
    (the streaming analogue of ``replay_job --wap-audit``'s exit 3): the
    epoch never commits, so after the operator intervenes the restart
    redelivers the same micro-batch. The failed batch stays staged for
    inspection; the restart abandons and re-stages it."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        if audit_suite is None:
            applier.apply_chunk(
                batch_df, lo=-1, hi=None, batch_id=epoch_id, epoch=epoch_id
            )
        else:
            wap_id = f"epoch-{epoch_id}"
            if wap_id in applier.target.list_staged():
                # redelivery after a crash (or audit failure) mid-cycle:
                # drop the old stage and rebuild from the redelivered batch
                applier.target.abandon_staged(wap_id)
            info = applier.stage_chunk(
                batch_df, wap_id, batch_id=epoch_id, epoch=epoch_id
            )
            if not info.get("skipped"):
                passed, report = applier.audit_staged(wap_id, suite=audit_suite)
                if not passed:
                    bad = [
                        r["check_name"]
                        for r in (x.asDict() for x in report.collect())
                        if r["n_violations"] > 0
                    ]
                    raise RuntimeError(
                        f"micro-batch {epoch_id} failed audit {bad}; "
                        f"kept staged as {wap_id!r} for inspection"
                    )
                applier.publish_chunk(wap_id)
        # bound MOR delta layering across a long-running stream
        applier.maybe_compact()
        for v in views or []:
            v.refresh()

    writer = (
        changes_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def windowed_event_rates(
    changes_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window event rates per op with late-data watermark —
    streaming pane analogue of the reference's month-aligned batch windows
    (late data re-opens the pane; the reference overwrites the month file)."""
    return (
        changes_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "op")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
        )
    )


def dedup_redelivered(
    changes_stream: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop redelivered change events (same ``lsn``) inside the watermark
    horizon via ``dropDuplicatesWithinWatermark`` — streaming state holds
    one entry per lsn only until the watermark passes it, so state is
    bounded by the horizon, not the stream length. Downstream LWW apply is
    already idempotent to redelivery; this operator removes the duplicate
    *work* before the shuffle (the reference's md5-filename skip,
    ``faimms.py:114-120``, as bounded streaming state)."""
    return changes_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["lsn"]
    )


TURN_STATE_SCHEMA = "n_turns long, max_turn_idx int, last_lsn long"
TURN_OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn_idx int, last_lsn long, batch_events long"
)


def conversation_turn_tracker(changes_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-conversation running turn statistics via
    applyInPandasWithState (arbitrary state, processing-time semantics)."""
    import pandas as pd

    def track(key, pdfs, state: GroupState):
        (conv_id,) = key
        n_turns, max_turn, last_lsn = (
            state.get if state.exists else (0, -1, -1)
        )
        batch_events = 0
        for pdf in pdfs:
            batch_events += len(pdf)
            if len(pdf):
                max_turn = max(max_turn, int(pdf["turn_idx"].max()))
                last_lsn = max(last_lsn, int(pdf["lsn"].max()))
                n_turns += len(pdf)
        state.update((n_turns, max_turn, last_lsn))
        yield pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "n_turns": n_turns,
                    "max_turn_idx": max_turn,
                    "last_lsn": last_lsn,
                    "batch_events": batch_events,
                }
            ]
        )

    return changes_stream.groupBy("conv_id").applyInPandasWithState(
        track,
        outputStructType=TURN_OUTPUT_SCHEMA,
        stateStructType=TURN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
