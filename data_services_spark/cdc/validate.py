"""Validation gates with a quarantine branch.

Re-expression of the reference's per-file validation ladder
(``FAIMMS/REALTIME/faimms.py:149-217``: no-data / empty-time / all-fill /
unknown-site / non-monotonic / checker / filename-regex, each failure
quarantining the unit to ``wip/errors`` for redownload, ``faimms.py:199-207``)
as a single declarative pass: every gate is a boolean column expression, the
first failing gate names the ``reason``, failing rows split into a
quarantine DataFrame instead of poisoning the batch. One scan, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import MAX_TEXT_CHARS, OPS, ROLES


def validation_reason(df: DataFrame) -> F.Column:
    """NULL when the event is valid, else the first failing gate's name."""
    gates = [
        ("null_lsn", F.col("lsn").isNull()),
        ("bad_op", ~F.col("op").isin(OPS)),
        ("null_ts", F.col("ts").isNull()),
        ("null_conv_id", F.col("conv_id").isNull()),
        ("null_turn_idx", F.col("turn_idx").isNull()),
        ("negative_turn_idx", F.col("turn_idx") < 0),
        # deletes legitimately carry no payload; payload gates apply to I/U
        ("bad_role", (F.col("op") != "D") & ~F.coalesce(F.col("role"), F.lit("")).isin(ROLES)),
        ("oversize_text", F.coalesce(F.length("text"), F.lit(0)) > MAX_TEXT_CHARS),
    ]
    expr = F.lit(None).cast("string")
    for name, cond in reversed(gates):
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Return (valid, quarantine); quarantine = input columns + ``reason``."""
    tagged = df.withColumn("reason", validation_reason(df))
    valid = tagged.where(F.col("reason").isNull()).drop("reason")
    quarantined = tagged.where(F.col("reason").isNotNull())
    return valid, quarantined


def monotonicity_violations(transcripts: DataFrame) -> DataFrame:
    """Constraint check (not a row filter): within each conversation, ts must
    be non-decreasing in turn order — the reference's strict-TIME invariant
    (``lib/python/aims_realtime_util.py:611-622``). Returns the violating
    adjacent pairs for reporting."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.withColumn("_prev_ts", F.lag("ts").over(w))
        .where(F.col("_prev_ts").isNotNull() & (F.col("ts") < F.col("_prev_ts")))
        .select("conv_id", "turn_idx", "ts", F.col("_prev_ts").alias("prev_ts"))
    )


def generic_validation_reason(
    df: DataFrame, keys: list[str], patch_ops: bool = False
) -> F.Column:
    """Schema-agnostic gate ladder for custom-keyed pipelines (the
    transcripts ladder above stays the tuned default): envelope sanity
    (lsn/op/ts) + non-null merge keys. ``patch_ops`` additionally admits
    'P' (partial-update tables)."""
    gates = [
        ("null_lsn", F.col("lsn").isNull()),
        ("bad_op", ~F.col("op").isin(OPS + ["P"] if patch_ops else OPS)),
        ("null_ts", F.col("ts").isNull()),
    ] + [(f"null_{k}", F.col(k).isNull()) for k in keys]
    expr = F.lit(None).cast("string")
    for name, cond in reversed(gates):
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr


def aggregation_validation_reason(df: DataFrame, keys: list[str]) -> F.Column:
    """Gate ladder for aggregation-merge tables: the generic envelope +
    key gates, plus DELETE REJECTION — an aggregate cannot retract a
    contribution exactly under out-of-order redelivery (Paimon's
    aggregation merge-engine likewise refuses DELETE rows), so op='D'
    events quarantine with an explicit reason instead of silently
    corrupting totals. Requeue after migrating the stream, or model
    removal as a counter column (e.g. sum of -1 tombstone credits)."""
    gates = [
        ("null_lsn", F.col("lsn").isNull()),
        ("bad_op", ~F.col("op").isin(OPS)),
        ("delete_unsupported_aggregation", F.col("op") == "D"),
        ("null_ts", F.col("ts").isNull()),
    ] + [(f"null_{k}", F.col(k).isNull()) for k in keys]
    expr = F.lit(None).cast("string")
    for name, cond in reversed(gates):
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr


def first_row_validation_reason(df: DataFrame, keys: list[str]) -> F.Column:
    """Gate ladder for first_row-merge tables: the generic envelope + key
    gates, plus DELETE REJECTION — under first-writer-wins an op='D' could
    never displace the earlier winner (min over the order), so accepting
    deletes would silently drop them; they quarantine with an explicit
    reason instead (Paimon's first-row merge engine likewise accepts only
    inserts)."""
    gates = [
        ("null_lsn", F.col("lsn").isNull()),
        ("bad_op", ~F.col("op").isin(OPS)),
        ("delete_unsupported_first_row", F.col("op") == "D"),
        ("null_ts", F.col("ts").isNull()),
    ] + [(f"null_{k}", F.col(k).isNull()) for k in keys]
    expr = F.lit(None).cast("string")
    for name, cond in reversed(gates):
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr


def patch_validation_reason(df: DataFrame) -> F.Column:
    """The transcripts ladder for partial-update streams: 'P' is a legal
    op, and the payload gates that assume a full row apply only to full
    writes — a patch legitimately carries NULL for every column it does
    not touch (a patch cannot write NULL by definition)."""
    full = F.col("op").isin("I", "U")
    gates = [
        ("null_lsn", F.col("lsn").isNull()),
        ("bad_op", ~F.col("op").isin(OPS + ["P"])),
        ("null_ts", F.col("ts").isNull()),
        ("null_conv_id", F.col("conv_id").isNull()),
        ("null_turn_idx", F.col("turn_idx").isNull()),
        ("negative_turn_idx", F.col("turn_idx") < 0),
        ("bad_role", full & ~F.coalesce(F.col("role"), F.lit("")).isin(ROLES)),
        # a PATCHED role must still be a legal role
        ("bad_role", (F.col("op") == "P") & F.col("role").isNotNull()
         & ~F.col("role").isin(ROLES)),
        ("oversize_text", F.coalesce(F.length("text"), F.lit(0)) > MAX_TEXT_CHARS),
    ]
    expr = F.lit(None).cast("string")
    for name, cond in reversed(gates):
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr
