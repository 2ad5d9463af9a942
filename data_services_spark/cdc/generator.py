"""Deterministic synthetic change-stream generator.

Everything is derived from ``spark.range(n)`` with pure JVM-side column
expressions (``xxhash64`` as the PRNG) — no driver-side data, no per-row
Python — so the same code that makes 500 test events makes 10^10 bench
events as a streaming scan that never materializes on the driver.

The stream deliberately contains every hazard FIXTURES.md F2 lists:
out-of-order events (ts jitter vs lsn order), duplicate deliveries (a
sampled subset re-emitted verbatim), multiple updates to one key within a
chunk, deletes followed by re-inserts, hot-key bursts (a configurable
fraction of all events landing on a few conv_ids — the skew test), and an
invalid-row trickle for the quarantine path (reference validation ladder:
``FAIMMS/REALTIME/faimms.py:149-217``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import EVOLUTION_COLS, ROLES

_WORDS = (
    "the quick brown fox jumps over the lazy dog while a stream of change "
    "events flows through salted partitions into bucketed snapshots and the "
    "merge applies last writer wins ordering by event time then log sequence "
    "number keeping every conversation turn exactly once in the lake table "
)
_CORPUS = _WORDS * 40  # ~10 KB of deterministic filler


def _h(salt: str, seed: int) -> F.Column:
    """Deterministic per-row hash stream: xxhash64(lsn, seed, salt) >= 0."""
    return F.abs(F.xxhash64(F.col("lsn"), F.lit(seed), F.lit(salt)))


def generate_changes(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 1000,
    max_turns: int = 50,
    n_hot: int = 1,
    hot_pct: int = 20,
    delete_pct: int = 5,
    dup_one_in: int = 20,
    invalid_one_in: int = 0,
    patch_pct: int = 0,
    seed: int = 42,
    with_evolution: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Build the change stream. ``lsn`` is the unique total order 0..n-1
    (duplicate deliveries re-use their original lsn, as a real redelivered
    binlog record would)."""
    base = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    df = base.withColumnRenamed("id", "lsn")

    is_hot = (_h("hot", seed) % 100) < hot_pct
    conv_num = F.when(is_hot, _h("hotconv", seed) % n_hot).otherwise(
        _h("conv", seed) % n_convs
    )
    turn_idx = (_h("turn", seed) % max_turns).cast("int")
    op_roll = _h("op", seed) % 100
    op = (
        F.when(op_roll < delete_pct, F.lit("D"))
        .when(op_roll < 50 + delete_pct, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    if patch_pct:
        # patch_pct% of the NON-delete events become sparse updates (op
        # 'P'): each writes a pseudo-random non-empty column subset (the
        # masked columns go NULL = not written — a patch cannot write NULL)
        op = F.when(
            (op != "D") & ((_h("patch", seed) % 100) < patch_pct), F.lit("P")
        ).otherwise(op)
    # event time: base + lsn seconds, jittered +/- up to 120s so ts order
    # disagrees with lsn order (the out-of-order ingredient); LWW must
    # therefore sort by (ts, lsn), not arrival order.
    jitter = (_h("jit", seed) % 241).cast("long") - 120
    ts = F.to_timestamp(F.lit("2025-01-01 00:00:00")) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), (F.col("lsn") + jitter).cast("double")
    )
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (_h("role", seed) % len(ROLES) + 1).cast("int")
    )
    tool = F.when(role == "tool", F.format_string("tool_%02d", (_h("tool", seed) % 10).cast("int")))
    text_len = (_h("len", seed) % 800 + 16).cast("int")

    df = (
        df.withColumn("conv_id", F.format_string("conv_%06d", conv_num.cast("int")))
        .withColumn("turn_idx", turn_idx)
        .withColumn("op", op)
        .withColumn("ts", ts)
        .withColumn("role", role)
        .withColumn("tool", tool)
        .withColumn("_tlen", text_len)
    )
    df = df.withColumn(
        "text",
        F.when(
            F.col("op") == "D", F.lit(None).cast("string")
        ).otherwise(
            F.concat(
                F.format_string("c=%s t=%d v=%d | ", F.col("conv_id"), F.col("turn_idx"), F.col("lsn")),
                F.expr(f"substring('{_CORPUS}', 1, _tlen)"),
            )
        ),
    ).drop("_tlen")
    # deletes carry no payload
    for c in ("role", "tool"):
        df = df.withColumn(c, F.when(F.col("op") == "D", F.lit(None)).otherwise(F.col(c)))
    if patch_pct:
        # per-patch written-column mask, never empty (mask % 7 + 1 over
        # bits role/text/tool)
        mask = (_h("pmask", seed) % 7 + 1).cast("int")
        for bit, c in ((1, "role"), (2, "text"), (4, "tool")):
            df = df.withColumn(
                c,
                F.when(
                    (F.col("op") == "P") & (F.pmod(F.floor(mask / bit), 2) == 0),
                    F.lit(None).cast("string"),
                ).otherwise(F.col(c)),
            )

    if invalid_one_in:
        # a trickle of rows violating the validation gates -> quarantine path
        bad_roll = _h("bad", seed) % invalid_one_in
        kind = _h("badkind", seed) % 3
        df = (
            df.withColumn(
                "conv_id",
                F.when((bad_roll == 0) & (kind == 0), F.lit(None)).otherwise(F.col("conv_id")),
            )
            .withColumn(
                "turn_idx",
                F.when((bad_roll == 0) & (kind == 1), F.lit(-1)).otherwise(F.col("turn_idx")),
            )
            .withColumn(
                "role",
                F.when((bad_roll == 0) & (kind == 2), F.lit("robot")).otherwise(F.col("role")),
            )
        )

    if with_evolution:
        df = df.withColumn(
            "tool_call_id",
            F.when(
                F.col("tool").isNotNull(),
                F.format_string("call_%012d", F.col("lsn")),
            ),
        ).withColumn(
            "metadata_json",
            F.when(
                F.col("op") != "D",
                F.format_string('{"gen":%d,"turn":%d}', _h("meta", seed) % 7, F.col("turn_idx")),
            ),
        )

    cols = ["lsn", "op", "ts", "conv_id", "turn_idx", "role", "text", "tool"]
    if with_evolution:
        cols += EVOLUTION_COLS
    df = df.select(*cols)

    if dup_one_in:
        dupes = df.where(_h("dup", seed) % dup_one_in == 0)  # verbatim redelivery
        df = df.unionByName(dupes)
    return df


def strip_evolution(df: DataFrame) -> DataFrame:
    """Project away the additive columns — models the pre-evolution segment
    of the stream (events before L_evolve simply do not have them)."""
    keep = [c for c in df.columns if c not in EVOLUTION_COLS]
    return df.select(*keep)
