"""Canonical schemas for the CDC engine (BASELINE.json input_hint shape).

Target table ``transcripts``: multi-turn conversation transcripts keyed by
``(conv_id, turn_idx)``. The target additionally stores ``lsn`` — the LSN of
the event that last wrote each row — which makes every upsert idempotent
under replay (a re-delivered event can never beat the row it already wrote;
cf. the reference's md5-suffixed filenames making re-delivery a no-op,
``FAIMMS/REALTIME/faimms.py:114-120``).

Change stream ``changes``: binlog/WAL-tail shape ``(lsn, op, ts, key...,
payload...)``; the reference's purest analogue is rsync itemized change
capture (``ARGO/rsync.sh:14-43``).
"""

from __future__ import annotations

from pyspark.sql import types as T

KEY_COLS = ["conv_id", "turn_idx"]
ORDER_COLS = ["ts", "lsn"]  # LWW ordering: event-time, LSN total-order tiebreak
ROLES = ["user", "assistant", "system", "tool"]
OPS = ["I", "U", "D"]
MAX_TEXT_CHARS = 32_768

TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("lsn", T.LongType(), True),
]
TRANSCRIPTS_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

CHANGES_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
    ]
)

# additive-evolution columns appearing mid-stream (FIXTURES.md F3)
EVOLUTION_COLS = ["tool_call_id", "metadata_json"]

# batch-level operational counters (one row per applied chunk/epoch),
# populated from the apply job's Observation — no extra scans
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("epoch", T.LongType(), True),
        T.StructField("hi_lsn", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("n_upserts", T.LongType(), True),
        T.StructField("n_deletes", T.LongType(), True),
        T.StructField("n_quarantined", T.LongType(), True),
        T.StructField("n_winner_rows", T.LongType(), True),
        T.StructField("n_affected_buckets", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("source_partition", T.IntegerType(), False),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("n_upserts", T.LongType(), True),
        T.StructField("n_deletes", T.LongType(), True),
        T.StructField("n_quarantined", T.LongType(), True),
        T.StructField("min_lsn", T.LongType(), True),
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("min_ts", T.TimestampType(), True),
        T.StructField("max_ts", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
