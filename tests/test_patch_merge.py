"""Partial-update (patch) merge — Paimon partial-update / Debezium sparse
update semantics: U writes every column (NULL = explicit reset), P writes
only its non-null columns and never creates, D deletes and drops later
patches until the next U."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import types as T

from data_services_spark.cdc.dedup import partial_update_merge

EPOCH = dt.datetime(2024, 1, 1)

SCHEMA = T.StructType([
    T.StructField("lsn", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("conv_id", T.StringType(), True),
    T.StructField("turn_idx", T.IntegerType(), True),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
])


def _merge(spark, rows):
    df = spark.createDataFrame(
        [(lsn, op, EPOCH + dt.timedelta(minutes=m), cid, ti, role, text)
         for (lsn, op, m, cid, ti, role, text) in rows],
        SCHEMA,
    )
    return {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in partial_update_merge(df, keys=["conv_id", "turn_idx"]).collect()
    }


def test_patch_updates_only_written_columns(spark):
    out = _merge(spark, [
        (0, "U", 0, "a", 0, "user", "t1"),
        (1, "P", 5, "a", 0, None, "t2"),     # writes text only
        (2, "P", 9, "a", 0, "assistant", None),  # writes role only
    ])
    row = out[("a", 0)]
    assert row["role"] == "assistant" and row["text"] == "t2"
    # the row's identity (order stamp) is its last FULL write
    assert row["lsn"] == 0 and row["ts"] == EPOCH


def test_full_upsert_resets_explicit_null(spark):
    out = _merge(spark, [
        (0, "U", 0, "a", 0, "user", "t1"),
        (1, "P", 5, "a", 0, None, "patched"),
        (2, "U", 9, "a", 0, "user", None),   # U's NULL text is a RESET
    ])
    row = out[("a", 0)]
    assert row["text"] is None and row["role"] == "user"


def test_patch_never_creates_and_delete_drops_patches(spark):
    out = _merge(spark, [
        (0, "P", 0, "ghost", 0, "user", "t"),          # no U ever -> absent
        (1, "U", 0, "b", 0, "user", "t1"),
        (2, "D", 5, "b", 0, None, None),
        (3, "P", 9, "b", 0, "assistant", "late"),       # patch after D: dropped
        (4, "U", 1, "c", 0, "user", "c1"),
        (5, "P", 2, "c", 0, None, "c-patch"),
        (6, "D", 5, "c", 0, None, None),
        (7, "U", 9, "c", 0, "system", None),             # recreate AFTER patches
    ])
    assert ("ghost", 0) not in out
    assert ("b", 0) not in out
    row = out[("c", 0)]
    # the pre-delete patch must not leak into the recreated row
    assert row["role"] == "system" and row["text"] is None
    assert row["lsn"] == 7


def test_out_of_order_delivery_invariant(spark):
    rows = [
        (0, "U", 0, "a", 0, "user", "t1"),
        (1, "P", 5, "a", 0, None, "t2"),
        (2, "U", 9, "a", 0, "sys", "t3"),
        (3, "P", 12, "a", 0, "asst", None),
        (4, "D", 2, "b", 0, None, None),
        (5, "U", 4, "b", 0, "user", "b1"),
        (6, "P", 6, "b", 0, None, "b2"),
    ]
    want = _merge(spark, rows)
    rng = random.Random(7)
    for _ in range(3):
        rng.shuffle(rows)
        assert _merge(spark, rows) == want
    assert want[("a", 0)]["text"] == "t3" and want[("a", 0)]["role"] == "asst"
    assert want[("b", 0)]["text"] == "b2"


def test_all_null_patch_is_a_noop(spark):
    out = _merge(spark, [
        (0, "U", 0, "a", 0, "user", "t1"),
        (1, "P", 5, "a", 0, None, None),
    ])
    row = out[("a", 0)]
    assert row["role"] == "user" and row["text"] == "t1"
    assert row["lsn"] == 0  # stamp stays at the full write


def test_stale_patch_loses_to_newer_full_write(spark):
    # event-time order, not arrival: a patch OLDER than the latest U is
    # discarded by the r0 horizon even though its lsn is higher
    out = _merge(spark, [
        (0, "U", 10, "a", 0, "user", "fresh"),
        (9, "P", 5, "a", 0, "asst", "stale"),
    ])
    row = out[("a", 0)]
    assert row["role"] == "user" and row["text"] == "fresh"
