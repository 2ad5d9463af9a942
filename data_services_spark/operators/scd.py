"""Slowly-changing-dimension Type-2 history — version chains per key.

Two tiers, matching the engine's batch/incremental split everywhere else:

* :func:`scd2_history` — the BATCH operator: one pass over a raw change
  stream produces the full event-time version history per key (every
  update opens a version, the next event closes it, deletes close without
  opening). One shuffle on the keys; the chain is a single window ``lead``
  — no self-join, no driver state, so the plan survives any key count.

* :class:`Scd2History` — the INCREMENTAL maintainer: a history table over
  a live :class:`LakeTable`, advanced per refresh from
  ``changes_between(with_before=True)``. The before-image carries the
  closing row's entire content (``_prev_*`` payload + ``_prev_ts`` =
  the open version's ``valid_from``), so a refresh is a pure column map
  over the changelog plus ONE merge-on-read delta append — zero reads of
  the history table, zero joins, O(net-changed keys) bytes per refresh.
  This is the warehouse SCD2-from-CDC recipe (Debezium -> dim tables;
  Iceberg changelog consumers) expressed against the lake's own changelog.

Semantics note (state-history vs event-history): the incremental tier
tracks the history of the source TABLE'S COMMITTED STATES — an
out-of-order event that loses the upstream LWW race produces no state
change, hence no version (exactly Delta CDF -> SCD2 behaviour). The batch
tier over the raw stream is the event-time history: every delivered
change is a version boundary. Both are deterministic; pick by input.

Reference analogue: the harvest pipelines keep only latest state and
re-download history on demand (wip/errors loop, ``faimms.py:15-18``);
a 100-TB lake cannot — the dimension history must be maintained forward.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lake.table import LakeTable


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    order: list[str] = ("ts", "lsn"),
    op_col: str = "op",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time SCD2 over a raw change stream (batch tier).

    Every non-delete event opens a version valid from its ``ts_col``;
    the key's NEXT event (any op) closes it. Output columns: the input's
    (minus ``op``, with ``ts_col`` renamed ``valid_from``) plus
    ``valid_to`` (next event's ts, NULL while open), ``end_reason``
    (``'update'`` / ``'delete'`` / NULL while open) and ``is_current``.

    Input must be delivery-deduped (the replay path's per-chunk
    ``dropDuplicates`` on lsn); a re-delivered identical event would
    manufacture a zero-length version. One shuffle (hash on ``keys``);
    the two ``lead`` calls share a single window sort.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    nxt_ts = F.lead(ts_col).over(w)
    nxt_op = F.lead(op_col).over(w)
    out = (
        changes
        .withColumn("valid_to", nxt_ts)
        .withColumn(
            "end_reason",
            F.when(nxt_op.isNull(), F.lit(None).cast("string"))
            .when(nxt_op == "D", "delete")
            .otherwise("update"),
        )
        .where(F.col(op_col) != "D")
        .withColumn("is_current", F.col("end_reason").isNull())
        .withColumnRenamed(ts_col, "valid_from")
        .drop(op_col)
    )
    return out


class Scd2History:
    """Incremental SCD2 history table over a source :class:`LakeTable`.

    The history table's merge keys are ``source keys + valid_from`` (each
    version is its own row identity), bucketed by the source keys alone so
    a conversation's full history is a bucket-pruned point read. Rows:

    * open version  — ``valid_to`` NULL, ``end_reason`` NULL,
      ``is_current`` true;
    * closed by update — ``valid_to`` = successor's ``valid_from``,
      ``end_reason='update'``;
    * closed by delete — ``end_reason='delete'``; ``valid_to`` stays NULL
      because a table-state diff carries no event time for the delete
      itself (the key is simply absent from the next state) — the honest
      stamp is "ended, end time unknown at table granularity".

    Ordering/idempotence: every row is ordered by ``upd_lsn`` (the
    changelog's transport LSN, dense from the source's committed
    watermark — strictly increasing across refreshes), so a closing row
    deterministically supersedes the open row it replaces and a crashed
    refresh re-run converges. A same-timestamp succession
    (``_prev_ts == ts``: new winner, identical event time) would collide
    with its own closing row on the merge key, so the zero-duration
    version is dropped — the new open row overwrites in place.
    """

    def __init__(self, spark: SparkSession, table: LakeTable, source: LakeTable):
        self.spark = spark
        self.table = table
        self.source = source
        props = table.snapshot().props
        self.keys: list[str] = list(props["scd_keys"])
        self.payload: list[str] = list(props["scd_payload"])

    # ------------------------------------------------------------- bootstrap
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        source: LakeTable,
        bucket_count: int = 8,
    ) -> "Scd2History":
        """Create an EMPTY history positioned at source snapshot 0 — the
        first ``refresh()`` is an incremental step from empty (initial
        load and steady state are one code path, as in IncrementalAggView)."""
        ssnap = source.snapshot()
        if not any(f.name == "ts" for f in ssnap.schema.fields):
            raise ValueError(
                f"source {source.path} has no 'ts' column: SCD2 intervals "
                "are stamped from the source's event-time column"
            )
        keys = list(ssnap.props.get("merge_keys", ssnap.bucket_keys))
        src_types = {f.name: f.dataType for f in ssnap.schema.fields}
        payload = [
            f.name for f in ssnap.schema.fields
            if f.name not in keys and f.name not in ("ts", "lsn", "op", "_wr")
        ]
        fields = [T.StructField(k, src_types[k], True) for k in keys]
        fields += [T.StructField(c, src_types[c], True) for c in payload]
        fields += [
            T.StructField("valid_from", src_types["ts"], True),
            T.StructField("valid_to", src_types["ts"], True),
            T.StructField("end_reason", T.StringType(), True),
            T.StructField("is_current", T.BooleanType(), True),
            T.StructField("upd_lsn", T.LongType(), True),
        ]
        table = LakeTable.create(
            spark, path, T.StructType(fields), list(keys), bucket_count,
            summary={"source_snapshot": 0},
            props={
                "merge_keys": keys + ["valid_from"],
                "order_cols": ["upd_lsn"],
                "scd_keys": keys,
                "scd_payload": payload,
                "scd_source": source.path,
            },
        )
        return cls(spark, table, source)

    @classmethod
    def load(cls, spark: SparkSession, path: str, source: LakeTable) -> "Scd2History":
        import os

        hist = cls(spark, LakeTable(spark, path), source)
        bound = hist.table.snapshot().props.get("scd_source")
        if bound and os.path.abspath(bound) != os.path.abspath(source.path):
            raise ValueError(
                f"history {path} was created over source {bound}, not "
                f"{source.path}: refreshing against a different table would "
                "interleave a foreign changelog into these version chains"
            )
        return hist

    # --------------------------------------------------------------- refresh
    def last_source_snapshot(self) -> int:
        return int(self.table.snapshot().summary.get("source_snapshot", 0))

    def refresh(self) -> dict[str, Any]:
        """Advance the history to the source's current snapshot. No-op
        (zero commits) when the source has not moved."""
        frm = self.last_source_snapshot()
        to = self.source.current_snapshot_id()
        if to == frm:
            return {"refreshed": False, "source_snapshot": frm}
        ch = self.source.changes_between(frm, to, with_before=True)
        k, p = self.keys, self.payload
        null_ts = F.lit(None).cast("timestamp")
        null_s = F.lit(None).cast("string")
        # open versions: the AFTER image of every row that exists afterwards
        opens = ch.where(F.col("op").isin("I", "U")).select(
            *k, *p,
            F.col("ts").alias("valid_from"),
            null_ts.alias("valid_to"),
            null_s.alias("end_reason"),
            F.lit(True).alias("is_current"),
            F.col("lsn").alias("upd_lsn"),
        )
        # closed versions: the BEFORE image, interval ended. A U closing at
        # the SAME event time as its successor would collide with the new
        # open row on (keys, valid_from) — drop the zero-duration version.
        closed_u = ch.where(
            (F.col("op") == "U") & (F.col("_prev_ts") != F.col("ts"))
        ).select(
            *k, *[F.col(f"_prev_{c}").alias(c) for c in p],
            F.col("_prev_ts").alias("valid_from"),
            F.col("ts").alias("valid_to"),
            F.lit("update").alias("end_reason"),
            F.lit(False).alias("is_current"),
            F.col("lsn").alias("upd_lsn"),
        )
        closed_d = ch.where(F.col("op") == "D").select(
            *k, *[F.col(f"_prev_{c}").alias(c) for c in p],
            F.col("_prev_ts").alias("valid_from"),
            null_ts.alias("valid_to"),
            F.lit("delete").alias("end_reason"),
            F.lit(False).alias("is_current"),
            F.col("lsn").alias("upd_lsn"),
        )
        delta = (
            opens.unionByName(closed_u).unionByName(closed_d)
            .withColumn("op", F.lit("U"))
        )
        delta = delta.localCheckpoint(eager=True)  # O(net-changed keys)
        n = delta.count()
        if n == 0:
            snap = self.table.commit_summary({"source_snapshot": to})
            return {"refreshed": True, "versions_written": 0,
                    "source_snapshot": to, "history_snapshot": snap.snapshot_id}
        self.table.append_delta(
            delta, summary={"source_snapshot": to},
            sort_cols=self.keys + ["valid_from"],
        )
        return {"refreshed": True, "versions_written": int(n),
                "source_snapshot": to,
                "history_snapshot": self.table.current_snapshot_id()}

    # ------------------------------------------------------------------ read
    def read(self, current_only: bool = False) -> DataFrame:
        df = self.table.read().drop("upd_lsn")
        return df.where(F.col("is_current")) if current_only else df
