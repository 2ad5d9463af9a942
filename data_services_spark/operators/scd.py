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


def temporal_enrich(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    fact_ts: str = "ts",
    payload: list[str] | None = None,
    prefix: str = "dim_",
    version_order: list[str] | None = None,
) -> DataFrame:
    """Event-time temporal join: each fact row picks up the dim version
    valid at its timestamp (``valid_from <= fact.ts < valid_to``; open
    versions have ``valid_to`` NULL; facts before the key's first version
    come back with NULL dim columns — LEFT JOIN semantics).

    The plan is the scale-safe union + forward-fill shape, NOT a range
    join: dim versions become (open, clear) marker rows, union with the
    facts on the key, ONE window sort per key carries the latest marker
    forward. One shuffle + one sort, linear in |facts| + |versions| —
    a key with thousands of versions and millions of facts never forms
    the per-key cross product a key-equality range join filters after
    pairing. This is Flink's event-time temporal table join
    (FLIP-132 semantics) as a batch plan.

    Tie rules, encoded in the sort ``(event_ts, tag, version_order)``:
    clear markers (tag 0) < open markers (tag 1) < facts (tag 2), so a
    fact AT ``valid_from`` sees the NEW version, a fact AT ``valid_to``
    of an ended chain sees nothing, and an interior boundary (close +
    successor open at the same instant) resolves to the successor.
    ``version_order`` (default: ``['lsn']`` when the history carries it)
    breaks same-instant version races by the dim's own order.

    ``history`` is :func:`scd2_history` / :class:`Scd2History` output
    (``valid_from`` / ``valid_to`` columns); ``payload`` defaults to its
    remaining data columns.
    """
    # Zero-length versions (closed by a same-instant successor or delete:
    # valid_to == valid_from) cover no instant, so they must not emit
    # markers — their open would otherwise outlive the boundary clear in
    # the same-instant sort and enrich facts with a state that never
    # existed. Dropping them is also the same-instant collapse: at most
    # one version per (key, instant) survives, which is what makes the
    # marker sort total.
    history = history.where(
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from"))
    )
    meta = {"valid_from", "valid_to", "end_reason", "is_current", "upd_lsn"}
    if payload is None:
        payload = [
            c for c in history.columns
            if c not in keys and c not in meta
        ]
    if version_order is None:
        version_order = [c for c in ("lsn",) if c in history.columns]

    p_struct = F.struct(*[F.col(c) for c in payload])
    vo_cols = [
        F.col(c).alias(f"_vo_{i}") for i, c in enumerate(version_order)
    ]
    null_vo = [
        F.lit(None).cast(history.schema[c].dataType).alias(f"_vo_{i}")
        for i, c in enumerate(version_order)
    ]
    opens = history.select(
        *keys,
        F.col("valid_from").alias("_ets"),
        F.lit(1).alias("_tag"),
        F.struct(p_struct.alias("p")).alias("_m"),
        *vo_cols,
    )
    clears = (
        history.where(F.col("valid_to").isNotNull())
        .select(
            *keys,
            F.col("valid_to").alias("_ets"),
            F.lit(0).alias("_tag"),
            # non-null outer, NULL inner: the clear must WIN the
            # ignorenulls forward-fill yet yield a null payload
            F.struct(
                F.lit(None).cast(
                    "struct<" + ",".join(
                        f"{c}:{history.schema[c].dataType.simpleString()}"
                        for c in payload
                    ) + ">"
                ).alias("p")
            ).alias("_m"),
            *null_vo,
        )
    )
    fact_rows = facts.select(
        "*",
        F.col(fact_ts).alias("_ets"),
        F.lit(2).alias("_tag"),
        F.lit(None).cast(opens.schema["_m"].dataType).alias("_m"),
        *[F.lit(None).cast(history.schema[c].dataType).alias(f"_vo_{i}")
          for i, c in enumerate(version_order)],
    )
    unioned = fact_rows.unionByName(
        opens.unionByName(clears), allowMissingColumns=True
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ets", "_tag", *[f"_vo_{i}" for i in range(len(version_order))])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "_dim", F.last("_m", ignorenulls=True).over(w)
    )
    out_cols = [c for c in facts.columns] + [
        F.col(f"_dim.p.{c}").alias(f"{prefix}{c}") for c in payload
    ]
    return filled.where(F.col("_tag") == 2).select(*out_cols)
