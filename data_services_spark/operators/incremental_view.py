"""Incremental materialized-aggregate maintenance from the lake changelog.

The classic counting algorithm for distributive aggregates (Gupta &
Mumick, "Maintenance of Materialized Views"): a COUNT/SUM-per-group view
is kept current by applying only the source table's row CHANGES — each
refresh costs O(changed rows + touched groups), never O(source table).
This is the engine-side materialization of the reference's report-view
cascade (``ANMN/data_report/views/report_db.anmn_deployments_view.sql:6-33``
aggregates recomputed from scratch by PostgreSQL on every query; at
10^10-row scale the recompute is the thing you cannot afford).

Mechanics per refresh:

1. ``source.changes_between(last_seen, now, with_before=True)`` — I/U/D
   rows with ``_prev_*`` before-images, read with bucket-level metadata
   pruning (O(touched buckets)).
2. Additions (+post for I/U) union retractions (-pre for D/U) collapse to
   one per-group delta aggregate — map-side combined, and group-moving
   updates are handled exactly: the retraction lands on the OLD group,
   the addition on the NEW one.
3. The view's CURRENT rows for touched groups only (bucket-pruned read —
   the view is hash-bucketed by its group columns) join the delta;
   updated aggregates append as a merge-on-read delta layer ordered by
   source snapshot id, groups whose count reaches zero become 'D'
   tombstones. One atomic commit carries the new source watermark in its
   summary, so refresh is exactly-once and crash-safe: a re-run recomputes
   the same changelog window and converges to the same state.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lake.table import LakeTable, _bucket_expr


class IncrementalAggView:
    """COUNT(*) + SUM(col...) + MIN/MAX(col...) per group over a source
    LakeTable, maintained incrementally from ``changes_between``. AVG falls
    out as sum/count at read time (algebraic aggregates decompose into
    distributive parts).

    MIN/MAX are the retraction-hard case (not distributive under deletes):
    an insert only ever tightens the extreme (``least(cur, new)`` — the
    monotonic fast path), but retracting a row whose value EQUALS the
    stored extreme may strand it, and the multiset of remaining values is
    not in the view. The standard practical answer (Snowflake MV refresh,
    DBSP's non-linear operators) is a bounded fallback: groups whose
    retracted extreme ties the stored one are flagged and recomputed from
    the source AT the refresh snapshot, via a broadcast semi-join on the
    flagged group keys — O(source scan) worst case but only for the
    flagged groups' rows, zero cost on append-only streams, and never a
    per-row auxiliary structure in the view."""

    def __init__(self, spark: SparkSession, table: LakeTable, source: LakeTable):
        self.spark = spark
        self.table = table
        self.source = source
        props = table.snapshot().props
        self.group_cols: list[str] = list(props["view_group_cols"])
        self.sum_cols: list[str] = list(props["view_sum_cols"])
        self.minmax_cols: list[str] = list(props.get("view_minmax_cols", []))

    # ------------------------------------------------------------- bootstrap
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        source: LakeTable,
        group_cols: list[str],
        sum_cols: list[str] | None = None,
        minmax_cols: list[str] | None = None,
        bucket_count: int = 8,
    ) -> "IncrementalAggView":
        """Create an EMPTY view positioned at source snapshot 0 — the first
        ``refresh()`` is simply an incremental step from the empty table,
        so initial load and steady-state maintenance are one code path."""
        sum_cols = list(sum_cols or [])
        minmax_cols = list(minmax_cols or [])
        src_schema = {f.name: f.dataType for f in source.snapshot().schema.fields}
        missing = [
            c for c in group_cols + sum_cols + minmax_cols if c not in src_schema
        ]
        if missing:
            raise ValueError(f"columns not in source schema: {missing}")
        reserved = {"lsn", "op"} & set(group_cols + sum_cols + minmax_cols)
        if reserved:
            raise ValueError(
                f"cannot maintain aggregates over {sorted(reserved)}: the "
                "changelog re-stamps 'lsn' as its transport ordering column "
                "(the stored after-image is not recoverable from "
                "changes_between) and 'op' is the change-type marker — "
                "aggregate over the business columns instead"
            )
        fields = [T.StructField(c, src_schema[c], True) for c in group_cols]
        fields.append(T.StructField("n_rows", T.LongType(), True))
        for c in sum_cols:
            dt = src_schema[c]
            agg_t = T.LongType() if isinstance(
                dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
            ) else T.DoubleType()
            fields.append(T.StructField(f"sum_{c}", agg_t, True))
            # non-null contribution count: SQL SUM over zero non-null rows
            # is NULL, which a bare accumulator cannot distinguish from a
            # sum that happens to be 0 — read() nulls the sum when nn==0
            fields.append(T.StructField(f"nn_{c}", T.LongType(), True))
        for c in minmax_cols:  # extremes keep the source column's own type
            fields.append(T.StructField(f"min_{c}", src_schema[c], True))
            fields.append(T.StructField(f"max_{c}", src_schema[c], True))
        fields.append(T.StructField("src_snap", T.LongType(), True))
        table = LakeTable.create(
            spark, path, T.StructType(fields), list(group_cols), bucket_count,
            summary={"source_snapshot": 0},
            props={
                "merge_keys": list(group_cols),
                "order_cols": ["src_snap"],
                "view_group_cols": list(group_cols),
                "view_sum_cols": sum_cols,
                "view_minmax_cols": minmax_cols,
                "view_source": source.path,
            },
        )
        return cls(spark, table, source)

    @classmethod
    def load(cls, spark: SparkSession, path: str, source: LakeTable) -> "IncrementalAggView":
        view = cls(spark, LakeTable(spark, path), source)
        bound = view.table.snapshot().props.get("view_source")
        if bound and os.path.abspath(bound) != os.path.abspath(source.path):
            raise ValueError(
                f"view {path} was created over source {bound}, not "
                f"{source.path}: refreshing against a different table would "
                "apply a foreign changelog on top of these aggregates"
            )
        return view

    # --------------------------------------------------------------- refresh
    def last_source_snapshot(self) -> int:
        return int(self.table.snapshot().summary.get("source_snapshot", 0))

    def refresh(self) -> dict[str, Any]:
        """Advance the view to the source's current snapshot. No-op (zero
        commits) when the source has not moved — idempotent by watermark."""
        frm = self.last_source_snapshot()
        to = self.source.current_snapshot_id()
        if to == frm:
            return {"refreshed": False, "source_snapshot": frm}
        ch = self.source.changes_between(frm, to, with_before=True)

        g, s = self.group_cols, self.sum_cols
        mm = self.minmax_cols
        src_types = {f.name: f.dataType for f in self.source.snapshot().schema.fields}
        one = F.lit(1).cast("long")
        # additions: the AFTER image of every row that exists afterwards
        add = ch.where(F.col("op").isin("I", "U")).select(
            *[F.col(c).alias(c) for c in g],
            one.alias("d_rows"),
            *[F.col(c).cast("double").alias(f"d_sum_{c}") for c in s],
            *[F.col(c).isNotNull().cast("long").alias(f"d_nn_{c}") for c in s],
            *[F.col(c).alias(f"a_{c}") for c in mm],
            *[F.lit(None).cast(src_types[c]).alias(f"r_{c}") for c in mm],
        )
        # retractions: the BEFORE image of every row that existed before —
        # group columns come from the before-image too, so an update that
        # MOVES a row between groups retracts from the old group exactly
        ret = ch.where(F.col("op").isin("D", "U")).select(
            *[self._before(c).alias(c) for c in g],
            (-one).alias("d_rows"),
            *[(-self._before(c).cast("double")).alias(f"d_sum_{c}") for c in s],
            *[(-self._before(c).isNotNull().cast("long")).alias(f"d_nn_{c}")
              for c in s],
            *[F.lit(None).cast(src_types[c]).alias(f"a_{c}") for c in mm],
            *[self._before(c).alias(f"r_{c}") for c in mm],
        )
        keep = F.col("d_rows") != 0
        for c in s:
            keep = keep | (F.col(f"d_sum_{c}") != 0) | (F.col(f"d_nn_{c}") != 0)
        for c in mm:  # any value activity can move an extreme
            keep = keep | F.col(f"amin_{c}").isNotNull() | F.col(f"rmin_{c}").isNotNull()
        delta = (
            add.unionByName(ret)
            .groupBy(*g)
            .agg(
                F.sum("d_rows").alias("d_rows"),
                *[F.sum(f"d_sum_{c}").alias(f"d_sum_{c}") for c in s],
                *[F.sum(f"d_nn_{c}").alias(f"d_nn_{c}") for c in s],
                *[x for c in mm for x in (
                    F.min(f"a_{c}").alias(f"amin_{c}"),
                    F.max(f"a_{c}").alias(f"amax_{c}"),
                    F.min(f"r_{c}").alias(f"rmin_{c}"),
                    F.max(f"r_{c}").alias(f"rmax_{c}"),
                )],
            )
            .where(keep)
        )
        delta = delta.localCheckpoint(eager=True)  # small: one row per touched group
        if not delta.head(1):
            # source moved but no net group change (e.g. ts-only updates)
            snap = self.table.commit_summary({"source_snapshot": to})
            return {"refreshed": True, "groups_touched": 0,
                    "groups_recomputed": 0,
                    "source_snapshot": to, "view_snapshot": snap.snapshot_id}

        # current state for TOUCHED buckets only (the view is bucketed by
        # its group columns, so the read prunes to O(touched buckets))
        vsnap = self.table.snapshot()
        tb = [
            int(r["b"])
            for r in delta.select(
                _bucket_expr(vsnap.bucket_keys, vsnap.bucket_count,
                             vsnap.bucket_fn).alias("b")
            ).distinct().collect()
        ]
        cur = self.table.read(buckets=tb).select(
            *g, "n_rows",
            *[x for c in s for x in (f"sum_{c}", f"nn_{c}")],
            *[x for c in mm for x in (f"min_{c}", f"max_{c}")],
        )
        # null-safe on the group columns: a NULL-valued group key is one
        # group (SQL GROUP BY semantics) and must keep matching its stored
        # view row — a plain equi-join would re-create it every window
        joined = delta.join(
            cur, [delta[c].eqNullSafe(cur[c]) for c in g], "left"
        )
        for c in g:
            joined = joined.drop(cur[c])
        survives = F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("d_rows") > 0
        upd_cols = [
            (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("d_rows")).alias("n_rows")
        ]
        for c in s:
            field = next(f for f in vsnap.schema.fields if f.name == f"sum_{c}")
            upd_cols.append(
                (F.coalesce(F.col(f"sum_{c}").cast("double"), F.lit(0.0))
                 + F.coalesce(F.col(f"d_sum_{c}"), F.lit(0.0)))
                .cast(field.dataType).alias(f"sum_{c}")
            )
            upd_cols.append(
                (F.coalesce(F.col(f"nn_{c}"), F.lit(0))
                 + F.coalesce(F.col(f"d_nn_{c}"), F.lit(0)))
                .cast("long").alias(f"nn_{c}")
            )
        # monotonic fast path: an insert only tightens an extreme
        # (least/greatest skip NULLs). A retraction can only STRAND one:
        # the stored min/max may have been exactly the retracted row, and
        # the view holds no multiset to fall back on — flag the group.
        invalid = F.lit(False)
        for c in mm:
            upd_cols.append(F.least(F.col(f"min_{c}"), F.col(f"amin_{c}")).alias(f"min_{c}"))
            upd_cols.append(F.greatest(F.col(f"max_{c}"), F.col(f"amax_{c}")).alias(f"max_{c}"))
            invalid = invalid | (
                F.col(f"rmin_{c}").isNotNull()
                & F.col(f"min_{c}").isNotNull()
                & (F.col(f"rmin_{c}") <= F.col(f"min_{c}"))
            ) | (
                F.col(f"rmax_{c}").isNotNull()
                & F.col(f"max_{c}").isNotNull()
                & (F.col(f"rmax_{c}") >= F.col(f"max_{c}"))
            )
        updated = joined.select(
            *g,
            *upd_cols,
            F.lit(to).cast("long").alias("src_snap"),
            F.when(~survives, "D").otherwise("U").alias("op"),
            (survives & invalid).alias("_recompute") if mm
            else F.lit(False).alias("_recompute"),
        )
        n_recomputed = 0
        n_touched = None
        if mm:
            # bounded fallback (Snowflake-MV-style): recompute ONLY the
            # flagged groups' extremes from the source AT this refresh's
            # snapshot. Flagged keys are a subset of the touched groups
            # (already assumed broadcast-small by the delta checkpoint);
            # append-only streams never flag anything.
            updated = updated.localCheckpoint(eager=True)
            n_touched = updated.count()  # checkpointed: counting is free,
            # and the left join below preserves row count — never count the
            # post-join plan (it would re-run the O(source) recompute scan)
            flagged = updated.where(F.col("_recompute")).select(*g)
            n_recomputed = flagged.count()
            if n_recomputed:
                src = self.source.read(snapshot_id=to)
                matched = src.join(
                    F.broadcast(flagged),
                    [src[c].eqNullSafe(flagged[c]) for c in g],
                    "left_semi",
                )
                fresh = matched.groupBy(*g).agg(*[
                    x for c in mm for x in (
                        F.min(c).alias(f"fmin_{c}"),
                        F.max(c).alias(f"fmax_{c}"),
                    )
                ])
                repl = [
                    x for c in mm for x in (
                        F.when(F.col("_recompute"), F.col(f"fmin_{c}"))
                        .otherwise(F.col(f"min_{c}")).alias(f"min_{c}"),
                        F.when(F.col("_recompute"), F.col(f"fmax_{c}"))
                        .otherwise(F.col(f"max_{c}")).alias(f"max_{c}"),
                    )
                ]
                mm_names = {x for c in mm for x in (f"min_{c}", f"max_{c}")}
                passthrough = [
                    f.name for f in vsnap.schema.fields
                    if f.name not in mm_names
                ]
                joined2 = updated.join(
                    fresh,
                    [updated[c].eqNullSafe(fresh[c]) for c in g],
                    "left",
                )
                for c in g:
                    joined2 = joined2.drop(fresh[c])
                updated = (
                    joined2.select(*passthrough, *repl, "op", "_recompute")
                    .select(*[f.name for f in vsnap.schema.fields], "op", "_recompute")
                )
        updated = updated.drop("_recompute")
        self.table.append_delta(
            updated, summary={"source_snapshot": to},
            sort_cols=list(g),
        )
        if n_touched is None:
            n_touched = updated.count()
        return {"refreshed": True, "groups_touched": int(n_touched),
                "groups_recomputed": int(n_recomputed),
                "source_snapshot": to,
                "view_snapshot": self.table.current_snapshot_id()}

    def _before(self, col: str) -> F.Column:
        """Before-image of ``col``: merge keys cannot change, so they have
        no ``_prev_`` column — the key itself IS the before value."""
        return F.col(f"_prev_{col}") if col not in self._source_keys() else F.col(col)

    def _source_keys(self) -> list[str]:
        snap = self.source.snapshot()
        return list(snap.props.get("merge_keys", snap.bucket_keys))

    # ------------------------------------------------------------------ read
    def read(self, with_avg: bool = False) -> DataFrame:
        """Current view state (LWW-resolved, tombstoned groups gone). SQL
        SUM semantics at the boundary: a group whose every contribution is
        NULL reads sum_<c> = NULL (the nn_<c> non-null counter decides),
        exactly what GROUP BY SUM returns. ``with_avg=True`` adds
        ``avg_<c>`` for every SUM column — sum over the NON-NULL count
        (algebraic AVG decomposed into its distributive parts), which is
        SQL AVG exactly: NULL contributions don't dilute, all-NULL groups
        read NULL."""
        df = self.table.read().drop("src_snap")
        for c in self.sum_cols:
            df = df.withColumn(
                f"sum_{c}",
                F.when(F.col(f"nn_{c}") > 0, F.col(f"sum_{c}")),
            )
            if with_avg:
                df = df.withColumn(
                    f"avg_{c}",
                    F.when(
                        F.col(f"nn_{c}") > 0,
                        F.col(f"sum_{c}").cast("double") / F.col(f"nn_{c}"),
                    ),
                )
            df = df.drop(f"nn_{c}")
        return df
