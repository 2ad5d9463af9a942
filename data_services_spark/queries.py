"""Query registry: every operator class from SURVEY.md §2 as a named query.

Each entry pairs a Spark-first implementation (``fn(spark, sf_dir) ->
DataFrame``) with an independently written ANSI/DuckDB oracle (``sql``)
over the same parquet tables. The driver runs both at sf=0.01 and compares
row count + schema + order-insensitive value hash, so every computed column
is aliased identically on both sides and floating aggregates are rounded.

Reference citations (file:line into /root/reference) sit on each entry —
the query reproduces that operator's *semantics*, not its implementation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


# --------------------------------------------------------------------------
# Flagship: CDC last-writer-wins apply (the engine's core operator) expressed
# over the driver's `events` table as a derived change stream.
# Reference: LWW dedup ardc_nrt/lib/bom/wfs.py:100-112; idempotent overwrite
# aims_realtime_util.py:1049-1053.
# --------------------------------------------------------------------------

@register(
    "cdc_lww_apply",
    sql="""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               CASE event_type
                    WHEN 'signup' THEN 'system'
                    WHEN 'purchase' THEN 'assistant'
                    ELSE 'user' END AS role,
               props AS text
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, ts, lsn
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    doc="LWW change-stream apply: final state per (conv_id, turn_idx).",
)
def cdc_lww_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cdc.dedup import lww_dedup

    ev = load(spark, sf_dir, "events")
    changes = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "ts",
        F.format_string("u%04d", "user_id").alias("conv_id"),
        F.pmod("event_id", F.lit(37)).cast("int").alias("turn_idx"),
        F.when(F.col("event_type") == "signup", "system")
        .when(F.col("event_type") == "purchase", "assistant")
        .otherwise("user")
        .alias("role"),
        F.col("props").alias("text"),
    )
    final = lww_dedup(changes, keys=["conv_id", "turn_idx"], order=["ts", "lsn"])
    return final.where(F.col("op") != "D").select(
        "conv_id", "turn_idx", "role", "text", "ts", "lsn"
    )


# --------------------------------------------------------------------------
# Engine-in-the-loop entries: the REAL apply machinery (CdcApplier +
# LakeTable under a scratch dir) replays a change stream derived from the
# driver's `events` table; the DuckDB oracle computes the expected final
# table state with one LWW window — so requeue-then-apply, post-rebucket
# reads, and two-microbatch restart are driver-verified end-to-end, not
# just pytest-covered.
# --------------------------------------------------------------------------

def _engine_change_stream(spark: SparkSession, sf_dir: str,
                          mangle_roles: bool = False) -> DataFrame:
    """Deterministic transcript change stream derived from `events`; with
    ``mangle_roles`` every 19th event carries an invalid role ('robot') so
    the default validation ladder quarantines it (bad_role gate)."""
    ev = load(spark, sf_dir, "events")
    role = (
        F.when(F.col("event_type") == "signup", "system")
        .when(F.col("event_type") == "purchase", "assistant")
        .otherwise("user")
    )
    if mangle_roles:
        role = F.when(
            F.pmod("event_id", F.lit(19)) == 0, F.lit("robot")
        ).otherwise(role)
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.format_string("u%04d", "user_id").alias("conv_id"),
        F.pmod("event_id", F.lit(37)).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.col("props").alias("text"),
        F.col("event_type").alias("tool"),
    )


def _engine_lww_oracle(role_case: str) -> str:
    return f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {role_case} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, lsn
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """


_ROLE_CASE = ("CASE event_type WHEN 'signup' THEN 'system' "
              "WHEN 'purchase' THEN 'assistant' ELSE 'user' END")


def _materialize_and_clean(df: DataFrame, scratch: str) -> DataFrame:
    """Pin the final table into Spark block storage so the scratch lake can
    be deleted before the driver collects the (lazy) result."""
    import shutil

    out = df.localCheckpoint(eager=True)
    shutil.rmtree(scratch, ignore_errors=True)
    return out


@register(
    "engine_requeue_final_state",
    sql=_engine_lww_oracle(
        f"CASE WHEN event_id % 19 = 0 THEN 'robot' ELSE {_ROLE_CASE} END"
    ),
    doc="Quarantine re-drive through the REAL engine: a stream where every "
        "19th event carries an invalid role is replayed (those events land "
        "in the quarantine table via the bad_role gate), then "
        "requeue_quarantine re-drives them under a relaxed validator — the "
        "reference's wip/errors redownload loop (faimms.py:15-18,199-207) "
        "as one idempotent job. The oracle is a single LWW pass over ALL "
        "events: requeued stragglers must converge to the same final state "
        "because LWW resolves by (ts, lsn) rank, not arrival order.",
)
def engine_requeue_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_requeue_")
    stream = _engine_change_stream(spark, sf_dir, mangle_roles=True)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(stream, chunk_size=max(1, (hi + 1) // 2 + 1))
    # relaxed validator (the "rule fixed upstream" moment): accept all
    lax = CdcApplier.load(
        spark, scratch, validator=lambda df: F.lit(None).cast("string")
    )
    lax.requeue_quarantine()
    return _materialize_and_clean(lax.target.read(), scratch)


@register(
    "engine_schema_evolution_state",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), split AS (
        SELECT CAST(max(lsn) // 2 AS BIGINT) AS s FROM changes
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, lsn,
           CASE WHEN lsn > (SELECT s FROM split)
                THEN printf('fb-%d', lsn % 7) END AS feedback
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    doc="Additive schema evolution through the REAL engine (a north-rule "
        "pillar, previously pytest-only): chunk 1 replays WITHOUT the "
        "'feedback' column, chunk 2 arrives WITH it — the engine widens "
        "the table in place (mergeSchema-analogue additive write, "
        "non-additive changes rejected elsewhere). The oracle computes "
        "the LWW final state where feedback exists exactly on keys whose "
        "WINNING event arrived post-evolution — pre-evolution winners "
        "must read back NULL, which catches both a dropped column and a "
        "backfill that invents data. Reference parity: new metadata "
        "fields appearing mid-harvest (harvest_mapping.py column adds).",
)
def engine_schema_evolution_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_evolve_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    split = hi // 2
    evolved = stream.withColumn(
        "feedback", F.format_string("fb-%d", F.pmod("lsn", F.lit(7)))
    )
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(stream, chunk_size=hi, source_hi=split)
    applier.replay(evolved, chunk_size=hi)
    return _materialize_and_clean(applier.target.read(), scratch)


@register(
    "engine_type_widening_state",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), split AS (
        SELECT CAST(max(lsn) // 2 AS BIGINT) AS s FROM changes
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, lsn,
           CAST(CASE WHEN lsn > (SELECT s FROM split)
                     THEN lsn % 1000 + 34359738368
                     ELSE lsn % 1000 END AS BIGINT) AS score
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    doc="Type-widening schema evolution through the REAL engine (Iceberg "
        "safe-promotion rules: int -> long in place, metadata-only — no "
        "rewrite of existing files): chunk 1 replays with an int32 'score' "
        "metadata column, chunk 2 arrives with score as int64 carrying "
        "values above 2^35 (upstream ALTER TABLE ... BIGINT mid-stream). "
        "The widened table must read pre-widen winners from narrow parquet "
        "pages upcast to long and post-widen winners with their full "
        "64-bit values — the oracle pins both eras' exact values, so a "
        "truncation, a dropped widen, or a mis-cast turns the driver red. "
        "Bucket keys are frozen against widening (hash(int) != hash(long) "
        "would scatter keys); that guard is pytest-pinned in "
        "tests/test_lake_table.py.",
)
def engine_type_widening_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_widen_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    split = hi // 2
    narrow = stream.withColumn(
        "score", F.pmod("lsn", F.lit(1000)).cast("int")
    )
    wide = stream.withColumn(
        "score", (F.pmod("lsn", F.lit(1000)) + F.lit(34359738368)).cast("long")
    )
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(narrow, chunk_size=hi, source_hi=split)
    applier.replay(wide, chunk_size=hi)
    return _materialize_and_clean(applier.target.read(), scratch)


@register(
    "engine_rebucket_equality",
    sql=_engine_lww_oracle(_ROLE_CASE),
    doc="Partition evolution through the REAL engine: the stream replays "
        "into a 4-bucket lake, rebucket(16) re-hashes the whole table in "
        "one shuffle with an atomic snapshot flip, and the post-rebucket "
        "read must still match the LWW oracle — including delete "
        "tombstones surviving the rewrite (the round-3 resurrection bug's "
        "regression gate, now driver-visible).",
)
def engine_rebucket_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_rebucket_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=4)
    applier.replay(stream, chunk_size=max(1, (hi + 1) // 2 + 1))
    applier.target.rebucket(16)
    return _materialize_and_clean(applier.target.read(), scratch)


@register(
    "engine_pruned_time_scan",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    ), final AS (
        SELECT conv_id, turn_idx, role, text, tool, ts, lsn
        FROM ranked WHERE rn = 1 AND op <> 'D'
    )
    SELECT * FROM final
    WHERE ts >= (SELECT min(ts) FROM final)
      AND ts <= (SELECT min(ts) + INTERVAL 10 DAY FROM final)
    """,
    doc="Manifest-level data skipping through the REAL engine: the stream "
        "replays into a lake with stats_cols=['ts','lsn'] (per-file min/max "
        "recorded in the snapshot manifest at commit — Iceberg lower/upper "
        "bound pruning), the table is compacted, and a 10-day time-range "
        "read (a ~1/3 slice of the 30-day stream) prunes files by manifest "
        "stats alone (no footer opens, no tasks for pruned files) while "
        "the oracle filters the full LWW state in SQL. "
        "tests/test_data_skipping.py pins that the pruned scan really "
        "opens fewer files; this entry pins that it returns exactly the "
        "right rows.",
)
def engine_pruned_time_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_prune_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(
        spark, scratch, bucket_count=8,
        target_props={"stats_cols": ["ts", "lsn"]},
    )
    applier.replay(stream, chunk_size=max(1, (hi + 1) // 2 + 1),
                   compact_at_end=True)
    lo_ts = applier.target.read().agg(F.min("ts")).collect()[0][0]
    import datetime as _dt

    window = (lo_ts, lo_ts + _dt.timedelta(days=10))
    out = applier.target.read(prune={"ts": window})
    return _materialize_and_clean(out, scratch)


@register(
    "engine_incremental_agg_view",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    ), final AS (
        SELECT conv_id, turn_idx, role, text, tool, ts, lsn
        FROM ranked WHERE rn = 1 AND op <> 'D'
    )
    SELECT role, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(turn_idx) AS BIGINT) AS sum_turn_idx
    FROM final GROUP BY role
    """,
    doc="Incremental materialized-aggregate maintenance (Gupta & Mumick "
        "counting algorithm) through the REAL engine: the stream applies "
        "in two chunks, and after EACH chunk the per-role COUNT/SUM view "
        "refreshes from changes_between with _prev_* before-images — each "
        "refresh costs O(changed rows + touched groups), never O(table). "
        "The oracle recomputes the aggregates from scratch over the final "
        "LWW state: equality proves two incremental refreshes (including "
        "retractions for updates and deletes) converge to the full "
        "recompute. The reference's report views "
        "(report_db.anmn_deployments_view.sql:6-33) recompute on every "
        "query; this is that cascade made affordable at 10^10 rows.",
)
def engine_incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier
    from .operators.incremental_view import IncrementalAggView

    scratch = tempfile.mkdtemp(prefix="q_iview_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    view = IncrementalAggView.create(
        spark, f"{scratch}/view_role", applier.target, ["role"], ["turn_idx"]
    )
    # chunk 1 -> refresh -> chunk 2 -> refresh: the view never sees the
    # source more than one changelog window at a time
    applier.replay(stream, chunk_size=hi, source_hi=hi // 2)
    view.refresh()
    applier.replay(stream, chunk_size=hi)
    view.refresh()
    return _materialize_and_clean(view.read(), scratch)


@register(
    "engine_incremental_minmax_view",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM changes_src
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    ), final AS (
        SELECT conv_id, turn_idx, role, text, tool, ts, lsn
        FROM ranked WHERE rn = 1 AND op <> 'D'
    )
    SELECT role, CAST(count(*) AS BIGINT) AS n_rows,
           min(ts) AS min_ts,
           max(ts) AS max_ts,
           CAST(min(turn_idx) AS INTEGER) AS min_turn_idx,
           CAST(max(turn_idx) AS INTEGER) AS max_turn_idx
    FROM final GROUP BY role
    """.replace("changes_src", "events"),
    doc="Incremental MIN/MAX view maintenance — the retraction-HARD case "
        "(not distributive under deletes: a retracted row may BE the "
        "stored extreme, and the view holds no multiset to fall back on). "
        "Inserts take the monotonic least/greatest fast path; groups whose "
        "retracted value ties the stored extreme are flagged and "
        "recomputed from the source AT the refresh snapshot via a "
        "broadcast semi-join on the flagged keys (Snowflake-MV-style "
        "bounded fallback). Tracked extremes are the per-role first/last "
        "event time (the _prev_ts before-image feeds the retraction side) "
        "and turn-index span — business columns; aggregating the "
        "changelog's transport 'lsn' is an explicit create()-time error "
        "(the re-stamped after-image would be meaningless). Updates and "
        "deletes strand extremes on this stream, so the fallback path is "
        "genuinely exercised; the oracle recomputes from scratch over the "
        "final LWW state.",
)
def engine_incremental_minmax_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier
    from .operators.incremental_view import IncrementalAggView

    scratch = tempfile.mkdtemp(prefix="q_mmview_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    view = IncrementalAggView.create(
        spark, f"{scratch}/view_mm", applier.target, ["role"],
        minmax_cols=["ts", "turn_idx"],
    )
    applier.replay(stream, chunk_size=hi, source_hi=hi // 2)
    view.refresh()
    applier.replay(stream, chunk_size=hi)
    view.refresh()
    return _materialize_and_clean(view.read(), scratch)


@register(
    "engine_restart_final_state",
    sql=_engine_lww_oracle(_ROLE_CASE),
    doc="Two-microbatch apply with a hard restart between them: chunk 1 is "
        "committed, the applier object is discarded, a NEW process-like "
        "CdcApplier.load resumes from the offsets in the committed "
        "snapshot summary and applies the remainder. The oracle applies "
        "the same events as ONE batch — equality proves resume introduces "
        "no duplicates or gaps (the north rule's exactly-once criterion, "
        "previously pytest-only, now driver-visible).",
)
def engine_restart_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_restart_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    # microbatch 1: first half of the LSN range, then "crash"
    applier.replay(stream, chunk_size=hi, source_hi=hi // 2)
    del applier
    # restart: fresh object, no in-memory state, resumes from the snapshot
    resumed = CdcApplier.load(spark, scratch)
    resumed.replay(stream, chunk_size=hi)
    return _materialize_and_clean(resumed.target.read(), scratch)


@register(
    "engine_rollback_state",
    # the visible state after rollback = LWW over ONLY the first half of
    # the LSN range (the "bad" second batch is rolled back)
    sql=_engine_lww_oracle(_ROLE_CASE).replace(
        "FROM events",
        "FROM events WHERE event_id <= "
        "(SELECT MAX(event_id) // 2 FROM events)",
    ),
    doc="Snapshot rollback through the REAL engine (Iceberg "
        "rollback_to_snapshot): the full stream is applied in two batches, "
        "the second batch is declared bad, and rollback() re-points the "
        "table at the first batch's snapshot as a NEW metadata-only commit "
        "— no data moves, the bad commit stays time-travelable until "
        "expiry, and the resume watermark regresses WITH the state in the "
        "same atomic flip (so the rolled-back events replay later with no "
        "gaps). Returned state must hash-equal the LWW oracle over only "
        "the first half of the LSN range: a rollback that leaked any "
        "second-batch row, tombstone, or delta layer fails the hash. "
        "tests/test_rollback.py pins the recovery loop (re-replay "
        "converges), metadata-only-ness, guards, and the maintain_job "
        "--rollback-to CLI.",
)
def engine_rollback_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_rollback_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(stream, chunk_size=hi, source_hi=hi // 2)
    good = applier.target.current_snapshot_id()
    applier.replay(stream, chunk_size=hi)  # the "bad" batch lands
    applier.target.rollback(good)
    return _materialize_and_clean(applier.target.read(), scratch)


@register(
    "engine_changelog_chain",
    # final-state equality over the DATA columns: each hop re-stamps the
    # transport lsn into the consumer's own offset space (by design), so
    # the lsn column is per-hop bookkeeping, not chained state
    sql=_engine_lww_oracle(_ROLE_CASE).replace(
        "SELECT conv_id, turn_idx, role, text, tool, ts, lsn",
        "SELECT conv_id, turn_idx, role, text, tool, ts",
    ),
    doc="The lake as a CDC *source* (Delta CDF / Iceberg changelog "
        "analogue): the stream applies into upstream table A in two "
        "windows, and after EACH window a DOWNSTREAM CdcApplier ingests "
        "only A.changes_between(prev, cur) — bucket-pruned I/U/D rows "
        "with LSNs reassigned from A's committed high-watermark, exactly "
        "the shape the applier consumes. The returned state is table B's: "
        "equality with the one-batch LWW oracle proves a two-hop CDC "
        "chain (binlog -> A -> changelog -> B) converges to the same "
        "state as direct apply — reporting marts, search indexes, or a "
        "second engine instance can hang off any table without re-reading "
        "the binlog. Pytest pins the same chain at the API level "
        "(tests/test_lake_table.py); this entry makes it driver-visible "
        "under the DuckDB oracle.",
)
def engine_changelog_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_chain_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    a = CdcApplier.bootstrap(spark, f"{scratch}/a", bucket_count=8)
    b = CdcApplier.bootstrap(spark, f"{scratch}/b", bucket_count=8)
    cols = ["lsn", "op", "ts", "conv_id", "turn_idx", "role", "text", "tool"]

    def _hop(s_from: int, s_to: int) -> None:
        # the downstream consumer keeps its OWN offset ledger: changelog
        # LSNs are dense from A's committed watermark at s_to, so a uniform
        # shift rebases them just past B's watermark (order — and therefore
        # LWW outcome — is preserved; no arithmetic coupling between hops)
        ch = a.target.changes_between(s_from, s_to).select(*cols)
        base = int(
            a.target.snapshot(s_to).summary.get("offsets", {}).get("last_lsn", -1)
        ) + 1
        bc = b.committed_lsn()
        shift = (bc if bc is not None else -1) + 1 - base
        b.replay(
            ch.withColumn("lsn", (F.col("lsn") + F.lit(shift)).cast("long")),
            chunk_size=2 * hi + 10,
        )

    s0 = a.target.current_snapshot_id()
    a.replay(stream, chunk_size=hi, source_hi=hi // 2)
    s1 = a.target.current_snapshot_id()
    _hop(s0, s1)
    a.replay(stream, chunk_size=hi)
    s2 = a.target.current_snapshot_id()
    _hop(s1, s2)
    return _materialize_and_clean(b.target.read().drop("lsn"), scratch)


@register(
    "engine_key_lookup",
    sql=f"""
    SELECT * FROM ({_engine_lww_oracle(_ROLE_CASE)})
    WHERE conv_id IN ('u0001', 'u0007', 'u0042')
    """,
    doc="Point-lookup read path (GDPR subject-access / targeted-repair "
        "shape): LakeTable.lookup hashes each full key to its bucket "
        "driver-side (the same Murmur3 the writers cluster by) and opens "
        "ONLY those buckets' files — O(distinct buckets among the keys), "
        "no index structures, LWW delta resolution and tombstones intact "
        "(Iceberg bucket-partition pruning on point predicates). The key "
        "set here is every possible turn of three conversations (the "
        "cross product covers turn_idx 0..36 exactly, so the SQL filter "
        "on conv_id alone is the same predicate); the oracle filters the "
        "full LWW state. tests/test_lake_table.py pins that a needle "
        "lookup scans a strict subset of the files a full read opens.",
)
def engine_key_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_lookup_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=16)
    applier.replay(stream, chunk_size=hi + 1)
    keys = [
        {"conv_id": f"u{c:04d}", "turn_idx": t}
        for c in (1, 7, 42) for t in range(37)
    ]
    return _materialize_and_clean(applier.target.lookup(keys), scratch)


@register(
    "engine_wap_publish",
    sql=_engine_lww_oracle(_ROLE_CASE),
    doc="Write-audit-publish through the REAL engine (Iceberg wap.id "
        "staged snapshots; reference analogue: files wait in wip/ until "
        "the checker passes before moving into the indexed hierarchy — "
        "here the move is ONE atomic snapshot flip over the audited "
        "bytes). Chunk 1 applies directly. A poison batch — turn_idx "
        "5000, beyond the contract bound but inside ingest validity — is "
        "staged, FAILS the audit suite, and is abandoned: zero trace, "
        "zero offset movement. Chunk 2 is staged, audited against the "
        "exact bytes publish will expose (the staged overlay resolves "
        "through the normal LWW read path), and published metadata-only, "
        "files + offsets in the same commit. Equality with the one-batch "
        "oracle proves the audit gate loses no events, adds none, and "
        "leaves no partial state.",
)
def engine_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier
    from .contracts import Contract, ContractSuite

    scratch = tempfile.mkdtemp(prefix="q_wap_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(stream, chunk_size=hi, source_hi=hi // 2)

    audit = ContractSuite([
        Contract("key_unique", "unique", columns=["conv_id", "turn_idx"]),
        Contract("turn_idx_in_range", "bounds", column="turn_idx",
                 min_value=0, max_value=36),
    ])
    # poison: passes the ingest validator (turn_idx >= 0, role in domain)
    # but violates the audit's turn-range contract -> abandoned untraced
    poison = (
        stream.where(F.col("lsn") > hi - 200)
        .withColumn("turn_idx", F.lit(5000).cast("int"))
        .withColumn("lsn", (F.col("lsn") + F.lit(10_000_000)).cast("long"))
        .withColumn("op", F.lit("U"))
    )
    applier.stage_chunk(poison, "poison")
    passed, _ = applier.audit_staged("poison", suite=audit)
    assert not passed, "poison batch must fail the audit"
    applier.abandon_chunk("poison")

    applier.stage_chunk(stream.where(F.col("lsn") > hi // 2), "good", hi=hi)
    passed, report = applier.audit_staged("good", suite=audit)
    assert passed, report.collect()
    applier.publish_chunk("good")
    return _materialize_and_clean(applier.target.read(), scratch)


@register(
    "engine_concurrent_writers",
    sql=f"""
    SELECT conv_id, turn_idx, role,
           CASE WHEN CAST(substr(conv_id, 2) AS INTEGER) % 2 = 0
                THEN upper(text) ELSE text END AS text,
           CASE WHEN CAST(substr(conv_id, 2) AS INTEGER) % 2 = 1
                THEN 'patched' ELSE tool END AS tool,
           ts
    FROM ({_engine_lww_oracle(_ROLE_CASE)})
    """,
    doc="Optimistic concurrency under REAL contention: after the base "
        "replay, two writer THREADS race disjoint delta commits against "
        "the same table (writer A upper-cases text for even conversations, "
        "writer B re-tools odd ones), each wrapped in retry_commit — the "
        "loser's O_EXCL snapshot claim fails, it re-reads the fresh "
        "snapshot, re-derives, and recommits with jittered backoff. The "
        "oracle applies both edits to the one-batch LWW state: equality "
        "proves neither write is lost and the final state is commit-order "
        "independent (disjoint keys + LWW = commutative). The transport "
        "lsn is bumped per edit and excluded (per-writer bookkeeping). "
        "Pytest pins the same protocol single-threaded with a forced "
        "conflict (test_append_retries_past_racing_writer).",
)
def engine_concurrent_writers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import threading

    from .cdc.apply import CdcApplier
    from .lake.table import retry_commit

    scratch = tempfile.mkdtemp(prefix="q_race_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(stream, chunk_size=hi + 1)
    t = applier.target
    final = t.read()
    parity = F.pmod(F.substring("conv_id", 2, 10).cast("int"), F.lit(2))
    edits = [
        final.where(parity == 0)
        .withColumn("text", F.upper("text")),
        final.where(parity == 1)
        .withColumn("tool", F.lit("patched")),
    ]
    edits = [
        e.withColumn("lsn", F.col("lsn") + F.lit(100_000).cast("long"))
        .withColumn("op", F.lit("U"))
        .localCheckpoint(eager=True)  # pin inputs BEFORE the table mutates
        for e in edits
    ]
    errs: list[Exception] = []

    def _writer(df: DataFrame) -> None:
        try:
            retry_commit(lambda: t.append_delta(df))
        except Exception as e:  # surfaced after join — never swallowed
            errs.append(e)

    threads = [threading.Thread(target=_writer, args=(e,)) for e in edits]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    if errs:
        raise errs[0]
    return _materialize_and_clean(t.read().drop("lsn"), scratch)


@register(
    "engine_time_travel",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
        WHERE event_id <= (SELECT max(event_id) / 2 FROM events)
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, lsn
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    doc="Time travel (Iceberg VERSION AS OF): the stream applies in two "
        "windows, the SECOND window's commits — including a full "
        "read-optimise compaction that rewrites every bucket — land on "
        "top, and the entry reads the table AT the snapshot committed by "
        "window 1. The oracle replays ONLY the first half of the stream: "
        "equality proves historical snapshots stay byte-consistent under "
        "later writes AND later compaction (old files are referenced by "
        "the old manifest until expire_snapshots, the GC horizon).",
)
def engine_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_tt_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(stream, chunk_size=hi, source_hi=hi // 2)
    s1 = applier.target.current_snapshot_id()
    applier.replay(stream, chunk_size=hi, compact_at_end=True)
    return _materialize_and_clean(applier.target.read(snapshot_id=s1), scratch)


@register(
    "engine_tombstone_gc",
    sql=_engine_lww_oracle(_ROLE_CASE),
    doc="Tombstone GC through the driver surface: after the full replay "
        "and compaction the table's delete tombstones (op='D' winners "
        "retained in base files for out-of-order safety) are expired with "
        "expire_tombstones(None) — the explicit declaration that no "
        "pre-delete event can still arrive (Cassandra gc_grace / Iceberg "
        "delete-file expiry). The CURRENT state must be unchanged by the "
        "GC rewrite (tombstones are invisible to live reads); the oracle "
        "is the standard one-batch LWW state. The resurrection hazard the "
        "tombstones guard against — and the horizon contract after GC — "
        "are pinned by tests/test_tombstones.py.",
)
def engine_tombstone_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_gc_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(stream, chunk_size=hi + 1, compact_at_end=True)
    snap = applier.target.expire_tombstones(None)
    assert snap.operation == "expire_tombstones"
    return _materialize_and_clean(applier.target.read(), scratch)


@register(
    "scd2_transcript_history",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), w AS (
        SELECT *,
               lead(ts) OVER win AS valid_to,
               lead(op) OVER win AS nxt_op
        FROM changes
        WINDOW win AS (PARTITION BY conv_id, turn_idx ORDER BY ts, lsn)
    )
    SELECT lsn, conv_id, turn_idx, role, text, tool,
           ts AS valid_from, valid_to,
           CASE WHEN nxt_op IS NULL THEN NULL
                WHEN nxt_op = 'D' THEN 'delete'
                ELSE 'update' END AS end_reason,
           (nxt_op IS NULL) AS is_current
    FROM w WHERE op <> 'D'
    """,
    doc="SCD Type-2 dimension history (batch tier): the full event-time "
        "version chain per transcript key — every update opens a version, "
        "the key's next event closes it (deletes close without opening), "
        "exactly one open version per live key. One shuffle on the keys; "
        "the chain is a single window lead, no self-join "
        "(operators/scd.py). Reference analogue: the harvest pipelines "
        "keep only latest state (aims_realtime_util.py:1049-1053); a "
        "dimension consumer needs the history kept forward.",
)
def scd2_transcript_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.scd import scd2_history

    return scd2_history(
        _engine_change_stream(spark, sf_dir), keys=["conv_id", "turn_idx"]
    )


@register(
    "scd2_temporal_enrich",
    sql="""
    WITH dimch AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS uid,
               props AS segment,
               value AS score
        FROM events WHERE event_id % 5 = 0
    ), hist AS (
        SELECT lsn, uid, segment, score, op, ts AS valid_from,
               lead(ts) OVER (PARTITION BY uid ORDER BY ts, lsn) AS valid_to
        FROM dimch
    ), versions AS (
        SELECT * FROM hist
        WHERE op <> 'D'
          AND (valid_to IS NULL OR valid_to > valid_from)
    ), facts AS (
        SELECT event_id AS fid, printf('u%04d', user_id) AS uid, ts
        FROM events WHERE event_id % 5 <> 0
    )
    SELECT f.fid, f.uid, f.ts,
           v.segment AS dim_segment, v.score AS dim_score
    FROM facts f
    LEFT JOIN versions v
      ON f.uid = v.uid AND f.ts >= v.valid_from
     AND (v.valid_to IS NULL OR f.ts < v.valid_to)
    """,
    doc="Event-time temporal enrichment (operators/scd.py:temporal_enrich): "
        "every 5th event forms a dim change stream -> SCD2 version chains; "
        "the remaining events are facts enriched with the dim version valid "
        "at each fact's timestamp (Flink FLIP-132 event-time temporal table "
        "join as a batch plan). The Spark side is union + ONE window "
        "forward-fill — no join operator, no per-key cross product (plan "
        "pinned by tests/test_scd2.py); the oracle is the naive "
        "key-equality range join, which the windowed plan must equal "
        "exactly, including same-instant version races and zero-length "
        "versions.",
)
def scd2_temporal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.scd import scd2_history, temporal_enrich

    ev = load(spark, sf_dir, "events")
    dimch = ev.where(F.pmod("event_id", F.lit(5)) == 0).select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.format_string("u%04d", "user_id").alias("uid"),
        F.col("props").alias("segment"),
        F.col("value").alias("score"),
    )
    hist = scd2_history(dimch, keys=["uid"])
    facts = ev.where(F.pmod("event_id", F.lit(5)) != 0).select(
        F.col("event_id").alias("fid"),
        F.format_string("u%04d", "user_id").alias("uid"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    return temporal_enrich(
        facts, hist, keys=["uid"], payload=["segment", "score"]
    )


@register(
    "engine_scd2_history",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), h AS (SELECT MAX(event_id) // 2 AS h1 FROM events),
    s1 AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM changes WHERE lsn <= (SELECT h1 FROM h)
        ) WHERE rn = 1 AND op <> 'D'
    ),
    s2 AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC
            ) AS rn
            FROM changes
        ) WHERE rn = 1 AND op <> 'D'
    )
    SELECT conv_id, turn_idx, role, text, tool,
           ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to,
           CAST(NULL AS VARCHAR) AS end_reason, TRUE AS is_current
    FROM s2
    UNION ALL
    SELECT s1.conv_id, s1.turn_idx, s1.role, s1.text, s1.tool,
           s1.ts AS valid_from, s2.ts AS valid_to,
           'update' AS end_reason, FALSE AS is_current
    FROM s1 JOIN s2 ON s1.conv_id = s2.conv_id AND s1.turn_idx = s2.turn_idx
    WHERE s1.lsn <> s2.lsn AND s1.ts <> s2.ts
    UNION ALL
    SELECT s1.conv_id, s1.turn_idx, s1.role, s1.text, s1.tool,
           s1.ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to,
           'delete' AS end_reason, FALSE AS is_current
    FROM s1 WHERE NOT EXISTS (
        SELECT 1 FROM s2
        WHERE s2.conv_id = s1.conv_id AND s2.turn_idx = s1.turn_idx
    )
    """,
    doc="SCD Type-2 maintained INCREMENTALLY from the lake changelog "
        "(Debezium->dim-table / Iceberg-changelog-consumer recipe): the "
        "stream applies into the source in two windows; after each, "
        "Scd2History.refresh() advances the history from "
        "changes_between(with_before=True) — the before-image carries the "
        "closing row's entire content, so a refresh is a pure column map "
        "plus ONE merge-on-read delta append: zero history reads, zero "
        "joins, O(net-changed keys) per refresh. Semantics are "
        "state-history (versions = the source table's committed states in "
        "commit order): the oracle derives the version set from the two "
        "windows' LWW states — current rows from the final state, "
        "'update'-closed rows where the winner changed between states "
        "(zero-duration same-ts successions dropped by design), "
        "'delete'-closed rows (end time unknowable from a state diff) "
        "where the key vanished. tests/test_scd2.py pins a 3-window chain "
        "with deletes, resurrection, and an out-of-order loser against "
        "time-travel-reconstructed expected chains.",
)
def engine_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier
    from .operators.scd import Scd2History

    scratch = tempfile.mkdtemp(prefix="q_scd2_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, f"{scratch}/src", bucket_count=8)
    hist = Scd2History.create(
        spark, f"{scratch}/hist", applier.target, bucket_count=8
    )
    applier.replay(stream, chunk_size=hi + 1, source_hi=hi // 2)
    hist.refresh()
    applier.replay(stream, chunk_size=hi + 1)
    hist.refresh()
    return _materialize_and_clean(hist.read(), scratch)


@register(
    "partial_update_state",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D'
                    WHEN event_id % 3 = 0 THEN 'P'
                    ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               CASE WHEN event_type = 'error' THEN NULL
                    WHEN event_id % 3 = 0 AND user_id % 2 = 0 THEN NULL
                    ELSE {_ROLE_CASE} END AS role,
               CASE WHEN event_type = 'error' THEN NULL
                    WHEN event_id % 3 = 0 AND event_id % 5 = 0 THEN NULL
                    ELSE props END AS text,
               CASE WHEN event_type = 'error' THEN NULL
                    ELSE event_type END AS tool
        FROM events
    ),
    r0 AS (
        SELECT conv_id, turn_idx, ts, lsn, op
        FROM changes WHERE op IN ('U', 'D')
        QUALIFY row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) = 1
    ),
    alive AS (SELECT * FROM r0 WHERE op = 'U'),
    applied AS (
        SELECT c.* FROM changes c
        JOIN alive a ON c.conv_id = a.conv_id AND c.turn_idx = a.turn_idx
        WHERE (c.ts, c.lsn) >= (a.ts, a.lsn)
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts, lsn) AS rk
        FROM applied
    ),
    merged AS (
        SELECT conv_id, turn_idx,
               arg_max(struct_pack(v := role), rk)
                   FILTER (WHERE op = 'U' OR role IS NOT NULL) AS role_s,
               arg_max(struct_pack(v := text), rk)
                   FILTER (WHERE op = 'U' OR text IS NOT NULL) AS text_s,
               arg_max(struct_pack(v := tool), rk)
                   FILTER (WHERE op = 'U' OR tool IS NOT NULL) AS tool_s
        FROM ranked GROUP BY conv_id, turn_idx
    )
    SELECT m.conv_id, m.turn_idx, role_s.v AS role, text_s.v AS text,
           tool_s.v AS tool, a.ts, a.lsn
    FROM merged m
    JOIN alive a ON m.conv_id = a.conv_id AND m.turn_idx = a.turn_idx
    """,
    doc="Partial-update (patch) merge OPERATOR — Debezium sparse updates / the "
        "Apache Paimon partial-update merge engine: every third event is a "
        "patch writing only its non-null columns, full upserts write every "
        "column (NULL = explicit reset), deletes drop the row and every "
        "later patch until the next full write; the row's order stamp is "
        "its last FULL write (patches ride on top). ONE aggregation, no "
        "window: a full write dominates every older patch per column "
        "automatically, so the horizon never materializes — each "
        "column's winner is a plain max over an (order, value) struct "
        "gated by the wrote-this-column predicate, map-side combinable "
        "(cdc/dedup.py:partial_update_merge). "
        "The oracle replays the same fold with QUALIFY + FILTERed "
        "arg_max over struct-wrapped values (NULL payloads survive "
        "arg_max's null-skipping).",
)
def partial_update_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cdc.dedup import partial_update_merge

    return partial_update_merge(
        _patch_change_stream(spark, sf_dir), keys=["conv_id", "turn_idx"]
    )


def _patch_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic U/P/D patch stream derived from `events`: every third
    event is a patch with a value-dependent written-column pattern."""
    ev = load(spark, sf_dir, "events")
    is_err = F.col("event_type") == "error"
    is_p = F.pmod("event_id", F.lit(3)) == 0
    null_s = F.lit(None).cast("string")
    role = (
        F.when(F.col("event_type") == "signup", "system")
        .when(F.col("event_type") == "purchase", "assistant")
        .otherwise("user")
    )
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.when(is_err, "D").when(is_p, "P").otherwise("U").alias("op"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.format_string("u%04d", "user_id").alias("conv_id"),
        F.pmod("event_id", F.lit(37)).cast("int").alias("turn_idx"),
        F.when(is_err, null_s)
        .when(is_p & (F.pmod("user_id", F.lit(2)) == 0), null_s)
        .otherwise(role).alias("role"),
        F.when(is_err, null_s)
        .when(is_p & (F.pmod("event_id", F.lit(5)) == 0), null_s)
        .otherwise(F.col("props")).alias("text"),
        F.when(is_err, null_s).otherwise(F.col("event_type")).alias("tool"),
    )


@register(
    "engine_patch_apply",
    # same final state as the standalone operator: the fold is
    # arrival-order free, so chunking + compaction must not change it
    sql=None,  # filled in right below from partial_update_state's oracle
    doc="Partial-update merge through the REAL engine "
        "(merge_engine='partial_update'): the patch stream replays in two "
        "windows through CdcApplier into a patch table — full-write "
        "winners plus per-event patch rows carrying the hidden _wr "
        "per-column writer-rank struct — with a full compaction between "
        "the windows, so window 2's patches and deletes resolve against "
        "COMPACTED rows purely via the preserved writer ranks. The "
        "DuckDB oracle is the operator entry's one-shot fold "
        "(partial_update_state): equality proves chunk boundaries, "
        "compaction and arrival order are invisible to patch semantics. "
        "tests/test_patch_table.py pins the out-of-order edges "
        "(late patch after compaction, late delete, post-death patches, "
        "orphan patches before a late creation).",
)
def engine_patch_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_patch_")
    stream = _patch_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(
        spark, scratch, bucket_count=8,
        target_props={"merge_engine": "partial_update"},
    )
    applier.replay(stream, chunk_size=hi + 1, source_hi=hi // 2)
    applier.target.compact()
    applier.replay(stream, chunk_size=hi + 1)
    return _materialize_and_clean(applier.target.read(), scratch)


# the engine entry's oracle IS the operator entry's: one-shot fold
REGISTRY["engine_patch_apply"].sql = REGISTRY["partial_update_state"].sql


def _first_row_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic I/U/D change stream from `events` for the first_row
    engine (the D rows exist to prove delete-rejection leaves state
    untouched)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
        .alias("op"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.format_string("u%04d", "user_id").alias("conv_id"),
        F.pmod("event_id", F.lit(29)).cast("int").alias("turn_idx"),
        F.when(F.col("event_type") == "purchase", "assistant")
        .otherwise("user")
        .alias("role"),
        F.col("props").alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )


_FIRST_ROW_SQL = """
    WITH ch AS (
        SELECT event_id AS lsn,
               CAST(ts AS TIMESTAMP) AS ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 29 AS INTEGER) AS turn_idx,
               CASE WHEN event_type = 'purchase' THEN 'assistant'
                    ELSE 'user' END AS role,
               props AS text,
               CAST(NULL AS VARCHAR) AS tool
        FROM events WHERE event_type <> 'error'
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts ASC, lsn ASC
        ) AS rn FROM ch
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, lsn
    FROM ranked WHERE rn = 1
"""


@register(
    "first_row_state",
    sql=_FIRST_ROW_SQL,
    doc="First-writer-wins dedup (the first_row merge rule standalone): "
        "one row per key = MIN over (ts, lsn) via map-side-combinable "
        "min_by — same one-aggregation shape as LWW, composition "
        "properties identical. DuckDB oracle is the independent "
        "row_number-ASC formulation.",
)
def first_row_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cdc.dedup import lww_dedup

    stream = _first_row_change_stream(spark, sf_dir).where(F.col("op") != "D")
    won = lww_dedup(stream, keep="first")
    return won.select("conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn")


@register(
    "engine_first_row_apply",
    sql=_FIRST_ROW_SQL,
    doc="first_row merge through the REAL engine "
        "(merge_engine='first_row', Paimon first-row parity): the stream "
        "replays in two windows through CdcApplier — FWW chunk pre-folds, "
        "MOR delta layers, deletes quarantined "
        "(delete_unsupported_first_row) — with a full compaction between "
        "the windows exercising the zero-shuffle local Arrow rewrite's "
        "first-of-run branch at the driver. Oracle = the standalone "
        "one-shot fold: chunking, compaction and arrival order must be "
        "invisible. tests/test_first_row.py pins the out-of-order and "
        "redelivery edges.",
)
def engine_first_row_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_frow_")
    stream = _first_row_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(
        spark, scratch, bucket_count=8,
        target_props={"merge_engine": "first_row"},
    )
    applier.replay(stream, chunk_size=hi + 1, source_hi=hi // 2)
    applier.target.compact()
    applier.replay(stream, chunk_size=hi + 1)
    return _materialize_and_clean(applier.target.read(), scratch)


# --------------------------------------------------------------------------
# Multi-table CDC routing (cdc/router.py): one multiplexed change stream ->
# two heterogeneous lake tables, each with its own offsets — Debezium
# topic-per-table / Paimon database-sync combined mode; the reference's
# one-cron-per-feed fleet (FAIMMS vs ANMN: same loop, different table) as
# one job.
# --------------------------------------------------------------------------

_MUX_ROUTE_SQL = """
    WITH src AS (
        SELECT event_id AS lsn,
               CASE WHEN event_id % 17 = 0 THEN 'D' ELSE 'U' END AS op,
               ts,
               CASE WHEN event_id % 2 = 0 THEN 'conv' ELSE 'metric' END AS tbl,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               props AS text,
               printf('s%02d', user_id % 50) AS site,
               CAST(event_id % 101 AS INTEGER) AS obs_idx,
               value AS temperature
        FROM events
    ), conv_ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM src WHERE tbl = 'conv'
    ), conv_final AS (
        SELECT 'conv' AS tbl, conv_id AS k1, CAST(turn_idx AS VARCHAR) AS k2,
               text, CAST(NULL AS DOUBLE) AS temperature, ts, lsn
        FROM conv_ranked WHERE rn = 1 AND op <> 'D'
    ), metric_ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY site, obs_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM src WHERE tbl = 'metric'
    ), metric_final AS (
        SELECT 'metric' AS tbl, site AS k1, CAST(obs_idx AS VARCHAR) AS k2,
               CAST(NULL AS VARCHAR) AS text, temperature, ts, lsn
        FROM metric_ranked WHERE rn = 1 AND op <> 'D'
    )
    SELECT * FROM conv_final UNION ALL SELECT * FROM metric_final
"""


@register(
    "engine_multi_table_route",
    sql=_MUX_ROUTE_SQL,
    doc="Multi-table CDC routing through the REAL engine (cdc/router.py): "
        "one multiplexed change stream (even lsn -> a transcripts-keyed "
        "'conv' table, odd -> a sensor-keyed 'metric' table, columns the "
        "UNION of both schemas) fans out via pushed-down table filters to "
        "two independent CdcApplier universes, replayed in chunks with "
        "per-table offsets. Oracle = per-table LWW folds unioned: routing, "
        "chunking and the shared stream must be invisible in each table's "
        "final state. tests/test_router.py pins resume independence and "
        "staged partition pruning.",
)
def engine_multi_table_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from .cdc.router import CdcRouter, TableSpec

    ev = load(spark, sf_dir, "events")
    stream = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.pmod("event_id", F.lit(17)) == 0, "D").otherwise("U").alias("op"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(F.pmod("event_id", F.lit(2)) == 0, "conv")
        .otherwise("metric").alias("_table"),
        F.format_string("u%04d", "user_id").alias("conv_id"),
        F.pmod("event_id", F.lit(37)).cast("int").alias("turn_idx"),
        F.col("props").alias("text"),
        F.format_string("s%02d", F.pmod("user_id", F.lit(50))).alias("site"),
        F.pmod("event_id", F.lit(101)).cast("int").alias("obs_idx"),
        F.col("value").alias("temperature"),
    )
    conv_schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("lsn", T.LongType(), True),
    ])
    metric_schema = T.StructType([
        T.StructField("site", T.StringType(), False),
        T.StructField("obs_idx", T.IntegerType(), False),
        T.StructField("temperature", T.DoubleType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("lsn", T.LongType(), True),
    ])
    scratch = tempfile.mkdtemp(prefix="q_route_")
    router = CdcRouter.bootstrap(
        spark, scratch,
        {
            "conv": TableSpec(conv_schema, ["conv_id", "turn_idx"], bucket_count=8),
            "metric": TableSpec(metric_schema, ["site", "obs_idx"], bucket_count=8),
        },
    )
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    router.replay(stream, chunk_size=max(1, (hi + 1) // 2 + 1))
    conv = router.appliers["conv"].target.read().select(
        F.lit("conv").alias("tbl"),
        F.col("conv_id").alias("k1"),
        F.col("turn_idx").cast("string").alias("k2"),
        "text",
        F.lit(None).cast("double").alias("temperature"),
        "ts", "lsn",
    )
    metric = router.appliers["metric"].target.read().select(
        F.lit("metric").alias("tbl"),
        F.col("site").alias("k1"),
        F.col("obs_idx").cast("string").alias("k2"),
        F.lit(None).cast("string").alias("text"),
        "temperature", "ts", "lsn",
    )
    return _materialize_and_clean(conv.unionByName(metric), scratch)


@register(
    "engine_merge_into",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), t0r AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes WHERE lsn % 2 = 0
    ), t0 AS (
        SELECT conv_id, turn_idx, role, text, tool, ts, lsn
        FROM t0r WHERE rn = 1 AND op <> 'D'
    ), srcr AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes WHERE lsn % 2 = 1
    ), src AS (
        SELECT conv_id, turn_idx, role, text, tool, ts, lsn
        FROM srcr WHERE rn = 1
    ),
    matched_upd AS (
        SELECT t.conv_id, t.turn_idx, s.role, s.text, s.tool,
               greatest(s.ts, t.ts) AS ts,
               greatest(s.lsn, t.lsn + 1) AS lsn
        FROM t0 t JOIN src s
          ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHERE s.tool <> 'error'
    ),
    inserts AS (
        SELECT s.* FROM src s
        WHERE NOT EXISTS (
            SELECT 1 FROM t0 t
            WHERE t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx)
    ),
    kept AS (
        SELECT t.* FROM t0 t
        WHERE NOT EXISTS (
            SELECT 1 FROM src s
            WHERE t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx)
    )
    SELECT * FROM matched_upd
    UNION ALL SELECT * FROM inserts
    UNION ALL SELECT * FROM kept
    """,
    doc="SQL MERGE INTO through the REAL engine (LakeTable.merge_into — "
        "Delta/Iceberg MERGE semantics over the bucket-pruned CoW path): "
        "the even-lsn half of the stream seeds the target; the odd half, "
        "LWW-collapsed to one row per key, merges with WHEN MATCHED AND "
        "tool='error' DELETE / WHEN MATCHED UPDATE SET * / WHEN NOT "
        "MATCHED INSERT. Updated/deleted rows take the batch-wins "
        "dominance stamp (greatest ts, max(lsn, current+1)) so the merge "
        "overwrites regardless of event-time order while staying an "
        "ordinary event in the LWW order. Oracle = the three-branch "
        "FULL-OUTER decomposition in DuckDB. tests/test_merge_into.py "
        "pins dominance, durable merge-deletes, re-insert through a "
        "tombstone, update-only mode and the multiple-match guard.",
)
def engine_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.dedup import lww_dedup
    from .cdc.schemas import KEY_COLS, ORDER_COLS, TRANSCRIPTS_SCHEMA
    from .lake.table import LakeTable

    scratch = tempfile.mkdtemp(prefix="q_merge_")
    stream = _engine_change_stream(spark, sf_dir)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]
    t0 = (
        lww_dedup(stream.where(F.pmod("lsn", F.lit(2)) == 0),
                  keys=KEY_COLS, order=ORDER_COLS)
        .where(F.col("op") != "D").select(*cols)
    )
    src = (
        lww_dedup(
            stream.where(F.pmod("lsn", F.lit(2)) == 1),
            keys=KEY_COLS, order=ORDER_COLS,
        ).select(*cols)
    )
    target = LakeTable.create(
        spark, f"{scratch}/t", TRANSCRIPTS_SCHEMA, KEY_COLS, 8,
        props={"merge_keys": KEY_COLS, "order_cols": ORDER_COLS},
    )
    target.append(t0)
    target.merge_into(
        src, update_set="all", delete_when="s.tool = 'error'")
    return _materialize_and_clean(target.read().select(*cols), scratch)


@register(
    "engine_gdpr_erase",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, lsn
    FROM ranked
    WHERE rn = 1 AND op <> 'D'
      AND conv_id NOT IN ('u0007', 'u0013')
    """,
    doc="Right-to-be-forgotten sweep through the REAL engine "
        "(LakeTable.erase + CdcApplier.erase_subject): after the full "
        "replay, two conversations are erased — affected buckets rewritten "
        "copy-on-write without the rows, payload-free tombstones planted "
        "at (erased row's ts, lsn+1) — then a straggler chunk redelivers "
        "STALE events (older event time, higher lsn) for the erased "
        "subjects, which the tombstones must repel. Oracle = the LWW fold "
        "excluding the erased conversations (the stale stragglers lose "
        "the LWW race everywhere else too). tests/test_erase.py pins the "
        "physical byte-removal, quarantine purge, and the "
        "block-the-past/allow-the-future contract.",
)
def engine_gdpr_erase(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_erase_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(stream, chunk_size=hi + 1)
    applier.erase_subject({"conv_id": ["u0007", "u0013"]})
    # straggler chunk: STALE data for the erased subjects — strictly older
    # event times under fresh transport LSNs — must bounce off the
    # tombstones. (An equal-or-newer event time would legitimately win:
    # LWW cannot, and should not, distinguish it from a new write.)
    stale = (
        stream.where(F.col("conv_id").isin("u0007", "u0013"))
        .withColumn("lsn", F.col("lsn") + F.lit(hi) + 1)
        .withColumn("ts", F.col("ts") - F.expr("INTERVAL 365 DAYS"))
    )
    applier.replay(stale, chunk_size=10**12)
    return _materialize_and_clean(applier.target.read(), scratch)


@register(
    "engine_branch_backfill",
    sql=_engine_lww_oracle(_ROLE_CASE),
    doc="Branch refs through the REAL engine (LakeTable branches — "
        "Iceberg/Paimon branch parity): the first half of the stream "
        "lands on main, a 'backfill' branch forks at that head, the "
        "SECOND half replays through a CdcApplier opened ON the branch "
        "(commits + offsets advance the branch ref; main's head and "
        "offsets stay put), then fast_forward merges main to the branch "
        "head — one metadata flip, no data copied. Oracle = one LWW pass "
        "over all events: forking, branch-side replay and the "
        "fast-forward must be invisible in the final state. "
        "tests/test_branches.py pins isolation, divergence refusal, "
        "ancestry-pinned expiry and DAG-global id allocation.",
)
def engine_branch_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_branch_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(stream, chunk_size=hi + 1, source_hi=hi // 2)
    src = applier.target
    main_head = src.current_snapshot_id()
    src.create_branch("backfill")
    b_applier = CdcApplier(
        spark, src.branch_table("backfill"),
        with_lineage=False, compact_threshold=16,
    )
    b_applier.replay(stream, chunk_size=hi + 1)
    if src.current_snapshot_id() != main_head:  # isolation invariant
        raise AssertionError("branch replay moved main's head")
    src.fast_forward("backfill")
    return _materialize_and_clean(src.read(), scratch)


@register(
    "engine_consumer_mirror",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    doc="Consumer-group changelog subscription through the REAL engine "
        "(LakeTable.register_consumer/consume/ack_consumer — Paimon "
        "consumer-id parity): the stream replays into a source table in "
        "two windows; after each window a registered consumer reads its "
        "pending changelog (changes_between from its metadata-held "
        "position) and applies it to a MIRROR table as one epoch, then "
        "acks. Returned rows are the MIRROR's final state (lsn excluded: "
        "the changelog assigns transport LSNs); oracle = one LWW pass "
        "over all events — two consume/ack hops must lose nothing. "
        "tests/test_consumers.py pins the at-least-once handshake, lag "
        "retention through expiry, and zombie-ack rejection.",
)
def engine_consumer_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier
    from .cdc.schemas import KEY_COLS, ORDER_COLS, TRANSCRIPTS_SCHEMA
    from .lake.table import LakeTable

    scratch = tempfile.mkdtemp(prefix="q_consumer_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    src_applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    src = src_applier.target
    mirror = LakeTable.create(
        spark, f"{scratch}/mirror", TRANSCRIPTS_SCHEMA, KEY_COLS, 8,
        props={"merge_keys": KEY_COLS, "order_cols": ORDER_COLS},
    )
    src.register_consumer("mirror")  # at the empty bootstrap snapshot

    def sync() -> None:
        ch, to_id = src.consume("mirror")
        applier = CdcApplier(
            spark, mirror, with_lineage=False, compact_threshold=None)
        cols = [f.name for f in TRANSCRIPTS_SCHEMA.fields]
        applier.apply_chunk(
            ch.select(*cols, "op"), lo=-1, hi=None,
            batch_id=to_id, epoch=to_id,
        )
        src.ack_consumer("mirror", to_id)

    src_applier.replay(stream, chunk_size=hi + 1, source_hi=hi // 2)
    sync()
    src_applier.replay(stream, chunk_size=hi + 1)
    sync()
    out = mirror.read().select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts")
    return _materialize_and_clean(out, scratch)


@register(
    "engine_zorder_scan",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    ), final AS (
        SELECT conv_id, turn_idx, role, text, tool, ts, lsn
        FROM ranked WHERE rn = 1 AND op <> 'D'
    )
    SELECT * FROM final
    WHERE ts >= (SELECT min(ts) FROM final)
      AND ts <= (SELECT min(ts) + INTERVAL 10 DAY FROM final)
      AND turn_idx BETWEEN 5 AND 20
    """,
    doc="Z-order clustered rewrite through the REAL engine "
        "(rewrite_clustered — Iceberg rewrite_data_files zorder / Delta "
        "OPTIMIZE ZORDER BY): after replay, each bucket's rows rewrite in "
        "Morton order of (ts, turn_idx) and range-split into z-prefix "
        "band files, so the manifest's per-file bounds are tight on BOTH "
        "dimensions and a two-dimensional window read "
        "(read(prune={ts, turn_idx})) skips most files driver-side "
        "before the scan. The oracle filters the full LWW state in SQL — "
        "equality proves pruning is an optimization, never a semantic. "
        "tests/test_zorder.py pins the skip ratio (a 2-D window on the "
        "key-ordered layout opens 100% of files, under 50% on the z "
        "layout), tombstone durability through the rewrite, and offset "
        "carry-forward.",
)
def engine_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_zorder_")
    stream = _engine_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    applier = CdcApplier.bootstrap(spark, scratch, bucket_count=8)
    applier.replay(stream, chunk_size=max(1, (hi + 1) // 2 + 1))
    applier.target.rewrite_clustered(["ts", "turn_idx"], files_per_bucket=8)
    lo_ts = applier.target.read().agg(F.min("ts")).collect()[0][0]
    out = applier.target.read(prune={
        "ts": (lo_ts, lo_ts + _dt.timedelta(days=10)),
        "turn_idx": (5, 20),
    })
    return _materialize_and_clean(out, scratch)


# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Multi-agg GROUP BY (TPC-H Q1 shape; SQL-view agg mirror "
        "report_db.anmn_deployments_view.sql:6-33).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    sql="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="3-way join + agg + deterministic top-k (sort/limit, SURVEY §2.6).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_revenue_by_nation",
    sql="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="Multi-join star query; small dims broadcast (vocab-join mirror "
        "lib/python/ship_callsign.py:52-60).",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dims = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "conditional_agg_orders",
    sql="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           round(sum(CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0 END), 2) AS big_total,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Conditional aggregation + min/max extents "
        "(report_db.anmn_deployments_view.sql:6-33: sum((file_version='0')::int)).",
)
def conditional_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.round(F.sum(F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).otherwise(0.0)), 2).alias("big_total"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@register(
    "reagg_percent_segment",
    sql="""
    WITH per_cust AS (
        SELECT c_custkey, c_mktsegment,
               count(o_orderkey) AS n_orders,
               coalesce(max(o_totalprice), 0) AS max_price
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment
    )
    SELECT c_mktsegment,
           count(*) AS n_customers,
           round(avg(n_orders), 4) AS avg_orders,
           round(100.0 * sum(CASE WHEN max_price > 100000 THEN 1 ELSE 0 END) / count(*), 2) AS pct_big
    FROM per_cust GROUP BY c_mktsegment
    """,
    doc="CTE re-aggregation with derived percent "
        "(report_db.anmn_datastreams_view.sql:6-33).",
)
def reagg_percent_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.max("o_totalprice"), F.lit(0.0)).alias("max_price"),
        )
    )
    return per_cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.avg("n_orders"), 4).alias("avg_orders"),
        F.round(
            100.0 * F.sum(F.when(F.col("max_price") > 100000, 1).otherwise(0)) / F.count("*"), 2
        ).alias("pct_big"),
    )


@register(
    "having_active_users",
    sql="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id HAVING count(*) > 80
    """,
    doc="HAVING filter (reports/anmn_platforms_with_no_new_data.sql:3-8).",
)
def having_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .where(F.col("n_events") > 80)
    )


@register(
    "union_bool_or_flags",
    sql="""
    WITH u AS (
        SELECT user_id, value, 'click' AS src FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, value, 'purchase' AS src FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           bool_or(value > 15) AS any_big,
           CAST(sum(CASE WHEN src = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           count(*) AS n_total
    FROM u GROUP BY user_id
    """,
    doc="UNION ALL + bool_or flags (anmn.nrs_zoo_view.sql:3-28; "
        "reports/anmn_deployments_with_new_data.sql:1-8).",
)
def union_bool_or_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "value", F.lit("click").alias("src"))
    purch = ev.where(F.col("event_type") == "purchase").select("user_id", "value", F.lit("purchase").alias("src"))
    return (
        clicks.unionByName(purch)
        .groupBy("user_id")
        .agg(
            F.bool_or(F.col("value") > 15).alias("any_big"),
            F.sum(F.when(F.col("src") == "purchase", 1).otherwise(0)).alias("n_purchase"),
            F.count("*").alias("n_total"),
        )
    )


@register(
    "chunked_batching",
    sql="""
    WITH numbered AS (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        FROM lineitem
    )
    SELECT CAST(floor((rn - 1) / 4096) AS BIGINT) AS chunk_id,
           count(*) AS n_rows,
           min(l_orderkey) AS min_key,
           max(l_orderkey) AS max_key,
           round(sum(l_extendedprice), 2) AS chunk_value
    FROM numbered GROUP BY 1
    """,
    doc="Fixed-size manifest chunking <=4096 rows per commit batch "
        "(faimms.py:356-366; anmn_nrs_aims.py:491-497). The global row "
        "number is computed DISTRIBUTED via the same range-partition -> "
        "local row_number -> broadcast-offset plan as the snapshot-diff "
        "LSN assigner — no single-partition Window.orderBy anywhere in "
        "the registry. (The production path chunks by LSN ranges, "
        "cdc/planner.py, which needs no numbering at all.)",
)
def chunked_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.change_capture import _assign_dense_lsn

    li = load(spark, sf_dir, "lineitem")
    return (
        _assign_dense_lsn(
            li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
            ["l_orderkey", "l_linenumber"],
            lsn_start=1,
        )
        .withColumnRenamed("lsn", "rn")
        .withColumn("chunk_id", F.floor((F.col("rn") - 1) / 4096).cast("long"))
        .groupBy("chunk_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
            F.round(F.sum("l_extendedprice"), 2).alias("chunk_value"),
        )
    )


# --------------------------------------------------------------------------
# Windows (SURVEY §2.5)
# --------------------------------------------------------------------------

@register(
    "window_lww_latest_event",
    sql="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="row_number window dedup — the literal north-star LWW window "
        "(bom/wfs.py:100-112).",
)
def window_lww_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@register(
    "forward_fill_events",
    sql="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
    FROM events
    """,
    doc="Forward fill via last(ignorenulls) over unbounded-preceding frame "
        "(auv_processing.py:452-459: missing track info <- previous row).",
)
def forward_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(
        F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
    ).over(w)
    return ev.select("event_id", "user_id", "ts", filled.alias("last_purchase_value"))


@register(
    "lag_runlength_mask",
    sql="""
    SELECT event_id, user_id, event_type
    FROM (
        SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ) WHERE event_type = prev_type
    """,
    doc="Lag-based run-length mask: rows repeating the previous row's value "
        "(qld_data_parser.py:197-208).",
)
def lag_runlength_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("event_type") == F.col("prev_type"))
        .select("event_id", "user_id", "event_type")
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# --------------------------------------------------------------------------

@register(
    "anti_join_inactive_customers",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders
        WHERE o_custkey IS NOT NULL
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
    doc="Anti-join reconciliation: customers with no recent orders — present "
        "on one side, missing in the DB (ACORN/hfradar.sh:149-174).",
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "semi_join_active_customers",
    sql="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    doc="Semi-join reconciliation (ACORN/hfradar.sh:176-183).",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_acctbal"
    )


@register(
    "asof_join_purchase_click",
    sql="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         pairs AS (
            SELECT p.event_id AS purchase_id, p.ts AS purchase_ts,
                   c.ts AS click_ts, c.event_id AS click_id, c.value AS click_value
            FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
         ),
         best_ts AS (
            SELECT purchase_id, max(click_ts) AS click_ts FROM pairs GROUP BY 1
         ),
         best AS (
            SELECT pr.purchase_id, pr.click_ts, max(pr.click_id) AS click_id
            FROM best_ts b JOIN pairs pr
              ON pr.purchase_id = b.purchase_id AND pr.click_ts = b.click_ts
            GROUP BY 1, 2
         )
    SELECT b.purchase_id, b.click_ts, b.click_id,
           round(max(pr.click_value), 2) AS click_value
    FROM best b JOIN pairs pr
      ON pr.purchase_id = b.purchase_id AND pr.click_id = b.click_id
    GROUP BY 1, 2, 3
    """,
    doc="As-of join (nearest click at-or-before each purchase). Spark side "
        "is the scale-correct union+sort+forward-fill formulation — one "
        "shuffle, no inequality join (auv_processing.py:468-497); the oracle "
        "deliberately uses the O(n^2) inequality-join formulation for "
        "independence.",
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("click", "purchase")).withColumn(
        "tag", F.when(F.col("event_type") == "click", 0).otherwise(1)
    )
    # clicks sort before purchases at equal ts => "at or before" semantics;
    # among equal-ts clicks the largest event_id wins (matches oracle tiebreak)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_struct = F.last(
        F.when(F.col("tag") == 0, F.struct("ts", "event_id", "value")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("_c", click_struct)
        .where((F.col("tag") == 1) & F.col("_c").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("_c.ts").alias("click_ts"),
            F.col("_c.event_id").alias("click_id"),
            F.round(F.col("_c.value"), 2).alias("click_value"),
        )
    )


@register(
    "interval_containment_join",
    sql="""
    SELECT a.o_orderkey AS first_order, b.o_orderkey AS followup_order
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND b.o_orderdate > a.o_orderdate
     AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
    """,
    doc="Interval-containment join: follow-up orders within a 30-day window "
        "of an earlier order, equi-join on key + range predicate "
        "(wave_parser.py:288-312: file extent within deployment interval).",
)
def interval_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    a = o.alias("a")
    b = o.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("b.o_orderdate") > F.col("a.o_orderdate"))
        & (F.col("b.o_orderdate") <= F.col("a.o_orderdate") + F.expr("INTERVAL 30 DAYS")),
    ).select(
        F.col("a.o_orderkey").alias("first_order"),
        F.col("b.o_orderkey").alias("followup_order"),
    )


# --------------------------------------------------------------------------
# Projections / filters / set ops / scalars (SURVEY §2.2, §2.7, §2.8)
# --------------------------------------------------------------------------

@register(
    "predicate_pushdown_projection",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 250000
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    doc="Conjunctive predicate + narrow projection, pushed to the parquet "
        "scan (geoserver_catalog.py:54-106 filter->project url).",
)
def predicate_pushdown_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_totalprice") > 250000)
        & (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_totalprice")


@register(
    "distinct_projection",
    sql="SELECT DISTINCT p_brand, p_type FROM part",
    doc="DISTINCT projection (report_db.anmn_files_view.sql:6; hfradar.sh:275-284).",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "part").select("p_brand", "p_type").distinct()


@register(
    "regex_extract_projection",
    sql="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           CASE WHEN p_type LIKE '%BRUSHED%' THEN 'brushed' ELSE 'other' END AS finish
    FROM part
    """,
    doc="Regex extraction projection (anmn_files_view.sql:7-17 substring-from-regex).",
)
def regex_extract_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head"),
        F.when(F.col("p_type").like("%BRUSHED%"), "brushed").otherwise("other").alias("finish"),
    )


@register(
    "set_except_intersect",
    sql="""
    SELECT user_id, 'click_only' AS bucket FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT user_id, 'both' AS bucket FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    doc="EXCEPT / INTERSECT reconciliation (hfradar.sh:166-183; "
        "xbt_dm_imos_conversion.py:308 set &).",
)
def set_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.where("event_type = 'click'").select("user_id")
    purch = ev.where("event_type = 'purchase'").select("user_id")
    # SQL EXCEPT is set-semantics: dedup first, then anti-join
    # (exceptAll would keep multiplicity differences — wrong semantics here)
    only = (
        clicks.distinct()
        .join(purch.distinct(), "user_id", "left_anti")
        .withColumn("bucket", F.lit("click_only"))
    )
    both = clicks.intersect(purch).withColumn("bucket", F.lit("both"))
    return only.unionByName(both)


@register(
    "scalar_datetime_kitchen",
    sql="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS order_month,
           CAST(date_part('year', o_orderdate) AS BIGINT) AS order_year,
           greatest(o_orderdate, TIMESTAMP '1996-06-01 00:00:00') AS clamped,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_epoch95,
           concat('P-', CAST(o_orderkey % 100 AS VARCHAR)) AS tag
    FROM orders WHERE o_orderkey % 97 = 0
    """,
    doc="Scalar date/time + string kitchen: date_trunc/date_part/greatest/"
        "datediff/concat (anmn_files_view.sql:24-39; aims monthly ranges "
        "aims_realtime_util.py:330-350).",
)
def scalar_datetime_kitchen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.greatest("o_orderdate", F.lit("1996-06-01 00:00:00").cast("timestamp")).alias("clamped"),
        F.datediff("o_orderdate", F.lit("1995-01-01 00:00:00").cast("timestamp")).cast("long").alias("days_since_epoch95"),
        F.concat(F.lit("P-"), (F.col("o_orderkey") % 100).cast("string")).alias("tag"),
    )


@register(
    "monotonicity_violations_value",
    sql="""
    SELECT user_id, count(*) AS n_drops
    FROM (
        SELECT user_id, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        FROM events WHERE event_type = 'view'
    ) WHERE value < prev_value
    GROUP BY user_id
    """,
    doc="Monotonicity audit per key (strictly_increasing / is_time_monotonic, "
        "aims_realtime_util.py:611-622) — count of decreasing steps.",
)
def monotonicity_violations_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where("event_type = 'view'")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_value", F.lag("value").over(w))
        .where(F.col("value") < F.col("prev_value"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_drops"))
    )


# --------------------------------------------------------------------------
# Training-data operators (dedup / similarity / text analysis / multimodal)
# --------------------------------------------------------------------------

@register(
    "dedup_exact_documents",
    sql="""
    SELECT md5(text) AS text_md5,
           min(doc_id) AS representative_id,
           count(*) AS n_dupes
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup by content hash (md5 idiom, faimms.py:114-120).",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_dedup import exact_dedup

    return exact_dedup(load(spark, sf_dir, "documents"))


@register(
    "ngram_jaccard_pairs",
    sql="""
    WITH t AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents
    ), tok AS (
        SELECT doc_id, len(w) AS sz, unnest(w) AS tkn FROM t
    ), dfreq AS (
        SELECT tkn, count(*) AS dfc FROM tok GROUP BY tkn
    ), ranked AS (
        SELECT tok.doc_id, tok.sz, tok.tkn,
               row_number() OVER (PARTITION BY tok.doc_id
                                  ORDER BY dfreq.dfc, tok.tkn) AS rn
        FROM tok JOIN dfreq USING (tkn)
    ), prefix AS (
        SELECT doc_id, sz, tkn FROM ranked
        WHERE rn <= sz - ceil(sz * 0.9 - 1e-9) + 1
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM prefix a JOIN prefix b
          ON a.tkn = b.tkn AND a.doc_id < b.doc_id
         AND CAST(least(a.sz, b.sz) AS DOUBLE)
             >= greatest(a.sz, b.sz) * 0.9 - 1e-9
    )
    SELECT c.doc_a, c.doc_b,
           round(CAST(len(list_intersect(ta.w, tb.w)) AS DOUBLE)
                 / len(list_distinct(list_concat(ta.w, tb.w))), 6) AS jaccard
    FROM cand c
    JOIN t ta ON ta.doc_id = c.doc_a
    JOIN t tb ON tb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(ta.w, tb.w)) AS DOUBLE)
          / len(list_distinct(list_concat(ta.w, tb.w))) >= 0.9
    """,
    doc="EXACT corpus-wide word-set Jaccard pairs via AllPairs/PPJoin "
        "prefix filtering — candidates join on each doc's rarest tokens, "
        "no corpus-quadratic block join.",
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.9)


@register(
    "minhash_lsh_candidates",
    sql=None,  # signature hashes aren't SQL-portable; verified in pytest
    doc="MinHash+LSH near-dup candidates (banding), exact-Jaccard verified. "
        "Rows-only driver check; pytest asserts recall vs brute-force pairs.",
)
def minhash_lsh_candidates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(load(spark, sf_dir, "documents"), jaccard_threshold=0.5)


@register(
    "simhash_buckets",
    sql=None,  # pandas-UDF bit arithmetic; pytest covers determinism
    doc="SimHash (vectorized Arrow pandas UDF) + prefix-bit bucketing.",
)
def simhash_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_dedup import simhash_buckets

    return simhash_buckets(load(spark, sf_dir, "documents"))


@register(
    "cosine_topk_embeddings",
    sql="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), n AS (
        SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    ), pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS sim
        FROM n a JOIN n b ON a.vec_id <> b.vec_id
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
    FROM ranked WHERE rank <= 3
    """,
    doc="Brute-force cosine top-k ANN baseline (zip_with dot products, "
        "precomputed norms).",
)
def cosine_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_topk

    return cosine_topk(load(spark, sf_dir, "embeddings"), k=3)


@register(
    "ann_lsh_topk",
    sql=None,  # approximate by construction; pytest measures recall
    doc="Multi-table hyperplane-LSH bucketed ANN (salted bucket caps, "
        "bucket-local partial top-k then exact merge) with DATA-CALIBRATED "
        "banding: (planes, tables) derived from the sampled kth-neighbor "
        "cosine, since fixed params keep <25% of true neighbors on "
        "near-random embeddings; recall vs brute force asserted in pytest.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import calibrate_ann_params, lsh_ann_topk

    emb = load(spark, sf_dir, "embeddings")
    b, t = calibrate_ann_params(emb, k=3, target_recall=0.9)
    return lsh_ann_topk(emb, k=3, n_planes=b, n_tables=t, dim=64)


@register(
    "lang_id_documents",
    sql="""
    SELECT doc_id,
      CASE
        WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
        WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de THEN 'en'
        WHEN h_es >= h_fr AND h_es >= h_de THEN 'es'
        WHEN h_fr >= h_de THEN 'fr'
        ELSE 'de'
      END AS lang_pred,
      h_en AS hits_en, h_es AS hits_es, h_fr AS hits_fr, h_de AS hits_de
    FROM (
      SELECT doc_id, text,
        len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b', 1)) AS h_en,
        len(regexp_extract_all(lower(text), '\\b(el|la|de|que|los)\\b', 1)) AS h_es,
        len(regexp_extract_all(lower(text), '\\b(le|la|les|et|des)\\b', 1)) AS h_fr,
        len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b', 1)) AS h_de
      FROM documents
    )
    """,
    doc="Heuristic language ID via marker-word counts (stopword n-gram "
        "heuristic; deterministic tie priority).",
)
def lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_analysis import lang_id

    return lang_id(load(spark, sf_dir, "documents"))


@register(
    "token_count_documents",
    sql="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
           len(regexp_extract_all(text, '([A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s])', 1)) AS n_subwords
    FROM documents
    """,
    doc="Whitespace token count + BPE-ish subword estimate (regex pieces).",
)
def token_count_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_analysis import token_count

    return token_count(load(spark, sf_dir, "documents"))


@register(
    "quality_score_documents",
    sql="""
    SELECT doc_id,
           n_chars_computed, n_words, punct_ratio, stopword_ratio, avg_word_len,
           CAST(floor((least(n_words / 64.0, 1.0) * 0.5
                 + least(stopword_ratio * 4, 1.0) * 0.3
                 + (1.0 - least(punct_ratio * 10, 1.0)) * 0.2) * 1000000)
                AS BIGINT) AS quality_score_x1e6
    FROM (
      SELECT doc_id,
             length(text) AS n_chars_computed,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
             round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                   / greatest(length(text), 1), 6) AS punct_ratio,
             round(len(regexp_extract_all(lower(text),
                       '\\b(the|a|and|of|to|in|is|it|for|on)\\b', 1))
                   / greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1), 6)
               AS stopword_ratio,
             round((length(text) - (len(list_filter(string_split(text, ' '), x -> x <> '')) - 1))
                   / greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1), 6)
               AS avg_word_len
      FROM documents
    )
    """,
    doc="Quality scoring: length/punct/stopword ratios -> composite score.",
)
def quality_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_analysis import quality_score

    return quality_score(load(spark, sf_dir, "documents"))


@register(
    "fingerprint_documents",
    sql="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp_md5,
           CAST(floor(length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) / 64)
                AS BIGINT) AS len_bucket
    FROM documents
    """,
    doc="Document fingerprint: md5 of normalized text + length bucket "
        "(md5-golden idiom, faimms.py:286-294).",
)
def fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_analysis import fingerprint

    return fingerprint(load(spark, sf_dir, "documents"))


@register(
    "multimodal_features",
    sql="""
    WITH d AS (SELECT doc_id FROM documents),
    vals AS (
        SELECT d.doc_id AS media_id, 'audio' AS kind,
               CAST(44 + 2 * (200 + d.doc_id % 57) AS INTEGER) AS n_bytes,
               'wav/pcm16' AS decoder,
               abs(((d.doc_id * 31 + g.i * 7) % 256) - 128) % 8 AS bin
        FROM d, generate_series(0, 500) g(i)
        WHERE d.doc_id % 3 = 1 AND g.i < 200 + d.doc_id % 57
        UNION ALL
        SELECT d.doc_id, 'image',
               CAST(13 + 3 * (8 + d.doc_id % 9) * (6 + d.doc_id % 5)
                    AS INTEGER),
               'ppm/p6',
               ((d.doc_id * 13 + g.j * 5) % 256) % 8
        FROM d, generate_series(0, 500) g(j)
        WHERE d.doc_id % 3 = 0
          AND g.j < 3 * (8 + d.doc_id % 9) * (6 + d.doc_id % 5)
        UNION ALL
        SELECT d.doc_id, 'video',
               CAST(256 + d.doc_id % 100 AS INTEGER),
               'fake/byte-histogram',
               ((d.doc_id * 17 + g.j * 3) % 256) % 8
        FROM d, generate_series(0, 500) g(j)
        WHERE d.doc_id % 3 = 2 AND g.j < 256 + d.doc_id % 100
    ),
    counts AS (
        SELECT media_id, kind, n_bytes, decoder, bin, count(*) AS c
        FROM vals GROUP BY ALL
    ),
    media AS (SELECT DISTINCT media_id, kind, n_bytes, decoder FROM vals),
    hist AS (
        SELECT m.media_id, m.kind, m.n_bytes, m.decoder, b.bin,
               COALESCE(c.c, 0) AS c
        FROM media m
        CROSS JOIN generate_series(0, 7) b(bin)
        LEFT JOIN counts c
          ON c.media_id = m.media_id AND c.bin = b.bin
    )
    SELECT media_id, kind, n_bytes, decoder,
           string_agg(CAST(c AS VARCHAR), ',' ORDER BY bin) AS hist_digest,
           CAST(sum(c * c) AS BIGINT) AS norm_sq
    FROM hist GROUP BY media_id, kind, n_bytes, decoder
    """,
    doc="Multimodal feature extraction with a REAL numeric oracle (closes "
        "the last rows-only stub): genuine PCM16 WAV / P6 PPM / raw-stream "
        "payloads are decoded by the from-spec stdlib parsers inside "
        "mapInPandas and binned into the operator's integer histogram "
        "(`hist`, the exact statistic behind the L2-normalized `feature` "
        "column); the DuckDB side recomputes every bin count from the "
        "series definitions via lateral generate_series. A decode, "
        "dispatch, binning, or batching bug turns the driver red. The "
        "normalized float feature is hist/||hist|| — pinned separately by "
        "tests/test_training_ops.py determinism checks.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import extract_features, synthesize_decodable_media

    media = synthesize_decodable_media(load(spark, sf_dir, "documents"))
    feats = extract_features(media)
    # Digest the exact integer histogram (the float feature is a trivial
    # normalization on top and can't be hash-compared across engines); the
    # driver's pandas canonicalizer sorts by every column, so array cells
    # project to a string digest + an integer norm.
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "decoder",
        F.concat_ws(",", F.col("hist").cast("array<string>")).alias(
            "hist_digest"
        ),
        F.aggregate(
            "hist",
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long") * x.cast("long"),
        ).alias("norm_sq"),
    )

# --------------------------------------------------------------------------
# Coverage additions (SURVEY §2 rows previously without registry entries)
# --------------------------------------------------------------------------

@register(
    "broadcast_vocab_join",
    sql="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           count(*) AS n_customers,
           round(avg(c.c_acctbal), 4) AS avg_acctbal
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Broadcast vocabulary/dimension lookup join (ship_callsign.py:52-60, "
        "platform_code_vocab.py:58-125): fact LEFT JOIN two tiny dims, both "
        "broadcast — no shuffle of the dims.",
)
def broadcast_vocab_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey, "left")
        .join(region, nation.n_regionkey == region.r_regionkey, "left")
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@register(
    "sentinel_normalization",
    sql="""
    SELECT event_type,
           count(*) AS n_events,
           count(CASE WHEN value IS NULL OR value < 0 THEN 1 END) AS n_fill,
           round(avg(CASE WHEN value IS NULL OR value < 0 THEN NULL
                          ELSE value END), 4) AS avg_clean
    FROM events
    GROUP BY event_type
    """,
    doc="Sentinel/fill-value normalization (qld_data_parser.py:173-194, "
        "process_MHLwave_from_txt.py:215): out-of-range sentinels -> NULL "
        "via when/otherwise before aggregating.",
)
def sentinel_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clean = F.when(F.col("value").isNull() | (F.col("value") < 0), None).otherwise(
        F.col("value")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("value").isNull() | (F.col("value") < 0), 1)).alias("n_fill"),
        F.round(F.avg(clean), 4).alias("avg_clean"),
    )


@register(
    "collect_list_catalog",
    sql="""
    SELECT source, lang,
           count(*) AS n_docs,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids_csv
    FROM documents
    GROUP BY source, lang
    """,
    doc="Grouped catalog records (oceancurrent_file_server_api.py:743-815, "
        "sortRecordings.py:36-49): groupBy + sorted collect_list rendered "
        "to a deterministic csv string.",
)
def collect_list_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")),
            ",",
        ).alias("doc_ids_csv"),
    )


@register(
    "avg_date_trunc_monthly",
    sql="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           count(*) AS n_orders,
           round(avg(o_totalprice), 4) AS avg_price,
           round(sum(o_totalprice), 2) AS month_revenue
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
    doc="AVG + date_trunc monthly rollup (anmn_all_deployments_with_data"
        ".sql:1-9): the reference's mean-processing-time report shape.",
)
def avg_date_trunc_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month")
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.sum("o_totalprice"), 2).alias("month_revenue"),
    )


@register(
    "month_range_delta_plan",
    sql="""
    SELECT o_custkey,
           unnest(generate_series(date_trunc('month', mn),
                                  date_trunc('month', mx),
                                  INTERVAL 1 MONTH)) AS batch_month
    FROM (
        SELECT o_custkey, min(o_orderdate) AS mn, max(o_orderdate) AS mx
        FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
    )
    """,
    doc="Month-aligned delta planning (create_list_of_dates_to_download, "
        "aims_realtime_util.py:300-350): per key, explode the month range "
        "[floor(month(first)), floor(month(last))] into batch panes via "
        "sequence() — the reference's rrule.MONTHLY loop as one expression.",
)
def month_range_delta_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    spans = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("mn"),
        F.date_trunc("month", F.max("o_orderdate")).alias("mx"),
    )
    return spans.select(
        "o_custkey",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 month"))).alias("batch_month"),
    )


@register(
    "fuzzy_contains_join",
    sql="""
    SELECT t.tok AS token, count(*) AS n_parts,
           round(avg(p.p_retailprice), 4) AS avg_price
    FROM part p
    JOIN (VALUES ('green'), ('blue'), ('red'), ('ivory'), ('sand')) AS t(tok)
      ON p.p_name LIKE '%' || t.tok || '%'
    GROUP BY t.tok
    """,
    doc="Fuzzy/substring theta-join (wa_awac_process.py:88-103: deployment "
        "folder matched to metadata key by substring): broadcast the tiny "
        "token side, join on contains().",
)
def fuzzy_contains_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    toks = F.broadcast(
        spark.createDataFrame([("green",), ("blue",), ("red",), ("ivory",), ("sand",)], ["tok"])
    )
    return (
        part.join(toks, F.col("p_name").contains(F.col("tok")))
        .groupBy(F.col("tok").alias("token"))
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


@register(
    "first_occurrence_dedup",
    sql="""
    SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="First-occurrence dedup (np.unique return_index idiom, "
        "srs_oc_bodbaw_netcdf_creation.py:473-488): row_number ASC = 1 — "
        "the FWW mirror of the LWW window.",
)
def first_occurrence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@register(
    "snapshot_diff_changes",
    sql="""
    WITH prev AS (
        SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01' GROUP BY o_custkey
    ), cur AS (
        SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY o_custkey
    )
    SELECT CASE WHEN p.o_custkey IS NULL THEN 'I'
                WHEN c.o_custkey IS NULL THEN 'D'
                WHEN p.n_orders IS DISTINCT FROM c.n_orders
                  OR p.spend IS DISTINCT FROM c.spend THEN 'U'
           END AS op,
           count(*) AS n_changes
    FROM prev p FULL OUTER JOIN cur c ON p.o_custkey = c.o_custkey
    WHERE CASE WHEN p.o_custkey IS NULL THEN 'I'
               WHEN c.o_custkey IS NULL THEN 'D'
               WHEN p.n_orders IS DISTINCT FROM c.n_orders
                 OR p.spend IS DISTINCT FROM c.spend THEN 'U'
          END IS NOT NULL
    GROUP BY 1
    """,
    doc="Snapshot-diff change capture (rsync -i itemized output, ARGO/"
        "rsync.sh:14-43): two keyed snapshots full-outer-joined into I/U/D "
        "change events — the engine's fallback CDC source, aggregated to "
        "op counts.",
)
def snapshot_diff_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.change_capture import snapshot_diff

    orders = load(spark, sf_dir, "orders")

    def snap(cutoff: str) -> DataFrame:
        return (
            orders.where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
            .groupBy("o_custkey")
            .agg(
                F.count("*").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("spend"),
                F.max("o_orderdate").alias("ts"),
            )
        )

    events = snapshot_diff(
        snap("1997-01-01"), snap("1998-01-01"), keys=["o_custkey"],
        compare_cols=["n_orders", "spend"],
    )
    return events.groupBy("op").agg(F.count("*").alias("n_changes"))


@register(
    "union_distinct_sorted",
    sql="""
    SELECT DISTINCT n.n_name AS nation_name
    FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION
        SELECT s_nationkey AS nk FROM supplier
    ) u JOIN nation n ON u.nk = n.n_nationkey
    """,
    doc="sort|uniq over unioned key sets (hfradar.sh:38-61, rsync.sh:33): "
        "UNION-dedup of two projections, dim join for names.",
)
def union_distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        cust.union(supp)
        .distinct()
        .join(nation, F.col("nk") == nation.n_nationkey)
        .select(F.col("n_name").alias("nation_name"))
        .distinct()
    )


@register(
    "greatest_least_interval",
    sql="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(avg(greatest(0, date_diff('day', CAST(o_orderdate AS DATE),
                                           CAST(last_ship AS DATE)))), 4)
             AS avg_fulfil_days,
           max(greatest(0, date_diff('day', CAST(o_orderdate AS DATE),
                                     CAST(last_ship AS DATE)))) AS max_fulfil_days
    FROM (
        SELECT o.o_orderkey, o.o_orderpriority, o.o_orderdate,
               max(l.l_shipdate) AS last_ship
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
    doc="Interval arithmetic with greatest() floor (anmn_files_view.sql:"
        "28-33: greatest(interval '0', end - start)): per-order fulfilment "
        "days, clamped non-negative, aggregated per priority.",
)
def greatest_least_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    per_order = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    days = F.greatest(
        F.lit(0), F.datediff(F.col("last_ship").cast("date"), F.col("o_orderdate").cast("date"))
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.avg(days), 4).alias("avg_fulfil_days"),
        F.max(days).alias("max_fulfil_days"),
    )


@register(
    "embedding_cosine_neardup",
    sql="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), n AS (
        SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.45
    """,
    doc="Embedding-cosine near-duplicate pairs (dedup battery, scale path "
        "is the LSH variant): all pairs with cosine >= 0.45, zip_with dot "
        "product, precomputed norms.",
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_pairs_above

    return cosine_pairs_above(load(spark, sf_dir, "embeddings"), threshold=0.45)


@register(
    "lsh_cosine_neardup",
    sql=None,  # approximate recall by construction; pytest pins recall
    doc="Embedding near-dup at scale: multi-table hyperplane-LSH candidates "
        "(salted bucket caps), exact cosine verified on candidates only — "
        "the default past the brute-force broadcast ceiling.",
)
def lsh_cosine_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import lsh_cosine_neardup

    return lsh_cosine_neardup(
        load(spark, sf_dir, "embeddings"), threshold=0.45, dim=64
    )


@register(
    "json_flatten_props",
    sql="""
    SELECT event_type,
           count(*) AS n_events,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4)
             AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="Nested-JSON payload flattening (pandas.json_normalize idiom, "
        "qld_data_parser.py:60; XML->dict aims_realtime_util.py:431-475): "
        "from_json the props column, aggregate the extracted field.",
)
def json_flatten_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "topk_per_group",
    sql="""
    SELECT event_type, event_id, round(value, 6) AS value_r, rk
    FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id) AS rk
        FROM events
    )
    WHERE rk <= 3
    """,
    doc="Top-k per group (latest/top-1 idiom generalised: sofar/api.py:94 "
        "latest element; Olrac/aodn_sst2geotiff.py:28-39 walk-back-to-"
        "newest): rank within event_type, keep top 3 by value with a "
        "deterministic event_id tiebreak.",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "event_type", "event_id",
            F.round("value", 6).alias("value_r"), "rk",
        )
    )


@register(
    "dropna_subset",
    sql="""
    SELECT event_type, count(*) AS n_rows, round(sum(value), 4) AS sum_value
    FROM events
    WHERE value IS NOT NULL AND props IS NOT NULL AND ts IS NOT NULL
    GROUP BY event_type
    """,
    doc="Null-row filter (dropna(subset=[...]): qld_data_parser.py:153; "
        "ardc_sofar_nrt.py:70): drop rows missing any required column, "
        "then aggregate survivors.",
)
def dropna_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.na.drop(subset=["value", "props", "ts"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "multiformat_timestamp_parse",
    sql="""
    WITH s AS (
        SELECT event_type,
               CASE event_id % 3
                 WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
                 WHEN 1 THEN strftime(ts, '%d/%m/%Y %H:%M:%S')
                 ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S')
               END AS raw
        FROM events
    )
    SELECT event_type,
           count(coalesce(
               try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
               try_strptime(raw, '%d/%m/%Y %H:%M:%S'),
               try_strptime(raw, '%Y-%m-%dT%H:%M:%S'))) AS n_parsed,
           min(coalesce(
               try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
               try_strptime(raw, '%d/%m/%Y %H:%M:%S'),
               try_strptime(raw, '%Y-%m-%dT%H:%M:%S'))) AS min_parsed,
           max(coalesce(
               try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
               try_strptime(raw, '%d/%m/%Y %H:%M:%S'),
               try_strptime(raw, '%Y-%m-%dT%H:%M:%S'))) AS max_parsed
    FROM s
    GROUP BY event_type
    """,
    doc="Multi-format timestamp dispatch (strptime ladder "
        "IMOSfilename.py:29-68; qld_data_parser.py:108-123): render each "
        "ts in one of three provider formats, parse back via a "
        "try-each-format coalesce, aggregate parsed extents.",
)
def multiformat_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 3 == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "dd/MM/yyyy HH:mm:ss"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"))
    )
    parsed = F.coalesce(
        F.try_to_timestamp(F.col("raw"), F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(F.col("raw"), F.lit("dd/MM/yyyy HH:mm:ss")),
        F.try_to_timestamp(F.col("raw"), F.lit("yyyy-MM-dd'T'HH:mm:ss")),
    )
    return (
        ev.withColumn("raw", raw)
        .withColumn("parsed", parsed)
        .groupBy("event_type")
        .agg(
            F.count("parsed").alias("n_parsed"),
            F.min("parsed").alias("min_parsed"),
            F.max("parsed").alias("max_parsed"),
        )
    )


@register(
    "bounds_quarantine_split",
    sql="""
    SELECT CASE WHEN value BETWEEN 0.05 AND 0.95 THEN 'ok'
                ELSE 'rejected' END AS status,
           count(*) AS n_rows,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1
    """,
    doc="Range/bounds predicate with quarantine branch (lat/lon bounds "
        "reject, soop_trv.py:103-112; failing units to wip/errors, "
        "faimms.py:199-207): classify rows against bounds, report both "
        "branches instead of silently dropping.",
)
def bounds_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    status = F.when(
        F.col("value").between(0.05, 0.95), F.lit("ok")
    ).otherwise(F.lit("rejected"))
    return (
        ev.withColumn("status", status)
        .groupBy("status")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@register(
    "column_cardinality_profile",
    sql="""
    SELECT count(DISTINCT event_type) AS n_event_type,
           count(DISTINCT user_id) AS n_user_id,
           count(DISTINCT props) AS n_props,
           (count(DISTINCT event_type) = 1) AS drop_event_type,
           (count(DISTINCT props) = 1) AS drop_props
    FROM events
    """,
    doc="Column-cardinality profiling driving constant-column drop "
        "(nunique==1 columns removed, qld_data_parser.py:159-170): "
        "distinct counts per column plus the drop decision flags.",
)
def column_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("event_type").alias("n_event_type"),
        F.countDistinct("user_id").alias("n_user_id"),
        F.countDistinct("props").alias("n_props"),
        (F.countDistinct("event_type") == 1).alias("drop_event_type"),
        (F.countDistinct("props") == 1).alias("drop_props"),
    )


# --------------------------------------------------------------------------
# Session windows / gap-based sessionization (SURVEY §2.9: the reference's
# per-run batching with TTL expiry, aims_realtime_util.py:1056-1086, restated
# as event-gap sessions; monthly panes are the tumbling analog).
# --------------------------------------------------------------------------

@register(
    "sessionize_events",
    sql="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                    THEN 1 ELSE 0 END AS is_new,
               event_id
        FROM events
    ), sess AS (
        SELECT user_id, ts,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_id
    HAVING count(*) >= 2
    """,
    doc="Gap-based sessionization (30-min inactivity gap) via lag + "
        "running-sum window then per-session aggregation; the engine's "
        "batch restatement of session state with TTL "
        "(aims_realtime_util.py:1056-1086 tmp-state expiry).",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .where(F.col("n_events") >= 2)
    )


@register(
    "md5_turn_fingerprint",
    sql="""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_distinct_md5,
           min(md5(text)) AS min_md5
    FROM documents
    GROUP BY source
    """,
    doc="Content md5 fingerprinting per group — the reference's md5 idiom "
        "for change detection / idempotent naming / golden tests "
        "(aims_realtime_util.py:366-375; faimms.py:114-120) and the "
        "engine's per-turn text-equality verifier.",
)
def md5_turn_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_distinct_md5"),
        F.min(F.md5(F.col("text").cast("binary"))).alias("min_md5"),
    )


@register(
    "backpressure_gate",
    sql="""
    SELECT event_type,
           count(*) AS n_pending,
           (count(*) >= 2000) AS abort_run
    FROM events
    WHERE event_type IN ('error', 'signup')
    GROUP BY event_type
    """,
    doc="Count-based backpressure admission gate (abort if >= files_crit "
        "pending, faimms.py:340-345; aims_realtime_util.py:402-423): "
        "pending counts per class plus the abort decision.",
)
def backpressure_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type").isin("error", "signup"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_pending"))
        .withColumn("abort_run", F.col("n_pending") >= 2000)
    )


@register(
    "rolling_avg_value",
    sql="""
    WITH r AS (
        SELECT user_id, ts, event_id,
               avg(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll_avg
        FROM events
    )
    SELECT user_id, count(*) AS n_rows,
           round(max(roll_avg), 6) AS max_roll_avg
    FROM r
    GROUP BY user_id
    HAVING count(*) > 50
    """,
    doc="Rolling-window aggregate with explicit row frame "
        "(rowsBetween(-6, 0)) — the frame machinery behind forward-fill "
        "and run-length masks (SURVEY §2.5; qld_data_parser.py:197-208).",
)
def rolling_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return (
        ev.withColumn("roll_avg", F.avg("value").over(w))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.max("roll_avg"), 6).alias("max_roll_avg"),
        )
        .where(F.col("n_rows") > 50)
    )


@register(
    "tumbling_window_counts",
    sql="""
    SELECT date_trunc('day', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling time window (1-day pane) per event class — Spark "
        "F.window(); the reference's month-aligned download panes "
        "(aims_realtime_util.py:300-350; Grouper(freq='M') batching).",
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "explode_word_counts",
    sql="""
    WITH words AS (
        SELECT lower(unnest(string_split_regex(trim(text), '\\s+'))) AS word
        FROM documents
        WHERE lang = 'en'
    )
    SELECT word, count(*) AS n
    FROM words
    WHERE length(word) >= 6
    GROUP BY word
    HAVING count(*) >= 20
    """,
    doc="Table-generating transform (UDTF-like, SURVEY §2.10): text -> "
        "exploded word rows -> frequency table; the RSS->rows / "
        "filename->fields explode pattern (parse_aims_xml, "
        "IMOSfilename.py:137-245) on the documents payload.",
)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.where(F.col("lang") == "en")
        .select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("raw")
        )
        .select(F.lower(F.col("raw")).alias("word"))
        .where(F.length("word") >= 6)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 20)
    )


@register(
    "pivot_event_matrix",
    sql="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'view') AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'error') AS error
    FROM events
    GROUP BY user_id
    HAVING count(*) > 80
    """,
    doc="Pivot / conditional-aggregation matrix: one column per event "
        "class via groupBy().pivot() — the conditional-agg idiom "
        "sum((file_version='0')::int) of anmn_deployments_view.sql:6-33 "
        "generalised to a matrix.",
)
def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "error"]
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )
    total = ev.groupBy("user_id").agg(F.count("*").alias("_n"))
    return (
        pivoted.join(total, "user_id")
        .where(F.col("_n") > 80)
        .drop("_n")
    )


@register(
    "value_percentiles",
    sql="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99,
           round(stddev_samp(value), 6) AS sd
    FROM events
    GROUP BY event_type
    """,
    doc="Exact percentiles + stddev per group (Spark 4 F.percentile; "
        "DuckDB quantile_cont) — the latency/size distribution queries a "
        "metrics table needs; reference only had min/max/avg "
        "(aims_realtime_util.py:709-724), engine metrics go further.",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
    )


@register(
    "reconciliation_3way",
    sql="""
    WITH ev AS (
        SELECT DISTINCT user_id FROM events
    ), cust AS (
        SELECT c_custkey FROM customer
    )
    SELECT
        (SELECT count(*) FROM ev) AS n_source_users,
        (SELECT count(*) FROM cust) AS n_target_keys,
        (SELECT count(*) FROM ev JOIN cust ON user_id = c_custkey)
            AS n_matched,
        (SELECT count(*) FROM ev WHERE user_id NOT IN
            (SELECT c_custkey FROM cust)) AS n_missing_in_target,
        (SELECT count(*) FROM cust WHERE c_custkey NOT IN
            (SELECT user_id FROM ev)) AS n_extra_in_target
    """,
    doc="3-way source/target reconciliation (semi + anti joins, counts "
        "agree) — the error-dir vs DB diff report of hfradar.sh:98-204 as "
        "one query: matched, missing-in-target, extra-in-target.",
)
def reconciliation_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE distributed plan: full-outer join on the key, then a single
    # aggregate classifies every key as matched / missing / extra — no
    # driver-side count loop, one shuffle (plus AQE broadcast if one side
    # is small).
    ev = load(spark, sf_dir, "events").select("user_id").distinct()
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    joined = ev.join(cust, ev.user_id == cust.c_custkey, "full_outer")
    return joined.agg(
        F.count("user_id").alias("n_source_users"),
        F.count("c_custkey").alias("n_target_keys"),
        F.count(F.when(F.col("user_id").isNotNull()
                       & F.col("c_custkey").isNotNull(), 1)).alias("n_matched"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_missing_in_target"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("n_extra_in_target"),
    )


# --------------------------------------------------------------------------
# Subquery / grouping-set shapes (SURVEY §4: Catalyst decorrelation & CBO are
# built-in — these queries prove the engine exercises them; the reference's
# UNION-of-SELECTs built by shell loop, hfradar.sh:149-159, is the manual
# ancestor of decorrelated subqueries).
# --------------------------------------------------------------------------

@register(
    "rollup_revenue",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets: subtotal hierarchy in one pass (multi-level "
        "report rollup; generalises the reference's agg-of-agg view cascade, "
        "report_db.anmn_datastreams_view.sql:6-33).",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_rows",
        )
    )


@register(
    "exists_late_orders",
    sql="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    doc="EXISTS correlated subquery (TPC-H q4 shape) — Catalyst decorrelates "
        "to a left-semi join; the reconciliation-by-presence idiom "
        "(hfradar.sh:176-183) as a subquery.",
)
def exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    orders.createOrReplaceTempView("v_orders")
    li.createOrReplaceTempView("v_lineitem")
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM v_orders o
        WHERE EXISTS (
            SELECT 1 FROM v_lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
    """)


@register(
    "revenue_share_scalar_subquery",
    sql="""
    SELECT l_returnflag,
           round(sum(l_extendedprice), 2) AS flag_revenue,
           round(sum(l_extendedprice) * 100.0 /
                 (SELECT sum(l_extendedprice) FROM lineitem), 4) AS pct_of_total
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Scalar subquery: per-group share of a global total in one "
        "statement (percent-coverage shape, datastreams_view.sql:27, "
        "without a CTE).",
)
def revenue_share_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("v_lineitem_share")
    return spark.sql("""
        SELECT l_returnflag,
               round(sum(l_extendedprice), 2) AS flag_revenue,
               round(sum(l_extendedprice) * 100.0 /
                     (SELECT sum(l_extendedprice) FROM v_lineitem_share), 4) AS pct_of_total
        FROM v_lineitem_share
        GROUP BY l_returnflag
    """)


@register(
    "min_cost_supplier",
    sql="""
    SELECT p.p_partkey, p.p_name, s.s_name,
           round(ps_min.min_price, 2) AS min_price
    FROM part p
    JOIN (
        SELECT l_partkey, min(l_extendedprice / l_quantity) AS min_price
        FROM lineitem WHERE l_quantity > 0
        GROUP BY l_partkey
    ) ps_min ON ps_min.l_partkey = p.p_partkey
    JOIN lineitem l
      ON l.l_partkey = p.p_partkey
     AND l.l_quantity > 0
     AND l.l_extendedprice / l.l_quantity = ps_min.min_price
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_partkey <= 200
    GROUP BY p.p_partkey, p.p_name, s.s_name, ps_min.min_price
    """,
    doc="Correlated-minimum join (TPC-H q2 shape): supplier(s) offering "
        "each part at its minimum observed unit price — agg subquery joined "
        "back on the min condition.",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    sup = load(spark, sf_dir, "supplier")
    unit = li.withColumn("unit_price", F.col("l_extendedprice") / F.col("l_quantity"))
    mins = unit.groupBy("l_partkey").agg(F.min("unit_price").alias("min_price")) \
               .withColumnRenamed("l_partkey", "m_partkey")
    return (
        unit.join(mins, (F.col("l_partkey") == F.col("m_partkey"))
                  & (F.col("unit_price") == F.col("min_price")))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_name",
                 F.round("min_price", 2).alias("min_price"))
        .agg(F.count(F.lit(1)).alias("_n")).drop("_n")
        .select("p_partkey", "p_name", "s_name", "min_price")
    )


# --------------------------------------------------------------------------
# Schema-mapping / QC-flag layer (reference: provider->canonical variable
# mapping on every ingest, ardc_nrt/lib/common/lookup.py:147-165 +
# netcdf.py:71-83; rename/retype battery aims_realtime_util.py:727-890;
# flag vocabulary PARAMETERS_MAPPING/qc_flags.csv).
# --------------------------------------------------------------------------

@register(
    "schema_mapping_apply",
    sql="""
    SELECT event_id,
           user_id AS uid,
           event_type AS etype,
           CAST(value AS DOUBLE) AS val,
           CAST(NULL AS VARCHAR) AS provider,
           ts
    FROM events
    """,
    doc="Config-driven provider->canonical column mapping: rename + retype "
        "+ default-fill absent columns, drop unmapped columns with a "
        "report (lookup.py:147-165, netcdf.py:71-75, "
        "aims_realtime_util.py:727-890). One projection, zero shuffles; "
        "Catalyst prunes dropped provider columns out of the scan.",
)
def schema_mapping_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cdc.mapping import SchemaMapping

    mapping = SchemaMapping.from_config(
        {
            "event_id": "event_id",
            "user_id": "uid",
            "event_type": "etype",
            "value": {"to": "val", "type": "double"},
            # absent in this feed -> typed default (additive evolution)
            "provider_name": {"to": "provider", "type": "string"},
            "ts": "ts",
        }
    )
    mapped, report = mapping.apply(load(spark, sf_dir, "events"))
    assert report.dropped == ["props"], report  # unmapped -> dropped+reported
    return mapped


@register(
    "qc_flag_histogram",
    sql="""
    SELECT 'value' AS col_name,
           CASE WHEN value IS NULL THEN 9
                WHEN value < 0.0 OR value > 400.0 THEN 4
                WHEN value > 100.0 THEN 3
                ELSE 1 END AS flag,
           count(*) AS n_values
    FROM events
    GROUP BY 1, 2
    """,
    doc="Per-column QC flags (IMOS/IODE 0/1/2/3/4/9 vocabulary) synthesized "
        "as when-chains and aggregated to a flag histogram "
        "(netcdf.py:80-83, qc_flags.csv). Flags are payload columns, so "
        "they ride the LWW merge untouched (e2e pytest).",
)
def qc_flag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cdc.qc import QcRule, qc_summary

    rules = [QcRule("value", hard_min=0.0, hard_max=400.0, soft_max=100.0)]
    out = qc_summary(load(spark, sf_dir, "events"), rules)
    return out.withColumnRenamed("column", "col_name")


@register(
    "contract_report",
    sql="""
    SELECT 'event_id_unique' AS check_name, 'unique' AS kind,
           CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS n_violations,
           coalesce(sum(n - 1), 0) = 0 AS passed
    FROM (SELECT count(*) AS n FROM events GROUP BY event_id HAVING count(*) > 1)
    UNION ALL
    SELECT 'event_id_not_null', 'not_null',
           CAST(count(*) FILTER (event_id IS NULL) AS BIGINT),
           count(*) FILTER (event_id IS NULL) = 0
    FROM events
    UNION ALL
    SELECT 'value_bounds', 'bounds',
           CAST(count(*) FILTER (value IS NOT NULL AND (value < 0 OR value > 400)) AS BIGINT),
           count(*) FILTER (value IS NOT NULL AND (value < 0 OR value > 400)) = 0
    FROM events
    UNION ALL
    SELECT 'event_type_domain', 'accepted_values',
           CAST(count(*) FILTER (event_type IS NOT NULL AND event_type NOT IN
                ('click','view','purchase','signup','error')) AS BIGINT),
           count(*) FILTER (event_type IS NOT NULL AND event_type NOT IN
                ('click','view','purchase','signup','error')) = 0
    FROM events
    UNION ALL
    SELECT 'ts_monotonic_per_user', 'monotonic',
           CAST(count(*) FILTER (p IS NOT NULL AND ts < p) AS BIGINT),
           count(*) FILTER (p IS NOT NULL AND ts < p) = 0
    FROM (SELECT ts, lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS p
          FROM events)
    """,
    doc="Declarative table-contract battery run post-commit (compliance "
        "checker gate, lib/python/util.py:120-174, "
        "compliance_checker_test.py:1-70): uniqueness, nullability, "
        "bounds, accepted values, per-group monotonicity. All row-local "
        "checks fold into ONE aggregate over one scan.",
)
def contract_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .contracts import Contract, ContractSuite

    suite = ContractSuite(
        [
            Contract("event_id_unique", "unique", columns=["event_id"]),
            Contract("event_id_not_null", "not_null", column="event_id"),
            Contract("value_bounds", "bounds", column="value",
                     min_value=0.0, max_value=400.0),
            Contract("event_type_domain", "accepted_values", column="event_type",
                     values=["click", "view", "purchase", "signup", "error"]),
            Contract("ts_monotonic_per_user", "monotonic", column="ts",
                     group_by=["user_id"], order_by="event_id"),
        ]
    )
    return suite.run(load(spark, sf_dir, "events"))


@register(
    "filename_convention_parse",
    sql="""
    WITH paths AS (
        SELECT doc_id,
               'catalog/' || source || '/PROJ_' || upper(source) || '_TZV_'
               || strftime(TIMESTAMP '2024-01-01' + INTERVAL (doc_id % 365) DAY,
                           '%Y%m%dT%H%M%S')
               || 'Z_PLAT-' || CAST(doc_id % 7 AS VARCHAR) || '_FV0'
               || CAST(doc_id % 2 AS VARCHAR) || '_' || lang || '.nc' AS path
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(regexp_extract(path, '[^/]*$'), '^([A-Za-z0-9]+)_', 1) AS project,
           regexp_extract(regexp_extract(path, '[^/]*$'),
                          '^[A-Za-z0-9]+_([A-Za-z0-9-]+)_', 1) AS facility,
           regexp_extract(regexp_extract(path, '[^/]*$'),
                          '^[A-Za-z0-9]+_[A-Za-z0-9-]+_([A-Z]+)_', 1) AS data_codes,
           regexp_extract(regexp_extract(path, '[^/]*$'),
                          '_(\\d{8}T\\d{6}Z?)_', 1) AS start_raw,
           regexp_extract(regexp_extract(path, '[^/]*$'),
                          '_\\d{8}T\\d{6}Z?_([A-Za-z0-9-]+)_FV', 1) AS platform_code,
           CAST(regexp_extract(regexp_extract(path, '[^/]*$'), '_FV(\\d{2})', 1)
                AS INTEGER) AS file_version_int,
           regexp_extract(regexp_extract(path, '[^/]*$'),
                          '\\.([A-Za-z0-9]+)$', 1) AS extension
    FROM paths
    """,
    doc="Full filename-convention parser (~15 structured fields, "
        "IMOSfilename.py:137-245): config-driven regex field specs compiled "
        "to one map-only projection; this entry checks the core fields "
        "against a synthesized deterministic catalog.",
)
def filename_convention_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.filenames import FilenameConvention

    docs = load(spark, sf_dir, "documents")
    start = F.date_format(
        F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(
            days=(F.col("doc_id") % 365).cast("int")
        ),
        "yyyyMMdd'T'HHmmss",
    )
    paths = docs.select(
        "doc_id",
        F.concat(
            F.lit("catalog/"), F.col("source"), F.lit("/PROJ_"),
            F.upper("source"), F.lit("_TZV_"), start, F.lit("Z_PLAT-"),
            (F.col("doc_id") % 7).cast("string"), F.lit("_FV0"),
            (F.col("doc_id") % 2).cast("string"), F.lit("_"), F.col("lang"),
            F.lit(".nc"),
        ).alias("path"),
    )
    parsed = FilenameConvention().parse(paths)
    return parsed.select(
        "doc_id", "project", "facility", "data_codes",
        F.date_format("start_time", "yyyyMMdd'T'HHmmss'Z'").alias("start_raw"),
        "platform_code", "file_version_int", "extension",
    )


@register(
    "referential_integrity_report",
    sql="""
    SELECT 'orders_custkey_fk' AS check_name, 'foreign_key' AS kind,
           CAST(count(*) FILTER (o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
                AS BIGINT) AS n_violations,
           count(*) FILTER (o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) = 0
             AS passed
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_orderkey_fk', 'foreign_key',
           CAST(count(*) FILTER (l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL)
                AS BIGINT),
           count(*) FILTER (l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL) = 0
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    doc="Referential-integrity contracts (FK orphan counts via LEFT ANTI "
        "join, parent side key-projected and broadcastable) — the FK half "
        "of the reference's schema declarations (NRMN extract relations) "
        "made checkable.",
)
def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .contracts import Contract, ContractSuite

    orders_suite = ContractSuite(
        [Contract("orders_custkey_fk", "foreign_key", column="o_custkey",
                  ref_table="customer", ref_columns=["c_custkey"])]
    )
    li_suite = ContractSuite(
        [Contract("lineitem_orderkey_fk", "foreign_key", column="l_orderkey",
                  ref_table="orders", ref_columns=["o_orderkey"])]
    )
    a = orders_suite.run(
        load(spark, sf_dir, "orders"),
        refs={"customer": load(spark, sf_dir, "customer")},
    )
    b = li_suite.run(
        load(spark, sf_dir, "lineitem"),
        refs={"orders": load(spark, sf_dir, "orders")},
    )
    return a.unionByName(b)


@register(
    "multimodal_frame_sample",
    sql="""
    WITH p AS (
        SELECT doc_id AS d, doc_id % 3 AS m,
               8 + doc_id % 9 AS w, 6 + doc_id % 5 AS h,
               200 + doc_id % 57 AS ns,
               256 + doc_id % 100 AS nv
        FROM documents
    ), payload AS (
        SELECT d, m,
            CASE m
              WHEN 1 THEN list_concat(list_concat(list_concat(list_concat(
                [82,73,70,70],
                [(36 + 2*ns) % 256, ((36 + 2*ns) // 256) % 256, 0, 0]),
                [87,65,86,69, 102,109,116,32, 16,0,0,0, 1,0, 1,0,
                 64,31,0,0, 128,62,0,0, 2,0, 16,0, 100,97,116,97]),
                [(2*ns) % 256, ((2*ns) // 256) % 256, 0, 0]),
                flatten([[0, ((d*31 + i*7) % 256 + 128) % 256]
                         for i in generate_series(0, ns - 1)])
              )
              WHEN 0 THEN list_concat(
                [80, 54, 10, 48 + w // 10, 48 + w % 10, 32,
                 48 + h // 10, 48 + h % 10, 10, 50, 53, 53, 10],
                [(d*13 + j*5) % 256 for j in generate_series(0, 3*w*h - 1)]
              )
              ELSE [(d*17 + j*3) % 256 for j in generate_series(0, nv - 1)]
            END AS bytes
        FROM p
    ), cutp AS (
        SELECT d, m, bytes, len(bytes) AS n_bytes,
               16 * (len(bytes) // 16) AS cut
        FROM payload
    ), samp AS (
        SELECT d, m, n_bytes,
            list_concat(
                [bytes[k + 1] for k in generate_series(0, cut - 16, 16)],
                list_slice(bytes, cut + 1, n_bytes)
            ) AS sbytes
        FROM cutp
    )
    SELECT d AS media_id,
           CASE m WHEN 1 THEN 'audio' WHEN 0 THEN 'image'
                  ELSE 'video' END AS kind,
           CAST(n_bytes AS INT) AS n_bytes,
           md5(array_to_string(
               list_transform(sbytes, x -> printf('%02X', x)), '')) AS sample_md5,
           CAST(len(sbytes) AS INT) AS sample_bytes
    FROM samp
    """,
    doc="Multimodal payload slicing ('frame sampling'): every Nth byte of "
        "the binary payload via hex regex — pure column expressions, no "
        "UDF, demonstrating payload transforms that never leave the JVM. "
        "Payloads are the deterministic integer-series WAV/PPM/raw media "
        "(synthesize_decodable_media), so the DuckDB oracle rebuilds the "
        "EXACT byte stream — RIFF/fmt/data and P6 headers included — with "
        "list comprehensions over generate_series, replays the identical "
        "sampling rule (first byte of each complete 16-byte group + the "
        "tail verbatim, the regexp_replace semantics), and md5s the same "
        "uppercase hex rendering: a one-byte framing bug on either side "
        "turns the driver red.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import frame_sample, synthesize_decodable_media

    media = synthesize_decodable_media(load(spark, sf_dir, "documents"))
    out = frame_sample(media, every_n_bytes=16)
    # sortable projection for the driver's canonicalizer: digest the binary
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        F.md5(F.hex("sampled_payload")).alias("sample_md5"),
        F.length("sampled_payload").alias("sample_bytes"),
    )


@register(
    "minhash_recall_vs_exact",
    sql="""
    WITH t AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents
    ), tok AS (
        SELECT doc_id, len(w) AS sz, unnest(w) AS tkn FROM t
    ), dfreq AS (
        SELECT tkn, count(*) AS dfc FROM tok GROUP BY tkn
    ), ranked AS (
        SELECT tok.doc_id, tok.sz, tok.tkn,
               row_number() OVER (PARTITION BY tok.doc_id
                                  ORDER BY dfreq.dfc, tok.tkn) AS rn
        FROM tok JOIN dfreq USING (tkn)
    ), prefix AS (
        SELECT doc_id, sz, tkn FROM ranked
        WHERE rn <= sz - ceil(sz * 0.9 - 1e-9) + 1
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM prefix a JOIN prefix b
          ON a.tkn = b.tkn AND a.doc_id < b.doc_id
         AND CAST(least(a.sz, b.sz) AS DOUBLE)
             >= greatest(a.sz, b.sz) * 0.9 - 1e-9
    ), pairs AS (
        SELECT c.doc_a, c.doc_b
        FROM cand c
        JOIN t ta ON ta.doc_id = c.doc_a
        JOIN t tb ON tb.doc_id = c.doc_b
        WHERE CAST(len(list_intersect(ta.w, tb.w)) AS DOUBLE)
              / len(list_distinct(list_concat(ta.w, tb.w))) >= 0.9
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(*) AS BIGINT) AS n_found_true,
           CAST(0 AS BIGINT) AS n_false_pos,
           CAST(1000000 AS BIGINT) AS recall_ppm
    FROM pairs
    """,
    doc="Recall pin for the approximate MinHash+LSH path: its candidate "
        "pairs (word-level shingles, exact-verified at J>=0.9) are joined "
        "against the EXACT AllPairs prefix-filter pair set at the same "
        "threshold. The oracle computes the exact side in SQL and asserts "
        "100% recall / zero false positives — deterministic (fixed xxhash64 "
        "seeds), so a banding/recall regression turns the driver red "
        "instead of hiding behind a rows-only check.",
)
def minhash_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_dedup import minhash_lsh_candidates, ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    # ONE full-outer join, then one aggregate: each expensive input (the
    # exact AllPairs set, the MinHash candidate set) is computed exactly
    # once — the earlier semi/anti/union formulation re-evaluated the
    # exact side 3x and the approximate side 2x (no common-subplan reuse
    # across union branches in Spark), turning a ~30s query into ~150s.
    exact = (
        ngram_jaccard_pairs(docs, threshold=0.9)
        .select("doc_a", "doc_b")
        .withColumn("_e", F.lit(1))
    )
    found = (
        minhash_lsh_candidates(docs, shingle_n=1, jaccard_threshold=0.9)
        .select("doc_a", "doc_b")
        .withColumn("_f", F.lit(1))
    )
    both = exact.join(found, ["doc_a", "doc_b"], "full_outer")
    agg = both.agg(
        F.sum(F.coalesce(F.col("_e"), F.lit(0))).cast("long").alias("n_exact"),
        F.sum(
            F.when(F.col("_e").isNotNull() & F.col("_f").isNotNull(), 1)
            .otherwise(0)
        ).cast("long").alias("n_found_true"),
        F.sum(
            F.when(F.col("_e").isNull() & F.col("_f").isNotNull(), 1)
            .otherwise(0)
        ).cast("long").alias("n_false_pos"),
    )
    return agg.select(
        "n_exact",
        "n_found_true",
        "n_false_pos",
        F.floor(F.col("n_found_true") * 1_000_000 / F.col("n_exact"))
        .cast("long")
        .alias("recall_ppm"),
    )


@register(
    "xml_feed_parse",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           max(value) AS max_value,
           CAST(min(event_id) AS BIGINT) AS min_event_id
    FROM events WHERE event_id < 200
    GROUP BY event_type
    """,
    doc="RSS/XML feed scan round-trip (the reference's AIMS feed drives its "
        "whole CDC loop, aims_realtime_util.py:431-475): feed XML is "
        "synthesized deterministically FROM the events table, parsed back "
        "through the real stdlib-ElementTree mapInPandas reader "
        "(sources/xml.py), widened, and aggregated — so the DuckDB oracle "
        "checks the full parse path against the source rows with no "
        "filesystem dependency. Aggregates are order-independent "
        "(count/distinct/max/min) and values are %.2f-exact.",
)
def xml_feed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.xml import parse_rss_items

    ev = load(spark, sf_dir, "events").where(F.col("event_id") < 200)
    item = F.format_string(
        "<item><event_id>%s</event_id><event_type>%s</event_type>"
        "<user_id>%s</user_id><value>%.2f</value></item>",
        F.col("event_id"), F.col("event_type"), F.col("user_id"), F.col("value"),
    )
    doc = ev.select(F.struct("event_id", item.alias("x")).alias("s")).agg(
        F.concat(
            F.lit('<rss version="2.0"><channel><title>events</title>'),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["x"]
                ),
            ),
            F.lit("</channel></rss>"),
        ).alias("xml")
    )
    raw = doc.select(
        F.lit("mem://feed.xml").alias("path"),
        F.col("xml").cast("binary").alias("content"),
    )
    long = parse_rss_items(raw)
    wide = long.groupBy("item_idx").agg(
        *[
            F.first(F.when(F.col("tag") == t, F.col("value")), ignorenulls=True)
            .alias(t)
            for t in ("event_id", "event_type", "user_id", "value")
        ]
    )
    return wide.groupBy("event_type").agg(
        F.count("*").alias("n_items"),
        F.countDistinct(F.col("user_id").cast("long")).alias("n_users"),
        F.max(F.col("value").cast("double")).alias("max_value"),
        F.min(F.col("event_id").cast("long")).alias("min_event_id"),
    )


@register(
    "multimodal_decode_stats",
    sql="""
    WITH d AS (SELECT doc_id FROM documents)
    SELECT d.doc_id AS media_id, 'audio' AS kind,
           CAST(44 + 2 * (200 + d.doc_id % 57) AS BIGINT) AS n_bytes,
           CAST(200 + d.doc_id % 57 AS BIGINT) AS n_units,
           CAST(sum(abs((((d.doc_id * 31 + g.i * 7) % 256) - 128) * 256))
                AS BIGINT) AS sum_units
    FROM d, generate_series(0, 500) g(i)
    WHERE d.doc_id % 3 = 1 AND g.i < 200 + d.doc_id % 57
    GROUP BY d.doc_id
    UNION ALL
    SELECT d.doc_id, 'image',
           CAST(13 + 3 * (8 + d.doc_id % 9) * (6 + d.doc_id % 5) AS BIGINT),
           CAST((8 + d.doc_id % 9) * (6 + d.doc_id % 5) AS BIGINT),
           CAST(sum((d.doc_id * 13 + g.j * 5) % 256) AS BIGINT)
    FROM d, generate_series(0, 500) g(j)
    WHERE d.doc_id % 3 = 0
      AND g.j < 3 * (8 + d.doc_id % 9) * (6 + d.doc_id % 5)
    GROUP BY d.doc_id
    UNION ALL
    SELECT d.doc_id, 'video',
           CAST(256 + d.doc_id % 100 AS BIGINT),
           CAST(256 + d.doc_id % 100 AS BIGINT),
           CAST(sum((d.doc_id * 17 + g.j * 3) % 256) AS BIGINT)
    FROM d, generate_series(0, 500) g(j)
    WHERE d.doc_id % 3 = 2 AND g.j < 256 + d.doc_id % 100
    GROUP BY d.doc_id
    """,
    doc="Multimodal decode with a REAL numeric oracle (closes the "
        "rows-only gap): payloads are genuine PCM16 WAV / binary P6 PPM "
        "built by integer arithmetic on the id, decoded back by from-spec "
        "stdlib parsers inside mapInPandas, and reduced to BIGINT stats; "
        "the DuckDB side recomputes the same stats from the series "
        "definitions via lateral generate_series — a framing/header bug on "
        "either the write or parse side turns the driver red.",
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import decode_stats, synthesize_decodable_media

    media = synthesize_decodable_media(load(spark, sf_dir, "documents"))
    return decode_stats(media)


@register(
    "image_resize_stats",
    sql="""
    WITH img AS (
        SELECT doc_id AS d, 8 + doc_id % 9 AS w, 6 + doc_id % 5 AS h
        FROM documents WHERE doc_id % 3 = 0
    ), px AS (
        SELECT d, w, h,
               g.i // 12 AS y, (g.i % 12) // 3 AS x, g.i % 3 AS ch
        FROM img, generate_series(0, 47) g(i)
    ), v AS (
        SELECT d,
               (d * 13 + (3 * (((y * h) // 4) * w + ((x * w) // 4)) + ch) * 5)
               % 256 AS val
        FROM px
    )
    SELECT d AS media_id,
           CAST(4 AS BIGINT) AS out_w, CAST(4 AS BIGINT) AS out_h,
           CAST(59 AS BIGINT) AS n_bytes,
           CAST(sum(val) AS BIGINT) AS sum_px
    FROM v GROUP BY d
    """,
    doc="REAL image resize with a numeric oracle: synthesized P6 payloads "
        "are decoded from spec, nearest-neighbor downsampled to 4x4 "
        "(src = floor(dst*src_dim/dst_dim)), re-encoded as P6, decoded "
        "AGAIN, and reduced to BIGINT pixel stats. The DuckDB side "
        "recomputes every sampled pixel from the series definition via "
        "lateral generate_series — a resize-kernel, header, or "
        "re-encode bug anywhere in the chain turns the driver red.",
)
def image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import (
        decode_stats,
        resize_images,
        synthesize_decodable_media,
    )

    media = synthesize_decodable_media(load(spark, sf_dir, "documents"))
    small = resize_images(media.where(F.col("kind") == "image"), 4, 4)
    st = decode_stats(small)
    return st.select(
        "media_id",
        F.lit(4).cast("long").alias("out_w"),
        F.lit(4).cast("long").alias("out_h"),
        "n_bytes",
        F.col("sum_units").alias("sum_px"),
    )


@register(
    "ann_recall_floor",
    sql="""
    SELECT CAST(3 * count(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met
    FROM embeddings
    """,
    doc="Driver-visible recall pin for the approximate ANN path (the "
        "companion that keeps ann_lsh_topk honest): brute-force top-3 "
        "(exact, oracled elsewhere as cosine_topk_embeddings) is joined "
        "against the calibrated LSH top-3; the entry emits the exact "
        "neighbor count (= 3 per vector, which DuckDB recomputes) and a "
        "boolean recall >= 0.8. Deterministic: fixed hyperplane seeds and "
        "data-derived calibration. A banding regression (round-2 shipped "
        "<25% recall before calibration landed) flips the boolean and "
        "turns the driver red.",
)
def ann_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import (
        calibrate_ann_params,
        cosine_topk,
        lsh_ann_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, k=3).select("query_id", "neighbor_id")
    b, t = calibrate_ann_params(emb, k=3, target_recall=0.9)
    ann = (
        lsh_ann_topk(emb, k=3, n_planes=b, n_tables=t, dim=64)
        .select("query_id", "neighbor_id")
        .withColumn("_f", F.lit(1))
    )
    agg = exact.join(ann, ["query_id", "neighbor_id"], "left").agg(
        F.count("*").cast("long").alias("n_exact"),
        F.sum(F.when(F.col("_f").isNotNull(), 1).otherwise(0)).alias("_hit"),
    )
    return agg.select(
        "n_exact",
        (F.col("_hit") >= F.col("n_exact") * 0.8).alias("recall_floor_met"),
    )


@register(
    "ivf_recall_floor",
    sql="""
    SELECT CAST(3 * count(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met
    FROM embeddings
    """,
    doc="Driver-visible recall pin for the IVF-Flat ANN path "
        "(operators/similarity.py ivf_ann_topk): brute-force top-3 joined "
        "against IVF top-3 at nlist=16/nprobe=8; emits the exact neighbor "
        "count (DuckDB recomputes it) and a boolean recall >= 0.8. "
        "Deterministic end-to-end: hash-ordered training sample, "
        "fixed-seed kmeans++ init, stable assignment ties — measured "
        "recall 0.841 at sf0.01 / 0.830 at sf0.1 on these NEAR-RANDOM "
        "embeddings (IVF's worst case; clustered production embeddings "
        "concentrate true neighbors in far fewer probed lists).",
)
def ivf_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_topk, ivf_ann_topk

    emb = load(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, k=3).select("query_id", "neighbor_id")
    ivf = (
        ivf_ann_topk(emb, k=3, nlist=16, nprobe=8, dim=64)
        .select("query_id", "neighbor_id")
        .withColumn("_f", F.lit(1))
    )
    agg = exact.join(ivf, ["query_id", "neighbor_id"], "left").agg(
        F.count("*").cast("long").alias("n_exact"),
        F.sum(F.when(F.col("_f").isNotNull(), 1).otherwise(0)).alias("_hit"),
    )
    return agg.select(
        "n_exact",
        (F.col("_hit") >= F.col("n_exact") * 0.8).alias("recall_floor_met"),
    )


@register(
    "lsh_neardup_recall_floor",
    sql="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), n AS (
        SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           TRUE AS recall_floor_met
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.45
    """,
    doc="Driver-visible recall pin for lsh_cosine_neardup: the exact "
        "brute-force pair set at threshold 0.45 (DuckDB recomputes its "
        "size) left-joined against the threshold-derived-parameter LSH "
        "pairs; emits a boolean recall >= 0.9. The round-2 shipped "
        "defaults kept ~10% of true pairs at this threshold — exactly the "
        "regression class this entry turns red. Precision needs no pin: "
        "the LSH path exact-verifies every candidate before emitting.",
)
def lsh_neardup_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_pairs_above, lsh_cosine_neardup

    emb = load(spark, sf_dir, "embeddings")
    exact = cosine_pairs_above(emb, threshold=0.45).select("vec_a", "vec_b")
    approx = (
        lsh_cosine_neardup(emb, threshold=0.45, dim=64)
        .select("vec_a", "vec_b")
        .withColumn("_f", F.lit(1))
    )
    agg = exact.join(approx, ["vec_a", "vec_b"], "left").agg(
        F.count("*").cast("long").alias("n_exact"),
        F.sum(F.when(F.col("_f").isNotNull(), 1).otherwise(0)).alias("_hit"),
    )
    return agg.select(
        "n_exact",
        (F.col("_hit") >= F.col("n_exact") * 0.9).alias("recall_floor_met"),
    )


@register(
    "simhash_exactdup_recall",
    sql="""
    SELECT CAST(sum(c * (c - 1) / 2) AS BIGINT) AS n_dup_pairs,
           CAST(sum(c * (c - 1) / 2) AS BIGINT) AS n_same_fp_pairs
    FROM (SELECT count(*) AS c FROM documents GROUP BY text)
    """,
    doc="Driver-visible invariant pin for the SimHash path: byte-identical "
        "texts MUST receive identical fingerprints, so the pair count "
        "inside exact-duplicate text groups (DuckDB recomputes it from the "
        "raw table) must equal the same-fingerprint pair count inside "
        "those groups. Counts come from per-group combinatorics "
        "(sum c*(c-1)/2), never materialized pairs, so the dup-heavy "
        "corpus costs two partial-aggregated shuffles, not O(pairs). "
        "Hamming-distance properties stay pinned in pytest.",
)
def simhash_exactdup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_dedup import simhash_buckets

    docs = load(spark, sf_dir, "documents")
    sh = simhash_buckets(docs).select("doc_id", "simhash")
    j = docs.select("doc_id", F.md5("text").alias("h")).join(sh, "doc_id")
    per_fp = j.groupBy("h", "simhash").agg(F.count("*").alias("c2"))
    per_text = per_fp.groupBy("h").agg(
        F.sum("c2").alias("c"),
        F.sum(F.col("c2") * (F.col("c2") - 1) / 2).alias("same_fp_part"),
    )
    return per_text.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2)
        .cast("long")
        .alias("n_dup_pairs"),
        F.sum("same_fp_part").cast("long").alias("n_same_fp_pairs"),
    )


@register(
    "dedup_cluster_canonical",
    sql="""
    WITH RECURSIVE t AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split(text, ' '),
                                         x -> x <> '')) AS w
        FROM documents
    ), tok AS (
        SELECT doc_id, len(w) AS sz, unnest(w) AS tkn FROM t
    ), dfreq AS (
        SELECT tkn, count(*) AS dfc FROM tok GROUP BY tkn
    ), ranked AS (
        SELECT tok.doc_id, tok.sz, tok.tkn,
               row_number() OVER (PARTITION BY tok.doc_id
                                  ORDER BY dfreq.dfc, tok.tkn) AS rn
        FROM tok JOIN dfreq USING (tkn)
    ), prefix AS (
        SELECT doc_id, sz, tkn FROM ranked
        WHERE rn <= sz - ceil(sz * 0.9 - 1e-9) + 1
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM prefix a JOIN prefix b
          ON a.tkn = b.tkn AND a.doc_id < b.doc_id
         AND CAST(least(a.sz, b.sz) AS DOUBLE)
             >= greatest(a.sz, b.sz) * 0.9 - 1e-9
    ), pairs AS (
        SELECT c.doc_a, c.doc_b
        FROM cand c
        JOIN t ta ON ta.doc_id = c.doc_a
        JOIN t tb ON tb.doc_id = c.doc_b
        WHERE CAST(len(list_intersect(ta.w, tb.w)) AS DOUBLE)
              / len(list_distinct(list_concat(ta.w, tb.w))) >= 0.9
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ), reach(n, m) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    )
    SELECT n AS doc_id, min(m) AS cluster_id,
           n = min(m) AS is_canonical
    FROM reach GROUP BY n
    """,
    doc="Duplicate-cluster assignment: the TRANSITIVE CLOSURE of the exact "
        "Jaccard>=0.9 pair set via alternating large-star/small-star "
        "connected components (O(log n) rounds, O(|E|) shuffle per round — "
        "operators/clustering.py), then one canonical survivor per cluster "
        "(min doc_id, deterministic across reruns). The DuckDB side "
        "recomputes the same closure with a recursive CTE, so a wrong "
        "merge ANYWHERE in the iteration turns the driver red. This is the "
        "step that turns pair detection into a usable training-set dedup: "
        "keep rows where is_canonical.",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.clustering import dedup_clusters
    from .operators.text_dedup import ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.9)
    return dedup_clusters(docs, pairs)


# --------------------------------------------------------------------------
# Training-corpus curation battery (round 3): the steps a large-scale
# LLM-training-data pipeline runs AFTER dedup — benchmark decontamination,
# stratified sampling, repetition-quality filters, sensitive-term redaction,
# and sequence packing.  All pure column expressions / hash-joins (no
# Python), each with an independently written DuckDB oracle.
# --------------------------------------------------------------------------

_WORD_RE = "[a-z0-9]+"


def _doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, t: array<string>) — lowercase word tokens, JVM-side."""
    return docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower("text"), F.lit(_WORD_RE), 0).alias("t"),
    )


@register(
    "decontaminate_ngram_overlap",
    sql="""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(t, CAST(i AS BIGINT),
                                             CAST(i + 7 AS BIGINT)), ' ') AS g
        FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
        WHERE len(t) >= 8
    ), bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
    )
    SELECT gr.doc_id, count(DISTINCT gr.g) AS n_shared_grams
    FROM grams gr JOIN bench b ON gr.g = b.g
    WHERE gr.doc_id % 97 <> 0
    GROUP BY gr.doc_id
    """,
    doc="Benchmark decontamination: flag corpus documents sharing any word "
        "8-gram with a held-out benchmark slice (doc_id % 97 == 0 stands in "
        "for the eval set). Spark plan: tokenize -> per-doc distinct 8-gram "
        "xxhash64 fingerprints (grams never shipped as strings — 8 bytes "
        "each on the wire) -> broadcast the benchmark fingerprint set "
        "(|eval| << |corpus| always holds at training scale) -> map-side "
        "semi-join + partial-agg count. One shuffle (final groupBy), scan "
        "reads only (doc_id, text). The oracle recomputes overlap on the "
        "raw gram strings, so a hash-path bug turns the driver red. "
        "Reference analog: the manifest-vs-index reconciliation pattern "
        "(lib/python/dest_path_email.py) applied to eval contamination.",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = _doc_tokens(docs)
    grams = (
        toks.where(F.size("t") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - F.lit(7)),
                    lambda i: F.xxhash64(F.array_join(F.slice("t", i, 8), " ")),
                )
            ).alias("gh"),
        )
        .dropDuplicates(["doc_id", "gh"])
    )
    bench = (
        grams.where(F.col("doc_id") % 97 == 0).select("gh").distinct()
    )
    return (
        grams.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(F.count_distinct("gh").alias("n_shared_grams"))
    )


@register(
    "stratified_sample_documents",
    sql="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <=
          CASE lang WHEN 'en' THEN '7'
                    WHEN 'zh' THEN 'b'
                    ELSE '3' END
    """,
    doc="Deterministic stratified sampling: per-language keep rates "
        "(en 50%, zh 75%, others 25%) keyed on md5(doc_id) so the sample "
        "is reproducible across reruns, engines, and partitionings — the "
        "property random() lacks and training-data pipelines need for "
        "resumable jobs. Map-only (no shuffle, no state); at 100 TB this "
        "is a pure scan->filter that pushes the lang predicate into the "
        "CASE and prunes to three columns.",
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    rate = (
        F.when(F.col("lang") == "en", F.lit("7"))
        .when(F.col("lang") == "zh", F.lit("b"))
        .otherwise(F.lit("3"))
    )
    return docs.where(bucket <= rate).select("doc_id", "lang", "source")


@register(
    "repetition_quality_documents",
    sql="""
    WITH words AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
    ), freq AS (
        SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_words,
           count(*) AS n_distinct,
           CAST(max(c) AS BIGINT) AS top_word_n,
           CAST(round(10000.0 * count(*) / sum(c)) AS BIGINT) AS distinct_ratio_e4
    FROM freq
    GROUP BY doc_id
    HAVING sum(c) > 0
    """,
    doc="Repetition-based quality scoring: per-document word count, "
        "distinct-word count, top-word frequency, and distinct ratio — the "
        "degenerate-repetition filter (Gopher/C4-style) applied before "
        "training. Two-level aggregation, both map-side combinable; the "
        "(doc_id, word) key is high-cardinality and uniform so the shuffle "
        "has no skew. Integer outputs (ratio scaled e4) keep the oracle "
        "hash exact.",
)
def repetition_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    freq = (
        _doc_tokens(docs)
        .select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    return (
        freq.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.count("*").alias("n_distinct"),
            F.max("c").cast("long").alias("top_word_n"),
            F.round(10000.0 * F.count("*") / F.sum("c"))
            .cast("long")
            .alias("distinct_ratio_e4"),
        )
        .where(F.col("n_words") > 0)
    )


@register(
    "redaction_scan_documents",
    sql="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '(customer|user|key)'))) AS BIGINT)
               AS n_hits,
           CAST(sum(length(regexp_replace(text, '(customer|user|key)',
                                          '[REDACTED]', 'g'))) AS BIGINT)
               AS redacted_chars,
           count(*) FILTER (WHERE regexp_matches(text, '(customer|user|key)'))
               AS n_docs_hit
    FROM documents
    GROUP BY source
    """,
    doc="Sensitive-term scan + redaction accounting per source: match "
        "count, post-redaction character volume, and affected-document "
        "count — the PII-scrub audit step of a training pipeline (the "
        "term list stands in for email/phone/credential patterns; swap "
        "the regex, the plan is identical). Map-only regex work inside "
        "whole-stage codegen, then one partial-agged groupBy on the "
        "low-cardinality source key.",
)
def redaction_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pat = "(customer|user|key)"
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.regexp_count("text", F.lit(pat))).cast("long").alias("n_hits"),
        F.sum(F.length(F.regexp_replace("text", pat, "[REDACTED]")))
        .cast("long")
        .alias("redacted_chars"),
        F.count_if(F.col("text").rlike(pat)).alias("n_docs_hit"),
    )


@register(
    "sequence_packing_plan",
    sql="""
    WITH sized AS (
        SELECT doc_id, source,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok
        FROM documents
    ), packed AS (
        SELECT source, n_tok,
               CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                            ROWS UNBOUNDED PRECEDING) - n_tok)
                          / 512.0) AS BIGINT) AS pack_id
        FROM sized
    )
    SELECT source, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY source, pack_id
    """,
    doc="Sequence packing for training: concatenate documents in "
        "deterministic doc_id order within each source shard and split at "
        "512-token context boundaries (the concat-then-chunk packing GPT "
        "pipelines use), emitting per-pack document and token counts. The "
        "running sum is windowed PER SOURCE — packs never cross shards, so "
        "the plan is one hash-partition by source with no global sort; at "
        "100 TB the shard key becomes (source, day) and each task packs "
        "its shard independently.",
)
def sequence_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_WORD_RE), 0)).alias(
            "n_tok"
        ),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.select(
        "source",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(512.0))
        .cast("long")
        .alias("pack_id"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("pack_tokens"),
    )


@register(
    "sketch_accuracy_audit",
    sql="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           TRUE AS hll_within_2pct,
           TRUE AS p95_within_1pct
    FROM events
    GROUP BY event_type
    """,
    doc="Sketch operators with an ORACLED accuracy contract: HyperLogLog++ "
        "distinct counts (approx_count_distinct, rsd=0.01) and streaming "
        "quantile sketches (approx_percentile, accuracy 10k) are the only "
        "way to profile 10^10-event streams in one pass with bounded "
        "memory; this entry computes BOTH the sketch and the exact value "
        "per group and emits within-tolerance booleans (HLL 2%, p95 1%) "
        "that the DuckDB oracle pins to TRUE — a sketch-config regression "
        "(rsd bumped, accuracy lowered) turns the driver red instead of "
        "silently degrading the metrics tables. Both sketches are "
        "map-side mergeable (partial aggregation), the property that "
        "makes them scale.",
)
def sketch_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # exact distinct via two-level aggregation (map-side combinable) joined
    # to the sketch aggregate — fusing count_distinct into the same agg
    # plans an EXPAND over every row with no partial aggregation on the
    # distinct path (measured 10x slower at sf0.1: 7.2s vs 0.8s)
    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.lit(1))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_exact"))
    )
    sketches = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("_hll"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("_p95a"),
        F.expr("percentile(value, 0.95)").alias("_p95e"),
    )
    agg = sketches.join(exact, "event_type")
    return agg.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("_hll") - F.col("n_exact"))
            <= 0.02 * F.col("n_exact")
        ).alias("hll_within_2pct"),
        (
            F.abs(F.col("_p95a") - F.col("_p95e"))
            <= 0.01 * F.abs(F.col("_p95e"))
        ).alias("p95_within_1pct"),
    )


@register(
    "curation_pipeline_summary",
    sql="""
    WITH words AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
    ), freq AS (
        SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
    ), quality AS (
        SELECT doc_id, sum(c) AS n_words,
               count(*) * 1.0 / sum(c) AS distinct_ratio
        FROM freq GROUP BY doc_id
    ), staged AS (
        SELECT d.doc_id, d.lang,
               (q.n_words BETWEEN 20 AND 10000
                AND q.distinct_ratio >= 0.05) AS pass_quality,
               substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) <=
                   CASE d.lang WHEN 'en' THEN '7' ELSE '3' END AS sampled
        FROM documents d JOIN quality q ON d.doc_id = q.doc_id
    )
    SELECT lang,
           count(*) AS n_total,
           count(*) FILTER (WHERE pass_quality) AS n_pass_quality,
           count(*) FILTER (WHERE pass_quality AND sampled) AS n_selected
    FROM staged GROUP BY lang
    """,
    doc="The curation battery as ONE end-to-end flow: repetition-quality "
        "gate (word count 20-10000, distinct ratio >= 5%) then md5-keyed "
        "stratified sampling, reported per language — the funnel summary a "
        "training-data pipeline publishes per snapshot. Stage composition "
        "costs nothing extra in Spark: the quality aggregation's output "
        "joins back to the slim (doc_id, lang) projection and both the "
        "gate and the sampler are column predicates, so the whole funnel "
        "is two shuffles (word freq, per-doc agg) + one broadcast-ready "
        "join + one final partial-agged groupBy.",
)
def curation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    freq = (
        _doc_tokens(docs)
        .select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    quality = freq.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        (F.count("*") * 1.0 / F.sum("c")).alias("distinct_ratio"),
    )
    pass_quality = (
        F.col("n_words").between(20, 10000) & (F.col("distinct_ratio") >= 0.05)
    )
    sampled = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= (
        F.when(F.col("lang") == "en", F.lit("7")).otherwise(F.lit("3"))
    )
    staged = (
        docs.select("doc_id", "lang")
        .join(quality, "doc_id")
        .select(
            "lang",
            pass_quality.alias("pass_quality"),
            sampled.alias("sampled"),
        )
    )
    return staged.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count_if(F.col("pass_quality")).alias("n_pass_quality"),
        F.count_if(F.col("pass_quality") & F.col("sampled")).alias("n_selected"),
    )


# --------------------------------------------------------------------------
# Aggregation merge engine (Paimon `aggregation` parity): the running-totals
# table maintained by the change stream itself — per-column merge functions
# (sum / max / bool_or / last_non_null) instead of last-writer-wins rows.
# --------------------------------------------------------------------------

_AGG_STATE_SQL = """
    WITH ch AS (
        SELECT event_id AS lsn,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(floor(value * 100) AS BIGINT) AS total_tok,
               CAST(event_id % 37 AS INTEGER) AS max_turn,
               event_type = 'error' AS had_error,
               CASE WHEN event_type = 'purchase' THEN props END AS last_model
        FROM events
    ),
    agg AS (
        SELECT conv_id,
               CAST(sum(total_tok) AS BIGINT) AS total_tok,
               max(max_turn) AS max_turn,
               bool_or(had_error) AS had_error
        FROM ch GROUP BY conv_id
    ),
    last_row AS (
        SELECT conv_id, ts, lsn FROM ch
        QUALIFY row_number() OVER (
            PARTITION BY conv_id ORDER BY ts DESC, lsn DESC) = 1
    ),
    last_model AS (
        SELECT conv_id, last_model FROM ch WHERE last_model IS NOT NULL
        QUALIFY row_number() OVER (
            PARTITION BY conv_id ORDER BY ts DESC, lsn DESC) = 1
    )
    SELECT a.conv_id, a.total_tok, a.max_turn, a.had_error,
           m.last_model, r.ts, r.lsn
    FROM agg a
    JOIN last_row r ON a.conv_id = r.conv_id
    LEFT JOIN last_model m ON a.conv_id = m.conv_id
"""


def _agg_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event contribution rows derived from `events`: each event adds
    tokens, raises the turn high-water mark, may flip the error flag, and
    purchases stamp the serving model."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.lit("U").alias("op"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.format_string("u%04d", "user_id").alias("conv_id"),
        F.floor(F.col("value") * 100).cast("long").alias("total_tok"),
        F.pmod("event_id", F.lit(37)).cast("int").alias("max_turn"),
        (F.col("event_type") == "error").alias("had_error"),
        F.when(F.col("event_type") == "purchase", F.col("props"))
        .alias("last_model"),
    )


_AGG_STATE_FNS = {
    "total_tok": "sum",
    "max_turn": "max",
    "had_error": "bool_or",
    "last_model": "last_non_null",
}


@register(
    "aggregation_merge_state",
    sql=_AGG_STATE_SQL,
    doc="Aggregation merge OPERATOR (Paimon `aggregation` merge-engine "
        "semantics): one row per conv whose columns are per-column "
        "AGGREGATES over every contributing event — sum(tokens), "
        "max(turn), bool_or(error), last_non_null(model) — stamped at "
        "the latest contribution. ONE aggregation: every function is a "
        "built-in agg or a max/min over a (rank, value) struct, all "
        "map-side combinable, so a hot conversation's event storm "
        "collapses before the shuffle (cdc/dedup.py:aggregation_merge).",
)
def aggregation_merge_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .cdc.dedup import aggregation_merge

    return aggregation_merge(
        _agg_change_stream(spark, sf_dir).drop("op"),
        keys=["conv_id"], order=["ts", "lsn"], functions=_AGG_STATE_FNS,
    )


@register(
    "engine_aggregation_apply",
    sql=None,  # filled in right below: the operator's one-shot fold
    doc="Aggregation merge through the REAL engine "
        "(merge_engine='aggregation'): the contribution stream replays in "
        "two windows through CdcApplier into an aggregation table — each "
        "chunk pre-folds to re-mergeable partial rows (op='U' + the "
        "positional functions' write ranks in the hidden _wr struct) — "
        "with a full compaction between the windows, so window 2's events "
        "merge against COMPACTED partials purely through the fold "
        "algebra. The DuckDB oracle is the operator entry's one-shot "
        "fold: equality proves chunking, compaction and arrival order "
        "are invisible. tests/test_agg_table.py + test_agg_property.py "
        "pin the edges (duplicate redelivery, delete quarantine, "
        "rebucket, arbitrary chunk/compaction points).",
)
def engine_aggregation_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier

    scratch = tempfile.mkdtemp(prefix="q_aggeng_")
    stream = _agg_change_stream(spark, sf_dir)
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("total_tok", T.LongType(), True),
            T.StructField("max_turn", T.IntegerType(), True),
            T.StructField("had_error", T.BooleanType(), True),
            T.StructField("last_model", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("lsn", T.LongType(), True),
        ]
    )
    applier = CdcApplier.bootstrap_custom(
        spark, scratch, schema, merge_keys=["conv_id"], bucket_count=8,
        target_props={"merge_engine": "aggregation",
                      "agg_functions": _AGG_STATE_FNS},
    )
    applier.replay(stream, chunk_size=hi + 1, source_hi=hi // 2)
    applier.target.compact()
    applier.replay(stream, chunk_size=hi + 1)
    return _materialize_and_clean(applier.target.read(), scratch)


REGISTRY["engine_aggregation_apply"].sql = REGISTRY["aggregation_merge_state"].sql


# --------------------------------------------------------------------------
# CDC envelope decoders (sources/envelopes.py): each entry ENCODES a
# ground-truth change stream derived from `events` into the dialect's JSON
# envelope, runs the real decoder over the raw strings, and returns the
# decoded rows; the DuckDB oracle computes the same ground truth directly
# (no JSON), so any decode drift — op mapping, LSN derivation, timestamp
# unit, image selection (after vs before on deletes), type casts — breaks
# the hash. Reference analogue: every harvester normalizes its feed into a
# common shape before indexing (ardc_nrt/lib/bom/wfs.py; ARGO/rsync.sh).
# --------------------------------------------------------------------------

_ENVELOPE_IMAGE_COLS = ["conv_id", "turn_idx", "role", "text"]


def _envelope_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground-truth change rows (ms-truncated ts — the envelope wire unit)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
        .alias("op"),
        F.timestamp_millis(F.unix_millis(F.col("ts").cast("timestamp"))).alias("ts"),
        F.format_string("u%04d", "user_id").alias("conv_id"),
        F.pmod("event_id", F.lit(37)).cast("int").alias("turn_idx"),
        F.when(F.col("event_type") == "purchase", "assistant")
        .otherwise("user")
        .alias("role"),
        F.col("props").alias("text"),
    )


_ENVELOPE_TRUTH_SQL = """
    SELECT event_id AS lsn,
           CASE WHEN event_type = 'error' THEN 'D'
                WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
           make_timestamp(epoch_ms(CAST(ts AS TIMESTAMP)) * 1000) AS ts,
           printf('u%04d', user_id) AS conv_id,
           CAST(event_id % 37 AS INTEGER) AS turn_idx,
           CASE WHEN event_type = 'purchase' THEN 'assistant'
                ELSE 'user' END AS role,
           props AS text
    FROM events
"""


def _envelope_row_schema():
    return T.StructType(
        [
            T.StructField("conv_id", T.StringType(), True),
            T.StructField("turn_idx", T.IntegerType(), True),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )


@register(
    "debezium_envelope_decode",
    sql=_ENVELOPE_TRUTH_SQL,
    doc="Debezium JSON envelope decode: ground-truth changes encoded as "
        "{before, after, source{lsn, ts_ms}, op c|u|d} (after=null on "
        "deletes, image in before — the connector's actual delete shape), "
        "decoded back by sources/envelopes.decode_debezium. Pure from_json "
        "column expressions, whole-stage codegen, no Python.",
)
def debezium_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.envelopes import decode_debezium

    ch = _envelope_truth(spark, sf_dir)
    img = F.struct(*[F.col(c) for c in _ENVELOPE_IMAGE_COLS])
    env = F.to_json(
        F.struct(
            F.struct(
                F.when(F.col("op") == "D", img).alias("before"),
                F.when(F.col("op") != "D", img).alias("after"),
                F.struct(
                    F.col("lsn").alias("lsn"),
                    F.unix_millis("ts").alias("ts_ms"),
                ).alias("source"),
                F.when(F.col("op") == "I", "c")
                .when(F.col("op") == "U", "u")
                .otherwise("d")
                .alias("op"),
            ).alias("payload")
        )
    )
    decoded = decode_debezium(ch.select(env.alias("value")), _envelope_row_schema())
    return decoded.select("lsn", "op", "ts", *_ENVELOPE_IMAGE_COLS)


@register(
    "maxwell_envelope_decode",
    sql="""
    SELECT event_id AS lsn,
           CASE WHEN event_type = 'error' THEN 'D'
                WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
           make_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                          * 1000000) AS ts,
           printf('u%04d', user_id) AS conv_id,
           CAST(event_id % 37 AS INTEGER) AS turn_idx,
           CASE WHEN event_type = 'purchase' THEN 'assistant'
                ELSE 'user' END AS role,
           props AS text
    FROM events
    """,
    doc="Maxwell JSON envelope decode: type insert|update|delete, epoch-"
        "second ts, binlog position string 'file:pos' re-encoded to the "
        "engine LSN (file_no * 2^32 + pos). The position here is "
        "'master.000000:<event_id>' so the decoded LSN equals event_id — "
        "any drift in the position parse breaks the hash.",
)
def maxwell_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.envelopes import decode_maxwell

    # Maxwell's wire unit is SECONDS: truncate the truth accordingly
    ch = _envelope_truth(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp("ts"))
    )
    img = F.struct(*[F.col(c) for c in _ENVELOPE_IMAGE_COLS])
    env = F.to_json(
        F.struct(
            F.when(F.col("op") == "I", "insert")
            .when(F.col("op") == "U", "update")
            .otherwise("delete")
            .alias("type"),
            F.unix_timestamp("ts").alias("ts"),
            F.format_string("master.000000:%d", "lsn").alias("position"),
            img.alias("data"),
        )
    )
    decoded = decode_maxwell(ch.select(env.alias("value")), _envelope_row_schema())
    return decoded.select("lsn", "op", "ts", *_ENVELOPE_IMAGE_COLS)


@register(
    "canal_envelope_decode",
    sql="""
    SELECT epoch_ms(CAST(ts AS TIMESTAMP)) * 4096 AS lsn,
           CASE WHEN event_type = 'error' THEN 'D'
                WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
           make_timestamp(epoch_ms(CAST(ts AS TIMESTAMP)) * 1000) AS ts,
           printf('u%04d', user_id) AS conv_id,
           CAST(event_id % 37 AS INTEGER) AS turn_idx,
           CASE WHEN event_type = 'purchase' THEN 'assistant'
                ELSE 'user' END AS role,
           props AS text
    FROM events
    """,
    doc="Canal JSON envelope decode: UPPER-CASE type, ms execution time "
        "es, row images carried as an ARRAY of all-string rows (Canal "
        "stringifies every value) — posexploded and cast back to the "
        "target types; default LSN = es*4096 + position-in-message.",
)
def canal_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.envelopes import decode_canal

    ch = _envelope_truth(spark, sf_dir)
    simg = F.array(
        F.struct(
            F.col("conv_id").cast("string").alias("conv_id"),
            F.col("turn_idx").cast("string").alias("turn_idx"),
            F.col("role").cast("string").alias("role"),
            F.col("text").cast("string").alias("text"),
        )
    )
    env = F.to_json(
        F.struct(
            F.when(F.col("op") == "I", "INSERT")
            .when(F.col("op") == "U", "UPDATE")
            .otherwise("DELETE")
            .alias("type"),
            F.unix_millis("ts").alias("es"),
            F.col("lsn").alias("id"),
            simg.alias("data"),
        )
    )
    decoded = decode_canal(ch.select(env.alias("value")), _envelope_row_schema())
    return decoded.select("lsn", "op", "ts", *_ENVELOPE_IMAGE_COLS)


@register(
    "debezium_flat_envelope_decode",
    sql=_ENVELOPE_TRUTH_SQL,
    doc="Flattened Debezium (ExtractNewRecordState SMT) decode: the "
        "message IS the row with __op/__source_ts_ms/__lsn/__deleted "
        "metadata fields — the shape most Kafka consumers actually see. "
        "Rewrite-mode deletes keep the row image under __deleted=true; "
        "the oracle is the envelope-free ground truth.",
)
def debezium_flat_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.envelopes import decode_debezium_flat

    ch = _envelope_truth(spark, sf_dir)
    env = F.to_json(
        F.struct(
            *[F.col(c) for c in _ENVELOPE_IMAGE_COLS],
            F.when(F.col("op") == "I", "c")
            .when(F.col("op") == "U", "u")
            .otherwise("d")
            .alias("__op"),
            F.unix_millis("ts").alias("__source_ts_ms"),
            F.col("lsn").alias("__lsn"),
            F.when(F.col("op") == "D", "true")
            .otherwise("false")
            .alias("__deleted"),
        )
    )
    decoded = decode_debezium_flat(
        ch.select(env.alias("value")), _envelope_row_schema()
    )
    return decoded.select("lsn", "op", "ts", *_ENVELOPE_IMAGE_COLS)


@register(
    "dms_envelope_decode",
    sql=_ENVELOPE_TRUTH_SQL,
    doc="AWS DMS Kafka envelope decode: {data, metadata{timestamp ISO-8601 "
        "ms, record-type, operation load|insert|update|delete, "
        "transaction-id}}; full-load rows map to I, control records (DDL "
        "markers) are dropped. Oracle = the envelope-free ground truth, so "
        "op mapping, ISO timestamp parse and LSN selection are all pinned.",
)
def dms_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.envelopes import decode_dms

    ch = _envelope_truth(spark, sf_dir)
    img = F.struct(*[F.col(c) for c in _ENVELOPE_IMAGE_COLS])
    env = F.to_json(
        F.struct(
            img.alias("data"),
            F.struct(
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias(
                    "timestamp"
                ),
                F.lit("data").alias("record-type"),
                # exercise the full-load path on the I rows
                F.when(F.col("op") == "I", "load")
                .when(F.col("op") == "U", "update")
                .otherwise("delete")
                .alias("operation"),
                F.col("lsn").alias("transaction-id"),
            ).alias("metadata"),
        )
    )
    decoded = decode_dms(ch.select(env.alias("value")), _envelope_row_schema())
    return decoded.select("lsn", "op", "ts", *_ENVELOPE_IMAGE_COLS)


@register(
    "mongo_envelope_decode",
    sql="""
    SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 4294967296
             + event_id % 4294967296 AS lsn,
           CASE WHEN event_type = 'error' THEN 'D'
                WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
           make_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                          * 1000000) AS ts,
           printf('u%04d', user_id) AS conv_id,
           CAST(event_id % 37 AS INTEGER) AS turn_idx,
           CASE WHEN event_type = 'error' THEN NULL
                WHEN event_type = 'purchase' THEN 'assistant'
                ELSE 'user' END AS role,
           CASE WHEN event_type = 'error' THEN NULL ELSE props END AS text
    FROM events
    """,
    doc="MongoDB change-stream decode (full mode): operationType + BSON "
        "clusterTime {t, i} → LSN = t*2^32 + i (the oplog's own total "
        "order), second-precision ts; updates carry fullDocument "
        "(updateLookup), deletes carry only documentKey — payload columns "
        "NULL on D rows, which the oracle asserts explicitly.",
)
def mongo_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.envelopes import decode_mongo

    # Mongo's wire clock is the BSON timestamp: second precision
    ch = _envelope_truth(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp("ts"))
    )
    img = F.struct(*[F.col(c) for c in _ENVELOPE_IMAGE_COLS])
    key = F.struct(F.col("conv_id"), F.col("turn_idx"))
    env = F.to_json(
        F.struct(
            F.when(F.col("op") == "I", "insert")
            .when(F.col("op") == "U", "update")
            .otherwise("delete")
            .alias("operationType"),
            F.struct(
                F.struct(
                    F.unix_timestamp("ts").alias("t"),
                    F.pmod("lsn", F.lit(1 << 32)).alias("i"),
                ).alias("$timestamp")
            ).alias("clusterTime"),
            F.when(F.col("op") != "D", img).alias("fullDocument"),
            key.alias("documentKey"),
        )
    )
    decoded = decode_mongo(ch.select(env.alias("value")), _envelope_row_schema())
    return decoded.select("lsn", "op", "ts", *_ENVELOPE_IMAGE_COLS)


@register(
    "mongo_patch_decode",
    sql="""
    SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 4294967296
             + event_id % 4294967296 AS lsn,
           CASE WHEN event_type = 'error' THEN 'D'
                WHEN event_type = 'signup' THEN 'I' ELSE 'P' END AS op,
           printf('u%04d', user_id) AS conv_id,
           CAST(event_id % 37 AS INTEGER) AS turn_idx,
           CASE WHEN event_type = 'signup' THEN 'user'
                ELSE NULL END AS role,
           CASE WHEN event_type = 'error' THEN NULL ELSE props END AS text
    FROM events
    """,
    doc="MongoDB change-stream decode (patch mode): updates WITHOUT "
        "updateLookup decode to op='P' sparse rows — documentKey keys + "
        "updatedFields payload, NULL elsewhere — feeding the "
        "partial_update merge engine, whose value-conditional write ranks "
        "realize Mongo's 'absent field = untouched' semantics. Here "
        "updatedFields carries only text, so role must be NULL on P rows.",
)
def mongo_patch_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.envelopes import decode_mongo

    ch = _envelope_truth(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp("ts"))
    )
    img = F.struct(*[F.col(c) for c in _ENVELOPE_IMAGE_COLS])
    key = F.struct(F.col("conv_id"), F.col("turn_idx"))
    env = F.to_json(
        F.struct(
            F.when(F.col("op") == "I", "insert")
            .when(F.col("op") == "U", "update")
            .otherwise("delete")
            .alias("operationType"),
            F.struct(
                F.struct(
                    F.unix_timestamp("ts").alias("t"),
                    F.pmod("lsn", F.lit(1 << 32)).alias("i"),
                ).alias("$timestamp")
            ).alias("clusterTime"),
            F.when(F.col("op") == "I", img).alias("fullDocument"),
            key.alias("documentKey"),
            F.when(
                F.col("op") == "U",
                F.struct(
                    F.struct(F.col("text")).alias("updatedFields"),
                    F.array().cast("array<string>").alias("removedFields"),
                ),
            ).alias("updateDescription"),
        )
    )
    decoded = decode_mongo(
        ch.select(env.alias("value")), _envelope_row_schema(), mode="patch"
    )
    return decoded.select("lsn", "op", *_ENVELOPE_IMAGE_COLS)


@register(
    "stream_bus_envelope_apply",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               make_timestamp(epoch_ms(ts) * 1000) AS ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, lsn
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    doc="The full message-bus streaming composition through the REAL "
        "engine: the change stream is enveloped as Debezium bus records "
        "(streaming/bus.py to_bus_records — key-stable partitions, "
        "offset=lsn), written as a two-file bus archive, tailed by "
        "readStream via read_bus(transport='file'), decoded by the pure-"
        "column Debezium decoder inside each micro-batch, and applied "
        "through the exactly-once foreachBatch loop (epoch ids in the "
        "snapshot commit). The oracle is one LWW window over the events "
        "table with ts truncated to milliseconds — the precision a "
        "Debezium ts_ms hop preserves. Proves stream+decode+apply "
        "end-to-end, not just the batch decoders (VERDICT r4 item 6).",
)
def stream_bus_envelope_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.apply import CdcApplier
    from .cdc.schemas import CHANGES_SCHEMA as _CH
    from .streaming.bus import (
        read_bus,
        start_bus_apply_stream,
        write_bus_archive,
    )

    scratch = tempfile.mkdtemp(prefix="q_bus_")
    row_schema = T.StructType(
        [f for f in _CH.fields if f.name not in ("lsn", "op", "ts")]
    )
    stream = _engine_change_stream(spark, sf_dir).withColumn(
        "ts", F.timestamp_millis(F.unix_millis("ts"))
    )
    hi = stream.agg(F.max("lsn")).collect()[0][0]
    archive = f"{scratch}/archive"
    write_bus_archive(
        stream, row_schema, archive, topic="cdc.transcripts",
        chunks=[(0, hi // 2), (hi // 2, hi + 1)],
    )
    applier = CdcApplier.bootstrap(spark, f"{scratch}/lake", bucket_count=8)
    bus = read_bus(spark, "file", path=archive, max_files_per_trigger=1)
    q = start_bus_apply_stream(
        applier, bus, row_schema, "debezium",
        checkpoint_dir=f"{scratch}/ckpt", topic="cdc.transcripts",
    )
    q.processAllAvailable()
    q.stop()
    return _materialize_and_clean(applier.target.read(), scratch)


@register(
    "engine_sql_dml",
    sql=f"""
    WITH changes AS (
        SELECT event_id AS lsn,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts,
               printf('u%04d', user_id) AS conv_id,
               CAST(event_id % 37 AS INTEGER) AS turn_idx,
               {_ROLE_CASE} AS role,
               props AS text,
               event_type AS tool
        FROM events
    ), t0r AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes WHERE lsn % 2 = 0
    ), t0 AS (
        SELECT conv_id, turn_idx, role, text, tool, ts, lsn
        FROM t0r WHERE rn = 1 AND op <> 'D'
    ), srcr AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
        FROM changes WHERE lsn % 2 = 1
    ), src AS (
        SELECT conv_id, turn_idx, role, text, tool, ts, lsn
        FROM srcr WHERE rn = 1
    ),
    matched_upd AS (
        SELECT t.conv_id, t.turn_idx, s.role, s.text, s.tool,
               greatest(s.ts, t.ts) AS ts,
               greatest(s.lsn, t.lsn + 1) AS lsn
        FROM t0 t JOIN src s
          ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHERE s.tool <> 'error'
    ),
    inserts AS (
        SELECT s.* FROM src s
        WHERE NOT EXISTS (
            SELECT 1 FROM t0 t
            WHERE t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx)
    ),
    kept AS (
        SELECT t.* FROM t0 t
        WHERE NOT EXISTS (
            SELECT 1 FROM src s
            WHERE t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx)
    ),
    merged AS (
        SELECT * FROM matched_upd
        UNION ALL SELECT * FROM inserts
        UNION ALL SELECT * FROM kept
    ),
    updated AS (
        SELECT conv_id, turn_idx,
               CASE WHEN turn_idx = 0 THEN upper(role) ELSE role END AS role,
               text, tool, ts,
               CASE WHEN turn_idx = 0 THEN lsn + 1 ELSE lsn END AS lsn
        FROM merged
    )
    SELECT * FROM updated WHERE turn_idx <> 1
    """,
    doc="The SQL TEXT surface end-to-end (lake/sql.py LakeSQL — VERDICT r4 "
        "'What's missing #3'): the whole flow runs as SQL statements — "
        "INSERT INTO lake.t SELECT <LWW window over a temp view> seeds the "
        "target from the even-lsn half; MERGE INTO lake.t ... WHEN MATCHED "
        "AND s.tool='error' THEN DELETE / WHEN MATCHED THEN UPDATE SET * / "
        "WHEN NOT MATCHED THEN INSERT * applies the odd half; UPDATE "
        "lake.t SET role = upper(role) WHERE turn_idx = 0 (bare columns "
        "resolve to the current row, dominance stamp bumps lsn by 1); "
        "DELETE FROM lake.t WHERE turn_idx = 1; SELECT * FROM lake.t "
        "returns the state. The DuckDB oracle replays the same four "
        "statements as relational algebra. tests/test_lake_sql.py pins "
        "the parser's strict-failure surface.",
)
def engine_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .cdc.schemas import KEY_COLS, ORDER_COLS, TRANSCRIPTS_SCHEMA
    from .lake.sql import LakeSQL
    from .lake.table import LakeTable

    scratch = tempfile.mkdtemp(prefix="q_sql_")
    LakeTable.create(
        spark, f"{scratch}/t", TRANSCRIPTS_SCHEMA, KEY_COLS, 8,
        props={"merge_keys": KEY_COLS, "order_cols": ORDER_COLS},
    )
    _engine_change_stream(spark, sf_dir).createOrReplaceTempView("raw_changes")
    lsql = LakeSQL(spark, scratch)
    lww = (
        "SELECT conv_id, turn_idx, role, text, tool, ts, lsn FROM ("
        "  SELECT *, row_number() OVER ("
        "    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) rn"
        "  FROM raw_changes WHERE pmod(lsn, 2) = {par}) WHERE rn = 1{extra}"
    )
    lsql.sql(
        "INSERT INTO lake.t "
        + lww.format(par=0, extra=" AND op <> 'D'")
    )
    spark.sql(lww.format(par=1, extra="")).createOrReplaceTempView("src_odd")
    lsql.sql(
        """
        MERGE INTO lake.t AS tgt USING src_odd AS src
        ON src.conv_id = tgt.conv_id AND src.turn_idx = tgt.turn_idx
        WHEN MATCHED AND src.tool = 'error' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    lsql.sql("UPDATE lake.t SET role = upper(role) WHERE turn_idx = 0")
    lsql.sql("DELETE FROM lake.t WHERE turn_idx = 1")
    out = lsql.sql(
        "SELECT conv_id, turn_idx, role, text, tool, ts, lsn FROM lake.t"
    )
    return _materialize_and_clean(out, scratch)


# --------------------------------------------------------------------------
# Driver-verification window ordering.
#
# The correctness driver compares the FIRST 50 registry entries (dict
# iteration order) against their DuckDB oracles.  Rounds 1-2 verified the
# original first 50; the 20 entries registered later (plus new round-3
# entries) have only local evidence.  Rotate them to the front so every
# entry accumulates driver evidence across rounds; the previously-verified
# entries keep standing evidence in CORRECTNESS_r01/r02.
# --------------------------------------------------------------------------

_DRIVER_PRIORITY = [
    # --- round-5 window (first 50 = driver correctness gate) ---
    # new this round: the bus streaming composition + the SQL text surface
    "stream_bus_envelope_apply",
    "engine_sql_dml",
    # oracle + operator changed this round (integer-histogram digest)
    "multimodal_features",
    # the three r4 ERRORs, fixed by the timestamp-portability pin/cast
    "engine_first_row_apply",
    "engine_pruned_time_scan",
    "engine_tombstone_gc",
    # flagship: keep standing driver evidence every round
    "cdc_lww_apply",
    # stalest evidence (r02) — rotate forward so staleness never exceeds
    # two rounds (VERDICT r4 item 4)
    "set_except_intersect",
    "scalar_datetime_kitchen",
    "monotonicity_violations_value",
    "dedup_exact_documents",
    "simhash_buckets",
    "cosine_topk_embeddings",
    "lang_id_documents",
    "token_count_documents",
    "quality_score_documents",
    "fingerprint_documents",
    "broadcast_vocab_join",
    "sentinel_normalization",
    "collect_list_catalog",
    "avg_date_trunc_monthly",
    "month_range_delta_plan",
    "fuzzy_contains_join",
    "union_distinct_sorted",
    "greatest_least_interval",
    "embedding_cosine_neardup",
    "json_flatten_props",
    "topk_per_group",
    "dropna_subset",
    "multiformat_timestamp_parse",
    "bounds_quarantine_split",
    # next-stalest (r03), oldest-first fill to 50
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "conditional_agg_orders",
    "reagg_percent_segment",
    "having_active_users",
    "union_bool_or_flags",
    "chunked_batching",
    "window_lww_latest_event",
    "forward_fill_events",
    "lag_runlength_mask",
    "anti_join_inactive_customers",
    "semi_join_active_customers",
    "column_cardinality_profile",
    "sessionize_events",
    "md5_turn_fingerprint",
    "backpressure_gate",
    "rolling_avg_value",
    "tumbling_window_counts",
    "explode_word_counts",
    # --- below the 50-entry window: r3/r4 standing evidence ---
    "pivot_event_matrix",
    "value_percentiles",
    "reconciliation_3way",
    "rollup_revenue",
    "exists_late_orders",
    "revenue_share_scalar_subquery",
    "min_cost_supplier",
    "schema_mapping_apply",
    "qc_flag_histogram",
    "contract_report",
    "filename_convention_parse",
    "referential_integrity_report",
    "minhash_recall_vs_exact",
    "xml_feed_parse",
    "multimodal_decode_stats",
    "image_resize_stats",
    "ann_recall_floor",
    "ivf_recall_floor",
    "lsh_neardup_recall_floor",
    "simhash_exactdup_recall",
    "dedup_cluster_canonical",
    "decontaminate_ngram_overlap",
    "stratified_sample_documents",
    "repetition_quality_documents",
    "redaction_scan_documents",
    "sequence_packing_plan",
    "sketch_accuracy_audit",
    "curation_pipeline_summary",
]


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in _DRIVER_PRIORITY if n in REGISTRY}
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
