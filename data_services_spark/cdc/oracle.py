"""Independent oracle for the CDC engine, in DuckDB SQL.

Computes the expected final table state by applying the change stream in
``(ts, lsn)`` LWW order with the same validation gates, entirely outside
Spark — the engine and the oracle share no code. Comparison is per-turn
md5(text) plus full-row equality, the reference's golden-md5 idiom
(``FAIMMS/REALTIME/faimms.py:286-294``, ``aims_realtime_util.py:366-375``).
"""

from __future__ import annotations

import duckdb
import pandas as pd


def _duck():
    """Fresh connection with a bounded allocator + disk spill: the oracle
    often runs INSIDE a worker process that already hosts a large-heap
    JVM, where the default greedy allocator can fail on transient
    pressure (observed at 4M events: 'Failed to allocate block of 4096
    bytes'). Bounded + spillable, the same fold just runs off-core."""
    import os as _os
    import tempfile as _tf

    con = duckdb.connect()
    con.execute("SET memory_limit='6GB'")
    con.execute(
        f"SET temp_directory='{_os.path.join(_tf.gettempdir(), 'duck_oracle_spill')}'"
    )
    return con

from .schemas import MAX_TEXT_CHARS

# mirrors validate.validation_reason — independently written SQL
_VALID_PRED = f"""
    lsn IS NOT NULL
    AND op IN ('I','U','D')
    AND ts IS NOT NULL
    AND conv_id IS NOT NULL
    AND turn_idx IS NOT NULL
    AND turn_idx >= 0
    AND (op = 'D' OR coalesce(role,'') IN ('user','assistant','system','tool'))
    AND coalesce(length(text), 0) <= {MAX_TEXT_CHARS}
"""


def expected_final_state(
    changes_parquet: str,
    hi_lsn: int | None = None,
    extra_cols: list[str] | None = None,
) -> pd.DataFrame:
    """LWW-apply the (validated) change stream up to ``hi_lsn``; return the
    expected final transcripts table as pandas, sorted by key."""
    import os

    if os.path.isdir(changes_parquet):  # Spark writes parquet as a directory
        changes_parquet = os.path.join(changes_parquet, "*.parquet")
    extra = "".join(f", {c}" for c in (extra_cols or []))
    hi = "" if hi_lsn is None else f"AND lsn <= {hi_lsn}"
    sql = f"""
    WITH ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, lsn DESC
        ) AS rn
        FROM read_parquet('{changes_parquet}', union_by_name=true)
        WHERE {_VALID_PRED} {hi}
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, lsn{extra}
    FROM ranked WHERE rn = 1 AND op <> 'D'
    ORDER BY conv_id, turn_idx
    """
    con = _duck()
    try:
        return con.sql(sql).df()
    finally:
        con.close()


def table_state_matches(actual: pd.DataFrame, expected: pd.DataFrame) -> tuple[bool, str]:
    """Bit-for-bit comparison under the per-turn text-equality invariant."""
    a = actual.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    e = expected.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    if len(a) != len(e):
        return False, f"row count mismatch: actual={len(a)} expected={len(e)}"
    cols = [c for c in e.columns if c in a.columns]
    a = a[cols]
    e = e[cols]
    for c in cols:
        av, ev = a[c], e[c]
        if c == "ts":
            av = pd.to_datetime(av).dt.tz_localize(None)
            ev = pd.to_datetime(ev).dt.tz_localize(None)
        neq = ~((av == ev) | (av.isna() & ev.isna()))
        if neq.any():
            i = int(neq.idxmax())
            return False, (
                f"column {c} differs at row {i}: "
                f"actual={av.iloc[i]!r} expected={ev.iloc[i]!r} "
                f"(key={a['conv_id'].iloc[i]},{a['turn_idx'].iloc[i]})"
            )
    return True, f"match: {len(a)} rows"


def per_turn_text_md5(df: pd.DataFrame) -> pd.Series:
    """md5 of each turn's text keyed by (conv_id, turn_idx)."""
    import hashlib

    keyed = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return keyed.apply(
        lambda r: hashlib.md5(
            f"{r.conv_id}|{r.turn_idx}|{r.text}".encode()
        ).hexdigest(),
        axis=1,
    )


# patch streams additionally admit op 'P'; full-row gates apply to full
# writes only, but a PATCHED role must still be a legal role
_PATCH_VALID_PRED = f"""
    lsn IS NOT NULL
    AND op IN ('I','U','D','P')
    AND ts IS NOT NULL
    AND conv_id IS NOT NULL
    AND turn_idx IS NOT NULL
    AND turn_idx >= 0
    AND (op IN ('D','P') OR coalesce(role,'') IN ('user','assistant','system','tool'))
    AND (op <> 'P' OR role IS NULL OR role IN ('user','assistant','system','tool'))
    AND coalesce(length(text), 0) <= {MAX_TEXT_CHARS}
"""


def expected_patch_state(
    changes_parquet: str,
    hi_lsn: int | None = None,
    conv_suffix: str | None = None,
) -> pd.DataFrame:
    """Partial-update fold of the (validated) patch stream, entirely in
    DuckDB — the independent oracle for ``merge_engine='partial_update'``
    tables. Horizon formulation: per key, ``r0`` = the latest full write
    or delete under (ts, lsn); dead if D or absent; else each column takes
    the latest at-or-after-``r0`` writer (full writes write every column,
    patches their non-null ones) and the row stamps ``r0``."""
    import os

    if os.path.isdir(changes_parquet):
        changes_parquet = os.path.join(changes_parquet, "*.parquet")
    hi = "" if hi_lsn is None else f"AND lsn <= {hi_lsn}"
    # the fold is per-key, so a deterministic key slice folds to exactly
    # that slice of the final state — bench-scale spot verification
    suf = ("" if conv_suffix is None
           else f"AND conv_id LIKE '%{conv_suffix}'")
    sql = f"""
    WITH valid AS (
        SELECT * REPLACE (CASE WHEN op = 'I' THEN 'U' ELSE op END AS op)
        FROM read_parquet('{changes_parquet}', union_by_name=true)
        WHERE {_PATCH_VALID_PRED} {hi} {suf}
    ),
    r0 AS (
        SELECT conv_id, turn_idx, ts, lsn, op
        FROM valid WHERE op IN ('U', 'D')
        QUALIFY row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) = 1
    ),
    alive AS (SELECT * FROM r0 WHERE op = 'U'),
    applied AS (
        SELECT c.* FROM valid c
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
    ORDER BY m.conv_id, m.turn_idx
    """
    con = _duck()
    try:
        return con.sql(sql).df()
    finally:
        con.close()


# first_row streams: the generic envelope + key gates, deletes rejected
# into quarantine (never part of the final state either way)
_FIRST_ROW_VALID_PRED = """
    lsn IS NOT NULL
    AND op IN ('I','U')
    AND ts IS NOT NULL
    AND conv_id IS NOT NULL
    AND turn_idx IS NOT NULL
"""


def expected_first_row_state(
    changes_parquet: str,
    hi_lsn: int | None = None,
    extra_cols: list[str] | None = None,
) -> pd.DataFrame:
    """First-writer-wins fold of the (validated) change stream — the
    independent oracle for ``merge_engine='first_row'`` tables: per key,
    the row with MIN (ts, lsn). Deletes are quarantined by the engine's
    first_row validation ladder, so the predicate admits I/U only."""
    import os

    if os.path.isdir(changes_parquet):
        changes_parquet = os.path.join(changes_parquet, "*.parquet")
    extra = "".join(f", {c}" for c in (extra_cols or []))
    hi = "" if hi_lsn is None else f"AND lsn <= {hi_lsn}"
    sql = f"""
    WITH ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx
            ORDER BY ts ASC, lsn ASC
        ) AS rn
        FROM read_parquet('{changes_parquet}', union_by_name=true)
        WHERE {_FIRST_ROW_VALID_PRED} {hi}
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, lsn{extra}
    FROM ranked WHERE rn = 1
    ORDER BY conv_id, turn_idx
    """
    con = _duck()
    try:
        return con.sql(sql).df()
    finally:
        con.close()
