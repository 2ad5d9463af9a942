"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, compares row count, column names, and order-insensitive values
(stricter than a hash: exact per-cell comparison after canonical sort).

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str).where(~df[c].isna(), None)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare(name: str, spark_df, con) -> tuple[bool, str]:
    import __spark_entry__ as entrymod

    sqls = entrymod.oracle_sql()
    a = _canon(spark_df.toPandas())
    if name not in sqls:
        return True, f"rows-only: {len(a)} rows"
    e = _canon(con.sql(sqls[name]).df())
    if sorted(a.columns) != sorted(e.columns):
        return False, f"schema mismatch: spark={sorted(a.columns)} oracle={sorted(e.columns)}"
    if len(a) != len(e):
        return False, f"row count: spark={len(a)} oracle={len(e)}"
    for c in a.columns:
        av, ev = a[c], e[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(ev):
            m = ~(
                (pd.to_numeric(av).fillna(1e308) - pd.to_numeric(ev).fillna(1e308)).abs()
                < 1e-6
            )
        else:
            m = ~((av == ev) | (av.isna() & ev.isna()))
        if m.any():
            i = int(m.idxmax())
            return False, f"value mismatch col={c} row={i}: spark={av.iloc[i]!r} oracle={ev.iloc[i]!r}"
    return True, f"match: {len(a)} rows x {len(a.columns)} cols"


def main() -> int:
    import __spark_entry__ as entrymod
    from data_services_spark.queries import TABLES
    from data_services_spark.session import get_spark

    spark = get_spark("check_correctness", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    names = sys.argv[1:] or list(qs)
    failures = 0
    for name in names:
        t0 = time.monotonic()
        try:
            df = qs[name](spark, SF_DIR)
            ok, msg = compare(name, df, con)
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(ex).__name__}: {ex}"
        dt = time.monotonic() - t0
        print(f"{'PASS' if ok else 'FAIL':4} {name:36} {dt:6.1f}s  {msg}")
        failures += (not ok)
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
