"""Property-based check of incremental view maintenance.

For ANY sequence of table states — inserts, in-place updates, group moves,
deletes, NULL group keys, NULL measures, duplicate extremes — refreshing
the view once per state transition must equal a from-scratch recompute of
COUNT/SUM/MIN/MAX per group. This drives the whole machinery: the counting
algorithm for SUM, the monotonic fast path and the flagged-group recompute
fallback for MIN/MAX, tombstoned groups, and the null-safe group joins.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from data_services_spark.lake import LakeTable
from data_services_spark.operators.incremental_view import IncrementalAggView

TS = dt.datetime(2024, 1, 1)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("v", T.IntegerType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# one row per key per window: (key 0..5, grp 0..2 or NULL, v 0..4 or NULL)
# — a tiny domain forces collisions: shared extremes, group moves, ties
row = st.tuples(
    st.integers(min_value=0, max_value=5),
    st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
    st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
)
window = st.lists(row, min_size=0, max_size=8)


def _state(rows: list[tuple]) -> dict:
    return {kid: (grp, v) for kid, grp, v in rows}  # last write per key wins


def _expected(state: dict) -> set[tuple]:
    if not state:
        return set()
    df = pd.DataFrame(
        [(f"g{g}" if g is not None else None, v) for g, v in state.values()],
        columns=["grp", "v"],
    )
    out = set()
    for grp, part in df.groupby("grp", dropna=False):
        key = None if pd.isna(grp) else grp
        vals = part["v"].dropna()
        out.add((
            key,
            len(part),
            int(vals.sum()) if len(vals) else None,
            int(vals.min()) if len(vals) else None,
            int(vals.max()) if len(vals) else None,
        ))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(windows=st.lists(window, min_size=1, max_size=3))
def test_incremental_refreshes_equal_recompute(spark, windows):
    scratch = tempfile.mkdtemp(prefix="view_prop_")
    try:
        src = LakeTable.create(
            spark, f"{scratch}/src", SRC_SCHEMA, ["k"], bucket_count=4,
            props={"merge_keys": ["k"]},
        )
        view = None
        for rows in windows:
            state = _state(rows)
            src.overwrite(spark.createDataFrame(
                [
                    (f"k{kid}", f"g{g}" if g is not None else None, v, TS)
                    for kid, (g, v) in state.items()
                ],
                SRC_SCHEMA,
            ))
            if view is None:
                view = IncrementalAggView.create(
                    spark, f"{scratch}/view", src, ["grp"], ["v"],
                    minmax_cols=["v"],
                )
            view.refresh()
            got = {
                (r.grp, r.n_rows, r.sum_v, r.min_v, r.max_v)
                for r in view.read().collect()
            }
            assert got == _expected(state), f"state {state}"
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
