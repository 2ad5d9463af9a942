"""Property-based checks of the aggregation merge engine.

The REFERENCE implementation is a literal pure-Python fold: per key,
``sum``/``max``/``bool_or`` over non-null contributions, ``last_non_null``
= value of the latest (ts, lsn) non-null write, order stamp = latest
contribution. The Spark operator computes the same thing as ONE
map-side-combinable aggregation, and the ENGINE path must be invariant to
chunking and compaction points — folded partial rows merging with raw
events through the same algebra is the design's load-bearing claim.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from data_services_spark.cdc.dedup import aggregation_merge

EPOCH = dt.datetime(2025, 1, 1)
MODELS = [None, "m1", "m2"]

SCHEMA = T.StructType([
    T.StructField("lsn", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("n_tokens", T.LongType(), True),
    T.StructField("max_turn", T.IntegerType(), True),
    T.StructField("had_error", T.BooleanType(), True),
    T.StructField("model", T.StringType(), True),
])

AGG_FNS = {
    "n_tokens": "sum",
    "max_turn": "max",
    "had_error": "bool_or",
    "model": "last_non_null",
}

# (key, ts_off, tokens_or_none, turn_or_none, err_idx, model_idx)
event = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=6),   # ts ties likely -> lsn tiebreak
    st.one_of(st.none(), st.integers(min_value=-5, max_value=50)),
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
    st.integers(min_value=0, max_value=2),   # 0=None 1=False 2=True
    st.integers(min_value=0, max_value=2),
)


def _decode(rows):
    out = []
    for lsn, (k, off, tok, turn, erri, mi) in enumerate(rows):
        out.append((
            lsn, "U", EPOCH + dt.timedelta(seconds=off), f"c{k}",
            tok, turn, [None, False, True][erri], MODELS[mi],
        ))
    return out


def _py_fold(events):
    per_key: dict = {}
    for ev in events:
        per_key.setdefault(ev[3], []).append(ev)
    out = {}
    for key, evs in per_key.items():
        evs.sort(key=lambda e: (e[2], e[0]))  # (ts, lsn)
        toks = [e[4] for e in evs if e[4] is not None]
        turns = [e[5] for e in evs if e[5] is not None]
        errs = [e[6] for e in evs if e[6] is not None]
        models = [e[7] for e in evs if e[7] is not None]
        last = evs[-1]
        out[key] = (
            sum(toks) if toks else None,
            max(turns) if turns else None,
            any(errs) if errs else None,
            models[-1] if models else None,
            last[2], last[0],
        )
    return out


def _spark_df(spark, events):
    return spark.createDataFrame(events, SCHEMA)


def _collect(df):
    return {
        r["conv_id"]: (
            r["n_tokens"], r["max_turn"], r["had_error"], r["model"],
            r["ts"], r["lsn"],
        )
        for r in df.collect()
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(event, min_size=1, max_size=40))
def test_operator_matches_literal_fold(spark, rows):
    events = _decode(rows)
    got = _collect(
        aggregation_merge(
            _spark_df(spark, events).drop("op"),
            keys=["conv_id"], order=["ts", "lsn"], functions=AGG_FNS,
        )
    )
    assert got == _py_fold(events)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(event, min_size=2, max_size=24),
    cut=st.integers(min_value=1, max_value=23),
    compact_first=st.booleans(),
)
def test_engine_invariant_to_chunking_and_compaction(
    spark, tmp_path_factory, rows, cut, compact_first
):
    """ANY split of the stream into two apply windows, with or without a
    compaction between them, yields the same final state as the one-shot
    operator fold — folded partials re-merge exactly."""
    from data_services_spark.cdc.apply import CdcApplier

    events = _decode(rows)
    cut = min(cut, len(events) - 1)
    root = tmp_path_factory.mktemp("aggprop")
    stats_schema = T.StructType(
        [f for f in SCHEMA.fields if f.name != "op"]
    )
    applier = CdcApplier.bootstrap_custom(
        spark, str(root), stats_schema,
        merge_keys=["conv_id"], bucket_count=2,
        target_props={"merge_engine": "aggregation", "agg_functions": AGG_FNS},
    )
    df = _spark_df(spark, events)
    applier.replay(df, chunk_size=len(events) + 1, source_hi=cut - 1)
    if compact_first:
        applier.target.compact()
    applier.replay(df, chunk_size=len(events) + 1)
    assert _collect(applier.target.read()) == _py_fold(events)
