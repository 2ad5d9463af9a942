"""Property-based check of multi-table routing: for ANY multiset of
multiplexed change events (random table assignment, duplicate LSNs as
redeliveries, ts ties, deletes) replayed under ANY chunking — including a
mid-replay router reload (driver restart) — every table's final state
equals the per-table pandas LWW oracle over exactly its own slice, and
no event leaks across tables."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from data_services_spark.cdc.router import CdcRouter, TableSpec

EPOCH = dt.datetime(2025, 1, 1)

A_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("lsn", T.LongType(), True),
])
B_SCHEMA = T.StructType([
    T.StructField("site", T.StringType(), False),
    T.StructField("val", T.DoubleType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("lsn", T.LongType(), True),
])

SPECS = {
    "ta": TableSpec(A_SCHEMA, ["conv_id", "turn_idx"], bucket_count=2),
    "tb": TableSpec(B_SCHEMA, ["site"], bucket_count=2),
}

# (table_pick, key, ts offset, lsn); op and payload DERIVE from these so
# an identical (key, ts, lsn) pair is an identical event — engine tie-break
# at equal rank is then content-neutral and the oracle stays deterministic
event = st.tuples(
    st.integers(min_value=0, max_value=1),
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=99),
)


def _is_del(lsn):
    return lsn % 7 == 0


def _oracle(rows, table):
    pick = 0 if table == "ta" else 1
    mine = [r for r in rows if r[0] == pick]
    if not mine:
        return set()
    df = pd.DataFrame(mine, columns=["t", "key", "off", "lsn"]).drop_duplicates()
    df["rank"] = list(zip(df["off"], df["lsn"]))
    idx = df.groupby("key")["rank"].idxmax()
    win = df.loc[idx]
    return {(int(r.key), int(r.off), int(r.lsn))
            for r in win.itertuples() if not _is_del(r.lsn)}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(event, min_size=2, max_size=40), data=st.data())
def test_router_any_chunking_matches_per_table_oracle(
    spark, tmp_path_factory, rows, data,
):
    root = str(tmp_path_factory.mktemp("route_prop") / "r")
    router = CdcRouter.bootstrap(spark, root, SPECS)
    stream = spark.createDataFrame(
        [
            (
                "ta" if pick == 0 else "tb",
                "D" if lsn % 7 == 0 else "U",
                EPOCH + dt.timedelta(seconds=off),
                lsn,
                f"c{key}" if pick == 0 else None,
                key if pick == 0 else None,
                f"t-{key}-{off}-{lsn}" if pick == 0 else None,
                f"s{key}" if pick == 1 else None,
                float(off) if pick == 1 else None,
            )
            for pick, key, off, lsn in rows
        ],
        "_table string, op string, ts timestamp, lsn long, "
        "conv_id string, turn_idx int, text string, site string, val double",
    )
    hi = max(lsn for _, _, _, lsn in rows)
    split = data.draw(st.integers(min_value=0, max_value=hi), label="split")
    chunk = data.draw(st.integers(min_value=1, max_value=hi + 1), label="chunk")
    # window 1, then a reload (driver restart), then the full stream
    router.replay(stream.where(stream.lsn <= split), chunk_size=chunk)
    router2 = CdcRouter.load(spark, root)
    router2.replay(stream, chunk_size=chunk)

    got_a = {
        (r["turn_idx"], int(r["ts"].timestamp() - EPOCH.timestamp()), r["lsn"])
        for r in router2.appliers["ta"].target.read().collect()
    }
    assert got_a == _oracle(rows, "ta")
    got_b = {
        (int(r["site"][1:]), int(r["ts"].timestamp() - EPOCH.timestamp()),
         r["lsn"])
        for r in router2.appliers["tb"].target.read().collect()
    }
    assert got_b == _oracle(rows, "tb")
