"""Property-based checks of partial-update merge.

The REFERENCE implementation here is the literal spec, horizon
formulation: per key, ``r0`` = the latest U/D under (ts, lsn); dead if it
is a D or absent; else every payload column takes the value of the latest
at-or-after-``r0`` event that wrote it, and the row stamps ``r0``. The
Spark operator computes the same thing WITHOUT materializing the horizon
(U-dominance) — these tests are the proof the shortcut is equivalent, for
any event multiset and, at the engine layer, any chunking and any
compaction point.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_services_spark.cdc.dedup import partial_update_merge

EPOCH = dt.datetime(2025, 1, 1)
ROLES = [None, "user", "assistant", "system"]
TEXTS = [None, "t1", "t2", "t3"]

# (key, op_idx, ts_off, role_idx, text_idx) — lsn is assigned by position
# (unique: the spec requires delivery-deduped input)
event = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=3),   # 0,1=U 2=P 3=D (U-biased)
    st.integers(min_value=0, max_value=6),   # ts ties likely -> lsn tiebreak
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=3),
)


def _decode(rows):
    out = []
    for lsn, (k, opi, off, ri, ti) in enumerate(rows):
        op = "D" if opi == 3 else ("P" if opi == 2 else "U")
        if op == "D":
            role = text = None
        elif op == "U":
            # full writes must pass the validator's role gate; text may be
            # an explicit NULL reset
            role = ROLES[1 + ri % 3]
            text = TEXTS[ti]
        else:  # patches: every column optionally written
            role, text = ROLES[ri], TEXTS[ti]
        out.append((lsn, op, EPOCH + dt.timedelta(seconds=off),
                    f"c{k}", 0, role, text))
    return out


def _py_fold(events):
    """Literal horizon-formulation fold (pure Python)."""
    per_key: dict = {}
    for (lsn, op, ts, cid, ti, role, text) in events:
        per_key.setdefault((cid, ti), []).append((ts, lsn, op, role, text))
    out = {}
    for key, evs in per_key.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        ud = [e for e in evs if e[2] in ("U", "D")]
        if not ud:
            continue
        r0 = ud[-1]
        if r0[2] == "D":
            continue
        since = [e for e in evs if (e[0], e[1]) >= (r0[0], r0[1])]
        vals = {}
        for col_idx, col in ((3, "role"), (4, "text")):
            writers = [
                e for e in since
                if e[2] == "U" or (e[2] == "P" and e[col_idx] is not None)
            ]
            vals[col] = writers[-1][col_idx] if writers else None
        out[key] = (vals["role"], vals["text"], r0[0], r0[1])
    return out


def _spark_df(spark, events):
    return spark.createDataFrame(
        [(lsn, op, ts, cid, ti, role, text)
         for (lsn, op, ts, cid, ti, role, text) in events],
        "lsn long, op string, ts timestamp, conv_id string, turn_idx int, "
        "role string, text string",
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(event, min_size=1, max_size=40))
def test_operator_matches_literal_horizon_fold(spark, rows):
    events = _decode(rows)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["ts"], r["lsn"])
        for r in partial_update_merge(
            _spark_df(spark, events), keys=["conv_id", "turn_idx"]
        ).collect()
    }
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
    data=st.data(),
)
def test_engine_invariant_to_chunking_and_compaction(
    spark, tmp_path_factory, rows, cut, compact_first, data
):
    """ANY split of the stream into two apply windows, with or without a
    compaction between them, yields the same final state as the one-shot
    operator fold — arrival order and physical layout are invisible."""
    from data_services_spark.cdc.apply import CdcApplier

    events = _decode(rows)
    cut = min(cut, len(events) - 1)
    # second window's events must carry HIGHER lsns (replay resumes past
    # the committed watermark) — chunking is by lsn, so split by position
    root = tmp_path_factory.mktemp("patchprop")
    applier = CdcApplier.bootstrap(
        spark, str(root), bucket_count=2,
        target_props={"merge_engine": "partial_update"},
    )
    df = _spark_df(spark, events)
    applier.replay(df, chunk_size=len(events) + 1, source_hi=cut - 1)
    if compact_first:
        applier.target.compact()
    applier.replay(df, chunk_size=len(events) + 1)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["ts"], r["lsn"])
        for r in applier.target.read().collect()
    }
    assert got == _py_fold(events)
