"""SCD Type-2 history: batch operator + incremental maintainer.

The incremental tier's contract: after any sequence of refreshes, the
history table equals the version chains derivable from the SOURCE TABLE'S
committed state sequence (state-history semantics) — verified here by
reconstructing the expected chains driver-side from time-travel reads of
every refreshed-at snapshot.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_services_spark.cdc.apply import CdcApplier
from data_services_spark.cdc.schemas import CHANGES_SCHEMA
from data_services_spark.operators.scd import Scd2History, scd2_history

EPOCH = dt.datetime(2024, 1, 1)


def _ts(minute: int) -> dt.datetime:
    return EPOCH + dt.timedelta(minutes=minute)


def _changes(spark, rows):
    """rows: (lsn, op, minute, conv_id, turn_idx, role, text)"""
    data = [
        (lsn, op, _ts(m), cid, ti, role, text, None)
        for (lsn, op, m, cid, ti, role, text) in rows
    ]
    return spark.createDataFrame(data, CHANGES_SCHEMA)


# ---------------------------------------------------------------- batch tier


def test_batch_scd2_chain(spark):
    ch = _changes(spark, [
        (0, "U", 0, "a", 0, "user", "v1"),
        (1, "U", 5, "a", 0, "user", "v2"),      # closes v1 (update)
        (2, "D", 9, "a", 0, None, None),          # closes v2 (delete)
        (3, "U", 12, "a", 0, "user", "v3"),     # resurrect -> current
        (4, "U", 1, "b", 1, "assistant", "w1"),  # single version, current
    ])
    out = scd2_history(ch, keys=["conv_id", "turn_idx"]).orderBy(
        "conv_id", "valid_from"
    )
    rows = [r.asDict() for r in out.collect()]
    a = [r for r in rows if r["conv_id"] == "a"]
    assert [r["text"] for r in a] == ["v1", "v2", "v3"]
    assert a[0]["valid_to"] == _ts(5) and a[0]["end_reason"] == "update"
    assert a[1]["valid_to"] == _ts(9) and a[1]["end_reason"] == "delete"
    assert a[2]["valid_to"] is None and a[2]["is_current"]
    assert not a[0]["is_current"] and not a[1]["is_current"]
    b = [r for r in rows if r["conv_id"] == "b"]
    assert len(b) == 1 and b[0]["is_current"] and b[0]["end_reason"] is None


# ---------------------------------------------------------- incremental tier


def _expected_chains(source, snapshot_ids):
    """Reconstruct expected version chains from the committed state at each
    refreshed snapshot (driver-side; test tables are tiny)."""
    states = []
    for sid in snapshot_ids:
        df = source.read(snapshot_id=sid)
        states.append({
            (r["conv_id"], r["turn_idx"]): r.asDict() for r in df.collect()
        })
    versions = {}  # (key, valid_from) -> row
    for prev, cur in zip(states, states[1:]):
        for key, row in cur.items():
            p = prev.get(key)
            if p is not None and p["lsn"] != row["lsn"]:
                # key changed: close the open version (unless zero-duration)
                if p["ts"] != row["ts"]:
                    versions[(key, p["ts"])] = dict(
                        p, valid_to=row["ts"], end_reason="update",
                        is_current=False,
                    )
                else:
                    versions.pop((key, p["ts"]), None)
            if p is None or p["lsn"] != row["lsn"]:
                versions[(key, row["ts"])] = dict(
                    row, valid_to=None, end_reason=None, is_current=True,
                )
        for key, p in prev.items():
            if key not in cur:
                versions[(key, p["ts"])] = dict(
                    p, valid_to=None, end_reason="delete", is_current=False,
                )
    out = set()
    for (key, vf), v in versions.items():
        out.add((
            key[0], key[1], v["role"], v["text"], vf, v["valid_to"],
            v["end_reason"], v["is_current"],
        ))
    return out


def _hist_rows(hist):
    return {
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["valid_from"],
         r["valid_to"], r["end_reason"], r["is_current"])
        for r in hist.read().collect()
    }


@pytest.fixture()
def pair(spark, tmp_path):
    applier = CdcApplier.bootstrap(spark, str(tmp_path / "src"), bucket_count=4)
    hist = Scd2History.create(
        spark, str(tmp_path / "hist"), applier.target, bucket_count=4
    )
    return applier, hist


def test_incremental_matches_state_history(spark, pair):
    applier, hist = pair
    stream = _changes(spark, [
        # key A: updated in every window
        (0, "U", 0, "a", 0, "user", "a1"),
        (10, "U", 20, "a", 0, "user", "a2"),
        (20, "U", 40, "a", 0, "user", "a3"),
        # key B: created w1, deleted w2
        (1, "U", 1, "b", 0, "user", "b1"),
        (11, "D", 21, "b", 0, None, None),
        # key C: created w1, deleted w2, resurrected w3
        (2, "U", 2, "c", 0, "user", "c1"),
        (12, "D", 22, "c", 0, None, None),
        (21, "U", 42, "c", 0, "assistant", "c2"),
        # key D: stable from w1 (single current version)
        (3, "U", 3, "d", 0, "system", "d1"),
        # key E: appears only in w3
        (22, "U", 43, "e", 0, "user", "e1"),
        # key F: LATE event in w3 loses LWW to its w1 state (no version)
        (4, "U", 4, "f", 0, "user", "f-new"),
        (23, "U", 1, "f", 0, "user", "f-stale"),
    ])
    sids = [applier.target.current_snapshot_id()]
    for hi in (9, 19, 99):
        applier.replay(stream, chunk_size=1000, source_hi=hi)
        res = hist.refresh()
        assert res["refreshed"]
        sids.append(applier.target.current_snapshot_id())
    got = _hist_rows(hist)
    want = _expected_chains(applier.target, sids)
    assert got == want
    # the late w3 event for F produced no version: exactly one F row, current
    f = [r for r in got if r[0] == "f"]
    assert len(f) == 1 and f[0][3] == "f-new" and f[0][7] is True
    # B ends closed-by-delete with unknown end time
    b = [r for r in got if r[0] == "b"]
    assert len(b) == 1 and b[0][6] == "delete" and b[0][5] is None
    # A has three versions, exactly one current
    a = sorted((r for r in got if r[0] == "a"), key=lambda r: r[4])
    assert [r[3] for r in a] == ["a1", "a2", "a3"]
    assert [r[7] for r in a] == [False, False, True]


def test_refresh_idempotent_by_watermark(spark, pair):
    applier, hist = pair
    stream = _changes(spark, [(0, "U", 0, "a", 0, "user", "a1")])
    applier.replay(stream, chunk_size=100)
    assert hist.refresh()["refreshed"]
    before = hist.table.current_snapshot_id()
    res = hist.refresh()  # source unmoved -> pure no-op, zero commits
    assert not res["refreshed"]
    assert hist.table.current_snapshot_id() == before


def test_same_ts_succession_drops_zero_duration_version(spark, pair):
    applier, hist = pair
    stream = _changes(spark, [
        (0, "U", 7, "a", 0, "user", "old"),
        (10, "U", 7, "a", 0, "user", "new"),   # same ts, higher lsn wins
    ])
    applier.replay(stream, chunk_size=100, source_hi=5)
    hist.refresh()
    applier.replay(stream, chunk_size=100)
    hist.refresh()
    rows = _hist_rows(hist)
    assert rows == {("a", 0, "user", "new", _ts(7), None, None, True)}


def test_current_only_read(spark, pair):
    applier, hist = pair
    stream = _changes(spark, [
        (0, "U", 0, "a", 0, "user", "a1"),
        (10, "U", 20, "a", 0, "user", "a2"),
    ])
    applier.replay(stream, chunk_size=100, source_hi=5)
    hist.refresh()
    applier.replay(stream, chunk_size=100)
    hist.refresh()
    cur = hist.read(current_only=True).collect()
    assert len(cur) == 1 and cur[0]["text"] == "a2"
    assert hist.read().count() == 2


def test_scd2_as_streaming_view(spark, tmp_path):
    """Scd2History satisfies the streaming mart's view contract (refresh()
    per micro-batch): the dimension history trails the table by at most
    one micro-batch, and converges to the state-history expectation."""
    from pyspark.sql import functions as F2

    from data_services_spark.streaming.stream_apply import (
        start_apply_stream,
        stream_changes,
    )

    src = str(tmp_path / "src")
    full = _changes(spark, [
        (0, "U", 0, "a", 0, "user", "a1"),
        (1, "U", 1, "b", 0, "user", "b1"),
        (10, "U", 20, "a", 0, "user", "a2"),
        (11, "D", 21, "b", 0, None, None),
        (20, "U", 40, "a", 0, "user", "a3"),
    ])
    for lo, hi in ((0, 9), (10, 19), (20, 29)):
        (full.where((F2.col("lsn") >= lo) & (F2.col("lsn") <= hi))
             .coalesce(1).write.mode("append").parquet(src))
    applier = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=4)
    hist = Scd2History.create(
        spark, str(tmp_path / "hist"), applier.target, bucket_count=4
    )
    q = start_apply_stream(
        applier,
        stream_changes(spark, src, max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "ckpt"),
        views=[hist],
    )
    q.processAllAvailable()
    q.stop()
    got = _hist_rows(hist)
    a = sorted((r for r in got if r[0] == "a"), key=lambda r: r[4])
    assert [r[3] for r in a] == ["a1", "a2", "a3"]
    assert [r[7] for r in a] == [False, False, True]
    b = [r for r in got if r[0] == "b"]
    assert len(b) == 1 and b[0][6] == "delete" and not b[0][7]


# ------------------------------------------------------- temporal enrichment


def _history(spark):
    """Dim history with update/delete/resurrect and a same-instant race."""
    from data_services_spark.operators.scd import scd2_history

    ch = _changes(spark, [
        (0, "U", 10, "a", 0, "user", "v1"),
        (1, "U", 20, "a", 0, "user", "v2"),     # closes v1
        (2, "D", 30, "a", 0, None, None),       # delete at 30
        (3, "U", 40, "a", 0, "user", "v3"),     # resurrect, open
        (4, "U", 10, "b", 1, "user", "w1"),
        (5, "U", 10, "b", 1, "user", "w2"),     # same ts, higher lsn wins
        (6, "U", 50, "c", 2, "user", "x1"),
        (7, "U", 60, "c", 2, "user", "x2"),     # opened and...
        (8, "D", 60, "c", 2, None, None),       # ...deleted same instant
    ])
    return scd2_history(ch, keys=["conv_id", "turn_idx"])


def _facts(spark):
    rows = [
        # (fid, conv_id, turn_idx, minute, expected_dim_text)
        (0, "a", 0, 5, None),      # before first version
        (1, "a", 0, 10, "v1"),     # exactly at valid_from -> new version
        (2, "a", 0, 19, "v1"),
        (3, "a", 0, 20, "v2"),     # boundary -> successor
        (4, "a", 0, 30, None),     # at delete instant -> gone
        (5, "a", 0, 35, None),     # between delete and resurrect
        (6, "a", 0, 40, "v3"),
        (7, "a", 0, 99, "v3"),     # open version
        (8, "b", 1, 10, "w2"),     # same-instant race -> higher lsn
        (9, "b", 1, 50, "w2"),
        (10, "z", 9, 50, None),    # key with no history at all
        (11, "c", 2, 55, "x1"),    # before the same-instant open+delete
        (12, "c", 2, 60, None),    # zero-length x2 must never match
        (13, "c", 2, 70, None),    # chain ended by the delete
    ]
    df = spark.createDataFrame(
        [(fid, c, t, _ts(m), exp) for fid, c, t, m, exp in rows],
        "fid long, conv_id string, turn_idx int, ts timestamp, expected string",
    )
    return df


def test_temporal_enrich_semantics(spark):
    from data_services_spark.operators.scd import temporal_enrich

    out = temporal_enrich(
        _facts(spark), _history(spark), keys=["conv_id", "turn_idx"],
        payload=["text", "role"],
    )
    got = {r["fid"]: r["dim_text"] for r in out.collect()}
    want = {r["fid"]: r["expected"] for r in _facts(spark).collect()}
    assert got == want
    assert out.count() == _facts(spark).count()  # left-join row preservation


def test_temporal_enrich_equals_range_join(spark):
    """The windowed plan must equal the naive key-equality range join."""
    from data_services_spark.operators.scd import temporal_enrich

    facts, hist = _facts(spark), _history(spark)
    out = temporal_enrich(
        facts, hist, keys=["conv_id", "turn_idx"], payload=["text"])
    # naive: LEFT JOIN on keys + [valid_from, valid_to) containment, with
    # the same-instant version race resolved by max lsn
    h = hist.select(
        "conv_id", "turn_idx", "valid_from", "valid_to", "text", "lsn")
    joined = facts.alias("f").join(
        h.alias("h"),
        on=[
            F.col("f.conv_id") == F.col("h.conv_id"),
            F.col("f.turn_idx") == F.col("h.turn_idx"),
            F.col("f.ts") >= F.col("h.valid_from"),
            F.col("h.valid_to").isNull() | (F.col("f.ts") < F.col("h.valid_to")),
        ],
        how="left",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("f.fid").orderBy(F.col("h.lsn").desc_nulls_last())
    naive = (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("f.fid").alias("fid"), F.col("h.text").alias("dim_text"))
    )
    got = {r["fid"]: r["dim_text"] for r in out.collect()}
    want = {r["fid"]: r["dim_text"] for r in naive.collect()}
    assert got == want


def test_temporal_enrich_plan_has_no_join(spark):
    """Scale contract: the plan is union + ONE window — no join operator,
    no per-key cross product, exactly one exchange on the keys."""
    from data_services_spark.operators.scd import temporal_enrich

    hist = _history(spark).localCheckpoint(eager=True)  # isolate enrich plan
    out = temporal_enrich(
        _facts(spark), hist, keys=["conv_id", "turn_idx"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "Join" not in plan
    n_exchanges = plan.count(") Exchange")
    assert n_exchanges == 1, plan
