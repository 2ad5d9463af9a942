"""Vocabulary/dimension refresh job: snapshot-committed dim updates.

Reference behavior: vocabularies are fetched from live services at run
time and joined as lookup dicts (platform_code_vocab.py:23-125,
ship_callsign.py:20-60). The engine's refresh_dim job commits each
vocabulary version as an atomic lake snapshot: queries between refreshes
see one consistent version, a new refresh flips atomically, and old
versions stay time-travelable (which vocab did run X use?).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_services_spark.jobs.refresh_dim_job import refresh_dim
from data_services_spark.lake.table import LakeTable


def _write_csv(path, rows):
    path.write_text("platform_code,platform_name,updated_at\n" +
                    "\n".join(",".join(map(str, r)) for r in rows))


def test_refresh_creates_then_updates_atomically(spark, tmp_path):
    src = tmp_path / "vocab.csv"
    root = str(tmp_path / "dims" / "platform")
    _write_csv(src, [("SL1", "Seal Rock", 1), ("BV2", "Bass Voyager", 1)])

    _, snap1, n1 = refresh_dim(
        spark, root, str(src), ["platform_code"], order_col="updated_at"
    )
    assert n1 == 2 and snap1.operation == "overwrite"

    # service updates one name, adds one platform, ships a stale duplicate
    _write_csv(src, [
        ("SL1", "Seal Rock Upgraded", 3),
        ("SL1", "Seal Rock Stale", 2),
        ("BV2", "Bass Voyager", 1),
        ("NW3", "New Wave", 1),
    ])
    table, snap2, n2 = refresh_dim(
        spark, root, str(src), ["platform_code"], order_col="updated_at"
    )
    assert n2 == 3 and snap2.parent_id == snap1.snapshot_id

    got = {r["platform_code"]: r["platform_name"] for r in table.read().collect()}
    assert got == {
        "SL1": "Seal Rock Upgraded", "BV2": "Bass Voyager", "NW3": "New Wave",
    }
    # time travel: the vocab a past run used is still readable
    old = {
        r["platform_code"]: r["platform_name"]
        for r in table.read(snapshot_id=snap1.snapshot_id).collect()
    }
    assert old["SL1"] == "Seal Rock"


def test_refreshed_dim_broadcast_joins(spark, tmp_path):
    src = tmp_path / "vocab.csv"
    root = str(tmp_path / "dims" / "platform")
    _write_csv(src, [("SL1", "Seal Rock", 1)])
    table, _, _ = refresh_dim(
        spark, root, str(src), ["platform_code"], order_col="updated_at"
    )
    fact = spark.createDataFrame(
        [("SL1", 10.0), ("SL1", 12.0), ("ZZ9", 1.0)], "platform_code string, v double"
    )
    joined = fact.join(
        F.broadcast(table.read().select("platform_code", "platform_name")),
        "platform_code", "left",
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    got = {(r["platform_code"], r["platform_name"]) for r in joined.collect()}
    assert ("SL1", "Seal Rock") in got and ("ZZ9", None) in got
