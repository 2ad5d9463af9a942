"""Envelope decoders: round-trip each dialect's encoder → decoder and pin
the dialect-specific edge cases (tombstones, bare vs wrapped payload,
delete images, multi-row Canal messages, binlog-position LSN encoding)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_services_spark.sources.envelopes import (
    decode_canal,
    decode_debezium,
    decode_debezium_flat,
    decode_dms,
    decode_envelope,
    decode_maxwell,
    decode_mongo,
)

ROW_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def _changes(spark, n=200):
    """Deterministic change rows: every 7th a delete, duplicate turn keys."""
    return spark.range(n).select(
        (F.col("id") + 1000).alias("lsn"),
        F.when(F.col("id") % 7 == 0, "D")
        .when(F.col("id") % 3 == 0, "I")
        .otherwise("U")
        .alias("op"),
        F.timestamp_millis(F.lit(1700000000000) + F.col("id") * 137).alias("ts"),
        F.format_string("c%03d", F.col("id") % 41).alias("conv_id"),
        F.pmod("id", F.lit(9)).cast("int").alias("turn_idx"),
        F.when(F.col("id") % 2 == 0, "user").otherwise("assistant").alias("role"),
        F.format_string("text-%05d", "id").alias("text"),
    )


def _assert_round_trip(decoded, changes):
    exp = changes.select(
        "lsn", "op", "ts", *[f.name for f in ROW_SCHEMA.fields]
    ).orderBy("lsn")
    got = decoded.orderBy("lsn")
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in exp.collect()
    ]


def test_debezium_round_trip_wrapped(spark):
    ch = _changes(spark)
    img = F.struct(*[F.col(f.name) for f in ROW_SCHEMA.fields])
    env = F.to_json(
        F.struct(
            F.struct(
                F.when(F.col("op") == "D", img).alias("before"),
                F.when(F.col("op") != "D", img).alias("after"),
                F.struct(
                    F.col("lsn").alias("lsn"),
                    (F.unix_millis("ts")).alias("ts_ms"),
                ).alias("source"),
                F.when(F.col("op") == "I", "c")
                .when(F.col("op") == "U", "u")
                .otherwise("d")
                .alias("op"),
            ).alias("payload")
        )
    )
    raw = ch.select(env.alias("value"))
    _assert_round_trip(decode_debezium(raw, ROW_SCHEMA), ch)


def test_debezium_bare_envelope_and_tombstones(spark):
    ch = _changes(spark, 60)
    img = F.struct(*[F.col(f.name) for f in ROW_SCHEMA.fields])
    env = F.to_json(
        F.struct(
            F.when(F.col("op") == "D", img).alias("before"),
            F.when(F.col("op") != "D", img).alias("after"),
            F.struct(
                F.col("lsn").alias("lsn"),
                F.unix_millis("ts").alias("ts_ms"),
            ).alias("source"),
            F.when(F.col("op") == "I", "r")  # snapshot reads decode to I
            .when(F.col("op") == "U", "u")
            .otherwise("d")
            .alias("op"),
        )
    )
    raw = ch.select(env.alias("value"))
    # interleave Kafka tombstones (null value) and garbage
    noise = spark.createDataFrame(
        [(None,), ("not json",), ("{}",)], "value string"
    )
    decoded = decode_debezium(raw.unionByName(noise), ROW_SCHEMA)
    _assert_round_trip(decoded, ch)


def test_debezium_mysql_file_pos_lsn(spark):
    raw = spark.createDataFrame(
        [
            (
                '{"before": null, "after": {"conv_id": "a", "turn_idx": 1, '
                '"role": "user", "text": "hi"}, '
                '"source": {"file": "mysql-bin.000007", "pos": 5, '
                '"ts_ms": 1700000000000}, "op": "c"}',
            )
        ],
        "value string",
    )
    row = decode_debezium(raw, ROW_SCHEMA).collect()[0]
    assert row.lsn == 7 * (1 << 32) + 5
    assert row.op == "I" and row.conv_id == "a"


def test_maxwell_round_trip(spark):
    ch = _changes(spark)
    img = F.struct(*[F.col(f.name) for f in ROW_SCHEMA.fields])
    env = F.to_json(
        F.struct(
            F.when(F.col("op") == "I", "insert")
            .when(F.col("op") == "U", "update")
            .otherwise("delete")
            .alias("type"),
            (F.unix_millis("ts") / 1000).cast("long").alias("ts"),
            F.format_string(
                "master.%06d:%d",
                (F.col("lsn") / F.lit(1 << 32)).cast("long"),
                F.pmod("lsn", F.lit(1 << 32)),
            ).alias("position"),
            img.alias("data"),
        )
    )
    # maxwell ts is seconds: regenerate with second-precision timestamps
    ch = ch.withColumn("ts", F.timestamp_seconds(F.unix_timestamp("ts")))
    raw = ch.select(env.alias("value"))
    _assert_round_trip(decode_maxwell(raw, ROW_SCHEMA), ch)


def test_maxwell_xid_fallback(spark):
    raw = spark.createDataFrame(
        [
            (
                '{"type": "insert", "ts": 1700000000, "xid": 99, '
                '"data": {"conv_id": "a", "turn_idx": 0, "role": "user", '
                '"text": "x"}}',
            )
        ],
        "value string",
    )
    assert decode_maxwell(raw, ROW_SCHEMA).collect()[0].lsn == 99


def test_canal_multi_row_message(spark):
    raw = spark.createDataFrame(
        [
            (
                '{"type": "INSERT", "es": 1700000001000, "id": 3, "data": ['
                '{"conv_id": "a", "turn_idx": "0", "role": "user", "text": "t0"},'
                '{"conv_id": "a", "turn_idx": "1", "role": "assistant", "text": "t1"}'
                "]}",
            ),
            ('{"type": "DELETE", "es": 1700000002000, "id": 4, "data": ['
             '{"conv_id": "a", "turn_idx": "0", "role": null, "text": null}]}',),
            (None,),
        ],
        "value string",
    )
    rows = decode_canal(raw, ROW_SCHEMA).orderBy("lsn").collect()
    assert [r.op for r in rows] == ["I", "I", "D"]
    # intra-message order preserved in the LSN; types cast from strings
    assert rows[0].lsn + 1 == rows[1].lsn
    assert rows[1].turn_idx == 1 and isinstance(rows[1].turn_idx, int)
    assert rows[2].lsn > rows[1].lsn


def test_debezium_flat_round_trip(spark):
    ch = _changes(spark, 130)
    env = F.to_json(
        F.struct(
            *[F.col(f.name) for f in ROW_SCHEMA.fields],
            F.when(F.col("op") == "I", "c")
            .when(F.col("op") == "U", "u")
            .otherwise("d")
            .alias("__op"),
            F.unix_millis("ts").alias("__source_ts_ms"),
            F.col("lsn").alias("__lsn"),
            F.when(F.col("op") == "D", "true").otherwise("false")
            .alias("__deleted"),
        )
    )
    decoded = decode_debezium_flat(ch.select(env.alias("value")), ROW_SCHEMA)
    _assert_round_trip(decoded, ch)


def test_debezium_flat_deleted_fallback_and_tombstone(spark):
    rows = [
        # rewrite-mode delete without __op: __deleted drives the mapping
        ('{"conv_id": "a", "turn_idx": 1, "role": "user", "text": "x", '
         '"__source_ts_ms": 1700000000000, "__lsn": 5, "__deleted": "true"}',),
        # plain row with neither __op nor __deleted: not a change event
        ('{"conv_id": "b", "turn_idx": 0, "role": "user", "text": "y", '
         '"__lsn": 6}',),
        (None,),  # Kafka tombstone
    ]
    raw = spark.createDataFrame(rows, "value string")
    out = decode_debezium_flat(raw, ROW_SCHEMA).collect()
    assert len(out) == 1
    assert out[0].op == "D" and out[0].lsn == 5 and out[0].conv_id == "a"


def test_dms_round_trip_and_control_drop(spark):
    ch = _changes(spark, 120)
    img = F.struct(*[F.col(f.name) for f in ROW_SCHEMA.fields])
    env = F.to_json(
        F.struct(
            img.alias("data"),
            F.struct(
                F.date_format(
                    "ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
                ).alias("timestamp"),
                F.lit("data").alias("record-type"),
                F.when(F.col("op") == "I", "insert")
                .when(F.col("op") == "U", "update")
                .otherwise("delete")
                .alias("operation"),
                F.col("lsn").alias("transaction-id"),
            ).alias("metadata"),
        )
    )
    raw = ch.select(env.alias("value"))
    # control records (DDL markers) carry no row image — must be dropped
    control = spark.createDataFrame(
        [
            (
                '{"metadata": {"record-type": "control", "operation": '
                '"create-table", "timestamp": "2023-01-01T00:00:00.000Z"}}',
            )
        ],
        "value string",
    )
    decoded = decode_dms(raw.unionByName(control), ROW_SCHEMA)
    _assert_round_trip(decoded, ch)


def test_dms_load_maps_to_insert(spark):
    raw = spark.createDataFrame(
        [
            (
                '{"data": {"conv_id": "a", "turn_idx": 0, "role": "user", '
                '"text": "x"}, "metadata": {"timestamp": '
                '"2023-05-17T19:28:17.438Z", "record-type": "data", '
                '"operation": "load", "transaction-id": 7}}',
            )
        ],
        "value string",
    )
    row = decode_dms(raw, ROW_SCHEMA).collect()[0]
    assert row.op == "I" and row.lsn == 7 and row.conv_id == "a"


def _mongo_envelopes(ch):
    """Encode change rows as change-stream events (full-mode shape)."""
    img = F.struct(*[F.col(f.name) for f in ROW_SCHEMA.fields])
    key = F.struct(
        F.col("conv_id").alias("conv_id"),
        F.col("turn_idx").alias("turn_idx"),
    )
    return ch.select(
        F.to_json(
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
        ).alias("value")
    )


def test_mongo_full_mode_round_trip(spark):
    # second-precision ts; LSN = t*2^32 + i round-trips exactly when the
    # encoder packs (t, lsn mod 2^32) and t is the truth's own second
    ch = _changes(spark, 150).withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp("ts"))
    )
    ch = ch.withColumn(
        "lsn",
        F.unix_timestamp("ts") * F.lit(1 << 32) + F.pmod("lsn", F.lit(1 << 32)),
    )
    decoded = decode_mongo(_mongo_envelopes(ch), ROW_SCHEMA)
    # deletes carry only the documentKey image (payload columns null)
    exp = ch.withColumn(
        "role", F.when(F.col("op") != "D", F.col("role"))
    ).withColumn("text", F.when(F.col("op") != "D", F.col("text")))
    _assert_round_trip(decoded, exp)


def test_mongo_full_mode_drops_imageless_updates(spark):
    raw = spark.createDataFrame(
        [
            # update without fullDocument (stream not run with updateLookup)
            (
                '{"operationType": "update", "clusterTime": {"$timestamp": '
                '{"t": 1700000000, "i": 1}}, "documentKey": {"conv_id": "a", '
                '"turn_idx": 0}, "updateDescription": {"updatedFields": '
                '{"text": "new"}, "removedFields": []}}',
            )
        ],
        "value string",
    )
    assert decode_mongo(raw, ROW_SCHEMA, mode="full").count() == 0
    # patch mode decodes the same event as a sparse op='P' row
    row = decode_mongo(raw, ROW_SCHEMA, mode="patch").collect()[0]
    assert row.op == "P" and row.conv_id == "a" and row.turn_idx == 0
    assert row.text == "new" and row.role is None
    assert row.lsn == 1700000000 * (1 << 32) + 1


def test_mongo_patch_mode_feeds_partial_update_engine(spark, tmp_path):
    """Mongo updates without updateLookup ARE the patch-engine contract:
    decode mode='patch' → CdcApplier on a partial_update table resolves
    per-column winners exactly as Mongo would have."""
    from data_services_spark.cdc.apply import CdcApplier

    events = [
        '{"operationType": "insert", "clusterTime": {"$timestamp": {"t": 100, "i": 0}},'
        ' "fullDocument": {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "v1"},'
        ' "documentKey": {"conv_id": "a", "turn_idx": 0}}',
        '{"operationType": "update", "clusterTime": {"$timestamp": {"t": 200, "i": 0}},'
        ' "documentKey": {"conv_id": "a", "turn_idx": 0},'
        ' "updateDescription": {"updatedFields": {"text": "v2"}, "removedFields": []}}',
        '{"operationType": "update", "clusterTime": {"$timestamp": {"t": 300, "i": 0}},'
        ' "documentKey": {"conv_id": "a", "turn_idx": 0},'
        ' "updateDescription": {"updatedFields": {"role": "assistant"}, "removedFields": []}}',
        '{"operationType": "delete", "clusterTime": {"$timestamp": {"t": 400, "i": 0}},'
        ' "documentKey": {"conv_id": "b", "turn_idx": 1}}',
    ]
    raw = spark.createDataFrame([(e,) for e in events], "value string")
    changes = decode_mongo(raw, ROW_SCHEMA, mode="patch").withColumn(
        "tool", F.lit(None).cast("string")
    )
    applier = CdcApplier.bootstrap(
        spark, str(tmp_path / "lake"), bucket_count=2,
        target_props={"merge_engine": "partial_update"},
    )
    # Mongo LSNs are t*2^32 + i — a SPARSE space where fixed-width
    # chunking degenerates; chunk by event mass (quantile boundaries)
    # so the patches land in later chunks than the insert
    applier.replay(changes, chunk_rows=2)
    rows = {
        (r.conv_id, r.turn_idx): r for r in applier.target.read().collect()
    }
    assert set(rows) == {("a", 0)}
    got = rows[("a", 0)]
    assert got.text == "v2" and got.role == "assistant"


def test_decode_envelope_dispatch(spark):
    raw = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(ValueError, match="unknown envelope format"):
        decode_envelope(raw, ROW_SCHEMA, "debeziumm")
    with pytest.raises(ValueError, match="unknown mongo decode mode"):
        decode_mongo(raw, ROW_SCHEMA, mode="fulll")
