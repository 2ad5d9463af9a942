"""Schema-mapping layer + QC-flag semantics (reference:
provider->canonical lookup applied on every ingest with unmapped-variable
warnings, ardc_nrt/lib/common/lookup.py:147-165 / netcdf.py:71-83 —
mirrored here the way the reference's test_lib_common_lookup exercises the
lookup), and flags surviving the CDC merge end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_services_spark.cdc.mapping import ColumnRule, SchemaMapping
from data_services_spark.cdc.qc import (
    FLAG_BAD,
    FLAG_BAD_MAYBE,
    FLAG_GOOD,
    FLAG_MISSING,
    QcRule,
    qc_summary,
    with_qc_flags,
)


@pytest.fixture()
def provider_df(spark):
    return spark.createDataFrame(
        [(1, "alpha", "22.5", "junk1"), (2, "beta", "7.25", "junk2")],
        "obs_id int, site string, temp_degc string, vendor_debug string",
    )


def test_mapping_rename_retype_drop(provider_df):
    mapping = SchemaMapping.from_config(
        {
            "obs_id": "observation_id",
            "site": "site_code",
            "temp_degc": {"to": "temperature", "type": "double"},
        }
    )
    out, report = mapping.apply(provider_df)
    assert out.columns == ["observation_id", "site_code", "temperature"]
    assert dict(out.dtypes)["temperature"] == "double"
    # unmapped provider column dropped AND reported, not silently lost
    assert report.dropped == ["vendor_debug"]
    assert "temp_degc->temperature" in report.renamed
    assert "temperature:double" in report.retyped
    vals = {r["observation_id"]: r["temperature"] for r in out.collect()}
    assert vals == {1: 22.5, 2: 7.25}


def test_mapping_absent_column_defaults(provider_df):
    """Additive evolution: a canonical column the provider doesn't send yet
    arrives as a typed default (reference: default-synthesized variables,
    netcdf.py:80-83)."""
    mapping = SchemaMapping(
        [
            ColumnRule("obs_id", "observation_id"),
            ColumnRule("depth_m", "depth", dtype="double", default=0.0),
        ]
    )
    out, report = mapping.apply(provider_df)
    assert report.defaulted == ["depth"]
    assert all(r["depth"] == 0.0 for r in out.collect())


def test_mapping_passthrough_envelope(provider_df):
    """CDC envelope columns (lsn/op/ts) pass through unrenamed."""
    df = provider_df.withColumn("lsn", F.col("obs_id").cast("long")).withColumn(
        "op", F.lit("U")
    )
    mapping = SchemaMapping(
        [ColumnRule("site", "site_code")], passthrough=["lsn", "op"]
    )
    out, report = mapping.apply(df)
    assert out.columns == ["lsn", "op", "site_code"]
    assert "vendor_debug" in report.dropped and "obs_id" in report.dropped


def test_mapping_is_pure_projection(provider_df):
    """The mapping must plan as a projection over the scan — no exchange."""
    mapping = SchemaMapping.from_config({"obs_id": "observation_id"})
    out, _ = mapping.apply(provider_df)
    assert "Exchange" not in out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )


def test_qc_flag_ladder(spark):
    df = spark.createDataFrame(
        [(1, None), (2, -5.0), (3, 120.0), (4, 50.0)], "id int, value double"
    )
    rules = [QcRule("value", hard_min=0.0, hard_max=400.0, soft_max=100.0)]
    flags = {r["id"]: r["value_qc"] for r in with_qc_flags(df, rules).collect()}
    assert flags == {1: FLAG_MISSING, 2: FLAG_BAD, 3: FLAG_BAD_MAYBE, 4: FLAG_GOOD}
    hist = {
        (r["column"], r["flag"]): r["n_values"]
        for r in qc_summary(df, rules).collect()
    }
    assert hist[("value", FLAG_GOOD)] == 1 and hist[("value", FLAG_MISSING)] == 1


def test_qc_respects_provider_flags(spark):
    """A provider-supplied _qc column is never overwritten (reference only
    synthesizes defaults when absent, netcdf.py:80-83)."""
    df = spark.createDataFrame(
        [(1, 50.0, 2)], "id int, value double, value_qc int"
    )
    out = with_qc_flags(df, [QcRule("value", hard_min=0.0)])
    assert out.collect()[0]["value_qc"] == 2


def test_qc_flags_survive_lww_merge_and_redelivery(spark, tmp_path):
    """End-to-end: flags ride the payload through MOR apply — the winner's
    flag lands with the winner's value, a re-delivered chunk is a no-op,
    and additive evolution admits the new _qc column mid-stream."""
    from data_services_spark.cdc.apply import CdcApplier
    from data_services_spark.cdc.generator import generate_changes

    applier = CdcApplier.bootstrap(spark, str(tmp_path / "lake"), bucket_count=4)
    base = generate_changes(spark, 2000, n_convs=100, max_turns=10, seed=11)
    applier.replay(base, chunk_size=2000)

    # second wave arrives WITH a synthesized qc flag column (text present ->
    # good, absent -> missing): additive evolution on the target
    wave2 = (
        generate_changes(spark, 1000, n_convs=100, max_turns=10, seed=12)
        .withColumn("lsn", F.col("lsn") + 10_000)
        .withColumn(
            "text_qc",
            F.when(F.col("text").isNull(), F.lit(FLAG_MISSING))
            .otherwise(F.lit(FLAG_GOOD))
            .cast("int"),
        )
    )
    applier.replay(wave2, chunk_size=1000)
    table = applier.target.read()
    assert "text_qc" in table.columns
    flagged = table.where(F.col("text_qc").isNotNull())
    assert flagged.count() > 0
    # flag agrees with its own row's payload (winner's flag with winner's value)
    bad = flagged.where(
        (F.col("text_qc") == FLAG_GOOD) & F.col("text").isNull()
        | (F.col("text_qc") == FLAG_MISSING) & F.col("text").isNotNull()
    )
    assert bad.count() == 0
    before = {
        (r["conv_id"], r["turn_idx"]): r["text_qc"] for r in table.collect()
    }
    # redelivery of the flagged chunk is a physical no-op
    applier.replay(wave2, chunk_size=1000)
    after = {
        (r["conv_id"], r["turn_idx"]): r["text_qc"]
        for r in applier.target.read().collect()
    }
    assert before == after


def test_mapping_duplicate_targets_rejected():
    with pytest.raises(ValueError, match="duplicate mapping targets"):
        SchemaMapping.from_config({"a": "x", "b": "x"})
    with pytest.raises(ValueError, match="duplicate mapping targets"):
        SchemaMapping([ColumnRule("a", "lsn")], passthrough=["lsn"])
