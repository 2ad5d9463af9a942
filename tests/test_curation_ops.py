"""Tests for the training-corpus curation battery (queries.py round 3):
decontamination, stratified sampling, repetition quality, redaction scan,
sequence packing.  The registry entries run over $sf_dir parquet; these
tests pin the SEMANTICS on crafted fixtures written to a tmp sf_dir so the
planted ground truth is known exactly (the DuckDB oracle pins parity, the
pytest pins intent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_services_spark.queries import REGISTRY

BENCH_ID = 97  # doc_id % 97 == 0 is the held-out benchmark slice


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    """Tiny documents table with planted contamination / repetition."""
    base = " ".join(f"tok{i}" for i in range(32))  # 32 distinct tokens
    rows = [
        # doc 0: benchmark member (0 % 97 == 0)
        (0, base, "en", "srcA"),
        # doc 5: shares the full 32-token run -> 25 shared 8-grams
        (5, base, "en", "srcA"),
        # doc 7: shares exactly the first 8 tokens -> exactly 1 shared 8-gram
        (7, " ".join(f"tok{i}" for i in range(8)) + " "
            + " ".join(f"zzz{i}" for i in range(24)), "en", "srcA"),
        # doc 9: disjoint vocabulary -> contamination-free
        (9, " ".join(f"qqq{i}" for i in range(32)), "de", "srcB"),
        # doc 11: degenerate repetition (one word 50 times)
        (11, " ".join(["spam"] * 50), "de", "srcB"),
        # doc 13: short (< 8 tokens) -> no grams at all
        (13, "a b c", "zh", "srcB"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    d = str(tmp_path_factory.mktemp("curation"))
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def _run(name, spark, sf_dir):
    return {tuple(r) for r in REGISTRY[name].fn(spark, sf_dir).collect()}


def test_decontamination_flags_planted_overlap(spark, sf_dir):
    got = {r["doc_id"]: r["n_shared_grams"]
           for r in REGISTRY["decontaminate_ngram_overlap"].fn(spark, sf_dir).collect()}
    assert got[5] == 25          # full 32-token overlap -> 32-8+1 grams
    assert got[7] == 1           # exactly one shared 8-gram
    assert 9 not in got          # disjoint vocab untouched
    assert 0 not in got          # benchmark rows never flag themselves
    assert 13 not in got         # sub-8-token docs produce no grams


def test_stratified_sample_deterministic_and_stratified(spark, sf_dir):
    a = _run("stratified_sample_documents", spark, sf_dir)
    b = _run("stratified_sample_documents", spark, sf_dir)
    assert a == b  # keyed on md5(doc_id): rerun-stable
    # every sampled row exists in the input, keyed filter only
    all_ids = {r["doc_id"] for r in
               spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    assert {t[0] for t in a} <= all_ids


def test_repetition_quality_on_degenerate_doc(spark, sf_dir):
    rows = {r["doc_id"]: r for r in
            REGISTRY["repetition_quality_documents"].fn(spark, sf_dir).collect()}
    spam = rows[11]
    assert spam["n_words"] == 50 and spam["n_distinct"] == 1
    assert spam["top_word_n"] == 50
    assert spam["distinct_ratio_e4"] == 200  # 1/50
    clean = rows[0]
    assert clean["n_distinct"] == 32 and clean["distinct_ratio_e4"] == 10000


def test_sequence_packing_conserves_tokens_and_shards(spark, sf_dir):
    out = REGISTRY["sequence_packing_plan"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.regexp_extract_all(F.lower("text"),
                                          F.lit("[a-z0-9]+"), 0)))
    ).first()[0]
    assert sum(r["pack_tokens"] for r in out) == total  # nothing dropped
    assert sum(r["n_docs"] for r in out) == docs.count()
    # packs never cross source shards
    assert {r["source"] for r in out} == {"srcA", "srcB"}
    # pack ids dense from 0 within each shard
    for src in ("srcA", "srcB"):
        ids = sorted(r["pack_id"] for r in out if r["source"] == src)
        assert ids[0] == 0


def test_redaction_scan_counts(spark):
    import tempfile

    rows = [(1, "the customer key is here", "en", "s1"),
            (2, "no sensitive words", "en", "s1"),
            (3, "user user user", "en", "s2")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r["source"]: r for r in
               REGISTRY["redaction_scan_documents"].fn(spark, d).collect()}
    assert out["s1"]["n_hits"] == 2 and out["s1"]["n_docs_hit"] == 1
    assert out["s2"]["n_hits"] == 3 and out["s2"]["n_docs_hit"] == 1
    # "user" (4 chars) -> "[REDACTED]" (10): 3 hits add 18 chars to len 14
    assert out["s2"]["redacted_chars"] == 14 + 3 * 6
