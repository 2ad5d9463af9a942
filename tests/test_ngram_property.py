"""Property-based exactness of the AllPairs prefix-filter Jaccard join:
for ANY random small corpus and threshold, the prefix+positional-filtered
pipeline must emit exactly the brute-force pair set — the filters may only
prune candidates that provably cannot reach the threshold."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_services_spark.operators.text_dedup import ngram_jaccard_pairs

WORDS = [f"w{i}" for i in range(12)]  # tiny vocab -> high-collision corpora

doc = st.lists(
    st.sampled_from(WORDS), min_size=1, max_size=10
).map(lambda ws: " ".join(ws))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(doc, min_size=2, max_size=12),
    thr=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
)
def test_prefix_filter_exact_on_random_corpora(spark, texts, thr):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    t = df.select(
        "doc_id",
        F.array_distinct(F.filter(F.split("text", " "), lambda x: x != "")).alias("w"),
    )
    a, b = t.alias("a"), t.alias("b")
    jac = F.size(F.array_intersect("a.w", "b.w")) / F.size(F.array_union("a.w", "b.w"))
    brute = {
        (r["da"], r["db"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"), jac.alias("j"))
        .where(F.col("j") >= thr)
        .collect()
    }
    fast = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(df, threshold=thr).collect()
    }
    assert fast == brute, (thr, texts, fast ^ brute)


def test_skew_salting_exact_when_cap_fires(spark):
    """A dup-dense corpus (every doc shares the same tokens) drives every
    prefix-token join group over the cap; the skew REPLICATION salt must
    keep the result exactly equal to brute force — no pair lost across
    salt boundaries."""
    texts = []
    for i in range(40):
        # near-identical docs: one common core, one rare suffix token
        texts.append("alpha beta gamma delta epsilon zeta " + f"rare{i % 5}")
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    t = df.select(
        "doc_id",
        F.array_distinct(F.filter(F.split("text", " "), lambda x: x != "")).alias("w"),
    )
    a, b = t.alias("a"), t.alias("b")
    jac = F.size(F.array_intersect("a.w", "b.w")) / F.size(F.array_union("a.w", "b.w"))
    brute = {
        (r["da"], r["db"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"), jac.alias("j"))
        .where(F.col("j") >= 0.8)
        .collect()
    }
    # group_cap=5 forces ceil(count/5) salted sub-groups on every prefix token
    fast = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(df, threshold=0.8, group_cap=5).collect()
    }
    assert len(brute) > 0
    assert fast == brute, fast ^ brute
