"""Connected components (large-star/small-star) and dedup clustering."""

from __future__ import annotations

from data_services_spark.operators.clustering import (
    connected_components,
    dedup_clusters,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_cc_basic_shapes(spark):
    # two components: a triangle {1,2,3} and an edge {10,11}; 5 isolated-ish
    got = _cc(spark, [(1, 2), (2, 3), (3, 1), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_logarithmic_rounds(spark):
    """A 120-node path is the worst case for min-label propagation
    (O(diameter) = 120 rounds); the star algorithm must close it in
    O(log n) — max_iter=15 would fail a linear-round implementation."""
    edges = [(i, i + 1) for i in range(120)]
    got = _cc(spark, edges, max_iter=15)
    assert got == {i: 0 for i in range(121)}


def test_cc_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(5, 4), (4, 5), (5, 4), (7, 6)])
    assert got == {4: 4, 5: 4, 6: 6, 7: 6}


def test_dedup_clusters_canonical_and_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (6, 7)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(rows) == 8
    assert [rows[i]["cluster_id"] for i in range(8)] == [0, 1, 2, 1, 4, 1, 6, 6]
    canon = {i for i in range(8) if rows[i]["is_canonical"]}
    assert canon == {0, 1, 2, 4, 6}  # exactly one survivor per cluster


def test_dedup_clusters_no_pairs(spark):
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    rows = dedup_clusters(docs, pairs).collect()
    assert all(r["is_canonical"] and r["cluster_id"] == r["doc_id"] for r in rows)
