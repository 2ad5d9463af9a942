"""Duplicate clustering: connected components over a near-dup pair set.

Every dedup battery ends the same way: pair detection (exact hash, MinHash
/LSH, AllPairs Jaccard, embedding cosine — all implemented in
``text_dedup.py`` / ``similarity.py``) emits EDGES, but the training
pipeline needs to keep ONE document per duplicate *cluster* — the
transitive closure of those edges. The reference stops at per-file
duplicate checks (e.g. ``lib/python/aims_realtime_util.py``'s
``remove_duplicated_dates`` dedups within one table); at 100-TB corpus
scale the closure is a graph problem in its own right.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shuffle-based CC method. Each round is two groupBy-aggregations over the
edge list; the edge set converges to a star forest (every node points at
its component's minimum id) in O(log n) rounds REGARDLESS of graph
diameter, unlike naive min-label propagation which needs O(diameter)
rounds and dies on chain-shaped graphs. Per round the shuffle volume is
O(|E|) and strictly decreases as stars form; no vertex state lives on the
driver.

Driver-side control loop: one fingerprint aggregate per round (count +
xxhash64 sum — two longs to the driver, never edges), iterating until the
edge set is stable. ``localCheckpoint`` cuts the lineage each round so the
plan does not grow with iterations (the classic iterative-Catalyst trap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _canon(df: DataFrame) -> DataFrame:
    """Canonical undirected edge form: (lo, hi), lo < hi, distinct."""
    lo = F.least("src", "dst")
    hi = F.greatest("src", "dst")
    return (
        df.select(lo.alias("src"), hi.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """Order-insensitive edge-set fingerprint: (count, wrapped hash sum).
    Two longs cross to the driver; the edge set itself never does."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"] or 0)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    nbrs = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = nbrs.groupBy("src").agg(F.min("dst").alias("_mn")).select(
        "src", F.least("_mn", "src").alias("m")
    )
    return (
        nbrs.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the larger endpoint, then connect every smaller
    neighbor (and u itself) to min(N_le(u) + {u})."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    moved = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        moved.union(self_edge)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 64,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the minimum node id reachable from it. Nodes absent from ``edges``
    (singletons) are simply not emitted — union them in at the call site
    where the full node universe is known (``dedup_clusters`` does).

    Deterministic, shuffle-bounded: O(log n) rounds of two aggregations
    each; converged when the canonical edge set's fingerprint is stable
    across a full large+small round (a star forest is a fixed point of
    both operators)."""
    cur = _canon(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint(eager=True)
    fp = _fingerprint(cur)
    for _ in range(max_iter):
        nxt = _canon(_small_star(_large_star(cur))).localCheckpoint(eager=True)
        nfp = _fingerprint(nxt)
        cur = nxt
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # star forest in canonical (lo, hi) form: lo is the component-min root,
    # hi the member — every member appears in exactly one (root, member) edge
    roots = cur.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    members = cur.select(
        F.col("dst").alias("node"), F.col("src").alias("component")
    )
    return members.union(roots).distinct()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
) -> DataFrame:
    """Assign every document its duplicate-cluster id and mark the one
    canonical survivor per cluster (the minimum id — deterministic, so
    reruns keep the same survivors and downstream training sets are
    stable). Singleton documents are their own canonical cluster.

    Plan shape: CC over the pair set (O(log n) bounded rounds), then ONE
    broadcast-able left join back to the corpus — components frame is
    O(docs-with-dups), typically a small fraction of the corpus."""
    comp = connected_components(pairs, src=pair_cols[0], dst=pair_cols[1])
    out = docs.select(id_col).join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    )
    cluster: Column = F.coalesce("component", F.col(id_col))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (F.col(id_col) == cluster).alias("is_canonical"),
    )
