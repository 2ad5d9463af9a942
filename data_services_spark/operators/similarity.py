"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exactness baseline; the LSH (random
hyperplane) variant is the scale path — candidates come from sign-bucket
equality, so the pairwise work is bucket-local instead of quadratic.

Physical strategies by shape:
* brute force (``cosine_topk`` / ``cosine_pairs_above``): broadcast the
  (small) reference matrix, one numpy matmul per Arrow batch inside
  ``mapInPandas`` — the vectorized-UDF pattern for math that Catalyst's
  per-element higher-order functions evaluate ~10x slower at n^2 * dim;
* LSH (``lsh_ann_topk``): bucket assignment and bucket-local exact cosine
  stay pure column expressions (``aggregate(zip_with(...))``) — JVM-side,
  no Python, because the bucket-local pair count is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_v", v).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Materialize the reference side as numpy (ids, matrix, norms) for
    broadcast. Brute force inherently ships every vector to every
    partition — same contract as a broadcast join side, so the same size
    discipline applies (guarded); the scale path is LSH bucketing."""
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    if len(rows) > 2_000_000:
        raise ValueError(
            f"brute-force side too large to broadcast ({len(rows)} vectors); "
            "use lsh_ann_topk"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    return ids, mat, norms


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (brute force baseline).

    Physical plan: the (small) reference matrix is broadcast; each Arrow
    batch of query vectors does ONE numpy matmul against it inside
    ``mapInPandas`` — the vectorized-UDF shape for work Catalyst's
    higher-order functions can't do efficiently (n^2 * dim element-wise
    expression evaluation measured ~10x slower). Ties broken by neighbor
    id. O(n^2) math — meant for modest n or as the verify stage after LSH
    candidate generation.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    ids, mat, norms = _collect_matrix(df, id_col, vec_col)
    b = spark.sparkContext.broadcast((ids, mat, norms))

    def topk_batches(batches):
        b_ids, b_mat, b_norms = b.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q_norms = np.sqrt((q * q).sum(axis=1))
            sims = (q @ b_mat.T) / np.outer(q_norms, b_norms)
            out_q, out_n, out_s, out_r = [], [], [], []
            for i, qid in enumerate(q_ids):
                row = sims[i]
                mask = b_ids != qid
                cand_ids = b_ids[mask]
                cand_sims = row[mask]
                # order by (-sim, neighbor_id): lexsort's last key is primary
                order = np.lexsort((cand_ids, -cand_sims))[:k]
                out_q.extend([qid] * len(order))
                out_n.extend(cand_ids[order])
                out_s.extend(cand_sims[order])
                out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame({
                "query_id": np.array(out_q, dtype=np.int64),
                "neighbor_id": np.array(out_n, dtype=np.int64),
                "sim": np.round(np.array(out_s, dtype=np.float64), 6),
                "rank": np.array(out_r, dtype=np.int32),
            })

    return df.select(id_col, vec_col).mapInPandas(
        topk_batches,
        schema="query_id long, neighbor_id long, sim double, rank int",
    )


def cosine_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All unordered pairs with cosine >= threshold (near-duplicate
    detection). Same broadcast + per-batch numpy matmul plan as
    ``cosine_topk``; emits each pair once (id_a < id_b)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    ids, mat, norms = _collect_matrix(df, id_col, vec_col)
    b = spark.sparkContext.broadcast((ids, mat, norms))

    def pair_batches(batches):
        b_ids, b_mat, b_norms = b.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q_norms = np.sqrt((q * q).sum(axis=1))
            sims = (q @ b_mat.T) / np.outer(q_norms, b_norms)
            keep = (sims >= threshold) & (q_ids[:, None] < b_ids[None, :])
            qi, bi = np.nonzero(keep)
            yield pd.DataFrame({
                "vec_a": q_ids[qi],
                "vec_b": b_ids[bi],
                "sim": np.round(sims[qi, bi], 6),
            })

    return df.select(id_col, vec_col).mapInPandas(
        pair_batches, schema="vec_a long, vec_b long, sim double"
    )


def _hyperplane(p: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component from a hash —
    reproducible across sessions/engines (no RNG state)."""
    import hashlib

    out = []
    for j in range(dim):
        h = int.from_bytes(hashlib.md5(f"plane:{p}:{j}".encode()).digest()[:8], "big")
        out.append((h % 2001 - 1000) / 1000.0)
    return out


def lsh_ann_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Bucket = sign bits against ``n_planes`` fixed hyperplanes; exact cosine
    is computed only within buckets. Recall < 1 by construction (tested vs
    the brute-force baseline); cost drops from n^2 to sum of bucket^2.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = [_hyperplane(p, dim) for p in range(n_planes)]
    t = with_norm(df, vec_col).select(F.col(id_col).alias("_id"), "_v", "_norm")
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dp = _dot(F.col("_v"), F.array(*[F.lit(c) for c in plane]))
        bucket = bucket + F.when(dp >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    t = t.withColumn("_bucket", bucket)
    a = t.alias("a")
    b = t.alias("b")
    sim = _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._norm") * F.col("b._norm"))
    pairs = (
        a.join(b, (F.col("a._bucket") == F.col("b._bucket")) & (F.col("a._id") != F.col("b._id")))
        .select(
            F.col("a._id").alias("query_id"),
            F.col("b._id").alias("neighbor_id"),
            sim.alias("_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_sim", 6).alias("sim"), "rank")
    )
