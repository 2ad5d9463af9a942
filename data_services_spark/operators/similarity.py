"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exactness baseline; the LSH (random
hyperplane) variant is the scale path — candidates come from sign-bucket
equality, so the pairwise work is bucket-local instead of quadratic.

Dot products are pure column expressions (``aggregate(zip_with(...))``) —
JVM-side, no Python in the hot path. Norms are precomputed once per vector.
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


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (brute force baseline).

    O(n^2) pairs — correct at any n but meant for modest n or as the
    verify stage after candidate generation. Ties broken by neighbor id.
    """
    t = with_norm(df, vec_col).select(F.col(id_col).alias("_id"), "_v", "_norm")
    a = t.alias("a")
    b = t.alias("b")
    sim = _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._norm") * F.col("b._norm"))
    pairs = (
        a.join(b, F.col("a._id") != F.col("b._id"))
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
