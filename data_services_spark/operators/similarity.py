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

from pyspark.sql import DataFrame
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
    # 100k x dim-64 float64 ~ 50 MB pickled — the same ceiling a broadcast
    # join side gets. Anything bigger belongs on the LSH path.
    if len(rows) > 100_000:
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


def plan_lsh_params(
    threshold: float,
    target_recall: float = 0.95,
    max_tables: int = 64,
) -> tuple[int, int]:
    """Derive (n_planes, n_tables) from the cosine threshold.

    Random-hyperplane LSH: a pair at cosine s survives one plane with
    p = 1 - arccos(s)/pi, a full b-plane table with p^b, and T independent
    tables with recall 1-(1-p^b)^T. Sizing at s = threshold bounds the
    WORST-case pair; higher-sim pairs do strictly better. Among b in
    [2, 16] with T(b) <= max_tables, pick the b minimizing estimated
    candidate work T(b) * 2^-b (random pairs collide per table at ~2^-b,
    so this is the n^2 coefficient). Fixed defaults are a recall trap:
    n_planes=8/n_tables=4 gives ~12% recall at threshold 0.45.
    """
    import math

    s = min(max(threshold, -0.999), 0.999)
    p = 1.0 - math.acos(s) / math.pi
    if p <= 0.0:
        raise ValueError(f"threshold {threshold} gives no plane selectivity")
    best: tuple[int, int] | None = None
    best_work = float("inf")
    for b in range(2, 17):
        ptab = p**b
        if ptab >= 1.0 or ptab <= 0.0:
            continue
        T = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - ptab)))
        if T > max_tables:
            continue
        work = T * (2.0**-b)
        if work < best_work:
            best_work, best = work, (b, T)
    if best is None:  # threshold too low for the table budget: max coverage
        return 2, max_tables
    return best


def calibrate_ann_params(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_recall: float = 0.9,
    sample_size: int = 2_000,
    max_tables: int = 64,
) -> tuple[int, int]:
    """Size (n_planes, n_tables) for :func:`lsh_ann_topk` from the DATA.

    Fixed LSH parameters are a recall trap for top-k just as for
    thresholds: on near-random embeddings the kth-neighbor cosine is low
    (~0.35 at n=2k, dim=64), so 6 planes / 4 tables keeps <25% of true
    top-3 neighbors. This estimates the kth-neighbor cosine exactly on a
    bounded deterministic sample (one numpy gram matrix, <= sample_size^2)
    and hands its conservative 10th percentile to :func:`plan_lsh_params`,
    which minimizes candidate work subject to the recall target. The
    sample is hash-ordered ``limit`` — a TakeOrdered, not a full sort, and
    reproducible across runs. Returns plain ints so callers can log/pin
    the derived configuration.
    """
    import numpy as np

    pdf = (
        df.select(F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_size)
        .toPandas()  # Arrow transfer; row-collect of arrays is ~2x slower
    )
    if len(pdf) <= k:
        return 8, 4
    # float32 gram: the estimate feeds a 10th-percentile -> plan_lsh_params
    # integer decision; fp32 noise (~1e-7 at dim 64) cannot flip it
    V = np.array(list(pdf["_v"]), dtype=np.float32)
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0.0] = 1.0
    Vn = V / norms[:, None]
    S = Vn @ Vn.T
    np.fill_diagonal(S, -np.inf)
    kth = np.partition(S, -k, axis=1)[:, -k]  # each row's kth-best cosine
    s = float(np.percentile(kth, 10))
    return plan_lsh_params(s, target_recall, max_tables)


def _lsh_candidates(
    t: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    bucket_cap: int,
) -> DataFrame:
    """Unordered candidate id pairs (_qa < _qb) from multi-table
    random-hyperplane banding with salted bucket caps. ``t`` must carry
    ``_id``, ``_v`` (double array).

    Bucket assignment is ONE numpy matmul per Arrow batch against a
    broadcast (n_tables*n_planes, dim) plane matrix — recall-correct
    parameter choices need dozens of tables, where per-plane Catalyst
    ``aggregate(zip_with(...))`` expressions evaluate ~10x slower."""
    import numpy as np
    import pandas as pd

    planes = np.array(
        [_hyperplane(i, dim) for i in range(n_tables * n_planes)],
        dtype=np.float64,
    )
    b_planes = t.sparkSession.sparkContext.broadcast(planes)
    nt, npl = n_tables, n_planes

    @F.pandas_udf("array<long>")
    def _buckets(vs):  # type: ignore[no-untyped-def]
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.array(list(vs), dtype=np.float64)
        signs = (V @ b_planes.value.T) >= 0  # (n, T*b) sign bits
        signs = signs.reshape(len(V), nt, npl)
        w = 1 << np.arange(npl, dtype=np.int64)
        bkts = (signs * w).sum(axis=2)  # (n, T) per-table bucket ids
        return pd.Series(list(bkts))

    banded = t.select(
        "_id", F.posexplode(_buckets(F.col("_v"))).alias("tbl", "bkt")
    )

    # cap: per-(table,bucket) counts via groupBy — map-side combinable, so a
    # degenerate bucket never lands on one task (a window count would).
    # The counts table is at most n_tables * 2^n_planes rows -> broadcast.
    counts = banded.groupBy("tbl", "bkt").agg(F.count("*").alias("_cnt"))
    banded = (
        banded.join(F.broadcast(counts), ["tbl", "bkt"])
        .withColumn(
            "_salt",
            F.when(
                F.col("_cnt") > bucket_cap,
                F.pmod(F.xxhash64("_id"), F.ceil(F.col("_cnt") / F.lit(bucket_cap))),
            ).otherwise(F.lit(0)),
        )
        .select("_id", "tbl", "bkt", "_salt")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a._salt") == F.col("b._salt"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("_qa"), F.col("b._id").alias("_qb"))
        .dropDuplicates(["_qa", "_qb"])
    )


def _cosine_udf():
    """Arrow-vectorized exact cosine over two array columns: one numpy
    row-wise product-sum per batch (the candidate-verify hot path —
    millions of candidate pairs x dim makes per-element Catalyst
    ``aggregate(zip_with(...))`` the bottleneck)."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf("double")
    def _cos(a, b):  # type: ignore[no-untyped-def]
        if len(a) == 0:
            return pd.Series([], dtype=np.float64)
        A = np.array(list(a), dtype=np.float64)
        B = np.array(list(b), dtype=np.float64)
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return _cos


def lsh_cosine_neardup(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int | None = None,
    dim: int | None = None,
    bucket_cap: int = 10_000,
    target_recall: float = 0.95,
) -> DataFrame:
    """Embedding near-dup pairs at scale: multi-table LSH candidates, exact
    cosine verified only on candidates. Approximate in recall (a pair all
    ``n_tables`` tables separate is missed — pytest pins recall vs the
    brute-force baseline at the REGISTRY parameters), exact in precision
    (every emitted sim is exact and >= threshold). This is the default
    path past the ~100k-vector broadcast ceiling of ``cosine_pairs_above``.

    ``n_planes``/``n_tables`` default to :func:`plan_lsh_params` at the
    given threshold — fixed values are a recall trap (8 planes / 4 tables
    keeps ~12% of true pairs at threshold 0.45)."""
    if n_planes is None and n_tables is None:
        n_planes, n_tables = plan_lsh_params(threshold, target_recall)
    elif n_tables is None:
        # caller pinned the plane count: size the table count FOR that b
        import math

        p = 1.0 - math.acos(min(max(threshold, -0.999), 0.999)) / math.pi
        ptab = p**n_planes
        n_tables = max(
            1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - ptab))
        )
    elif n_planes is None:
        n_planes, _ = plan_lsh_params(threshold, target_recall)
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    t = df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
    cand = _lsh_candidates(t, dim, n_planes, n_tables, bucket_cap)
    va = t.select(F.col("_id").alias("_qa"), F.col("_v").alias("_va"))
    vb = t.select(F.col("_id").alias("_qb"), F.col("_v").alias("_vb"))
    cos = _cosine_udf()
    return (
        cand.join(va, "_qa")
        .join(vb, "_qb")
        .withColumn("_sim", cos(F.col("_va"), F.col("_vb")))
        .where(F.col("_sim") >= threshold)
        .select(
            F.col("_qa").alias("vec_a"),
            F.col("_qb").alias("vec_b"),
            F.round("_sim", 6).alias("sim"),
        )
    )


def lsh_ann_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    bucket_cap: int = 10_000,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH — the 100-TB path.

    * **Multi-table banding**: ``n_tables`` independent hash tables, each
      bucketing on the sign bits of its own ``n_planes`` hyperplanes. A true
      neighbor missed by one table's bucketing is recovered by another —
      recall compounds as ``1-(1-p^b)^T`` instead of the single-table
      ``p^b``.
    * **Bucket-size cap, applied locally**: a degenerate bucket (e.g. the
      all-positive orthant on skewed data) would go quadratic; after the
      bucket shuffle every (table, bucket) group is complete in one task,
      so its EXACT size is known locally and over-cap groups are split
      into ``ceil(size/cap)`` hash-chunks on the spot — no separate
      count job, no broadcast-back, and the bucket-assignment UDF runs
      ONCE instead of once per consumer branch. Chunk membership is the
      same deterministic id-hash rule the global-salt design used, so the
      candidate set is identical; the difference is that one bucket's
      chunks run serially in its task (work bounded at size*cap*dim flops
      per task, memory at O(cap)) instead of spreading across tasks —
      cross-bucket parallelism, which is where real datasets live, is
      unaffected. Pairs split across chunks in one table can still meet
      in another (approximate by construction; recall is what the tests
      pin).
    * **Bucket-local partial top-k, then merge** — no pair explosion: each
      chunk computes ONE numpy gram matrix and emits only its local
      per-query top-k. Merging local top-ks is EXACTLY the global top-k
      over the candidate set (a neighbor in the final top-k has < k
      better candidates globally, hence < k better in every shared
      chunk), and the merge is itself a streaming per-query pass after a
      repartition on query_id — dedup + rank in one crossing, no window.
      The whole plan is TWO shuffles and two Python crossings, replacing
      the r2 candidate-pair self-join + dedup + two vector joins +
      per-pair cosine + window (5 shuffles, O(sum bucket^2) shipped
      rows); shipped rows here are n*T banded + <= n*T*k merge inputs.
    * Vectors ride into buckets (xT replication) instead of joining back
      per pair — dim*8 bytes per banded row, the standard LSH trade; the
      cap bounds every gram regardless.
    * ``dim`` should be passed when known — the ``first()`` probe is a
      driver round-trip kept only as a convenience fallback.
    """
    import numpy as np
    import pandas as pd

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    t = df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))

    planes = np.array(
        [_hyperplane(i, dim) for i in range(n_tables * n_planes)], dtype=np.float64
    )
    b_planes = t.sparkSession.sparkContext.broadcast(planes)
    nt, npl = n_tables, n_planes

    @F.pandas_udf("array<long>")
    def _buckets(vs):  # type: ignore[no-untyped-def]
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.array(list(vs), dtype=np.float64)
        signs = (V @ b_planes.value.T) >= 0
        signs = signs.reshape(len(V), nt, npl)
        w = 1 << np.arange(npl, dtype=np.int64)
        return pd.Series(list((signs * w).sum(axis=2)))

    banded = t.select(
        "_id", "_v", F.posexplode(_buckets(F.col("_v"))).alias("tbl", "bkt")
    )

    def _chunk_topk(ids: "np.ndarray", V: "np.ndarray"):
        n = len(ids)
        if n < 2:
            return None
        norms = np.sqrt((V * V).sum(axis=1))
        norms[norms == 0.0] = 1.0
        sims = (V @ V.T) / np.outer(norms, norms)
        np.fill_diagonal(sims, -np.inf)
        kk = min(k, n - 1)
        # same tie order as the final ranking: (-sim, neighbor_id)
        order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims), axis=1)[:, :kk]
        return (
            np.repeat(ids, kk),
            ids[order].ravel(),
            np.take_along_axis(sims, order, axis=1).ravel(),
        )

    def _group_topk(ids: "np.ndarray", V: "np.ndarray", qs, ns, ss):
        n = len(ids)
        if n <= bucket_cap:
            parts = [(ids, V)]
        else:
            # exact local count -> same deterministic hash-chunk rule the
            # global-salt design used (Knuth multiplicative on id)
            nchunks = -(-n // bucket_cap)
            h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
                nchunks
            )
            parts = [(ids[h == c], V[h == c]) for c in range(nchunks)]
        for cids, cV in parts:
            out = _chunk_topk(cids, cV)
            if out is not None:
                qs.append(out[0]); ns.append(out[1]); ss.append(out[2])

    def part_topk(batches):
        # Streaming groupby over a partition hash-clustered + sorted by
        # (tbl, bkt): one Python crossing per PARTITION, not per group
        # (calibrated configs make thousands of small groups, where
        # applyInPandas' per-group pandas overhead dominates), and only
        # the possibly-split trailing group is buffered across Arrow
        # batches — memory stays O(group) and grams O(bucket_cap) however
        # large the partition is.
        carry: pd.DataFrame | None = None

        def flush(pdf: pd.DataFrame):
            key = pdf[["tbl", "bkt"]].to_numpy(np.int64)
            bounds = np.flatnonzero((key[1:] != key[:-1]).any(axis=1)) + 1
            qs, ns, ss = [], [], []
            ids_all = pdf["_id"].to_numpy(np.int64)
            V_all = np.array(list(pdf["_v"]), dtype=np.float64)
            for lo, hi in zip(
                np.concatenate(([0], bounds)), np.concatenate((bounds, [len(pdf)]))
            ):
                _group_topk(ids_all[lo:hi], V_all[lo:hi], qs, ns, ss)
            if not qs:
                return None
            return pd.DataFrame(
                {
                    "query_id": np.concatenate(qs),
                    "neighbor_id": np.concatenate(ns),
                    "_sim": np.concatenate(ss),
                }
            )

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            keys = pdf[["tbl", "bkt"]].to_numpy()
            trailing = (keys == keys[-1]).all(axis=1)
            if trailing.all():  # whole batch is one group: keep buffering
                carry = pdf
                continue
            split = len(pdf) - int(np.argmin(trailing[::-1]))
            carry = pdf.iloc[split:]
            out = flush(pdf.iloc[:split])
            if out is not None:
                yield out
        if carry is not None and len(carry):
            out = flush(carry)
            if out is not None:
                yield out

    local = (
        banded.repartition("tbl", "bkt")
        .sortWithinPartitions("tbl", "bkt")
        .mapInPandas(part_topk, schema="query_id long, neighbor_id long, _sim double")
    )

    return (
        local.repartition("query_id")
        .sortWithinPartitions("query_id")
        .mapInPandas(
            _merge_topk(k),
            schema="query_id long, neighbor_id long, sim double, rank int",
        )
    )


def _merge_topk(k: int):
    """Streaming per-query dedup+rank pass for a ``query_id``-clustered,
    ``query_id``-sorted partition — shared by the LSH and IVF ANN paths.

    A candidate found through several tables/lists carries the SAME exact
    sim, so dedup-then-rank in one pass replaces a groupBy-max + window
    (two exchanges on the same key) with a single crossing; merging local
    per-group top-ks this way IS the global top-k over the candidate set.
    """
    import numpy as np
    import pandas as pd

    def merge_topk(batches):
        carry: pd.DataFrame | None = None

        def flush(pdf: pd.DataFrame):
            pdf = pdf.sort_values(
                ["query_id", "_sim", "neighbor_id"],
                ascending=[True, False, True],
                kind="stable",
            ).drop_duplicates(["query_id", "neighbor_id"])
            ranked = pdf.groupby("query_id", sort=False).cumcount() + 1
            pdf = pdf[ranked <= k]
            rank = pdf.groupby("query_id", sort=False).cumcount() + 1
            return pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(np.int64),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(np.int64),
                    "sim": np.round(pdf["_sim"].to_numpy(np.float64), 6),
                    "rank": rank.to_numpy(np.int32),
                }
            )

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            q = pdf["query_id"].to_numpy()
            trailing = q == q[-1]
            if trailing.all():
                carry = pdf
                continue
            split = len(pdf) - int(np.argmin(trailing[::-1]))
            carry = pdf.iloc[split:]
            yield flush(pdf.iloc[:split])
        if carry is not None and len(carry):
            yield flush(carry)

    return merge_topk

def train_ivf_centroids(
    df: DataFrame,
    nlist: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 20_000,
    iters: int = 10,
    seed: int = 0,
):
    """Spherical k-means coarse quantizer trained on a bounded
    deterministic sample — the FAISS IVF training recipe (train on a
    sample, assign the full set distributed; faiss Clustering defaults
    subsample to ~256 points/centroid for the same reason).

    The sample is hash-ordered ``limit`` (reproducible TakeOrdered, unique
    key so no tie ambiguity); init is kmeans++ under a fixed-seed
    Generator; Lloyd updates assign by cosine (argmax dot on unit
    vectors), renormalize means, and reseed empty lists to the point
    farthest from its centroid — every step deterministic, so repeated
    runs and the DuckDB-oracled recall entry see identical lists. Driver
    cost is O(sample * nlist * dim) numpy; the result is a broadcastable
    L2-normalized (nlist, dim) float64 matrix.
    """
    import numpy as np

    pdf = (
        df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
        .orderBy(F.xxhash64(F.col("_id")))
        .limit(sample_size)
        .toPandas()
    )
    V = np.array(list(pdf["_v"]), dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0.0] = 1.0
    V = V / norms[:, None]
    n = len(V)
    nlist = max(1, min(nlist, n))
    rng = np.random.default_rng(seed)
    C = np.empty((nlist, V.shape[1]))
    C[0] = V[int(rng.integers(n))]
    d2 = np.maximum(2.0 - 2.0 * (V @ C[0]), 0.0)
    for j in range(1, nlist):
        p = np.maximum(d2, 1e-12)
        C[j] = V[int(rng.choice(n, p=p / p.sum()))]
        d2 = np.minimum(d2, np.maximum(2.0 - 2.0 * (V @ C[j]), 0.0))
    for _ in range(iters):
        a = np.argmax(V @ C.T, axis=1)
        for j in range(nlist):
            m = a == j
            if m.any():
                c = V[m].mean(axis=0)
                nc = np.linalg.norm(c)
                if nc > 0.0:
                    C[j] = c / nc
            else:
                C[j] = V[int(np.argmin((V * C[a]).sum(axis=1)))]
    return C


def ivf_ann_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nlist: int = 16,
    nprobe: int = 8,
    dim: int | None = None,
    list_cap: int = 10_000,
    sample_size: int = 20_000,
    seed: int = 0,
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer (IVF-Flat) — the
    DATA-ADAPTIVE counterpart to :func:`lsh_ann_topk`. Hyperplane LSH
    partitions the sphere blindly; IVF partitions where the data actually
    clusters, which is why it is the production default (FAISS IVF) for
    real — clustered — embedding corpora. Same fused physical shape as the
    LSH path: two shuffles, two Python crossings.

    * **Train on a sample, assign distributed**: centroids come from
      :func:`train_ivf_centroids` (bounded driver-side numpy); assignment
      is ONE matmul per Arrow batch against the broadcast centroid matrix.
    * **Asymmetric roles**: every vector is a DATABASE member of exactly
      its nearest list (probe rank 0 = home) and a QUERY probing its
      ``nprobe`` nearest lists — shipped rows are n*nprobe, and each gram
      is (group queries) x (group HOME vectors) only.
    * **List cap**: a degenerate list (heavily clustered data) is split
      into deterministic id-hash chunks on the spot, exactly like the LSH
      bucket cap — gram memory bounded at O(cap^2) however skewed the
      centroid histogram; cross-chunk pairs are the approximation the
      recall tests pin.
    * **Merge**: the shared :func:`_merge_topk` streaming pass; local
      per-list top-ks merge to the exact global top-k over the candidate
      set.

    The reference stack has no ANN at all (aodn/data-services matches
    files by name/convention); this is part of the beyond-reference
    training-data battery alongside the LSH family.
    """
    import numpy as np
    import pandas as pd

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    t = df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
    C = train_ivf_centroids(
        t, nlist, id_col="_id", vec_col="_v", sample_size=sample_size, seed=seed
    )
    b_cent = t.sparkSession.sparkContext.broadcast(C)
    npr = min(nprobe, len(C))

    @F.pandas_udf("array<int>")
    def _probe_lists(vs):  # type: ignore[no-untyped-def]
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.array(list(vs), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        sims = (V / norms[:, None]) @ b_cent.value.T
        order = np.argsort(-sims, kind="stable", axis=1)[:, :npr]
        return pd.Series(list(order.astype(np.int32)))

    probed = t.select(
        "_id", "_v", F.posexplode(_probe_lists(F.col("_v"))).alias("pr", "lst")
    )

    def _score_chunk(ids, V, home, qs, ns, ss):
        hmask = home
        nh = int(hmask.sum())
        if nh == 0 or len(ids) < 2:
            return
        norms = np.sqrt((V * V).sum(axis=1))
        norms[norms == 0.0] = 1.0
        Vn = V / norms[:, None]
        H = Vn[hmask]
        hids = ids[hmask]
        sims = Vn @ H.T
        sims[ids[:, None] == hids[None, :]] = -np.inf
        kk = min(k, nh)
        order = np.lexsort((np.broadcast_to(hids, sims.shape), -sims), axis=1)[:, :kk]
        top = np.take_along_axis(sims, order, axis=1)
        keep = np.isfinite(top)
        if not keep.any():
            return
        qs.append(np.repeat(ids, kk)[keep.ravel()])
        ns.append(hids[order].ravel()[keep.ravel()])
        ss.append(top.ravel()[keep.ravel()])

    def part_topk(batches):
        # Streaming groupby keyed on lst over a lst-clustered, lst-sorted
        # partition — same carry discipline as the LSH path: only the
        # possibly-split trailing list buffers across Arrow batches.
        carry: pd.DataFrame | None = None

        def flush(pdf: pd.DataFrame):
            key = pdf["lst"].to_numpy(np.int64)
            bounds = np.flatnonzero(key[1:] != key[:-1]) + 1
            ids_all = pdf["_id"].to_numpy(np.int64)
            home_all = pdf["pr"].to_numpy(np.int64) == 0
            V_all = np.array(list(pdf["_v"]), dtype=np.float64)
            qs, ns, ss = [], [], []
            for lo, hi in zip(
                np.concatenate(([0], bounds)), np.concatenate((bounds, [len(pdf)]))
            ):
                ids, V, home = ids_all[lo:hi], V_all[lo:hi], home_all[lo:hi]
                if len(ids) <= list_cap:
                    _score_chunk(ids, V, home, qs, ns, ss)
                else:
                    nchunks = -(-len(ids) // list_cap)
                    h = (
                        ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                    ) % np.uint64(nchunks)
                    for c in range(nchunks):
                        m = h == c
                        _score_chunk(ids[m], V[m], home[m], qs, ns, ss)
            if not qs:
                return None
            return pd.DataFrame(
                {
                    "query_id": np.concatenate(qs),
                    "neighbor_id": np.concatenate(ns),
                    "_sim": np.concatenate(ss),
                }
            )

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            lst = pdf["lst"].to_numpy()
            trailing = lst == lst[-1]
            if trailing.all():
                carry = pdf
                continue
            split = len(pdf) - int(np.argmin(trailing[::-1]))
            carry = pdf.iloc[split:]
            out = flush(pdf.iloc[:split])
            if out is not None:
                yield out
        if carry is not None and len(carry):
            out = flush(carry)
            if out is not None:
                yield out

    local = (
        probed.repartition("lst")
        .sortWithinPartitions("lst")
        .mapInPandas(part_topk, schema="query_id long, neighbor_id long, _sim double")
    )
    return (
        local.repartition("query_id")
        .sortWithinPartitions("query_id")
        .mapInPandas(
            _merge_topk(k),
            schema="query_id long, neighbor_id long, sim double, rank int",
        )
    )
