"""Deduplication operators for large-scale text corpora.

Exact dedup, word-shingle MinHash+LSH, SimHash, and n-gram Jaccard — the
dedup battery a training-data pipeline runs over a documents table. The
reference's dedup idiom is content-md5 equality (``faimms.py:114-120``,
``aims_realtime_util.py:366-375``) and key-level drop_duplicates
(``bom/wfs.py:100-112``); near-dup detection generalizes that to
similarity-preserving signatures.

Scale design:
* exact: one hash-groupBy — map-side combinable, no sort.
* MinHash: signatures are pure column expressions
  (``array_min(transform(shingles, s -> xxhash64(s, seed_i)))`` per seed) —
  JVM-side, codegen'd, no UDF, no explode of the shingle set. LSH banding
  explodes only ``n_bands`` rows per doc (constant factor), then a
  self-join *within band buckets* — candidate generation never goes
  quadratic. Verification computes exact Jaccard only on candidates.
* SimHash: one vectorized Arrow pandas UDF (numpy bit-twiddling per batch).
* n-gram Jaccard: quadratic verify restricted to a blocking key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def tokens(col) -> F.Column:
    """Whitespace tokens, empties dropped (matches DuckDB
    list_filter(string_split(...)))."""
    return F.filter(F.split(col, " "), lambda x: x != "")


def word_shingles(col, n: int = 3) -> F.Column:
    """Distinct n-word shingles of a text column — pure column expr."""
    w = tokens(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the smallest
    id as representative and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def minhash_signature(col, num_hashes: int = 64, shingle_n: int = 3) -> F.Column:
    """MinHash signature as array<long>: per seed i, min over shingles of
    xxhash64(xxhash64(shingle), i). No UDF — array_min(transform(...)).

    NB: the transform lambda must take exactly ONE parameter — PySpark
    passes (element, index) to two-parameter callables, so the idiomatic
    `lambda s, i=i:` capture trick silently binds i to the ARRAY INDEX.
    """
    sh = word_shingles(col, shingle_n)
    hs = F.transform(sh, lambda s: F.xxhash64(s))  # hash each string ONCE
    return F.array(
        *[
            F.array_min(F.transform(hs, lambda h: F.xxhash64(h, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, built for scale:

    1. **Signatures via explode + 64 min-aggs** — shingles explode to rows,
       each string is xxhash64'd ONCE, the 64 per-seed variants are cheap
       long re-hashes, and ``groupBy(id).agg(min×64)`` is map-side
       combinable: the shuffle carries 64 longs per doc, never the shingle
       text.
    2. **Band buckets hashed from the raw longs** (``xxhash64(m_i.., band)``)
       — no string concat; the banded table is (id, band, bucket), 3 slim
       columns × ``bands`` rows per doc.
    3. **Self-join within (band, bucket)** on the slim table; candidate
       generation never goes quadratic in the corpus, only within buckets.
    4. **Verify by joining candidate ids back** to a (id, shingles) table —
       the heavy shingle arrays are shipped only for actual candidates.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, exact Jaccard
    >= threshold.
    """
    rows_per_band = num_hashes // bands
    shingles = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_n).alias("_sh"),
    )
    exploded = shingles.select("_id", F.explode("_sh").alias("_s")).select(
        "_id", F.xxhash64("_s").alias("_h")
    )
    sig = exploded.groupBy("_id").agg(
        *[F.min(F.xxhash64("_h", F.lit(i))).alias(f"m{i}") for i in range(num_hashes)]
    )
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[f"m{b * rows_per_band + r}" for r in range(rows_per_band)],
                            F.lit(b),
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_a = shingles.select(F.col("_id").alias("doc_a"), F.col("_sh").alias("sh_a"))
    sh_b = shingles.select(F.col("_id").alias("doc_b"), F.col("_sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", F.round(jac.cast("double"), 6))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


@F.pandas_udf(T.LongType())
def simhash64(texts):  # type: ignore[no-untyped-def]
    """64-bit SimHash — vectorized Arrow pandas UDF (numpy per batch).

    Per doc: hash each token to 64 bits; sum +1/-1 per bit position over
    tokens; sign vector -> bits. Python stays out of the per-row loop:
    tokens of the whole batch are hashed in one numpy pipeline.
    """
    import numpy as np
    import pandas as pd

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            continue
        toks = np.array([w for w in t.split(" ") if w], dtype=object)
        if toks.size == 0:
            continue
        # deterministic 64-bit token hashes (FNV-1a over utf-8, vectorized-ish)
        hs = np.fromiter(
            (_fnv1a64(w.encode()) for w in toks), dtype=np.uint64, count=toks.size
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        counts = (2 * bits - 1).sum(axis=0)
        sh = np.uint64(0)
        for b in np.nonzero(counts > 0)[0]:
            sh |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sh.astype(np.int64))
    return pd.Series(out)


def _fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in data:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_buckets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", prefix_bits: int = 16
) -> DataFrame:
    """SimHash each doc and bucket by the top ``prefix_bits`` bits — docs in
    one bucket are Hamming-near candidates (banding over bit prefixes)."""
    sh = df.select(
        F.col(id_col), simhash64(F.col(text_col)).alias("simhash")
    )
    return sh.withColumn(
        "bucket", F.shiftrightunsigned("simhash", 64 - prefix_bits)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "source",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact word-set Jaccard over pairs within a blocking key (the
    quadratic verify step; blocking keeps it tractable — at scale the
    blocking key comes from LSH, here from a metadata column)."""
    t = df.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        F.array_distinct(tokens(F.col(text_col))).alias("_w"),
    ).withColumn("_sz", F.size("_w"))
    a = t.alias("a")
    b = t.alias("b")
    jac = F.size(F.array_intersect("a._w", "b._w")) / F.size(F.array_union("a._w", "b._w"))
    # size-bound prefilter (exact): J >= t implies min(|A|,|B|)/max >= t,
    # so the length-ratio test prunes pairs BEFORE the array_intersect —
    # the join emits only ratio-compatible pairs
    # epsilon slack so float representation of the threshold can never
    # exclude an exactly-on-the-boundary pair
    ratio_ok = F.least("a._sz", "b._sz").cast("double") >= (
        F.greatest("a._sz", "b._sz") * F.lit(threshold) - F.lit(1e-9)
    )
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._id") < F.col("b._id"))
            & ratio_ok,
        )
        .withColumn("jaccard", F.round(jac.cast("double"), 6))
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            "jaccard",
        )
    )
