"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All pure column expressions (codegen'd, no UDFs) so they run at corpus
scale as map-only stages fused into the scan. Reference analogues: QC-flag
synthesis (``ardc_nrt/lib/common/netcdf.py:80-83``), sentinel normalization
(``qld_data_parser.py:173-194``), content-md5 fingerprinting
(``aims_realtime_util.py:366-375``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_dedup import tokens

# marker words per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "et", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def _marker_hits(text_col, words: list[str]) -> F.Column:
    """Count occurrences of any marker word (word-boundary regex count)."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text_col, F.lit(pattern), F.lit(1)))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: marker-word hit counts, deterministic CASE
    priority en > es > fr > de, CJK char presence short-circuits to zh."""
    t = F.lower(F.col(text_col))
    hits = {lang: _marker_hits(t, ws) for lang, ws in LANG_MARKERS.items()}
    has_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    pred = (
        F.when(has_cjk, "zh")
        .when(
            (hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["de"]),
            "en",
        )
        .when((hits["es"] >= hits["fr"]) & (hits["es"] >= hits["de"]), "es")
        .when(hits["fr"] >= hits["de"], "fr")
        .otherwise("de")
    )
    return df.select(
        id_col,
        pred.alias("lang_pred"),
        hits["en"].alias("hits_en"),
        hits["es"].alias("hits_es"),
        hits["fr"].alias("hits_fr"),
        hits["de"].alias("hits_de"),
    )


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (word-piece count via regex on letter runs / digits / punct)."""
    toks = tokens(F.col(text_col))
    subwords = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"([A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s])"), F.lit(1)
        )
    )
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        subwords.alias("n_subwords"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0,1] (all column arithmetic, mirrors classic corpus filters)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = tokens(t)
    n_words = F.size(toks)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    stop_hits = _marker_hits(F.lower(t), EN_STOPWORDS)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6)
    avg_word_len = F.round(
        (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1)), 6
    )
    # floor(x * 1e6) as integer instead of round(x, 6): identical doubles
    # floor identically everywhere, while decimal rounding of exact-half
    # dyadics (e.g. 0.5203125) differs between engines' rounding modes
    score = F.floor(
        (
            F.least(n_words / F.lit(64.0), F.lit(1.0)) * 0.5
            + F.least(stop_ratio * 4, F.lit(1.0)) * 0.3
            + (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
        )
        * 1_000_000
    ).cast("long")
    return df.select(
        id_col,
        n_chars.alias("n_chars_computed"),
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_word_len.alias("avg_word_len"),
        score.alias("quality_score_x1e6"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text +
    a coarse length bucket (the md5-golden idiom, faimms.py:286-294)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        id_col,
        F.md5(norm).alias("fp_md5"),
        (F.floor(F.length(norm) / 64)).cast("long").alias("len_bucket"),
    )
