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
        # raw integer bin counts behind `feature` (feature = hist / ||hist||):
        # exact, merge-able across shards (histograms add; normalized floats
        # don't), and DuckDB-oracle-able without float-rounding hazards
        T.StructField("hist", T.ArrayType(T.IntegerType()), True),
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


DECODABLE_SCHEMA = MEDIA_SCHEMA  # same shape; payloads are real WAV/PPM


def synthesize_decodable_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table whose payloads are REAL stdlib-decodable formats —
    canonical 44-byte-header PCM16 WAV for audio, binary P6 PPM for image
    (video stays an opaque byte stream). All content is integer arithmetic
    on the id (no hashing), so a DuckDB oracle can recompute the decoded
    stats with ``generate_series`` and cross-check the full
    write->parse->aggregate path, upgrading multimodal from rows-only to
    oracle-verified.

    Series definitions (id d):
    * audio  (d%3==1): n = 200 + d%57 samples @8kHz; pcm_i =
      (((d*31 + i*7) % 256) - 128) * 256.
    * image  (d%3==0): w = 8 + d%9, h = 6 + d%5; fixed 13-byte header
      ``P6\\n%02d %02d\\n255\\n``; byte_j = (d*13 + j*5) % 256.
    * video  (d%3==2): n = 256 + d%100 raw bytes; byte_j = (d*17 + j*3) % 256.
    """
    import struct as _struct

    import numpy as np

    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["media_id"]:
                d = int(d)
                m = d % 3
                if m == 1:  # WAV, canonical RIFF header per spec
                    n = 200 + d % 57
                    i = np.arange(n, dtype=np.int64)
                    pcm = (((d * 31 + i * 7) % 256) - 128) * 256
                    data = pcm.astype("<i2").tobytes()
                    hdr = b"RIFF" + _struct.pack("<I", 36 + len(data)) + b"WAVE"
                    hdr += b"fmt " + _struct.pack(
                        "<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16
                    )
                    hdr += b"data" + _struct.pack("<I", len(data))
                    rows.append((d, "audio", hdr + data, {"codec": "wav/pcm16"}))
                elif m == 0:  # PPM P6, fixed-width dims for a stable header
                    w, h = 8 + d % 9, 6 + d % 5
                    j = np.arange(3 * w * h, dtype=np.int64)
                    px = ((d * 13 + j * 5) % 256).astype(np.uint8)
                    hdr = b"P6\n" + (b"%02d %02d\n" % (w, h)) + b"255\n"
                    rows.append((d, "image", hdr + px.tobytes(), {"codec": "ppm/p6"}))
                else:  # opaque stream
                    n = 256 + d % 100
                    j = np.arange(n, dtype=np.int64)
                    b = ((d * 17 + j * 3) % 256).astype(np.uint8)
                    rows.append((d, "video", b.tobytes(), {"codec": "raw/v1"}))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return src.mapInPandas(synth, schema=MEDIA_SCHEMA)


def _decode_wav(buf: bytes):
    """From-spec RIFF/WAVE parse (no ``wave`` file-object dance): walk the
    chunk list, read fmt (PCM16 mono expected), return (rate, samples)."""
    import struct as _struct

    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (sz,) = _struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt, channels, rate = _struct.unpack_from("<HHI", body, 0)
            (bits,) = _struct.unpack_from("<H", body, 14)
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError(f"unsupported WAV layout {(fmt, channels, bits)}")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned per spec
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, data


def _decode_ppm(buf: bytes):
    """From-spec binary PPM (P6): whitespace-separated header tokens
    (width, height, maxval), then raw RGB bytes. Returns (w, h, pixels)."""
    import numpy as np

    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":  # comment to end-of-line
            while pos < len(buf) and buf[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval per spec
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(buf, dtype=np.uint8, count=3 * w * h, offset=pos)
    return w, h, px


def decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode of the WAV/PPM payloads via mapInPandas, reduced to
    integer stats: (media_id, kind, n_bytes, n_units, sum_units) where
    units are samples (sum |pcm|), pixels (sum rgb bytes), or raw bytes.
    BIGINT-only output so the driver's hash compare is exact."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                buf = bytes(payload)
                if kind == "audio":
                    _, pcm = _decode_wav(buf)
                    out.append(
                        (int(mid), kind, len(buf), int(pcm.size),
                         int(np.abs(pcm.astype(np.int64)).sum()))
                    )
                elif kind == "image":
                    w, h, px = _decode_ppm(buf)
                    out.append(
                        (int(mid), kind, len(buf), w * h,
                         int(px.astype(np.int64).sum()))
                    )
                else:
                    b = np.frombuffer(buf, dtype=np.uint8)
                    out.append(
                        (int(mid), kind, len(buf), int(b.size),
                         int(b.astype(np.int64).sum()))
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "kind", "n_bytes", "n_units", "sum_units"],
            )

    return media.mapInPandas(
        op,
        schema="media_id long, kind string, n_bytes long, n_units long, sum_units long",
    )


def resize_images(
    media: DataFrame, out_w: int = 4, out_h: int = 4
) -> DataFrame:
    """REAL image resize over the decodable payloads: from-spec P6 decode ->
    nearest-neighbor downsample (src index = floor(dst * src_dim /
    dst_dim), the classic integer rule, so an arithmetic oracle can
    recompute every output pixel) -> P6 re-encode. Non-image rows pass
    through untouched with resized=false. One numpy fancy-index per image
    inside mapInPandas — the Spark-side shape (schema, Arrow batching,
    partition behavior) is exactly what a PIL/ffmpeg-backed resize would
    use at scale; only the kernel differs."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                buf = bytes(payload)
                if kind != "image":
                    rows.append((int(mid), kind, buf, False))
                    continue
                w, h, px = _decode_ppm(buf)
                img = px.reshape(h, w, 3)
                ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
                xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
                small = img[ys][:, xs]
                hdr = b"P6\n%d %d\n255\n" % (out_w, out_h)
                rows.append((int(mid), kind, hdr + small.tobytes(), True))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "resized"]
            )

    return media.mapInPandas(
        op, schema="media_id long, kind string, payload binary, resized boolean"
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
            hists = []
            nbytes = []
            decoders = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    hists.append(None)
                    nbytes.append(0)
                    decoders.append(None)
                    continue
                raw = bytes(payload)
                nbytes.append(len(raw))
                # REAL from-spec decoders for the stdlib-decodable formats
                if raw[:4] == b"RIFF":
                    _, pcm = _decode_wav(raw)
                    vals = (np.abs(pcm.astype(np.int64)) >> 8) % feat_dim
                    decoders.append("wav/pcm16")
                elif raw[:2] == b"P6":
                    _, _, px = _decode_ppm(raw)
                    vals = px % feat_dim
                    decoders.append("ppm/p6")
                elif decoder == "pil":
                    # other codecs would decode here; container lacks them
                    raise NotImplementedError(
                        "real decode not available in this environment"
                    )
                else:
                    # FAKE decoder (clearly marked): raw byte histogram
                    vals = np.frombuffer(raw, dtype=np.uint8) % feat_dim
                    decoders.append("fake/byte-histogram")
                counts = np.bincount(vals, minlength=feat_dim)
                hists.append(counts.astype("int32").tolist())
                hist = counts.astype("float32")
                norm = float(np.linalg.norm(hist)) or 1.0
                feats.append((hist / norm).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "feature": feats,
                    "hist": hists,
                    "decoder": decoders,
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
