"""GeoTIFF raster scan — stdlib/numpy-only, parsed from the public TIFF 6.0
+ GeoTIFF specifications.

The reference converts bathymetry GeoTIFF blocks to NetCDF grids
(block-wise processing of huge rasters). No raster library ships here,
but TIFF is a small public format: a byte-order header, chained IFDs of
12-byte tag entries, strip or tile offsets/byte-counts for the sample
data; GeoTIFF adds double/short tags for the pixel-to-model transform
(ModelPixelScale / ModelTiepoint / GeoKeyDirectory). This reader covers:

* **strip and tile organisation** (tags 273/279 vs 322-325) — tiles are
  the layout huge bathymetry blocks actually ship in;
* **compression**: none (1), LZW (5, from the TIFF-spec variant: MSB-first
  codes, Clear=256/EOI=257, early code-width change), Deflate (8 and the
  legacy 32946, via zlib), PackBits (32773);
* **horizontal-differencing predictor** (tag 317 = 2), the usual pairing
  with LZW/Deflate on integer rasters;
* **multiband chunky rasters** (SamplesPerPixel > 1, PlanarConfiguration
  1) — cells carry a ``band`` column; and int/uint/float sample formats.

Spark shape: per-file ``binaryFile`` + ``mapInPandas``; cells surface as
a long-format (band, row, col, value, lon, lat) frame, segment by
segment, so a tiled 100 GB raster streams through executors in
segment-sized Arrow batches instead of materializing the grid.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_PLANAR_CONFIG = 284
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_BYTE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_MODEL_PIXEL_SCALE = 33550
_TAG_MODEL_TIEPOINT = 33922
_TAG_GDAL_NODATA = 42113

_COMP_NONE = 1
_COMP_LZW = 5
_COMP_DEFLATE = 8
_COMP_PACKBITS = 32773
_COMP_DEFLATE_OLD = 32946

# TIFF field types -> (struct fmt char, size)
_FIELD = {1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4),
          11: ("f", 4), 12: ("d", 8)}


@dataclass
class TiffInfo:
    width: int
    height: int
    bits: int
    sample_format: int  # 1 uint, 2 int, 3 float
    compression: int
    predictor: int
    samples_per_pixel: int
    rows_per_strip: int
    strip_offsets: list[int]
    strip_byte_counts: list[int]
    tile_width: int = 0
    tile_length: int = 0
    tile_offsets: list[int] = field(default_factory=list)
    tile_byte_counts: list[int] = field(default_factory=list)
    pixel_scale: list[float] = field(default_factory=list)
    tiepoint: list[float] = field(default_factory=list)
    nodata: float | None = None

    @property
    def tiled(self) -> bool:
        return bool(self.tile_offsets)

    def dtype(self) -> str:
        kind = {1: "u", 2: "i", 3: "f"}[self.sample_format]
        return f"{kind}{self.bits // 8}"


def _lzw_decode(src: bytes) -> bytes:
    """TIFF-variant LZW (spec section 13): MSB-first bit packing, 9-bit
    initial codes, Clear=256 / EOI=257, and the 'early change' — the code
    width bumps one code EARLIER than vanilla LZW (when the next entry
    index reaches 2^width - 1)."""
    out = bytearray()
    nbits = len(src) * 8
    pos = 0
    width = 9
    CLEAR, EOI = 256, 257
    table: list[bytes] = []
    prev = b""

    while True:
        if pos + width > nbits:
            break
        byte0 = pos >> 3
        chunk = int.from_bytes(src[byte0:byte0 + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (pos & 7) - width)) & ((1 << width) - 1)
        pos += width
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = b""
            continue
        if not table:
            raise ValueError("LZW stream must start with a Clear code")
        if not prev:
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt LZW stream (code {code})")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(src: bytes) -> bytes:
    out = bytearray()
    i = 0
    n_src = len(src)
    while i < n_src:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += src[i:i + 1] * (257 - n)
            i += 1
        # n == 128: no-op per spec
    return bytes(out)


def _decompress(seg: bytes, compression: int) -> bytes:
    if compression == _COMP_NONE:
        return seg
    if compression in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
        return zlib.decompress(seg)
    if compression == _COMP_LZW:
        return _lzw_decode(seg)
    if compression == _COMP_PACKBITS:
        return _packbits_decode(seg)
    raise NotImplementedError(f"TIFF compression scheme {compression}")


def parse_tiff(data: bytes) -> TiffInfo:
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF file")
    if struct.unpack_from(e + "H", data, 2)[0] != 42:
        raise ValueError("not a TIFF file (bad magic)")
    ifd = struct.unpack_from(e + "I", data, 4)[0]
    n = struct.unpack_from(e + "H", data, ifd)[0]
    tags: dict[int, list] = {}
    for i in range(n):
        pos = ifd + 2 + i * 12
        tag, ftype, count = struct.unpack_from(e + "HHI", data, pos)
        if ftype not in _FIELD:
            continue
        fmt, size = _FIELD[ftype]
        total = count * size
        off = pos + 8 if total <= 4 else struct.unpack_from(e + "I", data, pos + 8)[0]
        if ftype == 2:  # ASCII
            tags[tag] = [data[off:off + count].rstrip(b"\0").decode("ascii", "replace")]
        else:
            tags[tag] = list(struct.unpack_from(e + str(count) + fmt, data, off))

    def one(tag: int, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    compression = one(_TAG_COMPRESSION, 1)
    if compression not in (_COMP_NONE, _COMP_LZW, _COMP_DEFLATE,
                           _COMP_PACKBITS, _COMP_DEFLATE_OLD):
        raise NotImplementedError(f"TIFF compression scheme {compression}")
    if one(_TAG_PLANAR_CONFIG, 1) != 1:
        raise NotImplementedError("only chunky (PlanarConfiguration=1) rasters")
    predictor = one(_TAG_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} (only none/horizontal)")
    height = one(_TAG_HEIGHT)
    nodata = tags.get(_TAG_GDAL_NODATA)
    return TiffInfo(
        width=one(_TAG_WIDTH),
        height=height,
        bits=one(_TAG_BITS, 8),
        sample_format=one(_TAG_SAMPLE_FORMAT, 1),
        compression=compression,
        predictor=predictor,
        samples_per_pixel=one(_TAG_SAMPLES_PER_PIXEL, 1),
        rows_per_strip=one(_TAG_ROWS_PER_STRIP, height),
        strip_offsets=tags.get(_TAG_STRIP_OFFSETS, []),
        strip_byte_counts=tags.get(_TAG_STRIP_BYTE_COUNTS, []),
        tile_width=one(_TAG_TILE_WIDTH, 0),
        tile_length=one(_TAG_TILE_LENGTH, 0),
        tile_offsets=tags.get(_TAG_TILE_OFFSETS, []),
        tile_byte_counts=tags.get(_TAG_TILE_BYTE_COUNTS, []),
        pixel_scale=tags.get(_TAG_MODEL_PIXEL_SCALE, []),
        tiepoint=tags.get(_TAG_MODEL_TIEPOINT, []),
        nodata=float(nodata[0]) if nodata else None,
    )


CELL_SCHEMA = (
    "path string, band int, row int, col int, value double, lon double, lat double"
)


def _segments(info: TiffInfo):
    """Yield (offset, byte_count, row0, col0, seg_rows, seg_cols) for each
    strip or tile, with edge segments clipped to the raster bounds. Tile
    data is always padded to full tile size on disk; strips only carry the
    remaining rows."""
    if info.tiled:
        across = -(-info.width // info.tile_width)
        for i, (off, cnt) in enumerate(zip(info.tile_offsets, info.tile_byte_counts)):
            tr, tc = divmod(i, across)
            yield off, cnt, tr * info.tile_length, tc * info.tile_width, \
                info.tile_length, info.tile_width
    else:
        for s, (off, cnt) in enumerate(zip(info.strip_offsets, info.strip_byte_counts)):
            r0 = s * info.rows_per_strip
            yield off, cnt, r0, 0, min(info.rows_per_strip, info.height - r0), \
                info.width


def read_geotiff_cells(spark: SparkSession, path: str) -> DataFrame:
    """Raster cells as (path, band, row, col, value, lon, lat) —
    segment-wise (strip or tile) decode, decompression + horizontal
    predictor per the IFD, nodata -> NULL, model coordinates from the
    tiepoint + pixel-scale affine when present (the standard north-up
    GeoTIFF transform)."""
    import numpy as np
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["path", "band", "row", "col", "value", "lon", "lat"]
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                info = parse_tiff(data)
                endian = "<" if data[:2] == b"II" else ">"
                dt = np.dtype(info.dtype()).newbyteorder(endian)
                spp = info.samples_per_pixel
                sx, sy = (info.pixel_scale[:2] + [1.0, 1.0])[:2]
                tie = info.tiepoint
                ox, oy = (tie[3], tie[4]) if len(tie) >= 6 else (0.0, 0.0)
                for off, cnt, r0, c0, seg_rows, seg_cols in _segments(info):
                    seg = _decompress(data[off:off + cnt], info.compression)
                    vals = np.frombuffer(seg, dtype=dt,
                                         count=len(seg) // dt.itemsize)
                    rows_here = min(len(vals) // (seg_cols * spp),
                                    info.height - r0)
                    grid = vals[: rows_here * seg_cols * spp].reshape(
                        rows_here, seg_cols, spp
                    )
                    if info.predictor == 2:
                        # horizontal differencing: cumsum along cols per
                        # band in the dtype's modular arithmetic
                        grid = np.cumsum(grid, axis=1, dtype=dt.base)
                    grid = grid.astype("f8")
                    if info.nodata is not None:
                        grid = np.where(grid == info.nodata, np.nan, grid)
                    keep_cols = min(seg_cols, info.width - c0)
                    grid = grid[:, :keep_cols, :]
                    rr = np.repeat(np.arange(r0, r0 + rows_here), keep_cols)
                    cc = np.tile(np.arange(c0, c0 + keep_cols), rows_here)
                    frames = {
                        "path": p,
                        "band": np.zeros(len(rr), dtype="i4"),
                        "row": rr.astype("i4"), "col": cc.astype("i4"),
                        "value": grid[:, :, 0].ravel(),
                        "lon": ox + cc * sx,
                        "lat": oy - rr * sy,  # north-up: y decreases with row
                    }
                    if spp == 1:
                        yield pd.DataFrame(frames)[cols]
                    else:
                        out = []
                        for band in range(spp):
                            f = dict(frames)
                            f["band"] = np.full(len(rr), band, dtype="i4")
                            f["value"] = grid[:, :, band].ravel()
                            out.append(pd.DataFrame(f))
                        yield pd.concat(out, ignore_index=True)[cols]

    return raw.select("path", "content").mapInPandas(decode, CELL_SCHEMA)
