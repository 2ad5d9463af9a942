"""GeoTIFF raster scan — stdlib/numpy-only, parsed from the public TIFF 6.0
+ GeoTIFF specifications.

The reference converts bathymetry GeoTIFF blocks to NetCDF grids
(block-wise processing of huge rasters). No raster library ships here,
but baseline TIFF is a small public format: a byte-order header, chained
IFDs of 12-byte tag entries, strip offsets/byte-counts for the sample
data; GeoTIFF adds double/short tags for the pixel-to-model transform
(ModelPixelScale / ModelTiepoint / GeoKeyDirectory). This reader covers
uncompressed single-band rasters — the shape the reference's bathymetry
chain block-processes — with int/uint/float sample formats.

Spark shape: per-file ``binaryFile`` + ``mapInPandas``; cells surface as
a long-format (row, col, value, lon, lat) frame, strip by strip, so a
tiled 100 GB raster streams through executors in strip-sized Arrow
batches instead of materializing the grid.
"""

from __future__ import annotations

import struct
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
_TAG_SAMPLE_FORMAT = 339
_TAG_MODEL_PIXEL_SCALE = 33550
_TAG_MODEL_TIEPOINT = 33922
_TAG_GDAL_NODATA = 42113

# TIFF field types -> (struct fmt char, size)
_FIELD = {1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4),
          11: ("f", 4), 12: ("d", 8)}


@dataclass
class TiffInfo:
    width: int
    height: int
    bits: int
    sample_format: int  # 1 uint, 2 int, 3 float
    rows_per_strip: int
    strip_offsets: list[int]
    strip_byte_counts: list[int]
    pixel_scale: list[float] = field(default_factory=list)
    tiepoint: list[float] = field(default_factory=list)
    nodata: float | None = None

    def dtype(self) -> str:
        kind = {1: "u", 2: "i", 3: "f"}[self.sample_format]
        return f"{kind}{self.bits // 8}"


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

    if one(_TAG_COMPRESSION, 1) != 1:
        raise NotImplementedError("only uncompressed TIFF strips supported")
    if one(_TAG_SAMPLES_PER_PIXEL, 1) != 1:
        raise NotImplementedError("only single-band rasters supported")
    height = one(_TAG_HEIGHT)
    nodata = tags.get(_TAG_GDAL_NODATA)
    return TiffInfo(
        width=one(_TAG_WIDTH),
        height=height,
        bits=one(_TAG_BITS, 8),
        sample_format=one(_TAG_SAMPLE_FORMAT, 1),
        rows_per_strip=one(_TAG_ROWS_PER_STRIP, height),
        strip_offsets=tags.get(_TAG_STRIP_OFFSETS, []),
        strip_byte_counts=tags.get(_TAG_STRIP_BYTE_COUNTS, []),
        pixel_scale=tags.get(_TAG_MODEL_PIXEL_SCALE, []),
        tiepoint=tags.get(_TAG_MODEL_TIEPOINT, []),
        nodata=float(nodata[0]) if nodata else None,
    )


CELL_SCHEMA = (
    "path string, row int, col int, value double, lon double, lat double"
)


def read_geotiff_cells(spark: SparkSession, path: str) -> DataFrame:
    """Raster cells as (path, row, col, value, lon, lat) — strip-wise
    decode, nodata -> NULL, model coordinates from the
    tiepoint + pixel-scale affine when present (the standard
    north-up GeoTIFF transform)."""
    import numpy as np
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["path", "row", "col", "value", "lon", "lat"]
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                info = parse_tiff(data)
                endian = "<" if data[:2] == b"II" else ">"
                dt = np.dtype(info.dtype()).newbyteorder(endian)
                sx, sy = (info.pixel_scale[:2] + [1.0, 1.0])[:2]
                tie = info.tiepoint
                ox, oy = (tie[3], tie[4]) if len(tie) >= 6 else (0.0, 0.0)
                for s, (off, cnt) in enumerate(
                    zip(info.strip_offsets, info.strip_byte_counts)
                ):
                    vals = np.frombuffer(data, dtype=dt, count=cnt // dt.itemsize,
                                         offset=off).astype("f8")
                    if info.nodata is not None:
                        vals = np.where(vals == info.nodata, np.nan, vals)
                    rows_here = len(vals) // info.width
                    r0 = s * info.rows_per_strip
                    rr = np.repeat(np.arange(r0, r0 + rows_here), info.width)
                    cc = np.tile(np.arange(info.width), rows_here)
                    yield pd.DataFrame({
                        "path": p, "row": rr.astype("i4"), "col": cc.astype("i4"),
                        "value": vals[: rows_here * info.width],
                        "lon": ox + cc * sx,
                        "lat": oy - rr * sy,  # north-up: y decreases with row
                    })[cols]

    return raw.select("path", "content").mapInPandas(decode, CELL_SCHEMA)
