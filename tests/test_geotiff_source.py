"""GeoTIFF raster scan: test hand-writes a baseline TIFF (little-endian,
two strips, float32 samples, ModelPixelScale/Tiepoint + GDAL nodata)
per the public TIFF 6.0 / GeoTIFF specs and reads it back."""

from __future__ import annotations

import struct

import pytest

from data_services_spark.sources.geotiff import parse_tiff, read_geotiff_cells


def _tiff_bytes() -> bytes:
    """4x4 float32 raster, 2 rows per strip, pixel scale (0.5, 0.25),
    tiepoint anchoring pixel (0,0) at (lon 150.0, lat -20.0), nodata -9."""
    import io

    width = height = 4
    rows_per_strip = 2
    strip0 = struct.pack("<8f", 1, 2, 3, 4, 5, 6, 7, 8)
    strip1 = struct.pack("<8f", 9, -9, 11, 12, 13, 14, 15, 16)

    entries = []  # (tag, type, count, value_or_offset_placeholder)
    out = io.BytesIO()
    out.write(b"II" + struct.pack("<HI", 42, 8))  # header, IFD at 8

    tags = [
        (256, 3, 1, width), (257, 3, 1, height), (258, 3, 1, 32),
        (259, 3, 1, 1), (277, 3, 1, 1), (278, 3, 1, rows_per_strip),
        (339, 3, 1, 3),
        (273, 4, 2, "STRIP_OFFSETS"), (279, 4, 2, "STRIP_COUNTS"),
        (33550, 12, 3, "PIXEL_SCALE"), (33922, 12, 6, "TIEPOINT"),
        (42113, 2, 3, b"-9\x00"),
    ]
    n = len(tags)
    ifd_size = 2 + n * 12 + 4
    ext = io.BytesIO()  # out-of-line values, placed after the IFD
    ext_base = 8 + ifd_size

    def extval(b: bytes) -> int:
        off = ext_base + ext.tell()
        ext.write(b)
        return off

    data_off = None  # patched later
    ext_blobs = {}
    ext_blobs["PIXEL_SCALE"] = extval(struct.pack("<3d", 0.5, 0.25, 0.0))
    ext_blobs["TIEPOINT"] = extval(struct.pack("<6d", 0, 0, 0, 150.0, -20.0, 0))
    strips_at = ext_base + ext.tell() + 16  # after the two 2x4-byte arrays
    ext_blobs["STRIP_OFFSETS"] = extval(
        struct.pack("<2I", strips_at, strips_at + len(strip0))
    )
    ext_blobs["STRIP_COUNTS"] = extval(struct.pack("<2I", len(strip0), len(strip1)))

    out.write(struct.pack("<H", n))
    for tag, ftype, count, val in tags:
        if isinstance(val, str):
            out.write(struct.pack("<HHII", tag, ftype, count, ext_blobs[val]))
        elif isinstance(val, bytes):  # short ASCII: inline in the value slot
            out.write(struct.pack("<HHI", tag, ftype, count))
            out.write(val.ljust(4, b"\x00"))
        else:
            out.write(struct.pack("<HHI", tag, ftype, count))
            out.write(struct.pack("<HH", val, 0))  # SHORT packed in value slot
    out.write(struct.pack("<I", 0))  # next IFD
    out.write(ext.getvalue())
    out.write(strip0 + strip1)
    return out.getvalue()


def test_parse_header():
    info = parse_tiff(_tiff_bytes())
    assert (info.width, info.height, info.bits, info.sample_format) == (4, 4, 32, 3)
    assert info.rows_per_strip == 2 and len(info.strip_offsets) == 2
    assert info.pixel_scale[:2] == [0.5, 0.25]
    assert info.nodata == -9.0


def test_cells_frame_with_geo_transform(spark, tmp_path):
    p = tmp_path / "bathy.tif"
    p.write_bytes(_tiff_bytes())
    df = read_geotiff_cells(spark, str(p))
    rows = {(r["row"], r["col"]): r for r in df.collect()}
    assert len(rows) == 16
    assert rows[(0, 0)]["value"] == 1.0
    assert rows[(2, 1)]["value"] is None  # nodata -> NULL
    assert rows[(3, 3)]["value"] == 16.0
    # affine: lon = 150 + col*0.5 ; lat = -20 - row*0.25 (north-up)
    assert rows[(0, 2)]["lon"] == 151.0
    assert rows[(3, 0)]["lat"] == -20.75


def test_rejects_non_tiff():
    with pytest.raises(ValueError):
        parse_tiff(b"PK\x03\x04zipzip")
