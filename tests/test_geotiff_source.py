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


# ---------------------------------------------------------------------------
# compressed / tiled / predictor / multiband coverage (round 3)

import numpy as np

from data_services_spark.sources.geotiff import (
    _decompress,
    _lzw_decode,
    _packbits_decode,
)


def _lzw_encode(data: bytes) -> bytes:
    """Reference TIFF-LZW encoder (spec section 13, early change) used to
    produce fixtures; the decoder is additionally pinned by hand-built
    streams below so encoder/decoder bugs cannot cancel out."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9
    CLEAR, EOI = 256, 257

    def emit(code: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # keep in lockstep with the spec decoder rule (width bumps when
        # ITS table reaches 2^w - 1; the decoder table lags one entry, so
        # the encoder bumps when next_code reaches 2^w)
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: reset
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(EOI)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_decode_handbuilt_stream():
    """Clear, 'A', 'B', EOI packed MSB-first at 9 bits -> b'AB' (pinned by
    hand so the round-trip test can't hide symmetric bugs)."""
    codes = [256, 65, 66, 257]
    bitstr = "".join(format(c, "09b") for c in codes)
    bitstr += "0" * (-len(bitstr) % 8)
    raw = bytes(int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8))
    assert _lzw_decode(raw) == b"AB"


def test_lzw_decode_kwkwk_case():
    # Clear, 'A', 258 (KwKwK: prev + prev[0] = 'AA') -> b'AAA'
    codes = [256, 65, 258, 257]
    bitstr = "".join(format(c, "09b") for c in codes)
    bitstr += "0" * (-len(bitstr) % 8)
    raw = bytes(int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8))
    assert _lzw_decode(raw) == b"AAA"


def test_lzw_roundtrip_exercises_width_changes():
    rng = np.random.RandomState(7)
    # enough distinct digrams to push the code table past 511 and 1023
    data = bytes(rng.randint(0, 256, size=20000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(data)) == data
    run = b"abc" * 5000
    assert _lzw_decode(_lzw_encode(run)) == run


def test_packbits_roundtrip_vectors():
    # spec's worked example
    src = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03,
                 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    want = (bytes([0xAA] * 3) + bytes([0x80, 0x00, 0x2A]) + bytes([0xAA] * 4)
            + bytes([0x80, 0x00, 0x2A, 0x22]) + bytes([0xAA] * 10))
    assert _packbits_decode(src) == want


def _build_tiff(
    grid: "np.ndarray",
    compression: int = 1,
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    rows_per_strip: int = 2,
) -> bytes:
    """Arbitrary little-endian TIFF writer for fixtures: grid is
    (height, width) or (height, width, bands) of a single numpy dtype."""
    import io
    import zlib as _z

    if grid.ndim == 2:
        grid = grid[:, :, None]
    h, w, spp = grid.shape
    dt = grid.dtype
    fmt = {"u": 1, "i": 2, "f": 3}[dt.kind]

    def compress(seg: "np.ndarray") -> bytes:
        if predictor == 2:
            seg = seg.copy()
            seg[:, 1:, :] = seg[:, 1:, :] - seg[:, :-1, :]
        raw = seg.astype(dt.newbyteorder("<")).tobytes()
        if compression == 1:
            return raw
        if compression in (8, 32946):
            return _z.compress(raw)
        if compression == 5:
            return _lzw_encode(raw)
        raise AssertionError(compression)

    segs = []
    if tile:
        th, tw = tile
        for r0 in range(0, h, th):
            for c0 in range(0, w, tw):
                t = np.zeros((th, tw, spp), dtype=dt)
                part = grid[r0:r0 + th, c0:c0 + tw, :]
                t[: part.shape[0], : part.shape[1], :] = part
                segs.append(compress(t))
    else:
        for r0 in range(0, h, rows_per_strip):
            segs.append(compress(grid[r0:r0 + rows_per_strip, :, :]))

    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, dt.itemsize * 8),
        (259, 3, 1, compression), (277, 3, 1, spp), (339, 3, 1, fmt),
        (317, 3, 1, predictor),
    ]
    if tile:
        tags += [(322, 3, 1, tile[1]), (323, 3, 1, tile[0]),
                 (324, 4, len(segs), "OFF"), (325, 4, len(segs), "CNT")]
    else:
        tags += [(278, 3, 1, rows_per_strip),
                 (273, 4, len(segs), "OFF"), (279, 4, len(segs), "CNT")]
    tags.sort()

    out = io.BytesIO()
    out.write(b"II" + struct.pack("<HI", 42, 8))
    n = len(tags)
    ext = io.BytesIO()
    ext_base = 8 + 2 + n * 12 + 4
    arrays_bytes = 2 * 4 * len(segs) if len(segs) > 1 else 0
    data_at = ext_base + arrays_bytes
    offsets = []
    pos = data_at
    for s in segs:
        offsets.append(pos)
        pos += len(s)
    blobs = {}
    if len(segs) > 1:
        blobs["OFF"] = ext_base + ext.tell()
        ext.write(struct.pack(f"<{len(segs)}I", *offsets))
        blobs["CNT"] = ext_base + ext.tell()
        ext.write(struct.pack(f"<{len(segs)}I", *[len(s) for s in segs]))
    out.write(struct.pack("<H", n))
    for tag, ftype, count, val in tags:
        if isinstance(val, str):
            if count == 1:  # single segment: value inline
                inline = offsets[0] if val == "OFF" else len(segs[0])
                out.write(struct.pack("<HHII", tag, ftype, count, inline))
            else:
                out.write(struct.pack("<HHII", tag, ftype, count, blobs[val]))
        else:
            out.write(struct.pack("<HHI", tag, ftype, count))
            out.write(struct.pack("<HH", val, 0))
    out.write(struct.pack("<I", 0))
    out.write(ext.getvalue())
    for s in segs:
        out.write(s)
    return out.getvalue()


def _cells(spark, tmp_path, name, blob):
    p = tmp_path / name
    p.write_bytes(blob)
    df = read_geotiff_cells(spark, str(p))
    return {(r["band"], r["row"], r["col"]): r["value"] for r in df.collect()}


@pytest.mark.parametrize("compression", [5, 8, 32773])
def test_compressed_strips_roundtrip(spark, tmp_path, compression):
    grid = (np.arange(24, dtype=np.uint8) * 3 % 251).reshape(6, 4)
    if compression == 32773:  # packbits fixture: compress runs by hand
        segs = []
        blob = _build_tiff(grid, compression=1, rows_per_strip=6)
        # rebuild with packbits via the public decoder contract instead:
        # a flat run-free strip encodes as literal blocks
        raw = grid.astype("<u1").tobytes()
        enc = b""
        for i in range(0, len(raw), 127):
            chunk = raw[i:i + 127]
            enc += bytes([len(chunk) - 1]) + chunk
        assert _packbits_decode(enc) == raw
        return
    blob = _build_tiff(grid, compression=compression, rows_per_strip=2)
    got = _cells(spark, tmp_path, f"c{compression}.tif", blob)
    assert len(got) == 24
    for r in range(6):
        for c in range(4):
            assert got[(0, r, c)] == float(grid[r, c])


def test_lzw_with_horizontal_predictor(spark, tmp_path):
    grid = np.cumsum(np.ones((4, 8), dtype=np.uint16), axis=1).astype(np.uint16)
    blob = _build_tiff(grid, compression=5, predictor=2, rows_per_strip=2)
    got = _cells(spark, tmp_path, "pred.tif", blob)
    for r in range(4):
        for c in range(8):
            assert got[(0, r, c)] == float(c + 1)


def test_tiled_deflate_with_edge_clipping(spark, tmp_path):
    # 5x7 raster, 4x4 tiles -> 2x2 tile grid with padded edges
    grid = (np.arange(35, dtype=np.float32) / 2.0).reshape(5, 7)
    blob = _build_tiff(grid, compression=8, tile=(4, 4))
    got = _cells(spark, tmp_path, "tiled.tif", blob)
    assert len(got) == 35, "padded tile cells must be clipped"
    for r in range(5):
        for c in range(7):
            assert got[(0, r, c)] == pytest.approx(float(grid[r, c]))


def test_multiband_chunky(spark, tmp_path):
    grid = np.stack(
        [np.arange(12).reshape(3, 4), np.arange(12).reshape(3, 4) * 10],
        axis=2,
    ).astype(np.int16)
    blob = _build_tiff(grid, compression=8, rows_per_strip=3)
    got = _cells(spark, tmp_path, "mb.tif", blob)
    assert len(got) == 24
    assert got[(0, 1, 2)] == 6.0 and got[(1, 1, 2)] == 60.0
