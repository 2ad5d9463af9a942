"""MAT-file Level 5 scan: the test hand-writes v5 bytes per the public
spec (128-byte header, tagged 8-byte-aligned elements, miMATRIX
sub-elements, small-data-element form, miCOMPRESSED wrapping) and the
engine parses them back — numeric matrices, char vars, compression, and
the distributed long-format frame."""

from __future__ import annotations

import struct
import zlib

import pytest

from data_services_spark.sources.matfile import parse_mat5, read_mat_series


def _element(mi_type: int, payload: bytes, small: bool = False) -> bytes:
    if small:
        assert len(payload) <= 4
        return struct.pack("<HH", mi_type, len(payload)) + payload.ljust(4, b"\0")
    pad = (-len(payload)) % 8
    return struct.pack("<II", mi_type, len(payload)) + payload + b"\0" * pad


def _matrix(name: str, mx_class: int, dims: list[int],
            data_type: int, data: bytes) -> bytes:
    sub = _element(6, struct.pack("<II", mx_class, 0))          # array flags
    sub += _element(5, b"".join(struct.pack("<i", d) for d in dims))
    sub += _element(1, name.encode())                            # name
    sub += _element(data_type, data)
    return _element(14, sub)  # miMATRIX


def _mat_bytes(compressed: bool = False) -> bytes:
    header = b"MATLAB 5.0 MAT-file, engine test".ljust(124, b" ")
    header += struct.pack("<HH", 0x0100, 0x494D)  # version, 'IM' little-endian
    # TEMP: 3x1 double; DEPTH: 1x2 int32 stored as miINT32; site: char
    body = _matrix("TEMP", 6, [3, 1], 9, struct.pack("<3d", 21.5, 19.0, 18.25))
    body += _matrix("DEPTH", 12, [1, 2], 5, struct.pack("<2i", 5, 10))
    body += _matrix("site", 4, [1, 3], 4, struct.pack("<3H", ord("A"), ord("B"), ord("C")))
    if compressed:
        comp = zlib.compress(body)
        body = _element(15, comp)
    return header + body


def test_parse_numeric_char_vars():
    out = parse_mat5(_mat_bytes())
    assert out["TEMP"].reshape(-1).tolist() == [21.5, 19.0, 18.25]
    assert out["DEPTH"].reshape(-1).tolist() == [5, 10]
    assert out["site"] == "ABC"


def test_parse_compressed():
    out = parse_mat5(_mat_bytes(compressed=True))
    assert out["TEMP"].reshape(-1).tolist() == [21.5, 19.0, 18.25]


def test_rejects_garbage():
    with pytest.raises(ValueError):
        parse_mat5(b"\x00" * 130)


def test_series_dataframe(spark, tmp_path):
    p = tmp_path / "deploy.mat"
    p.write_bytes(_mat_bytes())
    df = read_mat_series(spark, str(p), variables=["TEMP", "DEPTH"])
    got = {(r["variable"], r["idx"]): r["value"] for r in df.collect()}
    assert got[("TEMP", 0)] == 21.5 and got[("TEMP", 2)] == 18.25
    assert got[("DEPTH", 1)] == 10.0
    assert ("site", 0) not in got  # char vars excluded from numeric series


def _mat_bytes_be() -> bytes:
    """Same variables, written fully big-endian ('MI' indicator read
    little-endian shows 0x4D49)."""
    def element(mi_type: int, payload: bytes) -> bytes:
        pad = (-len(payload)) % 8
        return struct.pack(">II", mi_type, len(payload)) + payload + b"\0" * pad

    def matrix(name: str, mx_class: int, dims, data_type: int, data: bytes) -> bytes:
        sub = element(6, struct.pack(">II", mx_class, 0))
        sub += element(5, b"".join(struct.pack(">i", d) for d in dims))
        sub += element(1, name.encode())
        sub += element(data_type, data)
        return element(14, sub)

    header = b"MATLAB 5.0 MAT-file, big-endian test".ljust(124, b" ")
    header += struct.pack(">HH", 0x0100, 0x494D)  # 'MI' in file byte order
    body = matrix("TEMP", 6, [3, 1], 9, struct.pack(">3d", 21.5, 19.0, 18.25))
    body += matrix("DEPTH", 12, [1, 2], 5, struct.pack(">2i", 5, 10))
    body += matrix("site", 4, [1, 3], 4, struct.pack(">3H", ord("A"), ord("B"), ord("C")))
    return header + body


def test_parse_big_endian():
    out = parse_mat5(_mat_bytes_be())
    assert out["TEMP"].reshape(-1).tolist() == [21.5, 19.0, 18.25]
    assert out["DEPTH"].reshape(-1).tolist() == [5, 10]
    assert out["site"] == "ABC"


def test_parse_big_endian_small_element():
    """Small-data-element form under big-endian tags: the packed 32-bit
    word's upper half is the byte count when read in file order."""
    header = b"MATLAB 5.0".ljust(124, b" ") + struct.pack(">HH", 0x0100, 0x494D)
    name_small = struct.pack(">HH", 1, 1) + b"x".ljust(4, b"\0")
    sub = struct.pack(">II", 6, 8) + struct.pack(">II", 6, 0)
    sub += struct.pack(">II", 5, 8) + struct.pack(">2i", 1, 1)
    sub += name_small
    sub += struct.pack(">II", 9, 8) + struct.pack(">d", 42.0)
    body = struct.pack(">II", 14, len(sub)) + sub
    out = parse_mat5(header + body)
    assert out["x"].reshape(-1).tolist() == [42.0]
