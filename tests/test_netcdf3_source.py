"""NetCDF-3 classic scan: the test hand-writes a CDF-1 file byte-by-byte
per the public spec (magic, dim/attr/var lists, fixed var at offset,
record vars interleaved per record) and the engine parses it back —
header, attributes, fill-value NULLs, record de-interleaving, and the
distributed binaryFile+mapInPandas shape."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from data_services_spark.sources.netcdf3 import (
    netcdf3_metadata,
    parse_netcdf3,
    read_netcdf3_timeseries,
    read_variable,
)


def _name(s: str) -> bytes:
    b = s.encode()
    pad = (-len(b)) % 4
    return struct.pack(">i", len(b)) + b + b"\x00" * pad


def _attrs(d: dict) -> bytes:
    if not d:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", 0x0C, len(d))
    for k, (nc_type, packed) in d.items():
        nelems = 1 if nc_type != 2 else len(packed)
        pad = (-len(packed)) % 4
        out += _name(k) + struct.pack(">ii", nc_type, nelems) + packed + b"\x00" * pad
    return out


def _build_cdf1(numrecs: int = 4) -> bytes:
    """dims: TIME(record), LEVEL(2). gattr title. vars: DEPTH f8[LEVEL]
    (fixed), TIME f8[TIME], TEMP f4[TIME] (with _FillValue -999)."""
    header = b"CDF\x01" + struct.pack(">i", numrecs)
    header += struct.pack(">ii", 0x0A, 2) + _name("TIME") + struct.pack(">i", 0)
    header += _name("LEVEL") + struct.pack(">i", 2)
    header += _attrs({"title": (2, b"unit test")})

    # variable entries need begins; assemble with placeholders then patch
    def var(nm, dimids, attrs, nc_type, vsize, begin):
        out = _name(nm) + struct.pack(">i", len(dimids))
        for d in dimids:
            out += struct.pack(">i", d)
        out += _attrs(attrs) + struct.pack(">iii", nc_type, vsize, begin)
        return out

    def varlist(begin_fixed, begin_rec):
        vl = struct.pack(">ii", 0x0B, 3)
        vl += var("DEPTH", [1], {"units": (2, b"m")}, 6, 16, begin_fixed)
        vl += var("TIME", [0], {"units": (2, b"days")}, 6, 8, begin_rec)
        vl += var("TEMP", [0], {"_FillValue": (5, struct.pack(">f", -999.0))},
                  5, 4, begin_rec + 8)
        return vl

    probe = header + varlist(0, 0)
    begin_fixed = len(probe)
    begin_rec = begin_fixed + 16  # DEPTH: 2 doubles
    body = header + varlist(begin_fixed, begin_rec)
    body += struct.pack(">dd", 5.0, 10.0)  # DEPTH
    temps = [21.5, -999.0, 19.25, 18.0]  # rec 1 is the fill value
    for r in range(numrecs):  # records: TIME(8) then TEMP(4) interleaved
        body += struct.pack(">d", 100.0 + r) + struct.pack(">f", temps[r])
    return body


@pytest.fixture()
def nc_path(tmp_path):
    p = tmp_path / "station.nc"
    p.write_bytes(_build_cdf1())
    return str(p)


def test_parse_header_and_variables(nc_path):
    data = open(nc_path, "rb").read()
    nc = parse_netcdf3(data)
    assert nc.numrecs == 4
    assert nc.dims == [("TIME", 0), ("LEVEL", 2)]
    assert nc.gattrs["title"] == "unit test"
    assert set(nc.variables) == {"DEPTH", "TIME", "TEMP"}
    assert nc.variables["TEMP"].is_record
    assert not nc.variables["DEPTH"].is_record
    assert read_variable(data, nc, "DEPTH").tolist() == [5.0, 10.0]
    assert read_variable(data, nc, "TIME").tolist() == [100.0, 101.0, 102.0, 103.0]
    temp = read_variable(data, nc, "TEMP").tolist()
    assert temp[0] == 21.5 and temp[1] == -999.0


def test_timeseries_dataframe_with_fill_nulls(spark, nc_path):
    df = read_netcdf3_timeseries(spark, nc_path, ["TEMP"])
    rows = sorted(df.collect(), key=lambda r: r["record_idx"])
    assert [r["TIME"] for r in rows] == [100.0, 101.0, 102.0, 103.0]
    assert rows[0]["TEMP"] == 21.5
    assert rows[1]["TEMP"] is None  # _FillValue -> NULL
    # absent variable surfaces as NULL column (additive evolution)
    df2 = read_netcdf3_timeseries(spark, nc_path, ["TEMP", "PSAL"])
    assert all(r["PSAL"] is None for r in df2.collect())


def test_metadata_frame(spark, nc_path):
    meta = {(r["variable"], r["attr"]): r["value"]
            for r in netcdf3_metadata(spark, nc_path).collect()}
    assert meta[(None, "title")] == "unit test"
    assert meta[("TIME", "units")] == "days"
    assert ("TEMP", "_FillValue") in meta


def test_rejects_non_netcdf(nc_path):
    with pytest.raises(ValueError, match="not a NetCDF"):
        parse_netcdf3(b"PK\x03\x04 not netcdf")


def test_lone_short_record_variable_unpadded_stride():
    """Spec special case: a LONE record variable is packed contiguously
    with NO round-to-4 padding. A short[TIME] record var has true slab 2
    bytes but header vsize 4 — using vsize as the stride garbles every
    record after 0."""
    header = b"CDF\x01" + struct.pack(">i", 4)
    header += struct.pack(">ii", 0x0A, 1) + _name("TIME") + struct.pack(">i", 0)
    header += _attrs({})

    def varlist(begin):
        vl = struct.pack(">ii", 0x0B, 1)
        # nc_type 3 = short; vsize padded to 4 per spec header rules
        vl = vl + _name("COUNT") + struct.pack(">i", 1) + struct.pack(">i", 0)
        vl += _attrs({}) + struct.pack(">iii", 3, 4, begin)
        return vl

    begin = len(header + varlist(0))
    body = header + varlist(begin)
    body += struct.pack(">hhhh", 7, 11, 13, 17)  # contiguous, unpadded
    nc = parse_netcdf3(body)
    assert nc.recsize == 2  # true slab size, not padded vsize
    assert read_variable(body, nc, "COUNT").tolist() == [7, 11, 13, 17]
