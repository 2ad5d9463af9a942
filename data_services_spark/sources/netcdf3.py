"""NetCDF-3 classic scan — stdlib/numpy-only, parsed from the public spec.

The reference's dominant format is NetCDF time series (1-D variables over
an unlimited TIME dimension with per-variable attributes). No NetCDF
library ships in this environment, but the NetCDF *classic* format (CDF-1
/ CDF-2) is a small, frozen, publicly specified binary layout (magic
``CDF\\x01``, big-endian header of dim/attr/var lists, fixed vars at
absolute offsets, record vars interleaved per record) — so the engine
parses it from spec: ~150 lines of ``struct``/``numpy``.

Spark shape (same as the XLSX/multimodal scans): ``binaryFile``
distributes whole files, one ``mapInPandas`` pass decodes each file and
emits typed rows — per-file parallelism, Arrow-batched, no per-row
Python. Fill-value attributes surface as NULLs downstream via the
engine's sentinel normalization; variable/attribute metadata comes back
as its own long-format frame for the schema-mapping layer.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type -> (numpy dtype, size)
_TYPES = {
    1: (">i1", 1),  # NC_BYTE
    2: ("S1", 1),   # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}


@dataclass
class NcVar:
    name: str
    dimids: list[int]
    attrs: dict[str, object]
    nc_type: int
    vsize: int
    begin: int
    is_record: bool = False


@dataclass
class NcFile:
    numrecs: int
    dims: list[tuple[str, int]]  # (name, length); 0 length = record dim
    gattrs: dict[str, object]
    variables: dict[str, NcVar] = field(default_factory=dict)
    recsize: int = 0


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.data, self.pos)
        self.pos += 4
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.data[self.pos:self.pos + n].decode("utf-8")
        self.pos += (n + 3) // 4 * 4  # padded to 4-byte boundary
        return s

    def values(self, nc_type: int, nelems: int):
        import numpy as np

        dt, size = _TYPES[nc_type]
        nbytes = nelems * size
        arr = np.frombuffer(self.data, dtype=dt, count=nelems, offset=self.pos)
        self.pos += (nbytes + 3) // 4 * 4
        if nc_type == 2:
            return arr.tobytes().decode("utf-8", errors="replace")
        return arr.tolist() if nelems > 1 else arr[0].item()

    def att_list(self) -> dict[str, object]:
        tag, n = self.i4(), self.i4()
        out: dict[str, object] = {}
        if tag == 0:  # ABSENT
            return out
        assert tag == _NC_ATTRIBUTE, f"bad attr tag {tag}"
        for _ in range(n):
            nm = self.name()
            nc_type = self.i4()
            nelems = self.i4()
            out[nm] = self.values(nc_type, nelems)
        return out


def parse_netcdf3(data: bytes) -> NcFile:
    """Parse the classic-format header (CDF-1 or CDF-2)."""
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("not a NetCDF classic (CDF-1/CDF-2) file")
    offset_fmt = ">i" if data[3] == 1 else ">q"
    offset_len = 4 if data[3] == 1 else 8
    r = _Reader(data)
    r.pos = 4
    numrecs = r.i4()

    dims: list[tuple[str, int]] = []
    tag, n = r.i4(), r.i4()
    if tag != 0:
        assert tag == _NC_DIMENSION, f"bad dim tag {tag}"
        for _ in range(n):
            dims.append((r.name(), r.i4()))

    out = NcFile(numrecs=numrecs, dims=dims, gattrs=r.att_list())

    tag, n = r.i4(), r.i4()
    if tag != 0:
        assert tag == _NC_VARIABLE, f"bad var tag {tag}"
        for _ in range(n):
            nm = r.name()
            ndims = r.i4()
            dimids = [r.i4() for _ in range(ndims)]
            attrs = r.att_list()
            nc_type = r.i4()
            vsize = r.i4()
            (begin,) = struct.unpack_from(offset_fmt, r.data, r.pos)
            r.pos += offset_len
            is_rec = bool(dimids) and dims[dimids[0]][1] == 0
            out.variables[nm] = NcVar(
                nm, dimids, attrs, nc_type, vsize, begin, is_rec
            )
    out.recsize = sum(v.vsize for v in out.variables.values() if v.is_record)
    rec_vars = [v for v in out.variables.values() if v.is_record]
    if len(rec_vars) == 1:
        # Spec special case: a LONE record variable is packed contiguously
        # with NO round-to-4 padding, so the true stride is the element
        # slab size — header vsize is rounded up and would garble a
        # byte/char/short variable after record 0.
        v = rec_vars[0]
        _, esize = _TYPES[v.nc_type]
        per = 1
        for d in v.dimids[1:]:
            per *= max(dims[d][1], 1)
        out.recsize = per * esize
    if out.numrecs < 0 and out.recsize:  # STREAMING sentinel (numrecs = -1):
        # infer the record count from the file length past the record start
        first = min(v.begin for v in out.variables.values() if v.is_record)
        out.numrecs = (len(data) - first) // out.recsize
    return out


def read_variable(data: bytes, nc: NcFile, name: str):
    """Decode one variable to a numpy array (record vars: one value set per
    record, de-interleaved from the record stride)."""
    import numpy as np

    v = nc.variables[name]
    dt, size = _TYPES[v.nc_type]
    per_rec = 1
    for d in v.dimids[1:] if v.is_record else []:
        per_rec *= max(nc.dims[d][1], 1)
    if not v.is_record:
        count = 1
        for d in v.dimids:
            count *= max(nc.dims[d][1], 1)
        return np.frombuffer(data, dtype=dt, count=count, offset=v.begin)
    # record variable: value(s) for record r live at begin + r*recsize.
    # nc.recsize already carries the spec's single-record-var special case
    # (contiguous, unpadded — computed in parse_netcdf3).
    stride = nc.recsize
    out = np.empty(nc.numrecs * per_rec, dtype=np.dtype(dt).newbyteorder("="))
    for rec in range(nc.numrecs):
        out[rec * per_rec:(rec + 1) * per_rec] = np.frombuffer(
            data, dtype=dt, count=per_rec, offset=v.begin + rec * stride
        )
    return out


VAR_META_SCHEMA = (
    "path string, variable string, attr string, value string"
)


def netcdf3_metadata(spark: SparkSession, path: str) -> DataFrame:
    """Global + per-variable attributes as a long-format frame — the input
    to the schema-mapping layer (provider attr -> canonical column)."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def meta(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        rows = []
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                nc = parse_netcdf3(bytes(content))
                for k, v in nc.gattrs.items():
                    rows.append((p, None, k, str(v)))
                for vn, var in nc.variables.items():
                    for k, v in var.attrs.items():
                        rows.append((p, vn, k, str(v)))
            yield pd.DataFrame(
                rows, columns=["path", "variable", "attr", "value"]
            )
            rows = []

    return raw.select("path", "content").mapInPandas(meta, VAR_META_SCHEMA)


def read_netcdf3_timeseries(
    spark: SparkSession,
    path: str,
    variables: list[str],
    time_var: str = "TIME",
) -> DataFrame:
    """Read 1-D record variables as a wide typed table:
    ``(path, record_idx, TIME, var...)`` — the reference's canonical
    time-series shape. All requested variables surface as double."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)
    want = [time_var] + [v for v in variables if v != time_var]
    schema = "path string, record_idx int, " + ", ".join(
        f"`{v}` double" for v in want
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            frames = []
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                nc = parse_netcdf3(data)
                cols: dict[str, object] = {}
                n = nc.numrecs
                for v in want:
                    if v not in nc.variables:
                        cols[v] = [None] * n  # additive evolution: absent var
                        continue
                    arr = read_variable(data, nc, v).astype("float64")
                    fill = nc.variables[v].attrs.get("_FillValue")
                    if fill is not None:
                        import numpy as np

                        arr = np.where(arr == float(fill), np.nan, arr)
                    cols[v] = arr[:n]
                frame = pd.DataFrame(cols)
                frame.insert(0, "record_idx", range(n))
                frame.insert(0, "path", p)
                frames.append(frame)
            yield pd.concat(frames) if frames else pd.DataFrame(
                columns=["path", "record_idx", *want]
            )

    return raw.select("path", "content").mapInPandas(decode, schema)
