"""MATLAB MAT-file (Level 5) scan — stdlib/numpy-only, parsed from the
public MAT-File Format specification.

The reference ingests instrument deployments delivered as ``.mat`` files
(wave-buoy and current-meter processing chains). No MATLAB/scipy ships in
this environment, but the Level-5 MAT format is publicly specified: a
128-byte header, then 8-byte-aligned tagged data elements; arrays are
``miMATRIX`` elements with flags/dimensions/name/data sub-elements,
optionally zlib-wrapped (``miCOMPRESSED``). This reader covers the
numeric and char array classes the reference's files consist of.

Spark shape: the same per-file ``binaryFile`` + ``mapInPandas`` pattern
as the NetCDF/XLSX scans — 1-D numeric variables surface as a long-format
(variable, index, value) frame to feed the mapping layer.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

# mi data types -> numpy dtype letter; endianness prefix comes from the
# header's 'MI'/'IM' indicator and is applied at parse time
_MI_DTYPES = {
    1: "i1", 2: "u1", 3: "i2", 4: "u2", 5: "i4", 6: "u4",
    7: "f4", 9: "f8", 12: "i8", 13: "u8", 16: "u1",  # miUTF8 as bytes
}
_MI_MATRIX = 14
_MI_COMPRESSED = 15
_NUMERIC_CLASSES = {6: "f8", 7: "f4", 8: "i1", 9: "u1", 10: "i2",
                    11: "u2", 12: "i4", 13: "u4", 14: "i8", 15: "u8"}
_MX_CHAR = 4


def _elements(data: bytes, pos: int, end: int, e: str = "<"):
    """Yield (mi_type, payload_bytes) for 8-byte-aligned tagged elements."""
    while pos + 8 <= end:
        dtype, nbytes = struct.unpack_from(e + "II", data, pos)
        if dtype >> 16:  # small data element: size & type packed in one word
            nbytes = dtype >> 16
            dtype = dtype & 0xFFFF
            yield dtype, data[pos + 4:pos + 4 + nbytes]
            pos += 8
        else:
            yield dtype, data[pos + 8:pos + 8 + nbytes]
            pos += 8 + ((nbytes + 7) // 8 * 8)


def _parse_matrix(payload: bytes, e: str = "<"):
    """miMATRIX sub-elements -> (name, numpy array | string) or None for
    unsupported classes."""
    import numpy as np

    subs = list(_elements(payload, 0, len(payload), e))
    if len(subs) < 4:
        return None
    (_, flags), (_, dims_b), (_, name_b) = subs[0], subs[1], subs[2]
    mx_class = struct.unpack_from(e + "I", flags, 0)[0] & 0xFF
    dims = np.frombuffer(dims_b, dtype=e + "i4").tolist()
    name = bytes(name_b).decode("ascii", errors="replace")
    data_type, data_b = subs[3]
    if mx_class == _MX_CHAR:
        # chars arrive as miUINT16 (UTF-16 codepoints) or miUTF8 bytes
        raw = np.frombuffer(data_b, dtype=e + _MI_DTYPES.get(data_type, "u2"))
        if data_type == 16:  # miUTF8
            return name, bytes(raw).decode("utf-8", errors="replace")
        return name, "".join(chr(c) for c in raw.tolist())
    if mx_class not in _NUMERIC_CLASSES:
        return None
    stored = np.frombuffer(data_b, dtype=e + _MI_DTYPES.get(data_type, "f8"))
    arr = stored.astype(np.dtype(e + _NUMERIC_CLASSES[mx_class]).newbyteorder("="))
    return name, arr.reshape(dims, order="F")


def parse_mat5(data: bytes) -> dict[str, object]:
    """Top-level variables of a Level-5 MAT file: {name: ndarray | str}."""
    if len(data) < 128:
        raise ValueError("not a MAT-file (too short)")
    version, endian = struct.unpack_from("<HH", data, 124)
    if endian not in (0x4D49, 0x494D):  # 'MI' / 'IM'
        raise ValueError("not a Level-5 MAT-file (bad endian indicator)")
    # the spec defines the indicator as the chars 'MI' written in the
    # FILE's byte order: reading little-endian, a big-endian file shows
    # 0x4D49 ('IM' swapped) -> parse every tag/payload big-endian
    e = ">" if endian == 0x4D49 else "<"
    out: dict[str, object] = {}
    for mi_type, payload in _elements(data, 128, len(data), e):
        if mi_type == _MI_COMPRESSED:
            inner = zlib.decompress(bytes(payload))
            for t2, p2 in _elements(inner, 0, len(inner), e):
                if t2 == _MI_MATRIX:
                    parsed = _parse_matrix(p2, e)
                    if parsed:
                        out[parsed[0]] = parsed[1]
        elif mi_type == _MI_MATRIX:
            parsed = _parse_matrix(payload, e)
            if parsed:
                out[parsed[0]] = parsed[1]
    return out


SERIES_SCHEMA = "path string, variable string, idx long, value double"


def read_mat_series(
    spark: SparkSession, path: str, variables: list[str] | None = None
) -> DataFrame:
    """Numeric MAT variables as a long-format frame (path, variable, idx,
    value) — flattened Fortran-order; feed to the schema-mapping layer and
    pivot per the deployment's variable dictionary."""
    import numpy as np
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["path", "variable", "idx", "value"]
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for name, val in parse_mat5(bytes(content)).items():
                    if variables is not None and name not in variables:
                        continue
                    if not isinstance(val, np.ndarray):
                        continue
                    flat = val.reshape(-1, order="F").astype("f8")
                    rows.extend(
                        (p, name, i, float(v)) for i, v in enumerate(flat)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return raw.select("path", "content").mapInPandas(decode, SERIES_SCHEMA)
