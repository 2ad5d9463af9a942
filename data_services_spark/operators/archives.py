"""Archive payload extraction: zip columns -> entry rows.

The reference's HTTP-zip pipelines download an archive then unzip and
process each member file (wget + unzip idiom). Network I/O stays a
non-goal, but the data-shape half is engine work: given a DataFrame with
a ``binary`` zip payload column (from ``binaryFile``, an object store, or
a prior fetch stage), explode it into one row per archive entry with the
entry bytes — distributed per archive via ``mapInPandas`` (stdlib
``zipfile`` over an in-memory buffer; no temp files, no driver work).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

from pyspark.sql import DataFrame

ENTRY_SCHEMA = (
    "source string, entry string, n_bytes long, crc32 long, content binary"
)


def zip_entries(
    df: DataFrame,
    payload_col: str = "content",
    source_col: str = "path",
    include_content: bool = True,
    suffix: str | None = None,
) -> DataFrame:
    """One row per archive member: (source, entry, n_bytes, crc32,
    content). ``suffix`` filters members (e.g. ``.csv``);
    ``include_content=False`` lists without decompressing (manifest pass —
    the cheap first stage when only names/sizes gate further work)."""
    import pandas as pd

    def explode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["source", "entry", "n_bytes", "crc32", "content"]
        for pdf in batches:
            rows = []
            for src, payload in zip(pdf[source_col], pdf[payload_col]):
                if payload is None:
                    continue
                with zipfile.ZipFile(io.BytesIO(bytes(payload))) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        if suffix and not info.filename.endswith(suffix):
                            continue
                        content = zf.read(info) if include_content else None
                        rows.append(
                            (src, info.filename, info.file_size,
                             info.CRC, content)
                        )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(source_col, payload_col).mapInPandas(
        explode, schema=ENTRY_SCHEMA
    )
