"""Structured filename-convention parser (catalog ingest metadata).

The reference's convention parser extracts ~15 structured fields from every
incoming file name — project, facility, data codes, start/end/creation
datetimes, platform, file version, product code, extension — with per-field
validation (``lib/python/IMOSfilename.py:137-245``). Re-expression: a
config-driven :class:`FilenameConvention` compiled to ONE projection of
column expressions (split + regexp_extract + to_timestamp) — map-only,
codegen'd, no UDFs, so parsing rides the directory-scan DataFrame at any
fan-in.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# <PROJECT>_<FACILITY>_<CODES>_<START>_<PLATFORM>_FV0X[_<PRODUCT>]
# [_END-<END>][_C-<CREATED>].<ext>   — the reference's convention, generalized
_TS = r"(\d{8}T\d{6}Z?)"


@dataclass
class FieldSpec:
    name: str
    pattern: str  # regex with ONE capture group, applied to the whole name
    group: int = 1


DEFAULT_FIELDS = [
    FieldSpec("project", r"^([A-Za-z0-9]+)_"),
    FieldSpec("facility", r"^[A-Za-z0-9]+_([A-Za-z0-9-]+)_"),
    FieldSpec("data_codes", r"^[A-Za-z0-9]+_[A-Za-z0-9-]+_([A-Z]+)_"),
    FieldSpec("start_time_raw", "_" + _TS + "_"),
    FieldSpec("platform_code", "_" + _TS + r"_([A-Za-z0-9-]+)_FV", 2),
    FieldSpec("file_version", r"_FV(\d{2})"),
    FieldSpec("product", r"_FV\d{2}_([A-Za-z0-9-]+?)(?:_END|_C-|\.)"),
    FieldSpec("end_time_raw", "_END-" + _TS),
    FieldSpec("creation_time_raw", "_C-" + _TS),
    FieldSpec("extension", r"\.([A-Za-z0-9]+)$"),
]


def _to_ts(col: F.Column) -> F.Column:
    """'20240131T235959Z' (Z optional) -> timestamp; unparsed -> NULL
    (try_to_timestamp: ANSI mode would abort the whole scan on one bad
    name, which is exactly wrong for catalog ingest)."""
    clean = F.regexp_replace(col, "Z$", "")
    return F.try_to_timestamp(clean, F.lit("yyyyMMdd'T'HHmmss"))


class FilenameConvention:
    """Parses a path column into the convention's structured fields plus
    derived columns (typed datetimes, per-code array, coverage seconds,
    validity flag). ~15 output fields on the default convention."""

    def __init__(self, fields: list[FieldSpec] | None = None):
        self.fields = fields or DEFAULT_FIELDS

    def parse(self, df: DataFrame, path_col: str = "path") -> DataFrame:
        name = F.element_at(F.split(F.col(path_col), "/"), -1)
        dirname = F.regexp_replace(F.col(path_col), r"/[^/]*$", "")
        out = df.withColumn("file_name", name).withColumn("dir_name", dirname)
        for fs in self.fields:
            out = out.withColumn(
                fs.name, F.regexp_extract(F.col("file_name"), fs.pattern, fs.group)
            )
        # typed derivations
        out = (
            out.withColumn("start_time", _to_ts(F.col("start_time_raw")))
            .withColumn("end_time", _to_ts(F.col("end_time_raw")))
            .withColumn("creation_time", _to_ts(F.col("creation_time_raw")))
            .withColumn(
                "data_code_list",
                F.when(
                    F.col("data_codes") != "", F.split(F.col("data_codes"), "")
                ).otherwise(F.array().cast("array<string>")),
            )
            .withColumn(
                "coverage_sec",
                F.when(
                    F.col("end_time").isNotNull() & F.col("start_time").isNotNull(),
                    F.col("end_time").cast("long") - F.col("start_time").cast("long"),
                ),
            )
            .withColumn(
                "file_version_int",
                F.when(F.col("file_version") != "", F.col("file_version").cast("int")),
            )
            .drop("start_time_raw", "end_time_raw", "creation_time_raw")
        )
        # validity: the mandatory prefix fields parsed and start time exists
        mandatory = (
            (F.col("project") != "")
            & (F.col("facility") != "")
            & (F.col("data_codes") != "")
            & F.col("start_time").isNotNull()
            & (F.col("file_version") != "")
        )
        return out.withColumn("convention_ok", mandatory)
