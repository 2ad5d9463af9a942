"""JDBC full-table extract feeding the lake bootstrap.

Reference: ``NRMN/extract.sh:17-57`` — a 16-relation SQL dump piped to CSV
before ingestion. Re-expression: ``spark.read.jdbc`` with *partitioned*
reads, so a 10^9-row relation arrives as N parallel range scans instead of
one connection's cursor, and with filter/column pushdown left to the JDBC
source (Catalyst pushes predicates into the remote WHERE clause).

The real ``spark.read.jdbc`` path is exercised end-to-end in
``tests/test_jdbc_source.py`` against an embedded Apache Derby database
(Derby's driver ships with Spark); production targets add their driver
jar (``--jars postgresql.jar``). Partition planning is additionally
unit-tested because a wrong stride plan silently drops rows at 10^9 rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcExtract:
    """One relation to extract (a row of the reference's extract.sh list)."""

    table: str  # table name or "(select ...) alias" subquery pushdown
    partition_column: str | None = None  # numeric/date column for striding
    lower: int | None = None
    upper: int | None = None
    num_partitions: int = 8
    fetch_size: int = 10_000


def stride_bounds(lower: int, upper: int, num_partitions: int) -> list[tuple[int, int]]:
    """The (lo, hi] strides Spark's JDBC partitioner produces: first/last
    strides are open-ended so rows outside [lower, upper) are never lost —
    kept as an explicit, unit-tested function because a wrong stride plan
    silently drops rows at 10^9 scale."""
    if num_partitions <= 1 or upper <= lower:
        return [(None, None)]  # type: ignore[list-item]
    width = max((upper - lower) // num_partitions, 1)
    bounds: list[tuple[int, int]] = []
    lo = lower
    for i in range(num_partitions):
        hi = upper if i == num_partitions - 1 else lo + width
        bounds.append((None if i == 0 else lo, None if i == num_partitions - 1 else hi))
        lo = hi
    return bounds


def predicate_list(column: str, lower: int, upper: int, num_partitions: int) -> list[str]:
    """WHERE-clause predicates for ``spark.read.jdbc(predicates=...)`` —
    exhaustive and disjoint (every row matches exactly one predicate,
    including NULLs and out-of-range values)."""
    if not column.replace("_", "").isalnum():
        raise ValueError(f"suspicious partition column name: {column!r}")
    preds = []
    for lo, hi in stride_bounds(lower, upper, num_partitions):
        if lo is None and hi is None:
            preds.append("1=1")
        elif lo is None:
            preds.append(f"{column} < {hi} OR {column} IS NULL")
        elif hi is None:
            preds.append(f"{column} >= {lo}")
        else:
            preds.append(f"{column} >= {lo} AND {column} < {hi}")
    return preds


def jdbc_reader(
    spark: SparkSession,
    url: str,
    extract: JdbcExtract,
    properties: dict[str, str] | None = None,
):
    """Assemble the partitioned JDBC DataFrameReader (not yet loaded).

    With ``partition_column`` set the read plans ``num_partitions`` parallel
    range scans (Spark issues one remote query per stride); without it, one
    connection streams the relation with ``fetchsize`` batching."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", extract.table)
        .option("fetchsize", str(extract.fetch_size))
    )
    if extract.partition_column is not None:
        if extract.lower is None or extract.upper is None:
            raise ValueError("partitioned JDBC read requires lower/upper bounds")
        reader = (
            reader.option("partitionColumn", extract.partition_column)
            .option("lowerBound", str(extract.lower))
            .option("upperBound", str(extract.upper))
            .option("numPartitions", str(extract.num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    extract: JdbcExtract,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Load the relation (requires a JDBC driver jar on the cluster)."""
    return jdbc_reader(spark, url, extract, properties).load()


def jdbc_bootstrap(
    spark: SparkSession,
    url: str,
    extracts: list[JdbcExtract],
    lake_root: str,
    bucket_keys_by_table: dict[str, list[str]],
    bucket_count: int = 16,
    properties: dict[str, str] | None = None,
) -> dict[str, Any]:
    """The NRMN multi-relation extract (extract.sh:17-57) as lake
    bootstraps: one partitioned read -> one ``LakeTable.overwrite`` per
    relation. Returns per-table row counts."""
    from ..lake.table import LakeTable

    out: dict[str, Any] = {}
    for ex in extracts:
        df = read_jdbc_table(spark, url, ex, properties)
        keys = bucket_keys_by_table[ex.table]
        path = f"{lake_root}/{ex.table}"
        table = LakeTable.create(
            spark, path, df.schema, keys, bucket_count
        ) if not LakeTable.exists(path) else LakeTable(spark, path)
        snap = table.overwrite(df, summary={"source": url, "relation": ex.table})
        out[ex.table] = {"snapshot_id": snap.snapshot_id}
    return out
