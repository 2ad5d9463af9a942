"""JDBC extract source: partition planning must be exhaustive/disjoint
(a wrong stride plan silently drops rows at scale) and the reader must
assemble the partitioned-scan options. No driver jars ship in this
environment, so .load() itself is exercised on clusters that carry one
(reference analogue: NRMN/extract.sh:17-57)."""

from __future__ import annotations

import pytest

from data_services_spark.sources.jdbc import (
    JdbcExtract,
    jdbc_reader,
    predicate_list,
    stride_bounds,
)


def test_stride_bounds_cover_everything():
    bounds = stride_bounds(0, 100, 4)
    assert bounds[0][0] is None and bounds[-1][1] is None  # open-ended ends
    # interior boundaries chain with no gap or overlap
    for (_, hi), (lo, _) in zip(bounds, bounds[1:]):
        assert hi == lo


def test_stride_bounds_degenerate():
    assert stride_bounds(0, 100, 1) == [(None, None)]
    assert stride_bounds(5, 5, 4) == [(None, None)]
    # more partitions than rows: still exhaustive, width floors at 1
    bounds = stride_bounds(0, 3, 8)
    assert bounds[0][0] is None and bounds[-1][1] is None


def test_predicates_exhaustive_and_disjoint():
    import duckdb

    preds = predicate_list("id", 0, 1000, 7)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT CASE WHEN range % 50 = 0 THEN NULL "
        "ELSE range * 3 - 500 END AS id FROM range(0, 2000)"
    )  # includes NULLs and values far outside [0, 1000)
    total = con.execute("SELECT count(*) FROM t").fetchone()[0]
    matched = sum(
        con.execute(f"SELECT count(*) FROM t WHERE {p}").fetchone()[0]
        for p in preds
    )
    assert matched == total  # every row matched exactly once across strides


def test_predicate_column_injection_guard():
    with pytest.raises(ValueError):
        predicate_list("id; drop table x", 0, 10, 2)


def test_reader_assembles_partitioned_options(spark):
    ex = JdbcExtract(
        table="(select conv_id, ts from transcripts) t",
        partition_column="lsn",
        lower=0,
        upper=10_000,
        num_partitions=16,
    )
    reader = jdbc_reader(spark, "jdbc:postgresql://db/warehouse", ex)
    # the reader object exists with jdbc format + options; .load() needs a
    # driver jar, which this sandbox doesn't ship
    assert reader is not None


def test_reader_requires_bounds_with_partition_column(spark):
    ex = JdbcExtract(table="t", partition_column="lsn")
    with pytest.raises(ValueError):
        jdbc_reader(spark, "jdbc:postgresql://db/warehouse", ex)
