"""JDBC extract source: partition planning must be exhaustive/disjoint
(a wrong stride plan silently drops rows at scale), the reader must
assemble the partitioned-scan options, and the real ``spark.read.jdbc``
path is exercised end-to-end against an embedded Apache Derby database
(Derby's JDBC driver ships with Spark itself, so the test runs wherever
Spark does). Reference analogue: NRMN/extract.sh:17-57."""

from __future__ import annotations

import pytest

from data_services_spark.sources.jdbc import (
    JdbcExtract,
    jdbc_reader,
    predicate_list,
    read_jdbc_table,
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


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


def test_jdbc_partitioned_read_end_to_end_derby(spark, tmp_path):
    """The actual spark.read.jdbc path: create an embedded Derby relation
    through the driver JVM, read it back partitioned, and check the stride
    plan loses no rows (including rows outside [lower, upper))."""
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on Spark classpath")
    jvm = spark._jvm
    jvm.java.lang.System.setProperty(
        "derby.stream.error.file", str(tmp_path / "derby.log")
    )
    db = str(tmp_path / "extractdb")
    conn = jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};create=true")
    try:
        st = conn.createStatement()
        st.executeUpdate(
            "CREATE TABLE measurements "
            "(id INT PRIMARY KEY, site VARCHAR(16), value DOUBLE)"
        )
        ps = conn.prepareStatement("INSERT INTO measurements VALUES (?, ?, ?)")
        # ids 0..499 plus stragglers outside the declared [0, 400) bounds —
        # Spark's open-ended first/last strides must still fetch them
        for i in list(range(500)) + [900, 1500]:
            ps.setInt(1, i)
            ps.setString(2, f"site{i % 7}")
            ps.setDouble(3, i * 0.5)
            ps.addBatch()
        ps.executeBatch()
    finally:
        conn.close()

    ex = JdbcExtract(
        table="measurements",
        partition_column="id",
        lower=0,
        upper=400,
        num_partitions=4,
    )
    df = read_jdbc_table(
        spark, f"jdbc:derby:{db}", ex, {"driver": DERBY_DRIVER}
    )
    assert df.rdd.getNumPartitions() == 4  # four parallel range scans
    assert df.count() == 502  # no row lost outside the stride bounds
    # Derby folds unquoted identifiers to upper case, so the returned
    # schema is ID/SITE/VALUE (predicates stay case-insensitive server-side)
    got = {r["ID"]: r["VALUE"] for r in df.where("site = 'site0'").collect()}
    assert got[0] == 0.0 and got[7] == 3.5 and got[490] == 245.0

    # unpartitioned single-cursor form reads the same relation
    plain = read_jdbc_table(
        spark, f"jdbc:derby:{db}", JdbcExtract(table="measurements"),
        {"driver": DERBY_DRIVER},
    )
    assert plain.count() == 502
