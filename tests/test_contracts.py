"""Contract suite: violation counts on a seeded-violation fixture, the
hard gate, and the one-aggregate plan promise (reference: compliance
checker with expected pass/fail corpus, compliance_checker_test.py:1-70)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_services_spark.contracts import Contract, ContractSuite


@pytest.fixture()
def dirty(spark):
    rows = [
        (1, "a", 10.0, "click", 100),
        (1, "a", 20.0, "view", 101),      # duplicate id
        (2, None, -5.0, "click", 102),    # null name, below bounds
        (3, "c", 500.0, "zap", 103),      # above bounds, bad domain
        (4, "d", 50.0, "view", 99),       # ts regression (99 < 103 for same grp)
    ]
    return spark.createDataFrame(rows, "id int, name string, v double, et string, ts int")


def suite():
    return ContractSuite(
        [
            Contract("id_unique", "unique", columns=["id"]),
            Contract("name_not_null", "not_null", column="name"),
            Contract("v_bounds", "bounds", column="v", min_value=0.0, max_value=400.0),
            Contract("et_domain", "accepted_values", column="et", values=["click", "view"]),
            Contract("v_le_100_when_click", "predicate",
                     predicate_sql="NOT (et = 'click') OR v <= 100"),
        ]
    )


def test_violation_counts(spark, dirty):
    rep = {r["check_name"]: r["n_violations"] for r in suite().run(dirty).collect()}
    assert rep == {
        "id_unique": 1,
        "name_not_null": 1,
        "v_bounds": 2,
        "et_domain": 1,
        "v_le_100_when_click": 0,
    }


def test_monotonic_contract(spark):
    rows = [("u", 1, 100), ("u", 2, 200), ("u", 3, 150), ("w", 1, 5)]
    df = spark.createDataFrame(rows, "g string, seq int, ts int")
    s = ContractSuite(
        [Contract("ts_mono", "monotonic", column="ts", group_by=["g"], order_by="seq")]
    )
    rep = s.run(df).collect()
    assert rep[0]["n_violations"] == 1 and not rep[0]["passed"]


def test_assert_table_gate(spark, dirty):
    with pytest.raises(AssertionError, match="name_not_null"):
        suite().assert_table(dirty)
    clean = dirty.where(F.lit(False))
    suite().assert_table(clean)  # empty table passes


def test_violations_rows(spark, dirty):
    rows = suite().violations(dirty, "v_bounds").collect()
    assert sorted(r["id"] for r in rows) == [2, 3]


def test_row_local_checks_share_one_scan(spark, dirty):
    """All row-local contracts fold into a single aggregate: the report
    plan for a row-local-only suite contains exactly one scan subtree."""
    s = ContractSuite(
        [
            Contract("name_not_null", "not_null", column="name"),
            Contract("v_bounds", "bounds", column="v", min_value=0.0),
            Contract("et_domain", "accepted_values", column="et", values=["click"]),
        ]
    )
    plan = s.run(dirty)._sc._jvm.PythonSQLUtils.explainString(
        s.run(dirty)._jdf.queryExecution(), "formatted"
    )
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") <= 2


def test_foreign_key_contract_finds_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    s = ContractSuite(
        [Contract("fk_check", "foreign_key", column="fk",
                  ref_table="parent", ref_columns=["pk"])]
    )
    rep = s.run(child, refs={"parent": parent}).collect()[0]
    # orphan = non-null fk with no parent (id=3); NULL fk is not an orphan
    assert rep["n_violations"] == 1 and not rep["passed"]

    with pytest.raises(ValueError, match="refs"):
        s.run(child)


def test_suite_rejects_empty_and_unknown_kinds():
    import pytest as _pytest

    from data_services_spark.contracts import Contract, ContractSuite

    with _pytest.raises(ValueError, match="at least one"):
        ContractSuite([])
    with _pytest.raises(ValueError, match="unknown contract kind"):
        ContractSuite([Contract("typo", "not_nul", column="x")])
