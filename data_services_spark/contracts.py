"""Declarative table-level contract checks (post-commit compliance gate).

The reference gates every output file on a compliance-checker battery with
per-suite expected pass/fail corpora (``lib/python/util.py:120-174``,
``lib/python/compliance_checker_test.py:1-70``). Re-expression: a
:class:`ContractSuite` is plain data — uniqueness / nullability / accepted
values / bounds / monotonic-ordering rules — compiled into as few Spark
jobs as possible:

* every row-local rule (not-null, bounds, accepted-values, custom
  predicate) becomes one conditional count in a SINGLE aggregate over ONE
  scan — adding a rule adds zero scans;
* uniqueness is one groupBy on the key (map-side combinable count);
* monotonicity is one window pass per (group, order) pair.

``run`` returns a report DataFrame ``(check_name, kind, n_violations,
passed)`` so the gate composes with the engine's own query surface; fetch
offending rows with ``violations``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class Contract:
    """One check. ``kind`` in {not_null, bounds, accepted_values, unique,
    monotonic, predicate}; row-local kinds fold into one aggregate."""

    name: str
    kind: str
    column: str | None = None
    columns: list[str] = field(default_factory=list)
    min_value: Any = None
    max_value: Any = None
    values: list[Any] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)  # monotonic: per-group
    order_by: str | None = None  # monotonic: ordering column
    predicate_sql: str | None = None  # predicate: SQL bool expr, TRUE = ok
    ref_table: str | None = None  # foreign_key: key into run(refs=...)
    ref_columns: list[str] = field(default_factory=list)  # fk target cols


def _row_violation_expr(c: Contract) -> F.Column:
    """TRUE when the row violates the contract (row-local kinds only)."""
    if c.kind == "not_null":
        return F.col(c.column).isNull()
    if c.kind == "bounds":
        col = F.col(c.column)
        bad = F.lit(False)
        if c.min_value is not None:
            bad = bad | (col < c.min_value)
        if c.max_value is not None:
            bad = bad | (col > c.max_value)
        return col.isNotNull() & bad
    if c.kind == "accepted_values":
        return F.col(c.column).isNotNull() & ~F.col(c.column).isin(c.values)
    if c.kind == "predicate":
        return ~F.expr(c.predicate_sql)
    raise ValueError(f"not a row-local contract kind: {c.kind}")


ROW_LOCAL = {"not_null", "bounds", "accepted_values", "predicate"}
KNOWN_KINDS = ROW_LOCAL | {"unique", "foreign_key", "monotonic"}


class ContractSuite:
    def __init__(self, contracts: list[Contract]):
        if not contracts:
            raise ValueError("ContractSuite needs at least one contract")
        names = [c.name for c in contracts]
        if len(set(names)) != len(names):
            raise ValueError("duplicate contract names")
        unknown = [c.name for c in contracts if c.kind not in KNOWN_KINDS]
        if unknown:  # reject, never silently skip a misspelled kind
            raise ValueError(
                f"unknown contract kind(s) on {unknown}; "
                f"known: {sorted(KNOWN_KINDS)}"
            )
        self.contracts = contracts

    def run(
        self, df: DataFrame, refs: dict[str, DataFrame] | None = None
    ) -> DataFrame:
        """Report DataFrame: one row per contract with its violation count.
        Row-local checks share one aggregate job; unique/monotonic/
        foreign_key each add one shuffle-bounded job, unioned lazily.
        ``refs`` supplies parent tables for ``foreign_key`` contracts."""
        parts: list[DataFrame] = []

        row_local = [c for c in self.contracts if c.kind in ROW_LOCAL]
        if row_local:
            agg = df.agg(
                *[
                    F.sum(_row_violation_expr(c).cast("long")).alias(c.name)
                    for c in row_local
                ]
            )
            stack = F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c.name).alias("check_name"),
                            F.lit(c.kind).alias("kind"),
                            F.coalesce(F.col(c.name), F.lit(0)).alias("n_violations"),
                        )
                        for c in row_local
                    ]
                )
            )
            parts.append(agg.select(stack.alias("r")).select("r.*"))

        for c in self.contracts:
            if c.kind == "unique":
                keys = c.columns or [c.column]
                dupes = (
                    df.groupBy(*keys)
                    .agg(F.count("*").alias("_n"))
                    .where(F.col("_n") > 1)
                    .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("n_violations"))
                )
                parts.append(
                    dupes.select(
                        F.lit(c.name).alias("check_name"),
                        F.lit("unique").alias("kind"),
                        "n_violations",
                    )
                )
            elif c.kind == "foreign_key":
                # referential integrity: rows whose (non-null) FK has no
                # parent — one LEFT ANTI join on the key; the parent side
                # is key-projected (and typically dimension-sized, so
                # Catalyst broadcasts it)
                if refs is None or c.ref_table not in refs:
                    raise ValueError(
                        f"foreign_key contract {c.name!r} needs refs[{c.ref_table!r}]"
                    )
                fk_cols = c.columns or [c.column]
                parent = refs[c.ref_table].select(
                    *[
                        F.col(rc).alias(fc)
                        for fc, rc in zip(fk_cols, c.ref_columns or fk_cols)
                    ]
                ).dropDuplicates(fk_cols)
                child = df.dropna(subset=fk_cols)
                orphans = child.join(parent, fk_cols, "left_anti").agg(
                    F.count("*").alias("n_violations")
                )
                parts.append(
                    orphans.select(
                        F.lit(c.name).alias("check_name"),
                        F.lit("foreign_key").alias("kind"),
                        "n_violations",
                    )
                )
            elif c.kind == "monotonic":
                w = Window.partitionBy(*c.group_by).orderBy(c.order_by)
                prev = F.lag(F.col(c.column)).over(w)
                viol = (
                    df.withColumn("_prev", prev)
                    .where(F.col("_prev").isNotNull() & (F.col(c.column) < F.col("_prev")))
                    .agg(F.count("*").alias("n_violations"))
                )
                parts.append(
                    viol.select(
                        F.lit(c.name).alias("check_name"),
                        F.lit("monotonic").alias("kind"),
                        "n_violations",
                    )
                )

        report = parts[0]
        for p in parts[1:]:
            report = report.unionByName(p)
        return report.withColumn("passed", F.col("n_violations") == 0)

    def violations(self, df: DataFrame, name: str) -> DataFrame:
        """Offending rows for one row-local contract (debug/quarantine)."""
        c = next(x for x in self.contracts if x.name == name)
        if c.kind not in ROW_LOCAL:
            raise ValueError(f"violations() supports row-local kinds, not {c.kind}")
        return df.where(_row_violation_expr(c))

    def assert_table(
        self, df: DataFrame, refs: dict[str, DataFrame] | None = None
    ) -> None:
        """Hard gate: raise with the failing checks (the reference's
        checker-fails -> quarantine behavior, util.py:120-174)."""
        failed = [
            (r["check_name"], r["n_violations"])
            for r in self.run(df, refs).where(~F.col("passed")).collect()
        ]
        if failed:
            raise AssertionError(f"contract violations: {failed}")


def transcripts_suite() -> ContractSuite:
    """The engine's default post-commit gate for the transcripts target
    (the reference runs its checker suite on every output file,
    util.py:120-174): key uniqueness (exactly-once invariant made
    checkable), nullability, turn bounds, role domain. Per-conversation
    ts-monotonicity is deliberately NOT a default gate: a later edit to an
    earlier turn legitimately carries a newer event time (LWW orders by
    event ts, not turn order) — it stays available as a diagnostic via
    ``monotonicity_violations`` / a ``monotonic`` contract."""
    from .cdc.schemas import KEY_COLS, ROLES

    return ContractSuite(
        [
            Contract("key_unique", "unique", columns=list(KEY_COLS)),
            Contract("conv_id_not_null", "not_null", column="conv_id"),
            Contract("lsn_not_null", "not_null", column="lsn"),
            Contract("turn_idx_non_negative", "bounds", column="turn_idx",
                     min_value=0),
            Contract("role_domain", "accepted_values", column="role",
                     values=list(ROLES)),
        ]
    )
