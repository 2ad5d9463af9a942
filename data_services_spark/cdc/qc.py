"""Per-column quality-control flags carried through the CDC apply path.

The reference pairs every measurement variable with a ``<var>_qc`` flag
column, synthesizing defaults when the provider sends none
(``ardc_nrt/lib/common/netcdf.py:80-83``; flag vocabulary
``PARAMETERS_MAPPING/qc_flags.csv``; value/_qc column pairs throughout
``ANMN/data_report/tables/anmn.nrs_hydall.sql``). Flags use the IMOS/IODE
convention: 0 = no QC, 1 = good, 2 = probably good, 3 = bad-but-maybe-
recoverable, 4 = bad, 9 = missing value.

Engine semantics: flags are ordinary payload columns — pure ``when``
chains, one projection, no UDFs — so they ride the LWW merge like any
other field (winner's flags win with the winner's values, additive schema
evolution admits new ``_qc`` columns) and survive redelivery untouched.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FLAG_NO_QC = 0
FLAG_GOOD = 1
FLAG_PROBABLY_GOOD = 2
FLAG_BAD_MAYBE = 3
FLAG_BAD = 4
FLAG_MISSING = 9


@dataclass
class QcRule:
    """Range rule for one measurement column: values outside
    [hard_min, hard_max] flag BAD (4); outside [soft_min, soft_max] flag
    BAD_MAYBE (3); NULL flags MISSING (9); otherwise GOOD (1). Any bound
    may be None (unchecked)."""

    column: str
    hard_min: float | None = None
    hard_max: float | None = None
    soft_min: float | None = None
    soft_max: float | None = None


def qc_flag_expr(rule: QcRule) -> F.Column:
    """The flag as one ``when`` chain (first match wins: missing > bad >
    bad-maybe > good) — entirely JVM-side."""
    c = F.col(rule.column)
    hard = F.lit(False)
    if rule.hard_min is not None:
        hard = hard | (c < rule.hard_min)
    if rule.hard_max is not None:
        hard = hard | (c > rule.hard_max)
    soft = F.lit(False)
    if rule.soft_min is not None:
        soft = soft | (c < rule.soft_min)
    if rule.soft_max is not None:
        soft = soft | (c > rule.soft_max)
    return (
        F.when(c.isNull(), F.lit(FLAG_MISSING))
        .when(hard, F.lit(FLAG_BAD))
        .when(soft, F.lit(FLAG_BAD_MAYBE))
        .otherwise(F.lit(FLAG_GOOD))
        .cast("int")
    )


def with_qc_flags(df: DataFrame, rules: list[QcRule], suffix: str = "_qc") -> DataFrame:
    """Append ``<col>_qc`` flag columns per rule. Columns already carrying a
    provider-supplied flag are left untouched (the reference only
    synthesizes defaults when the variable has no flag, netcdf.py:80-83)."""
    out = df
    for r in rules:
        flag_col = f"{r.column}{suffix}"
        if flag_col in df.columns:
            continue
        out = out.withColumn(flag_col, qc_flag_expr(r))
    return out


def qc_summary(df: DataFrame, rules: list[QcRule], suffix: str = "_qc") -> DataFrame:
    """Per-column flag histogram (reporting stage): one aggregate over the
    flagged frame — explode the (column, flag) pairs from literals, never
    the payload."""
    flagged = with_qc_flags(df, rules, suffix)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r.column).alias("column"),
                F.col(f"{r.column}{suffix}").alias("flag"),
            )
            for r in rules
        ]
    )
    return (
        flagged.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.column").alias("column"), F.col("p.flag").alias("flag"))
        .agg(F.count("*").alias("n_values"))
    )
