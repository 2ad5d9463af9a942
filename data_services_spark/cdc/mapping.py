"""Config-driven provider->canonical column mapping for change batches.

Every reference pipeline front-loads a schema-mapping pass before data
touches the sink: a provider-variable -> canonical-variable lookup applied
on ingest, unmapped columns dropped with a warning
(``ardc_nrt/lib/common/lookup.py:147-165``,
``ardc_nrt/lib/common/netcdf.py:71-75``) and a battery of hard
rename/retype rules (``lib/python/aims_realtime_util.py:727-890``).

Re-expression: a :class:`SchemaMapping` is plain data (rename / retype /
default per target column) applied to a DataFrame as one ``select`` of
column expressions — pure projection, zero shuffles, fully codegen'd, and
Catalyst prunes unselected provider columns all the way into the scan. The
drop/missing report is computed from schemas on the driver (no data pass).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ColumnRule:
    """One mapping rule: provider column ``source`` lands as canonical
    column ``target``; optional Spark SQL ``dtype`` retype; optional
    ``default`` literal used when the provider column is absent (additive
    evolution: older feeds simply lack the new field)."""

    source: str
    target: str
    dtype: str | None = None
    default: Any = None


@dataclass
class MappingReport:
    """Driver-side application report (the reference logs a warning per
    unmapped variable; the engine returns them as data for metrics)."""

    renamed: list[str] = field(default_factory=list)
    retyped: list[str] = field(default_factory=list)
    defaulted: list[str] = field(default_factory=list)  # absent -> default
    dropped: list[str] = field(default_factory=list)  # unmapped provider cols


class SchemaMapping:
    """An ordered set of :class:`ColumnRule` plus passthrough columns.

    ``passthrough`` columns (e.g. the CDC envelope: lsn/op/ts) keep their
    name and type. Everything else not named by a rule is DROPPED, counted
    in the report — the reference's "variable not in lookup -> warn and
    skip" behavior (``lookup.py:147-165``).
    """

    def __init__(
        self,
        rules: list[ColumnRule],
        passthrough: list[str] | None = None,
    ):
        self.rules = rules
        self.passthrough = list(passthrough or [])
        targets = self.passthrough + [r.target for r in rules]
        dupes = {t for t in targets if targets.count(t) > 1}
        if dupes:
            raise ValueError(f"duplicate mapping targets: {sorted(dupes)}")

    @classmethod
    def from_config(
        cls, config: dict[str, Any] | list[dict[str, Any]],
        passthrough: list[str] | None = None,
    ) -> "SchemaMapping":
        """Build from plain config (JSON-shaped — how the reference ships
        its PARAMETERS_MAPPING csv/json). Accepts either
        ``{"provider_col": "canonical"}`` /
        ``{"provider_col": {"to": ..., "type": ..., "default": ...}}``
        or a list of rule dicts ``{"source": ..., "target": ...}``."""
        rules: list[ColumnRule] = []
        if isinstance(config, dict):
            for src, spec in config.items():
                if isinstance(spec, str):
                    rules.append(ColumnRule(src, spec))
                else:
                    rules.append(
                        ColumnRule(
                            src,
                            spec.get("to", src),
                            spec.get("type"),
                            spec.get("default"),
                        )
                    )
        else:
            for spec in config:
                rules.append(
                    ColumnRule(
                        spec["source"],
                        spec.get("target", spec["source"]),
                        spec.get("type"),
                        spec.get("default"),
                    )
                )
        return cls(rules, passthrough)

    def apply(self, df: DataFrame) -> tuple[DataFrame, MappingReport]:
        """One projection: rename + retype + default-fill, dropping unmapped
        columns. Returns (mapped_df, report)."""
        report = MappingReport()
        have = set(df.columns)
        out_cols: list[F.Column] = []
        for name in self.passthrough:
            if name in have:
                out_cols.append(F.col(name))
        mapped_sources = {r.source for r in self.rules} | set(self.passthrough)
        for r in self.rules:
            if r.source in have:
                col = F.col(r.source)
                if r.source != r.target:
                    report.renamed.append(f"{r.source}->{r.target}")
                if r.dtype is not None:
                    col = col.cast(r.dtype)
                    report.retyped.append(f"{r.target}:{r.dtype}")
            else:
                # additive evolution: absent in this feed -> typed default
                col = F.lit(r.default)
                if r.dtype is not None:
                    col = col.cast(r.dtype)
                report.defaulted.append(r.target)
            out_cols.append(col.alias(r.target))
        report.dropped = sorted(have - mapped_sources)
        return df.select(*out_cols), report
