"""Fixed-width text scan with versioned layouts.

The reference ingests fixed-width station files whose layout changed over
time, dispatching on the line shape and parsing each vintage with its own
column offsets (``MHL/process_MHLwave_from_txt.py:44-78``). Re-expression:
each :class:`FixedWidthLayout` is (selector regex, field offsets/types);
``read_fixed_width`` compiles ALL layouts into one projection of
``substring`` + ``trim`` + ``try_cast`` when-chains over ``spark.read.text``
— one map-only pass, no UDFs, unmatched lines quarantined by tag rather
than aborting the scan. Columns absent from an older layout surface as
NULLs: the same additive-evolution contract the lake applies
(``lake/table.py:_evolve_schema``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class FixedWidthField:
    name: str
    start: int  # 1-based, inclusive (SQL substring convention)
    width: int
    dtype: str = "string"  # any Spark SQL type; parsed with try_cast


@dataclass
class FixedWidthLayout:
    name: str
    selector: str  # regex the raw line must match for this layout
    fields: list[FixedWidthField]


def read_fixed_width(
    spark: SparkSession,
    path: str,
    layouts: list[FixedWidthLayout],
    keep_raw: bool = False,
) -> DataFrame:
    """Parse ``path`` under the first matching layout per line.

    Output columns = union of all layouts' fields (order of first
    appearance) + ``layout`` tag (NULL = no layout matched -> the caller's
    quarantine branch, mirroring the engine's validation-gate idiom).
    """
    raw = spark.read.text(path)
    line = F.col("value")

    layout_tag = F.lit(None).cast("string")
    for lay in reversed(layouts):
        layout_tag = F.when(line.rlike(lay.selector), F.lit(lay.name)).otherwise(
            layout_tag
        )
    tagged = raw.withColumn("layout", layout_tag)

    # canonical field order: first appearance across layouts
    order: list[str] = []
    by_field: dict[str, list[tuple[FixedWidthLayout, FixedWidthField]]] = {}
    for lay in layouts:
        for f in lay.fields:
            if f.name not in by_field:
                by_field[f.name] = []
                order.append(f.name)
            by_field[f.name].append((lay, f))

    cols = [F.col("layout")]
    for name in order:
        expr = F.lit(None).cast(by_field[name][0][1].dtype)
        for lay, f in reversed(by_field[name]):
            piece = F.trim(F.substring(line, f.start, f.width))
            piece = F.when(piece == "", None).otherwise(piece).try_cast(f.dtype)
            expr = F.when(F.col("layout") == lay.name, piece).otherwise(expr)
        cols.append(expr.alias(name))
    if keep_raw:
        cols.append(line.alias("raw_line"))
    return tagged.select(*cols)
