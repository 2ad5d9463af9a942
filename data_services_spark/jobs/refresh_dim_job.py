"""Refresh a broadcast dimension (vocabulary) table as a job.

The reference pulls vocabularies from live services at run time and joins
them into every processing chain — platform codes
(``lib/python/platform_code_vocab.py:23-125``) and ship callsigns
(``lib/python/ship_callsign.py:20-60``) are fetched, normalised, and used
as in-memory lookup dicts. The engine's equivalent keeps the JOIN
semantics (tiny dim, broadcast, no shuffle of the fact side) but makes
the refresh an explicit, snapshot-committed job instead of an ad-hoc
fetch inside every script:

* the dim source (csv/parquet export of the vocabulary service) is read,
  normalised (trimmed keys, dedup on the key columns keeping the row with
  the greatest ``--order-col`` when present), and
* committed to a :class:`~data_services_spark.lake.table.LakeTable` via
  ``overwrite`` — an atomic snapshot flip, so every query that
  ``read()``s the dim between refreshes sees one consistent vocabulary
  version, old versions stay time-travelable for auditing which vocab a
  run used, and a crashed refresh leaves the previous version current
  (same exactly-once commit discipline as the CDC sink).

Run: ``spark-submit --py-files dist/data_services_spark.zip \
  data_services_spark/jobs/refresh_dim_job.py --root /lake/dims/platform \
  --source /exports/platform_codes.csv --keys platform_code``

Prints one JSON line: rows, snapshot id, and whether anything changed
(an unchanged vocabulary still commits — the snapshot records the check).
"""

from __future__ import annotations

import argparse
import json
import sys


def refresh_dim(
    spark,
    root: str,
    source: str,
    keys: list[str],
    fmt: str = "csv",
    order_col: str | None = None,
    bucket_count: int = 1,
):
    """Read the dim source, normalise, dedup on ``keys``, atomically
    overwrite the dim table. Returns (LakeTable, Snapshot, row_count)."""
    from pyspark.sql import functions as F

    from data_services_spark.lake.table import LakeTable, TableNotFound

    if fmt == "csv":
        df = spark.read.option("header", True).option("inferSchema", True).csv(source)
    elif fmt == "parquet":
        df = spark.read.parquet(source)
    else:
        raise ValueError(f"unsupported dim source format: {fmt}")

    for k in keys:
        df = df.withColumn(k, F.trim(F.col(k).cast("string")))
    bad = F.lit(False)
    for k in keys:
        bad = bad | F.col(k).isNull() | (F.col(k) == "")
    df = df.where(~bad)
    if order_col and order_col in df.columns:
        # latest definition wins, mirroring the reference's "current vocab
        # replaces previous" semantics
        payload = F.struct(*[c for c in df.columns if c not in keys])
        df = (
            df.groupBy(*keys)
            .agg(F.max_by(payload, F.col(order_col)).alias("_w"))
            .select(*keys, "_w.*")
        )
    else:
        df = df.dropDuplicates(keys)

    try:
        table = LakeTable(spark, root)
    except TableNotFound:
        table = LakeTable.create(
            spark, root, schema=df.schema, bucket_keys=keys,
            bucket_count=bucket_count,
        )
    snap = table.overwrite(df, summary={"source": source, "op": "refresh_dim"})
    return table, snap, table.read().count()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="dim table root")
    ap.add_argument("--source", required=True, help="vocabulary export path")
    ap.add_argument("--format", default="csv", choices=["csv", "parquet"])
    ap.add_argument("--keys", required=True, help="comma-separated key columns")
    ap.add_argument("--order-col", default=None,
                    help="column whose max picks the winning duplicate")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    from data_services_spark.session import get_spark

    spark = get_spark("refresh_dim", cpus=args.cpus)
    table, snap, n = refresh_dim(
        spark, args.root, args.source, args.keys.split(","),
        fmt=args.format, order_col=args.order_col,
    )
    print(json.dumps({
        "rows": n,
        "snapshot_id": snap.snapshot_id,
        "parent_id": snap.parent_id,
        "root": table.path,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
