"""Create / refresh an incremental materialized-aggregate view as a job.

The reference's reporting layer is a cascade of PostgreSQL views recomputed
from scratch on every query (``ANMN/data_report/views/
report_db.anmn_deployments_view.sql:6-33``); at 10^10 source rows that
recompute is the thing you cannot afford. This job drives
:class:`~data_services_spark.operators.incremental_view.IncrementalAggView`
from the CLI: ``--create`` declares the view (group columns, SUM columns,
MIN/MAX columns) positioned at source snapshot 0, and every subsequent run
refreshes it from the source lake's changelog — O(changed rows + touched
groups) per refresh, the watermark riding the view's own atomic commit so
a crashed refresh re-runs the same window and converges (exactly-once).

A cron cadence of ``view_job --refresh`` after each ``replay_job`` window
is the engine's materialized reporting mart: always one changelog window
behind the source at most, never a full recompute.

``--kind scd2`` maintains a :class:`~data_services_spark.operators.scd.
Scd2History` dimension-history table instead — same create/refresh verbs,
same watermark discipline; each refresh maps the changelog's before-images
straight to closing+opening version rows (zero history reads, zero joins).

Run::

  spark-submit --py-files dist/data_services_spark.zip \\
    data_services_spark/jobs/view_job.py --root /lake/views/per_role \\
    --source /lake/transcripts --create --group-cols role \\
    --sum-cols turn_idx --minmax-cols ts
  # ... later, after each ingest window:
  spark-submit ... view_job.py --root /lake/views/per_role \\
    --source /lake/transcripts --refresh
  # SCD2 dimension history over the same changelog:
  spark-submit ... view_job.py --root /lake/views/history \\
    --source /lake/transcripts --kind scd2 --create

Prints one JSON line per run (created/refreshed, groups touched, groups
recomputed for the MIN/MAX fallback, source + view snapshot ids).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--root", required=True, help="view table path")
    ap.add_argument("--source", required=True, help="source LakeTable path")
    ap.add_argument("--create", action="store_true",
                    help="create the view (then refresh it once)")
    ap.add_argument("--refresh", action="store_true",
                    help="refresh an existing view to the source head")
    ap.add_argument("--group-cols", default="",
                    help="comma-separated group columns (create)")
    ap.add_argument("--sum-cols", default="",
                    help="comma-separated SUM columns (create)")
    ap.add_argument("--minmax-cols", default="",
                    help="comma-separated MIN/MAX columns (create)")
    ap.add_argument("--kind", choices=["agg", "scd2"], default="agg",
                    help="agg = IncrementalAggView (default); scd2 = "
                         "Scd2History dimension-history table")
    ap.add_argument("--bucket-count", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    if not args.create and not args.refresh:
        ap.error("nothing to do: pass --create and/or --refresh")

    from data_services_spark.lake.table import LakeTable
    from data_services_spark.operators.incremental_view import IncrementalAggView
    from data_services_spark.session import get_spark

    spark = get_spark("view_job", cpus=args.cpus)
    source = LakeTable(spark, args.source)
    out: dict = {"root": args.root, "source": args.source}

    if args.kind == "scd2":
        from data_services_spark.operators.scd import Scd2History

        if args.group_cols or args.sum_cols or args.minmax_cols:
            ap.error("--kind scd2 takes no column args: keys and payload "
                     "derive from the source table's own merge keys/schema")
        if args.create:
            view = Scd2History.create(
                spark, args.root, source, bucket_count=args.bucket_count
            )
            out["created"] = True
        else:
            view = Scd2History.load(spark, args.root, source)
    elif args.create:
        groups = [c for c in args.group_cols.split(",") if c]
        if not groups:
            ap.error("--create needs --group-cols")
        view = IncrementalAggView.create(
            spark, args.root, source,
            group_cols=groups,
            sum_cols=[c for c in args.sum_cols.split(",") if c],
            minmax_cols=[c for c in args.minmax_cols.split(",") if c],
            bucket_count=args.bucket_count,
        )
        out["created"] = True
    else:
        view = IncrementalAggView.load(spark, args.root, source)

    res = view.refresh()
    out.update(res)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
