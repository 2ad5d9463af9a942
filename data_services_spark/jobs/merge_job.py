"""CLI entrypoint: batch DML on a lake table — MERGE INTO / DELETE WHERE /
UPDATE WHERE (the Delta/Iceberg DML triad on the spark-submit surface).

    # MERGE a source parquet (WHEN MATCHED UPDATE SET * / NOT MATCHED INSERT,
    # optional conditional delete over the s/t aliases)
    spark-submit --py-files dist/data_services_spark.zip \
        data_services_spark/jobs/merge_job.py \
        --root /lake --table transcripts \
        --merge-source /tmp/src.parquet --delete-when "s.tool = 'error'"

    # predicate DML
    ... merge_job.py --root /lake --table transcripts \
        --delete-where "conv_id = 'conv_000007'"
    ... merge_job.py --root /lake --table transcripts \
        --update-where "role = 'tool'" --set '{"text": "upper(t.text)"}'

Prints one JSON line. Rows produced by these verbs take the batch-wins
dominance stamp — they overwrite the current row regardless of event-time
order, while later CDC events applied through replay_job still win
(see LakeTable.merge_into).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--table", default="transcripts")
    ap.add_argument("--merge-source", default=None,
                    help="parquet path of the MERGE source (must carry the "
                         "merge keys and order columns; at most one row "
                         "per key)")
    ap.add_argument("--update", default="all",
                    help="'all' (UPDATE SET *) or a JSON object mapping "
                         "payload column -> SQL expression over the s/t "
                         "aliases")
    ap.add_argument("--delete-when", default=None,
                    help="SQL condition over s/t: WHEN MATCHED AND cond "
                         "THEN DELETE")
    ap.add_argument("--no-insert", action="store_true",
                    help="drop unmatched source rows (update-only merge)")
    ap.add_argument("--delete-where", default=None,
                    help="SQL predicate over the table: row-level DELETE "
                         "with durable anti-resurrection tombstones")
    ap.add_argument("--update-where", default=None,
                    help="SQL predicate over the table: row-level UPDATE "
                         "(requires --set)")
    ap.add_argument("--set", default=None,
                    help="JSON object column -> SQL expression (t alias) "
                         "for --update-where")
    ap.add_argument("--branch", default=None,
                    help="run the DML on the named branch instead of main")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    modes = [bool(args.merge_source), bool(args.delete_where),
             bool(args.update_where)]
    if sum(modes) != 1:
        ap.error("pass exactly one of --merge-source / --delete-where / "
                 "--update-where")
    if args.update_where and not args.set:
        ap.error("--update-where requires --set")
    # refuse flags that belong to a different mode instead of silently
    # dropping them (--delete-when vs --delete-where is an easy slip)
    if not args.merge_source:
        stray = [f for f, v in (("--delete-when", args.delete_when),
                                ("--no-insert", args.no_insert),
                                ("--update", args.update != "all")) if v]
        if stray:
            ap.error(f"{', '.join(stray)} only applies with --merge-source")
    if not args.update_where and args.set:
        ap.error("--set only applies with --update-where")

    # absolute imports: spark-submit executes this file as a top-level script
    from data_services_spark.lake.table import LakeTable
    from data_services_spark.session import get_spark

    spark = get_spark("merge_job", cpus=args.cpus)
    table = LakeTable(spark, f"{args.root}/{args.table}", branch=args.branch)
    t0 = time.monotonic()

    if args.merge_source:
        update = args.update if args.update == "all" else json.loads(args.update)
        res = table.merge_into(
            spark.read.parquet(args.merge_source),
            update_set=update,
            insert=not args.no_insert,
            delete_when=args.delete_when,
        )
        res["job"] = "merge_into"
    elif args.delete_where:
        res = table.delete_where(args.delete_where)
        res["job"] = "delete_where"
    else:
        res = table.update_where(args.update_where, json.loads(args.set))
        res["job"] = "update_where"

    res["table"] = args.table
    res["branch"] = args.branch
    res["wall_sec"] = round(time.monotonic() - t0, 3)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
