"""CLI entrypoint: lake-table maintenance (compaction + snapshot expiry).

The reference expires temp manifest state after 15 days
(``lib/python/aims_realtime_util.py:1056-1086``) and relies on S3 object
versions for history (``lib/common/s3.sh:55-80``); the engine's analogues
are merge-on-read compaction (fold delta layers into base files) and
snapshot expiry (drop old manifests + sweep unreferenced data dirs).

    spark-submit --py-files dist/data_services_spark.zip \
        data_services_spark/jobs/maintain_job.py \
        --root /path/to/lake --compact --expire-keep 5

Prints one JSON line per table maintained.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

TABLES = ["transcripts", "lineage", "quarantine", "metrics"]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="lake root directory")
    ap.add_argument("--tables", default="transcripts",
                    help=f"comma-sep subset of {TABLES} (default transcripts)")
    ap.add_argument("--compact", action="store_true",
                    help="fold merge-on-read delta layers into base files")
    ap.add_argument("--compact-min-layers", type=int, default=1,
                    help="only compact buckets with at least this many delta layers")
    ap.add_argument("--expire-keep", type=int, default=0,
                    help="expire all but the last N snapshots (0 = don't expire)")
    ap.add_argument("--rewrite-clustered", default=None, metavar="COLS",
                    help="comma-separated columns: z-order clustered "
                         "rewrite (Iceberg rewrite_data_files zorder / "
                         "Delta OPTIMIZE ZORDER BY) — multi-column file "
                         "skipping for reads")
    ap.add_argument("--files-per-bucket", type=int, default=8,
                    help="z-prefix band files per bucket for "
                         "--rewrite-clustered (default 8)")
    ap.add_argument("--rebucket", type=int, default=0,
                    help="re-hash the table into this many buckets "
                         "(partition evolution; 0 = don't)")
    ap.add_argument("--expire-tombstones", action="store_true",
                    help="GC delete tombstones from base files — declares "
                         "the out-of-order horizon closed (no event older "
                         "than a delete can still arrive)")
    ap.add_argument("--expire-tombstones-before", default=None,
                    help="ISO timestamp: GC only tombstones older than "
                         "this event-time horizon")
    ap.add_argument("--describe", action="store_true",
                    help="print a metadata-only health summary per table "
                         "(layout, MOR debt, tombstone state, checkpoint)")
    ap.add_argument("--remove-orphans", action="store_true",
                    help="delete data files referenced by no snapshot "
                         "(crash debris between commit phases)")
    ap.add_argument("--orphan-age-sec", type=float, default=86400.0,
                    help="only remove orphan files older than this "
                         "(safety margin against in-flight commits)")
    ap.add_argument("--contracts", action="store_true",
                    help="run the transcripts contract battery post-commit "
                         "(uniqueness/nullability/domain/monotonicity); "
                         "failing checks land in the JSON report and flip "
                         "the exit code to 2")
    ap.add_argument("--requeue-quarantine", action="store_true",
                    help="re-validate quarantined events under the current "
                         "rules and apply the newly-valid ones through the "
                         "normal LWW path (offsets untouched, idempotent)")
    ap.add_argument("--requeue-validator", default="default",
                    choices=["default", "generic"],
                    help="validation ladder for --requeue-quarantine: "
                         "'default' = the table's tuned ladder, 'generic' = "
                         "envelope + non-null merge keys only (the relaxed "
                         "re-drive after a rule proves too strict)")
    ap.add_argument("--list-staged", action="store_true",
                    help="list staged write-audit-publish batch ids "
                         "(the operator's first stop after a replay_job "
                         "--wap-audit halt or a failed streaming audit)")
    ap.add_argument("--audit-staged", default=None, metavar="WAP_ID",
                    help="re-run the contract battery over a staged "
                         "batch's would-be-published state; violations "
                         "land in the JSON report and flip exit code to 2")
    ap.add_argument("--publish-staged", default=None, metavar="WAP_ID",
                    help="make a staged batch visible (metadata-only "
                         "commit; files + offsets atomically)")
    ap.add_argument("--abandon-staged", default=None, metavar="WAP_ID",
                    help="reject a staged batch: remove its files and "
                         "manifest (its events replay later — offsets "
                         "never advanced)")
    ap.add_argument("--tag", default=None, metavar="NAME",
                    help="create an immutable named ref to the CURRENT "
                         "snapshot (dataset-release handle; tagged "
                         "snapshots survive --expire-keep until dropped)")
    ap.add_argument("--drop-tag", default=None, metavar="NAME")
    ap.add_argument("--erase-subject", action="append", default=None,
                    metavar="COL:V1,V2",
                    help="right-to-be-forgotten sweep: physically rewrite "
                         "the subject's rows out of the target (with "
                         "anti-resurrection tombstones) and purge its raw "
                         "events from quarantine; repeat the flag for a "
                         "conjunctive multi-column subject; follow with "
                         "--expire-keep to sweep historic snapshots")
    ap.add_argument("--create-branch", default=None, metavar="NAME",
                    help="fork a named branch at the current snapshot "
                         "(one pointer file over the shared snapshot DAG; "
                         "open with LakeTable(..., branch=NAME) or "
                         "replay_job --branch)")
    ap.add_argument("--fast-forward", default=None, metavar="NAME",
                    help="advance MAIN to branch NAME's head (refuses if "
                         "main diverged since the fork)")
    ap.add_argument("--drop-branch", default=None, metavar="NAME")
    ap.add_argument("--register-consumer", default=None, metavar="NAME",
                    help="register a named downstream incremental reader "
                         "at the CURRENT snapshot (Paimon consumer-id: "
                         "position lives in table metadata; its snapshot "
                         "survives --expire-keep until acked past)")
    ap.add_argument("--consumer-from", type=int, default=None, metavar="SID",
                    help="with --register-consumer: start at snapshot SID "
                         "instead of current (0 = full-history replay)")
    ap.add_argument("--ack-consumer", default=None, metavar="NAME:SID",
                    help="advance consumer NAME's position to snapshot SID "
                         "(monotonic; the consume/ack handshake's second "
                         "half)")
    ap.add_argument("--drop-consumer", default=None, metavar="NAME")
    ap.add_argument("--consumer-lag", action="store_true",
                    help="report each consumer's position vs current snapshot")
    ap.add_argument("--rollback-to", type=int, default=None, metavar="SID",
                    help="roll the table back to snapshot SID as a NEW "
                         "commit (metadata-only; offsets regress with the "
                         "state, so the next replay re-applies the "
                         "rolled-back events)")
    ap.add_argument("--export-delta-log", action="store_true",
                    help="write/advance a Delta Lake transaction log over "
                         "the table's own data files (zero copy; standard "
                         "Delta readers then read the table in place). "
                         "Requires a compacted, tombstone-free snapshot — "
                         "combine with --compact --expire-tombstones")
    ap.add_argument("--export-parquet", default=None, metavar="DIR",
                    help="materialize the RESOLVED snapshot state as plain "
                         "hive-layout parquet under DIR (works from any "
                         "snapshot state; one full copy)")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    # absolute imports: spark-submit executes this file as a top-level script
    from data_services_spark.lake.table import LakeTable
    from data_services_spark.session import get_spark

    spark = get_spark("maintain_job", cpus=args.cpus)

    rc = 0
    if args.erase_subject:
        from data_services_spark.cdc.apply import CdcApplier

        subject = {}
        for spec in args.erase_subject:
            col, _, vals = spec.partition(":")
            if not col or not vals:
                ap.error(f"--erase-subject wants COL:V1,V2 — got {spec!r}")
            subject[col] = vals.split(",")
        t0 = time.monotonic()
        res = CdcApplier.load(spark, args.root).erase_subject(subject)
        res.update(job="erase_subject", subject=subject,
                   wall_sec=round(time.monotonic() - t0, 3))
        print(json.dumps(res))
    if args.requeue_quarantine:
        from data_services_spark.cdc.apply import CdcApplier

        kw = {}
        if args.requeue_validator == "generic":
            from data_services_spark.cdc.validate import generic_validation_reason
            from data_services_spark.lake.table import LakeTable as _LT

            keys = _LT(spark, f"{args.root}/transcripts").snapshot().props.get(
                "merge_keys", ["conv_id", "turn_idx"]
            )
            kw["validator"] = lambda df: generic_validation_reason(df, list(keys))
        applier = CdcApplier.load(spark, args.root, **kw)
        t0 = time.monotonic()
        res = applier.requeue_quarantine()
        res.update(job="requeue_quarantine",
                   wall_sec=round(time.monotonic() - t0, 3))
        print(json.dumps(res))

    for name in [t for t in args.tables.split(",") if t]:
        path = f"{args.root}/{name}"
        if not LakeTable.exists(path):
            print(json.dumps({"table": name, "error": "not found"}))
            continue
        t0 = time.monotonic()
        table = LakeTable(spark, path)
        out = {"table": name, "snapshot_before": table.current_snapshot_id()}
        if args.tag:
            out["tagged"] = {"name": args.tag,
                             "snapshot_id": table.tag(args.tag)}
        if args.drop_tag:
            table.drop_tag(args.drop_tag)
            out["dropped_tag"] = args.drop_tag
        if args.create_branch:
            out["created_branch"] = {
                "name": args.create_branch,
                "snapshot_id": table.create_branch(args.create_branch),
            }
        if args.fast_forward:
            out["fast_forwarded"] = {
                "name": args.fast_forward,
                "snapshot_id": table.fast_forward(args.fast_forward),
            }
        if args.drop_branch:
            table.drop_branch(args.drop_branch)
            out["dropped_branch"] = args.drop_branch
        if args.register_consumer:
            out["registered_consumer"] = {
                "name": args.register_consumer,
                "snapshot_id": table.register_consumer(
                    args.register_consumer, args.consumer_from
                ),
            }
        if args.ack_consumer:
            cname, _, sid = args.ack_consumer.rpartition(":")
            if not cname or not sid.isdigit():
                ap.error(
                    f"--ack-consumer wants NAME:SID — got {args.ack_consumer!r}"
                )
            table.ack_consumer(cname, int(sid))
            out["acked_consumer"] = {"name": cname, "snapshot_id": int(sid)}
        if args.drop_consumer:
            table.drop_consumer(args.drop_consumer)
            out["dropped_consumer"] = args.drop_consumer
        if args.consumer_lag:
            cur = table.current_snapshot_id()
            out["consumer_lag"] = {
                n: {"position": p, "current": cur, "lag_snapshots": cur - p}
                for n, p in sorted(table.consumers().items())
            }
        if args.rollback_to is not None:
            snap = table.rollback(args.rollback_to)
            out["rolled_back"] = {
                "to": args.rollback_to,
                "new_snapshot_id": snap.snapshot_id,
                "committed_lsn": snap.summary.get("offsets", {})
                                             .get("last_lsn"),
            }
        if args.describe:  # after tag ops so the report reflects them
            out["describe"] = table.describe()
        if args.list_staged:
            out["staged"] = table.list_staged()
        if args.audit_staged:
            from data_services_spark.contracts import transcripts_suite

            report = transcripts_suite().run(
                table.read_staged(args.audit_staged)
            ).collect()
            out["staged_audit"] = {
                "wap_id": args.audit_staged,
                **{r["check_name"]: int(r["n_violations"]) for r in report},
            }
            if any(int(r["n_violations"]) > 0 for r in report):
                rc = 2
        if args.publish_staged:
            snap = table.publish_staged(args.publish_staged)
            out["published"] = {
                "wap_id": args.publish_staged,
                "snapshot_id": snap.snapshot_id,
            }
        if args.abandon_staged:
            out["abandoned"] = {
                "wap_id": args.abandon_staged,
                "files_removed": table.abandon_staged(args.abandon_staged),
            }
        if args.compact:
            snap = table.snapshot()
            targets = [
                b for b in snap.delta_buckets()
                if len(snap.delta_files.get(str(b), [])) >= args.compact_min_layers
            ]
            out["compacted_buckets"] = len(targets)
            if targets:
                table.compact(buckets=targets)
        if args.rebucket > 0:
            before = table.bucket_count
            table.rebucket(args.rebucket)
            out["rebucket"] = {"from": before, "to": args.rebucket}
        if args.rewrite_clustered:
            cols = [c for c in args.rewrite_clustered.split(",") if c]
            snap = table.rewrite_clustered(
                cols, files_per_bucket=args.files_per_bucket
            )
            out["rewrite_clustered"] = {
                "cluster_by": cols,
                "files": sum(len(fs) for fs in snap.bucket_files.values()),
                "snapshot_id": snap.snapshot_id,
            }
        if args.expire_tombstones or args.expire_tombstones_before:
            horizon = None
            if args.expire_tombstones_before:
                import datetime as _dt

                horizon = _dt.datetime.fromisoformat(args.expire_tombstones_before)
            before_id = table.current_snapshot_id()
            table.expire_tombstones(older_than=horizon)
            out["expire_tombstones"] = {
                "horizon": args.expire_tombstones_before or "all",
                "committed": table.current_snapshot_id() != before_id,
            }
        if args.expire_keep > 0:
            expired = table.expire_snapshots(keep_last=args.expire_keep)
            out["expired_snapshots"] = len(expired)
        if args.remove_orphans:
            out["orphans_removed"] = len(
                table.remove_orphan_files(older_than_sec=args.orphan_age_sec)
            )
        if args.export_delta_log:
            from data_services_spark.lake.export import export_delta_log

            out["delta_log"] = export_delta_log(table)
        if args.export_parquet:
            from data_services_spark.lake.export import export_snapshot_parquet

            out["exported_parquet"] = export_snapshot_parquet(
                table, os.path.join(args.export_parquet, name)
            )
        if args.contracts and name == "transcripts":
            from data_services_spark.contracts import transcripts_suite

            report = transcripts_suite().run(table.read()).collect()
            out["contracts"] = {
                r["check_name"]: int(r["n_violations"]) for r in report
            }
            if any(not r["passed"] for r in report):
                rc = 2
        out["snapshot_after"] = table.current_snapshot_id()
        out["wall_sec"] = round(time.monotonic() - t0, 3)
        print(json.dumps(out))
    return rc


if __name__ == "__main__":
    sys.exit(main())
