"""Multi-executor scaling evidence: N vs 4N EXECUTORS via local-cluster.

The primary bench (bench.py) pins cores inside one JVM. This harness runs
the same replay through ``spark-submit --master local-cluster[E,1,M]`` —
E separate executor JVMs with 1 core each, real inter-JVM (netty) shuffle,
the closest sandbox realization of "a cluster of N executors". The pair
E=1 vs E=4 is the north rule's N -> 4N executors, literally.

Usage: python tools/bench_cluster.py  (writes one JSON line; ~20 min)
Env: SPARK_GRAFT_BENCH_EVENTS (default 8_000_000), SPARK_GRAFT_CLUSTER_REPEATS.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "8000000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_CLUSTER_REPEATS", "6"))
EXEC_MEM_MB = 8192


def _spark_submit_worker(executors: int, args: list[str]) -> dict:
    """Run bench_worker under spark-submit on a local-cluster of
    ``executors`` 1-core executor JVMs. The pin set is executors+1 cores:
    a real cluster runs the driver on its own node, so the driver gets one
    core outside the counted executor budget at BOTH levels."""
    cmd = [
        "spark-submit",
        "--master", f"local-cluster[{executors},1,{EXEC_MEM_MB}]",
        "--driver-memory", "8g",
        "--py-files", os.path.join(ROOT, "dist", "data_services_spark.zip"),
        os.path.join(ROOT, "data_services_spark", "jobs", "bench_worker.py"),
        *args,
    ]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{executors}", *cmd]
    env = dict(os.environ, PYTHONPATH=ROOT)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=ROOT, check=False)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main() -> int:
    zip_path = os.path.join(ROOT, "dist", "data_services_spark.zip")
    if not os.path.exists(zip_path):
        subprocess.run(
            ["zip", "-qr", zip_path, "data_services_spark"], cwd=ROOT, check=True
        )
    scratch = tempfile.mkdtemp(prefix="bench_cluster_")
    changes = os.path.join(scratch, "changes.parquet")
    subprocess.run(
        [sys.executable, "-m", "data_services_spark.jobs.bench_worker",
         "--mode", "generate", "--cpus", "16", "--events", str(EVENTS),
         "--changes", changes],
        env=dict(os.environ, PYTHONPATH=ROOT), cwd=ROOT, check=True,
        capture_output=True, text=True,
    )

    results = {}
    for execs in (4, 1):
        subprocess.run(["sync"], check=False)
        results[execs] = _spark_submit_worker(
            execs,
            ["--mode", "cdc", "--cpus", str(execs), "--events", str(EVENTS),
             "--chunks", "2", "--changes", changes, "--repeats", str(REPEATS),
             "--workdir", os.path.join(scratch, f"lake{execs}")],
        )
    shutil.rmtree(scratch, ignore_errors=True)

    lo, hi = results[1], results[4]
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / 4
    e2e = (hi["end_to_end_events_per_sec"] / lo["end_to_end_events_per_sec"]) / 4
    print(json.dumps({
        "protocol": "local-cluster[E,1,8192] spark-submit, E separate executor JVMs",
        "events": EVENTS,
        "executors_lo": 1, "executors_hi": 4,
        "apply_events_per_sec_lo": lo["events_per_sec"],
        "apply_events_per_sec_hi": hi["events_per_sec"],
        "apply_scaling_efficiency": round(eff, 3),
        "end_to_end_events_per_sec_lo": lo["end_to_end_events_per_sec"],
        "end_to_end_events_per_sec_hi": hi["end_to_end_events_per_sec"],
        "end_to_end_scaling_efficiency": round(e2e, 3),
        "rep_walls_lo": lo.get("rep_walls"),
        "rep_walls_hi": hi.get("rep_walls"),
        "table_rows": hi["table_rows"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
