"""Per-query timed sweep of the full registry at an arbitrary SF.

Runs every ``queries()`` entry in one Spark session, each under a wall-clock
budget enforced via job-group cancellation, and prints one line per query:
``name  seconds  rows`` (or TIMEOUT/ERROR). Used to hunt queries whose cost
curve breaks between sf0.01 (driver verify) and sf0.1 (bench) — the canary
for what would break at 100 TB.

Usage: python tools/sweep_registry.py [sf_dir] [budget_sec] [start_idx]
"""

from __future__ import annotations

import os
import sys
import threading
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    start = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    names = list(qs)[start:]
    print(f"sweep: {len(names)} queries at {sf_dir}, budget {budget}s each", flush=True)

    for i, name in enumerate(names, start):
        result: dict = {}

        def run() -> None:
            spark.sparkContext.setJobGroup(name, name, interruptOnCancel=True)
            try:
                t0 = time.time()
                n = qs[name](spark, sf_dir).count()
                result["sec"] = time.time() - t0
                result["rows"] = n
            except Exception as exc:  # noqa: BLE001
                result["err"] = f"{type(exc).__name__}: {exc}"[:200]

        t = threading.Thread(target=run, daemon=True)
        t0 = time.time()
        t.start()
        t.join(budget)
        if t.is_alive():
            print(f"[{i:3d}] {name:40s} TIMEOUT >{budget}s — cancelling", flush=True)
            spark.sparkContext.cancelJobGroup(name)
            t.join(30)
            if t.is_alive():
                print(f"[{i:3d}] {name:40s} STUCK after cancel — aborting sweep", flush=True)
                os._exit(3)
        elif "err" in result:
            print(f"[{i:3d}] {name:40s} ERROR {result['err']}", flush=True)
        else:
            print(
                f"[{i:3d}] {name:40s} {result['sec']:7.2f}s  rows={result['rows']}",
                flush=True,
            )
    print("sweep done", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
