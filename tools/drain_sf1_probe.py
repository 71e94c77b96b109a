#!/usr/bin/env python
"""sf1.0 STREAMING drain probe + state-store provider experiment
(r10 VERDICT #5 and #6).

#5 — the r10 sf1.0 probe covered batch queries; this measures the
streaming path at 10x: an AvailableNow drain of a synthesized sf1.0
binary redo fixture (the sf_probe key-shift synthesis), recording
records/s AND the state-store footprint per micro-batch
(stateOperators.numRowsTotal / stateOnCurrentVersionSizeBytes from the
query progress events), so super-linear state growth is measured, not
assumed. maxFilesPerTrigger paces the drain into many micro-batches —
state growth is visible batch by batch.

#6 — ~50% of drain time is state-store commits + micro-batch
scheduling (r10 decomposition). This compares the default
HDFS-backed provider against RocksDB
(spark.sql.streaming.stateStore.providerClass) at the sf0.1 drain
signature; adopt if >=15% and signature-stable, else document the
framework floor.

NOT part of bench.py (the driver fixes the bench sf). Results recorded
in PERF.md.

Usage: python tools/drain_sf1_probe.py [--skip-gen] [--skip-rocks]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

BASE = "/root/testdata/sf0.1"
BIG = "/tmp/sfprobe/sf1.0v2"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _drain(spark, redo_dir: str, files_per_trigger: int,
           provider: str | None = None) -> dict:
    from openlogreplicator_spark.config import EngineConfig
    from openlogreplicator_spark.streaming.engine import build_pipeline

    if provider:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", provider
        )
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    ckpt = tempfile.mkdtemp(prefix="olr_sf1_drain_")
    t0 = time.perf_counter()
    try:
        q = build_pipeline(
            spark,
            EngineConfig(),
            redo_dir,
            checkpoint=ckpt,
            sink="noop",
            query_name="olr_sf1_drain",
            available_now=True,
            max_files_per_trigger=files_per_trigger,
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 3)
        batches = []
        for p in q.recentProgress:
            so = p.get("stateOperators") or []
            batches.append(
                {
                    "batch": p.get("batchId"),
                    "rows_in": p.get("numInputRows"),
                    "ms": (p.get("durationMs") or {}).get("triggerExecution"),
                    "state_rows": sum(
                        s.get("numRowsTotal", 0) for s in so
                    ),
                    "state_bytes": sum(
                        s.get("stateOnCurrentVersionSizeBytes")
                        or s.get("memoryUsedBytes", 0)
                        for s in so
                    ),
                    "commit_ms": sum(
                        (s.get("commitTimeMs") or 0) for s in so
                    ),
                }
            )
        return {"wall_sec": wall, "batches": batches}
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    from openlogreplicator_spark.session import get_spark
    from openlogreplicator_spark.operators.cdc import _binary_redo_dir
    from openlogreplicator_spark.sources.binary_redo import parse_redo_files
    from tools.sf_probe import synthesize

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="olr-sf1-drain-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    if "--skip-gen" not in sys.argv and not os.path.exists(BIG):
        synthesize(spark)

    out: dict = {}
    for label, sf_dir in (("sf0.1", BASE), ("sf1.0", BIG)):
        redo_dir = _binary_redo_dir(spark, sf_dir)
        n = parse_redo_files(spark, redo_dir).count()
        n_files = len(
            [f for f in os.listdir(redo_dir) if f.endswith(".olrs")]
        )
        # ~8 micro-batches at either scale so per-batch state growth
        # is visible on a comparable trigger cadence
        fpt = max(1, n_files // 8)
        r = _drain(spark, redo_dir, fpt)
        r["n_records"] = n
        r["n_files"] = n_files
        r["files_per_trigger"] = fpt
        r["rec_s"] = int(n / r["wall_sec"])
        out[label] = r

    if "--skip-rocks" not in sys.argv:
        redo_dir = _binary_redo_dir(spark, BASE)
        n = out["sf0.1"]["n_records"]
        rocks: dict = {}
        for label, provider in (
            ("default", None),
            ("rocksdb", ROCKSDB),
        ):
            runs = []
            for _ in range(3):
                runs.append(_drain(spark, redo_dir, None,
                                   provider=provider)["wall_sec"])
            rocks[label] = {
                "runs": runs,
                "median": statistics.median(runs),
                "rec_s": int(n / statistics.median(runs)),
            }
        out["state_store_experiment"] = rocks

    print(json.dumps(out))


if __name__ == "__main__":
    main()
