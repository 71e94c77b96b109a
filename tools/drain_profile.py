#!/usr/bin/env python
"""Drain decomposition refresh (r9 VERDICT #7): where does the
streaming drain's time go at the current signature? Reports parse-only,
parse + batch assembly, and the full streaming drain over the sf0.1
OLRS fixture (900k records), so the next optimization targets the
actual top cost. Methodology matches bench.py: noop-forced, fresh
checkpoint per streaming run, median of 3.

Usage: python tools/drain_profile.py
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn, runs: int = 3) -> list[float]:
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    from openlogreplicator_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="olr-drain-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from openlogreplicator_spark.config import EngineConfig
    from openlogreplicator_spark.operators.cdc import _binary_redo_dir
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )
    from openlogreplicator_spark.sources.binary_redo import parse_redo_files
    from openlogreplicator_spark.streaming.engine import build_pipeline

    redo_dir = _binary_redo_dir(spark, SF_DIR)
    n_records = parse_redo_files(spark, redo_dir).count()  # warm + size

    def parse_only():
        parse_redo_files(spark, redo_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def parse_assemble():
        assemble_transactions(
            parse_redo_files(spark, redo_dir)
        ).write.mode("overwrite").format("noop").save()

    def full_drain():
        ckpt = tempfile.mkdtemp(prefix="olr_profile_ckpt_")
        try:
            q = build_pipeline(
                spark,
                EngineConfig(),
                redo_dir,
                checkpoint=ckpt,
                sink="noop",
                query_name="olr_profile_drain",
                available_now=True,
            )
            q.awaitTermination()
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    res = {
        "n_records": n_records,
        "parse_only_sec": _timed(parse_only),
        "parse_assemble_sec": _timed(parse_assemble),
        "full_drain_sec": _timed(full_drain),
    }
    for k in ("parse_only_sec", "parse_assemble_sec", "full_drain_sec"):
        med = statistics.median(res[k])
        res[k.replace("_sec", "_median")] = med
        res[k.replace("_sec", "_rec_s")] = int(n_records / med)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
