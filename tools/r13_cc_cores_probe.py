#!/usr/bin/env python
"""r13 VERDICT #5: dedup_cluster_cc ran FASTER on 8 cores than 32 in
the driver's r12 scaling block. Probe the query at both core counts in
fresh JVMs with a phase decomposition (jaccard pairs pipeline vs the
full query incl. CC) to locate where the extra cores hurt.

Usage: python tools/r13_cc_cores_probe.py [samples_per_arm]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cpus = {cpus}
from openlogreplicator_spark.session import get_spark
spark = get_spark(app_name="cc-probe", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
from openlogreplicator_spark.operators.clustering import (
    _three_gen_corpus, _jaccard_pairs, _JACCARD_T, dedup_cluster_cc,
)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark.range(1_000_000).selectExpr("sum(id)").collect()

def noop(df):
    df.write.mode("overwrite").format("noop").save()

out = {{}}
t0 = time.perf_counter()
noop(_jaccard_pairs(_three_gen_corpus(spark, sf_dir), _JACCARD_T))
out["pairs_only"] = round(time.perf_counter() - t0, 3)
spark.catalog.clearCache()
t0 = time.perf_counter()
noop(dedup_cluster_cc(spark, sf_dir))
out["full_cc"] = round(time.perf_counter() - t0, 3)
spark.catalog.clearCache()
# second warm pass of each (codegen warm)
t0 = time.perf_counter()
noop(_jaccard_pairs(_three_gen_corpus(spark, sf_dir), _JACCARD_T))
out["pairs_only_warm"] = round(time.perf_counter() - t0, 3)
spark.catalog.clearCache()
t0 = time.perf_counter()
noop(dedup_cluster_cc(spark, sf_dir))
out["full_cc_warm"] = round(time.perf_counter() - t0, 3)
spark.stop()
print("RESULT " + json.dumps(out))
"""


def run_child(cpus: int) -> dict:
    code = _CHILD.format(repo=REPO_ROOT, cpus=cpus)
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT (cpus={cpus}):\n{p.stderr[-1500:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    arms = [32, 8]
    samples: dict[int, dict[str, list[float]]] = {a: {} for a in arms}
    order = []
    for i in range(n):
        order += arms if i % 2 == 0 else arms[::-1]
    for i, cpus in enumerate(order):
        res = run_child(cpus)
        for k, v in res.items():
            samples[cpus].setdefault(k, []).append(v)
        print(f"# run {i + 1}/{len(order)} cpus={cpus}: {res}",
              file=sys.stderr, flush=True)
    keys = sorted(samples[arms[0]])
    print(f"{'phase':18s} {'32-core':>10s} {'8-core':>10s}")
    for k in keys:
        m32 = statistics.median(samples[32][k])
        m8 = statistics.median(samples[8][k])
        print(f"{k:18s} {m32:10.3f} {m8:10.3f}")
    print("RAW " + json.dumps({str(a): samples[a] for a in arms}))


if __name__ == "__main__":
    main()
