#!/usr/bin/env python
"""r13: settle the Arrow-batch 4000-vs-10000 question with driver-grade
evidence (r12 VERDICT #3). The r12 tune was adopted on warm same-session
interleaved A/Bs; the driver's cold run showed the assembly plane slower
and the verdict flagged the claim weak. This harness reproduces the
driver's conditions: a FRESH JVM per sample (cold codegen, cold Python
worker fleet), the bench's own warmup sequence, then one timed noop-sink
pass per assembly-plane query. Settings alternate A/B/A/B across
samples so box waves hit both arms equally.

Usage: python tools/r13_arrow_ab.py [n_samples_per_setting] [batch_a batch_b]
Prints per-query medians per setting and the pairwise verdict.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "cdc_txn_assembly",
    "cdc_txn_assembly_binary",
    "cdc_kdo_positional_binary",
    "cdc_lob_reassembly",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from openlogreplicator_spark.session import get_spark

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="arrow-ab", master=f"local[{{cpus}}]",
                  shuffle_partitions=int(cpus))
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

# bench.py's warmup sequence, verbatim shape
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
def _worker_warm(p):
    import openlogreplicator_spark.operators.transaction_assembly  # noqa: F401
    return p
spark.range(0, 1 << 20, 1, int(cpus)).withColumn(
    "b", F.col("id") % int(cpus)
).groupBy("b").applyInPandas(
    _worker_warm, schema="id long, b long"
).write.mode("overwrite").format("noop").save()
from openlogreplicator_spark.operators.cdc import (
    _binary_redo_dir, _kdo_positional_redo_dir,
)
_binary_redo_dir(spark, sf_dir)
_kdo_positional_redo_dir(spark, sf_dir)

registry = entrymod.queries()
out = {{}}
for name in {queries!r}:
    t0 = time.perf_counter()
    registry[name](spark, sf_dir).write.mode("overwrite").format(
        "noop").save()
    out[name] = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
spark.stop()
print("RESULT " + json.dumps(out))
"""


def run_child(batch: str) -> dict:
    env = dict(os.environ, OLRS_ARROW_BATCH=batch)
    code = _CHILD.format(repo=REPO_ROOT, queries=QUERIES)
    p = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(
        f"child (batch={batch}) produced no RESULT:\n{p.stderr[-2000:]}"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    a, b = (sys.argv[2], sys.argv[3]) if len(sys.argv) > 3 else (
        "4000", "10000"
    )
    samples: dict[str, dict[str, list[float]]] = {
        a: {q: [] for q in QUERIES}, b: {q: [] for q in QUERIES}
    }
    order = []
    for i in range(n):
        # alternate which arm goes first each round
        order += [a, b] if i % 2 == 0 else [b, a]
    for i, batch in enumerate(order):
        res = run_child(batch)
        for q, t in res.items():
            samples[batch][q].append(t)
        print(f"# run {i + 1}/{len(order)} batch={batch}: {res}",
              file=sys.stderr, flush=True)

    print(f"{'query':28s} {a:>10s} {b:>10s}  ratio(b/a)")
    for q in QUERIES:
        ma = statistics.median(samples[a][q])
        mb = statistics.median(samples[b][q])
        print(f"{q:28s} {ma:10.3f} {mb:10.3f}  {mb / ma:8.3f}")
    ta = statistics.median(
        [sum(x) for x in zip(*[samples[a][q] for q in QUERIES])]
    )
    tb = statistics.median(
        [sum(x) for x in zip(*[samples[b][q] for q in QUERIES])]
    )
    print(f"{'TOTAL (per-run sums, median)':28s} {ta:10.3f} {tb:10.3f}  "
          f"{tb / ta:8.3f}")
    print("RAW " + json.dumps(samples))


if __name__ == "__main__":
    main()
