#!/usr/bin/env python
"""One-off sf1.0 scale probe (r9 VERDICT #4): measure the top-5 bench
queries at sf0.1 and a locally synthesized sf1.0 (10x), and record
seconds + shuffle-write bytes so the scaling exponent per query is
EMPIRICAL, not just plan-audited.

sf1.0 synthesis = 10 key-shifted copies of the driver's sf0.1 tables
(seeded, deterministic). Text copies get a per-copy letter rotation so
cross-copy documents are NOT near-duplicates — the duplicate-rate /
LSH-bucket-occupancy workload shape of the base corpus is preserved
per copy instead of amplified 10x (which would measure an adversarial
all-dup corpus, not scale). Embeddings get a per-copy additive
perturbation for the same reason.

NOT part of bench.py: the driver fixes the bench sf; this is a design
validation recorded in PERF.md.

Usage: python tools/sf_probe.py [--skip-gen]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

BASE = "/root/testdata/sf0.1"
BIG = "/tmp/sfprobe/sf1.0v2"
COPIES = 10
PROBES = [
    "dedup_cluster_cc",
    "dedup_minhash_lsh",
    "decontaminate_ngram",
    "cdc_txn_assembly_binary",
    "ann_pq",
]
# 10-letter mutation alphabet: rotation is injective over all 10 copies
# (a 5-letter alphabet gave copies c and c+5 IDENTICAL text — a 2x
# exact-duplicate corpus, the amplification this scheme must avoid)
MUTATE = "aeiousnrtl"


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(BIG, "_SUCCESS")):
        return
    os.makedirs(BIG, exist_ok=True)

    def shifted(df, keys: dict, copy: int, extra=None):
        out = df
        for col, span in keys.items():
            out = out.withColumn(col, F.col(col) + F.lit(copy * span))
        if extra is not None:
            out = extra(out, copy)
        return out

    def spans(df, cols):
        row = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        return {c: int(row[c]) + 1 for c in cols}

    def write_copies(name, keys_cols, extra=None):
        df = spark.read.parquet(f"{BASE}/{name}.parquet")
        sp = spans(df, keys_cols)
        parts = [shifted(df, sp, i, extra) for i in range(COPIES)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{BIG}/{name}.parquet")

    def doc_mutate(df, copy: int):
        # per-copy letter rotation (bijective on the 10-char alphabet):
        # same within-copy near-dup structure, no cross-copy near-dups
        # (every shingle containing any of these letters differs
        # between copies; period 10 = COPIES, so no two copies share
        # the mapping)
        rot = MUTATE[copy % 10:] + MUTATE[: copy % 10]
        return df.withColumn("text", F.translate("text", MUTATE, rot))

    def emb_mutate(df, copy: int):
        return df.withColumn(
            "embedding",
            F.transform("embedding", lambda x: x + F.lit(copy * 0.013)),
        )

    write_copies("documents", ["doc_id"], doc_mutate)
    write_copies("embeddings", ["vec_id"], emb_mutate)
    write_copies("orders", ["o_orderkey", "o_custkey"])
    write_copies(
        "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]
    )
    # small dims copied verbatim (queries only key-shift fact tables)
    for t in ("customer", "supplier", "part", "nation", "region", "events"):
        src = f"{BASE}/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{BIG}/{t}.parquet"
            )
    open(os.path.join(BIG, "_SUCCESS"), "w").close()


def shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across completed stages (REST API)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def main() -> None:
    from openlogreplicator_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="olr-sf-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # the session default disables the UI; the probe needs the REST
        # stage metrics for shuffle-write byte deltas
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if "--skip-gen" not in sys.argv:
        t0 = time.perf_counter()
        synthesize(spark)
        print(f"# sf1.0 synthesis: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    import __spark_entry__ as entry

    qs = entry.queries()

    # fixture prep out of band (bench.py convention: fixture writing is
    # test-data prep, not the parse/assembly pipeline being measured)
    from openlogreplicator_spark.operators.cdc import _binary_redo_dir

    results: dict = {}
    for sf_name, sf_dir in (("sf0.1", BASE), ("sf1.0", BIG)):
        _binary_redo_dir(spark, sf_dir)
        results[sf_name] = {}
        for name in PROBES:
            spark.sparkContext._jvm.System.gc()
            b0 = shuffle_write_bytes(spark)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            b1 = shuffle_write_bytes(spark)
            results[sf_name][name] = {
                "sec": round(dt, 2),
                "shuffle_write_bytes": (b1 - b0) if b0 >= 0 else -1,
            }
            print(f"# {sf_name} {name}: {dt:.2f}s "
                  f"shuffle={b1 - b0:,}B", file=sys.stderr)

    import math

    for name in PROBES:
        a = results["sf0.1"][name]["sec"]
        b = results["sf1.0"][name]["sec"]
        results.setdefault("exponent", {})[name] = round(
            math.log10(max(b, 1e-9) / max(a, 1e-9)), 2
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
