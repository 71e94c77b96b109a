#!/usr/bin/env python
"""Dump .explain("formatted") for queries into plans/<tag>/<name>_<suffix>.txt
and print a red-flag summary per plan (Exchange count, join strategies,
Python-eval nodes, cartesian products, scan pushdown info).

Usage:
    python tools/plan_dump.py --tag r12 --suffix before [--all] [names...]

Default query set is bench.py's HEADLINE list; --all sweeps the whole
registry (summary only unless names are headline). Red-flag scan is
static (plan text), no execution.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(name: str, txt: str) -> dict:
    return {
        "name": name,
        "exchanges": len(re.findall(r"\bExchange\b", txt)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", txt)),
        "shuffled_hash_joins": len(re.findall(r"\bShuffledHashJoin\b", txt)),
        "broadcast_joins": len(re.findall(r"\bBroadcastHashJoin\b", txt)),
        "nested_loop": len(re.findall(r"\bBroadcastNestedLoopJoin\b", txt)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", txt)),
        "batch_eval_python": len(re.findall(r"\bBatchEvalPython\b", txt)),
        "arrow_eval_python": len(re.findall(r"\bArrowEvalPython\b", txt)),
        "map_in_arrow_pandas": len(
            re.findall(r"\bMapInArrow\b|\bMapInPandas\b|\bFlatMapGroupsInPandas\b", txt)
        ),
        "sorts": len(re.findall(r"^\s*\(\d+\) Sort\b", txt, re.M)),
        "in_mem_relation": len(re.findall(r"InMemoryTableScan", txt)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-write", action="store_true", help="summary only")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from openlogreplicator_spark.session import get_spark

    spark = get_spark(app_name="plan-dump", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from bench import HEADLINE

    registry = entrymod.queries()
    if args.names:
        names = args.names
    elif args.all:
        names = sorted(registry)
    else:
        names = [n for n in HEADLINE if n in registry]

    out_dir = os.path.join(REPO_ROOT, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    rows = []
    for name in names:
        try:
            df = registry[name](spark, args.sf_dir)
            txt = plan_text(df)
        except Exception as exc:  # noqa: BLE001
            print(f"!! {name}: {type(exc).__name__}: {exc}", flush=True)
            continue
        if not args.no_write:
            with open(os.path.join(out_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(txt)
        rows.append(summarize(name, txt))
        spark.catalog.clearCache()

    cols = [
        "exchanges", "sort_merge_joins", "shuffled_hash_joins",
        "broadcast_joins", "nested_loop", "cartesian",
        "batch_eval_python", "arrow_eval_python", "map_in_arrow_pandas",
        "sorts", "in_mem_relation",
    ]
    hdr = "name".ljust(34) + " ".join(c[:4] for c in cols)
    print(hdr)
    for r in rows:
        print(r["name"].ljust(34) + " ".join(str(r[c]).ljust(4) for c in cols))
    spark.stop()


if __name__ == "__main__":
    main()
