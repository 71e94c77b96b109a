#!/usr/bin/env python
"""r13 VERDICT #7: skew audit of the dedup/text hot-key pipelines at
the 10x probe corpus. Runs each subject query at sf1.0 with the UI on,
then pulls per-stage task-time and shuffle-read distributions
(REST taskSummary) for the heaviest stages and prints max/median
ratios — the guide §2.5 skew signal. Salt only if a hot key shows
(ratio >5-10x on a data-scale stage).

Usage: python tools/r13_skew_audit.py [--skip-gen]
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

from tools.sf_probe import BIG, synthesize  # noqa: E402

SUBJECTS = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "decontaminate_ngram",
    "text_bigram_perplexity",
]


def _get(url: str):
    with urllib.request.urlopen(url, timeout=20) as r:
        return json.load(r)


def stage_report(spark, after_stage: int) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = _get(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    rows = []
    for s in stages:
        if s["stageId"] < after_stage:
            continue
        rows.append(s)
    rows.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    out = []
    for s in rows[:6]:
        sid, att = s["stageId"], s["attemptId"]
        try:
            q = _get(
                f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}/"
                "taskSummary?quantiles=0.5,1.0"
            )
        except Exception:
            continue
        dur_med, dur_max = q["executorRunTime"]
        sr = q.get("shuffleReadMetrics", {}).get("readBytes", [0, 0])
        out.append(
            {
                "stage": sid,
                "name": (s.get("name") or "")[:60],
                "tasks": s.get("numCompleteTasks"),
                "run_ms_med": int(dur_med),
                "run_ms_max": int(dur_max),
                "run_ratio": round(dur_max / dur_med, 1)
                if dur_med
                else None,
                "shuf_read_med": int(sr[0]),
                "shuf_read_max": int(sr[1]),
                "shuf_ratio": round(sr[1] / sr[0], 1) if sr[0] else None,
            }
        )
    return out


def main() -> None:
    from openlogreplicator_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r13-skew-audit",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if "--skip-gen" not in sys.argv:
        t0 = time.perf_counter()
        synthesize(spark)
        print(f"# synthesis {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    import __spark_entry__ as entry

    qs = entry.queries()
    results = {}
    for name in SUBJECTS:
        tracker = spark.sparkContext.statusTracker()
        # stages created from here on belong to this query
        ids = tracker.getJobIdsForGroup() or []
        next_stage = 0
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        try:
            done = _get(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            )
            next_stage = 1 + max((s["stageId"] for s in done), default=-1)
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"skew:{name}")
        t0 = time.perf_counter()
        qs[name](spark, BIG).write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 1)
        spark.catalog.clearCache()
        rep = stage_report(spark, next_stage)
        results[name] = {"sec": dt, "stages": rep}
        print(f"\n== {name}  ({dt}s at sf1.0)")
        for r in rep:
            print(
                f"  stage {r['stage']:>4} tasks={r['tasks']:>3} "
                f"run med/max {r['run_ms_med']:>7}/{r['run_ms_max']:>7} ms"
                f" (x{r['run_ratio']})  shufRead med/max "
                f"{r['shuf_read_med'] >> 10:>8}/{r['shuf_read_max'] >> 10:>8} KB"
                f" (x{r['shuf_ratio']})  {r['name']}"
            )
    print("\nJSON " + json.dumps(results))


if __name__ == "__main__":
    main()
