#!/usr/bin/env python
"""r13 VERDICT #6: decompose cdc_metrics' wall clock per counter-family
branch (noop sink, interleaved rounds, medians) to decide whether the
ddl / writer / reader branches can fold onto the assembled pass the way
the dml/txn families did in r12 — or to prove they are independent
pipelines over different sources.

Usage: python tools/r13_metrics_decompose.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from openlogreplicator_spark.session import get_spark

    spark = get_spark(
        app_name="r13-metrics-decompose",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from openlogreplicator_spark.builders.json_builder import build_events
    from openlogreplicator_spark.config import Format
    from openlogreplicator_spark.operators.cdc import (
        _binary_redo_dir,
        _ddl_chunk_stream,
        _orders_redo_stream,
        cdc_metrics,
        replication_counters,
    )
    from openlogreplicator_spark.operators.extras import (
        _orders_as_change_events,
    )
    from openlogreplicator_spark.operators.lob_assembly import (
        classify_ddl,
        reassemble_ddl,
    )
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )

    _binary_redo_dir(spark, sf_dir)

    def dml_families():
        assembled = assemble_transactions(_orders_redo_stream(spark, sf_dir))
        return assembled.groupBy(
            F.col("xid"), (F.col("obj") % 4).alias("tab")
        ).agg(F.count(F.lit(1)).alias("value"))

    subjects = {
        "assembled_preagg": dml_families,
        "ddl_branch": lambda: classify_ddl(
            reassemble_ddl(_ddl_chunk_stream(spark, sf_dir))
        ).groupBy("ddl_category").agg(F.count(F.lit(1)).alias("value")),
        "writer_branch": lambda: build_events(
            _orders_as_change_events(spark, sf_dir),
            Format(attributes=True, redo_thread=True),
            tag_cols=("O_ORDERKEY",),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("value")).alias("b"),
        ),
        "reader_branch": lambda: replication_counters(
            spark, _binary_redo_dir(spark, sf_dir)
        ),
        "full_cdc_metrics": lambda: cdc_metrics(spark, sf_dir),
    }

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    samples: dict[str, list[float]] = {k: [] for k in subjects}
    for _ in range(rounds):
        for name, fn in subjects.items():
            spark.sparkContext.setJobDescription(f"r13metrics:{name}")
            t0 = time.perf_counter()
            noop(fn())
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)

    for name, xs in samples.items():
        print(
            f"{name:18s} med={statistics.median(xs):6.3f} "
            f"min={min(xs):6.3f} all={[round(x, 3) for x in xs]}"
        )


if __name__ == "__main__":
    main()
