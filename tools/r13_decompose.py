#!/usr/bin/env python
"""r13 measurement: decompose the binary assembly plane's wall clock
(guide §1 measure-first). Times, with the noop sink under the driver
recipe: parse-only, parse+shuffle (xid repartition, no kernel),
parse+assembly, and the two full bench queries — interleaved A/B style
ordering, N rounds each, medians printed. Not part of bench.py.

Usage: python tools/r13_decompose.py [rounds]
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
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from openlogreplicator_spark.session import get_spark

    spark = get_spark(
        app_name="r13-decompose",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from openlogreplicator_spark.operators.cdc import (
        _binary_redo_dir,
        _kdo_positional_redo_dir,
        cdc_txn_assembly,
        cdc_txn_assembly_binary,
        cdc_kdo_positional_binary,
        _orders_redo_stream,
    )
    from openlogreplicator_spark.operators.extras import cdc_lob_reassembly
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )
    from openlogreplicator_spark.sources.binary_redo import parse_redo_files

    redo_dir = _binary_redo_dir(spark, sf_dir)
    _kdo_positional_redo_dir(spark, sf_dir)

    subjects = {
        "parse_only": lambda: parse_redo_files(spark, redo_dir),
        "parse_shuffle": lambda: parse_redo_files(spark, redo_dir)
        .repartition(32, "xid"),
        "parse_assemble": lambda: assemble_transactions(
            parse_redo_files(spark, redo_dir)
        ),
        "synth_only": lambda: _orders_redo_stream(spark, sf_dir),
        "synth_assemble": lambda: assemble_transactions(
            _orders_redo_stream(spark, sf_dir)
        ),
        "full_binary": lambda: cdc_txn_assembly_binary(spark, sf_dir),
        "full_txn": lambda: cdc_txn_assembly(spark, sf_dir),
        "full_kdo": lambda: cdc_kdo_positional_binary(spark, sf_dir),
        "full_lob": lambda: cdc_lob_reassembly(spark, sf_dir),
    }

    # warm
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    noop(parse_redo_files(spark, redo_dir))

    samples: dict[str, list[float]] = {k: [] for k in subjects}
    for _ in range(rounds):
        for name, fn in subjects.items():
            spark.sparkContext.setJobDescription(f"r13probe:{name}")
            t0 = time.perf_counter()
            noop(fn())
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)

    for name, xs in samples.items():
        print(
            f"{name:16s} med={statistics.median(xs):6.3f} "
            f"min={min(xs):6.3f} all={[round(x, 3) for x in xs]}"
        )


if __name__ == "__main__":
    main()
