#!/usr/bin/env python
"""Straddle-heavy streaming drain probe — closes the r11 caveat on the
sf1.0 streaming probe: the standard fixture is hash-partitioned (a
transaction never straddles files), so its per-batch state was
trivially empty. This probe builds SEQUENCE-SEGMENT fixtures
(`write_binary_redo_segments`, the S4 layout) with commits DELAYED by
a configurable distance, so thousands of transactions are open across
micro-batch boundaries, and measures the state store per batch.

The scale claim under test: per-batch state tracks the OPEN-transaction
count (bounded by the workload's in-flight window and the T4 cap), not
total data volume — two workloads with the same open window but 4x the
transactions must show the SAME per-batch state plateau.

Usage: python tools/straddle_drain_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def synthesize(spark, out_dir: str, n_txns: int, open_window: int) -> int:
    """n_txns transactions of (begin, insert, commit) with the commit
    delayed ``open_window`` transactions into the future — at any scn,
    ~open_window transactions are open. Returns total record count."""
    from pyspark.sql import functions as F

    from openlogreplicator_spark.sources.binary_redo import (
        write_binary_redo_segments,
    )

    ids = spark.range(n_txns).select(F.col("id"))

    def rec(opcode, scn_expr, with_cols):
        return ids.select(
            scn_expr.alias("scn"),
            F.lit(0).alias("subscn"),
            F.lit(0).cast("long").alias("block"),
            F.col("id").cast("int").alias("offset"),
            F.lit(1).cast("long").alias("seq"),
            F.col("id").cast("string").alias("xid"),
            F.lit(opcode).alias("opcode"),
            F.lit(9).cast("long").alias("obj"),
            (F.col("id") if with_cols else F.lit(None)).cast("long")
            .alias("bdba"),
            (F.lit(0) if with_cols else F.lit(None)).cast("int")
            .alias("slot"),
            F.lit(0).alias("fb"),
            (
                F.create_map(F.lit("v"), F.col("id").cast("string"))
                if with_cols
                else F.lit(None).cast("map<string,string>")
            ).alias("cols"),
            F.lit(None).cast("array<map<string,string>>").alias("rows"),
        )

    stream = (
        rec("begin", F.col("id") * 10, False)
        .unionByName(rec("insert", F.col("id") * 10 + 1, True))
        # commit lands open_window transactions later; the final window
        # clamps so every transaction still commits inside the fixture
        .unionByName(rec(
            "commit",
            F.least(
                (F.col("id") + F.lit(open_window)) * 10 + 9,
                F.lit((n_txns - 1) * 10 + 9),
            ),
            False,
        ))
    )
    write_binary_redo_segments(stream, out_dir, n_files=32)
    return 3 * n_txns


def main() -> None:
    from openlogreplicator_spark.session import get_spark
    from tools.drain_sf1_probe import _drain

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="olr-straddle-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}
    for label, n_txns, window in (
        ("50k_txns_20k_open", 50_000, 20_000),
        ("200k_txns_20k_open", 200_000, 20_000),   # 4x data, SAME window
        ("200k_txns_5k_open", 200_000, 5_000),     # same data, 1/4 window
    ):
        d = tempfile.mkdtemp(prefix=f"olr_straddle_{label}_")
        try:
            n = synthesize(spark, d, n_txns, window)
            r = _drain(spark, d, 4)  # 32 files / 4 per trigger = 8 batches
            out[label] = {
                "records": n,
                "wall_sec": r["wall_sec"],
                "rec_s": int(n / r["wall_sec"]),
                "state_rows": [b["state_rows"] for b in r["batches"]],
                "state_bytes": [b["state_bytes"] for b in r["batches"]],
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
