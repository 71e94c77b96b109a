"""Exactly-once sink helpers.

Structured Streaming's checkpoint + sink epochs give exactly-once for
replayable sinks; for plain-file / at-least-once targets the reference
relies on its confirm heap + checkpoint SCN (Writer.cpp:106-165). The
equivalent here is an idempotent append keyed by the event identity
(scn, idx): re-delivered batches drop rows whose keys already landed.
Used inside foreachBatch, where Spark may re-run a batch after failure.

Scale note: the existing-keys read prunes to the key columns only
(column pruning reaches the parquet footer) and the anti join broadcasts
the incoming batch's keys when small — the target table is never fully
rewritten, only appended.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_append(
    batch: DataFrame, path: str, keys: tuple[str, ...] = ("commit_scn", "xid", "num")
) -> int:
    """Append only rows whose key tuple is not already in the target.
    Returns the number of rows actually written."""
    spark = batch.sparkSession
    to_write = batch
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(*keys)
        to_write = batch.join(existing, on=list(keys), how="left_anti")
    to_write = to_write.persist()
    n = to_write.count()
    if n:
        to_write.write.mode("append").parquet(path)
    to_write.unpersist()
    return n


def foreach_batch_idempotent(path: str, keys: tuple[str, ...] = ("commit_scn", "xid", "num")):
    """foreachBatch hook: writer exactly-once under batch replay."""

    def write(batch: DataFrame, epoch_id: int) -> None:
        idempotent_append(batch, path, keys)

    return write
