"""SparkSession factory tuned for the engine.

Scale-minded defaults: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), UTC session timezone (CDC events carry instants),
Arrow for pandas-UDF exchange. On a real cluster the same builder is used —
only master/memory come from the environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# JVM↔Python Arrow transfer granularity. The engine's hot Python stages
# (redo parse, transaction assembly) move SLIM rows through iterator-form
# kernels whose heavy init is per-task, so batch size only sets transfer/
# pipelining granularity: an interleaved A/B at sf0.1 (r12, quiet-box
# medians over 3-6 runs each way) measured 4000 beating the 10000 default
# by 15-20% on the three assembly-plane queries (2.8→2.3 s class) and
# neutral-or-better on every other Python-boundary operator (LOB
# reassembly 1.55→1.39, semantic dedup 3.62→3.48, multimodal/quantize/
# drain within noise); 20k-100k batches lose 20-40% (less JVM↔Python
# overlap, bigger per-batch working sets). Env-tunable for clusters where
# wider rows or faster interconnects move the optimum.
_ARROW_BATCH = os.environ.get("OLRS_ARROW_BATCH", "4000")


def get_spark(
    app_name: str = "openlogreplicator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and master.startswith("local["):
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", _ARROW_BATCH
        )
        # files.maxPartitionBytes stays at the 128 MB default: an A/B at
        # sf0.1 showed 16 MB partitions (≈10 scan tasks for a 300 MB
        # file instead of 3) consistently LOSE end-to-end — each extra
        # task costs more in launch overhead (and in Python-runner
        # handshakes for pandas stages) than its share of parallelism
        # returns at this data size.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-provided session.

    The driver hands us its own SparkSession; static confs (memory, master)
    are fixed, but these are safe to set at runtime and matter for
    correctness (UTC) and plan quality (AQE).
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.execution.arrow.maxRecordsPerBatch", _ARROW_BATCH),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked down — proceed with session defaults
    return spark
