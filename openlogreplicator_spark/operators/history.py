"""CDC consumers: history materialization over a change stream.

The reference delivers ordered change events; what consumers build from
them is a versioned history (SCD2) or a current-state snapshot. These
operators are the canonical downstream shapes, kept in the engine so a
user replicating with OpenLogReplicator→Kafka→warehouse can express the
whole path in one plan.

Scale shape: SCD2 is one shuffle on the business key + a window lead —
no self-join, no driver state; at 100 TB the key cardinality is the
parallelism and per-key state is one row of look-ahead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table


def scd2(
    changes: DataFrame,
    key: str,
    ts_col: str,
    order_tiebreak: str,
    tracked: list[str],
) -> DataFrame:
    """Change rows → SCD2 version rows: each change opens a version that
    closes when the next change for the same key arrives
    (valid_from/valid_to half-open interval, is_current on the last)."""
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    return changes.select(
        key,
        *tracked,
        F.row_number().over(w).alias("version"),
        F.col(ts_col).alias("_from"),
        F.lead(F.col(ts_col)).over(w).alias("_to"),
    ).select(
        key,
        *tracked,
        "version",
        F.date_format("_from", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "valid_from"
        ),
        F.date_format("_to", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_to"),
        F.col("_to").isNull().alias("is_current"),
    )


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over the events change stream: every event is a new version
    of its user's row; versions close at the next event."""
    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round("value", 6).alias("val_r"),
    )
    return scd2(
        changes, "user_id", "ts", "event_id", ["event_type", "val_r"]
    )


CDC_SCD2_SQL = """
SELECT user_id, event_type, ROUND(value, 6) AS val_r,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS version,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           AS is_current
FROM events
"""


QUERIES = {
    "cdc_scd2_history": cdc_scd2_history,
}

ORACLE = {
    "cdc_scd2_history": CDC_SCD2_SQL,
}
