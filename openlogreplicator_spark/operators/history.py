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


# far beyond c_custkey at any scale factor (sf100 tops out at 15M):
# at 10_000 every sf0.1+ signup key COLLIDED with an existing customer,
# so the insert path silently became an update at bench scale
# (r12 review-pass-10)
_INSERT_OFFSET = 100_000_000


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """MERGE a change stream into a snapshot: per key the LAST change
    wins — 'd' removes the row, 'u' updates it, 'i' creates it; keys
    without changes pass through. One window shuffle on the key to pick
    the last change + one outer join against the base — exactly the
    plan a warehouse MERGE executes, with no per-row driver logic.

    ``changes`` columns: key, op ('i'|'u'|'d'), new_bal, ts, tiebreak.
    (reference analog: the consumer side of W1-W3's ordered delivery —
    doc 8.checkpointing.adoc's idempotent-apply contract)"""
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak).desc()
    )
    # _had_i: whether ANY change in the key's set is an insert —
    # sequential MERGE of [i, u...] on a base-missing key ends with the
    # row EXISTING at the last update's balance; keeping only the last
    # op dropped it (r12 review-pass-10)
    last = (
        changes.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_had_i",
            F.max((F.col("op") == "i").cast("int")).over(
                Window.partitionBy(key)
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(key, "op", "new_bal", "_had_i")
    )
    b = base.alias("b")
    c = last.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    return (
        joined.filter(
            F.col("c.op").isNull() | (F.col("c.op") != "d")
        )
        .filter(
            F.col(f"b.{key}").isNotNull()
            | (F.col("c.op") == "i")
            | (F.col("c._had_i") == 1)
        )
        .select(
            F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key),
            F.coalesce(
                F.col("b.c_name"),
                F.concat(F.lit("NEW-"), F.col(f"c.{key}").cast("string")),
            ).alias("c_name"),
            F.when(F.col("c.op").isin("u", "i"), F.col("c.new_bal"))
            .otherwise(F.col("b.c_acctbal"))
            .alias("c_acctbal"),
            F.coalesce(F.col("b.c_mktsegment"), F.lit("NEW")).alias(
                "c_mktsegment"
            ),
        )
    )


def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state snapshot from base + change stream: events map
    deterministically to ops ('error'→delete of user_id, 'signup'→insert
    of user_id+offset, click/view/purchase→balance update); the last
    change per key wins; untouched base rows pass through."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        F.when(
            F.col("event_type") == "signup",
            F.col("user_id") + _INSERT_OFFSET,
        )
        .otherwise(F.col("user_id"))
        .alias("c_custkey"),
        F.when(F.col("event_type") == "error", F.lit("d"))
        .when(F.col("event_type") == "signup", F.lit("i"))
        .otherwise(F.lit("u"))
        .alias("op"),
        F.round("value", 2).alias("new_bal"),
        "ts",
        "event_id",
    )
    return apply_changes(base, changes, "c_custkey", "ts", "event_id")


CDC_APPLY_CHANGES_SQL = f"""
WITH changes AS (
    SELECT CASE WHEN event_type = 'signup'
                THEN user_id + {_INSERT_OFFSET} ELSE user_id END AS c_custkey,
           CASE event_type WHEN 'error' THEN 'd'
                           WHEN 'signup' THEN 'i'
                           ELSE 'u' END AS op,
           ROUND(value, 2) AS new_bal, ts, event_id
    FROM events
),
last AS (
    SELECT c_custkey, op, new_bal, had_i
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                       ORDER BY ts DESC, event_id DESC) AS rn,
                 MAX(CASE WHEN op = 'i' THEN 1 ELSE 0 END)
                     OVER (PARTITION BY c_custkey) AS had_i
          FROM changes)
    WHERE rn = 1
)
SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
       COALESCE(b.c_name, 'NEW-' || CAST(c.c_custkey AS VARCHAR)) AS c_name,
       CASE WHEN c.op IN ('u', 'i') THEN c.new_bal
            ELSE b.c_acctbal END AS c_acctbal,
       COALESCE(b.c_mktsegment, 'NEW') AS c_mktsegment
FROM customer b FULL OUTER JOIN last c ON b.c_custkey = c.c_custkey
WHERE (c.op IS NULL OR c.op <> 'd')
  AND (b.c_custkey IS NOT NULL OR c.op = 'i' OR c.had_i = 1)
"""


QUERIES = {
    "cdc_scd2_history": cdc_scd2_history,
    "cdc_apply_changes": cdc_apply_changes,
}

ORACLE = {
    "cdc_scd2_history": CDC_SCD2_SQL,
    "cdc_apply_changes": CDC_APPLY_CHANGES_SQL,
}
