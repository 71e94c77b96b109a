"""Windowed aggregation surface — batch-checkable forms of the streaming
operators (tumbling / sliding / session windows).

The same expressions run under Structured Streaming (see pipeline.py and
tests/test_streaming.py): `F.window` / `F.session_window` are identical in
batch and streaming plans; the driver-facing queries here are the batch
projections so DuckDB can oracle-check the window semantics.

Reference analog: the per-LWN checkpoint cadence (B8) and metrics
aggregation (W8) are tumbling windows over the commit-time axis; session
windows are the transaction-assembly shape (gap-bounded activity per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table


def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type: count + exact decimal sum.
    Streaming form: readStream → withWatermark("ts", ...) → same groupBy."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(18,6) per row: `value` carries 6 decimal digits,
            # so the cast is EXACT and the sum is the true total; the
            # previous (18,2) cast quantized each row before summing —
            # a sum of rounded values, not an exact decimal sum
            # (r12 review-pass-10)
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


STREAM_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour: each event lands in two windows.
    Spark expands the window set natively; the oracle unnests the two
    candidate starts per event."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "2 hours", "1 hour")
    return (
        ev.groupBy(win)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
            "n_users",
        )
    )


STREAM_SLIDING_SQL = """
WITH expanded AS (
    SELECT UNNEST([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                   date_trunc('hour', ts)]) AS window_start,
           user_id
    FROM events
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
FROM expanded
GROUP BY window_start
"""


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) per user — Spark's
    session_window merges overlapping [ts, ts+gap) intervals, which is
    exactly transaction assembly's activity grouping. Oracle reproduces
    the merge with lag + cumulative-sum session ids; session end = last
    event + gap (Spark semantics)."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw, "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            "n_events",
        )
    )


STREAM_SESSION_SQL = """
WITH lagged AS (
    SELECT user_id, ts, event_id,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 30*60*1000000
                THEN 1 ELSE 0 END AS is_new
    FROM lagged
), sess AS (
    -- event_id joins the cum-sum ORDER BY (r12 review-pass-10): the
    -- LAG above tiebreaks on it, so duplicate (user_id, ts) rows
    -- otherwise get nondeterministic session assignment
    SELECT user_id, ts,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
    FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f')
           AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_idx
"""


def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once replay dedup: the event feed is delivered twice (an
    at-least-once source re-sending a whole batch) and deduplicated on
    event_id before a per-type rollup. Streaming form is
    `dropDuplicatesWithinWatermark(["event_id"])` — state is TTL'd by
    the event-time watermark instead of growing without bound (see
    tests/test_streaming.py::test_stream_dedup_within_watermark); the
    batch projection here runs the identical plan minus the TTL.

    100-TB shape: dedup state is hash-partitioned on event_id and
    watermark-bounded, so the stream holds one watermark-window of keys
    per partition, not the full history.
    """
    ev = load_table(spark, sf_dir, "events")
    replayed = ev.unionByName(ev)
    deduped = replayed.dropDuplicates(["event_id"])
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# event_id is unique in the feed, so dedup-on-event_id of a double
# delivery collapses back to the original table.
STREAM_DEDUP_SQL = """
WITH replayed AS (
    SELECT * FROM events UNION ALL SELECT * FROM events
),
deduped AS (
    SELECT event_type, user_id
    FROM replayed
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts) = 1
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM deduped
GROUP BY event_type
"""


QUERIES = {
    "stream_tumbling_window": stream_tumbling_window,
    "stream_sliding_window": stream_sliding_window,
    "stream_session_window": stream_session_window,
    "stream_dedup_replay": stream_dedup_replay,
}

ORACLE = {
    "stream_tumbling_window": STREAM_TUMBLING_SQL,
    "stream_sliding_window": STREAM_SLIDING_SQL,
    "stream_session_window": STREAM_SESSION_SQL,
    "stream_dedup_replay": STREAM_DEDUP_SQL,
}
