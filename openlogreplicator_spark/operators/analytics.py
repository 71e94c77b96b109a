"""Event-stream analytics consumers over the CDC/event tables.

The reference delivers an ordered change/event stream (W1-W3); the
canonical things a warehouse does with that stream beyond history
materialization (history.py) are behavioral analytics: funnels, cohort
retention, transition graphs, and net-change compaction (the consumer
side of doc 8.checkpointing.adoc's idempotent-apply contract — Kafka
topic-compaction semantics expressed relationally).

Scale shapes: every operator here is one or two key-partitioned
shuffles (user_id / cohort bucket); no self-joins on the event table,
no driver-side state. Stage frames in the funnel are per-user
aggregates — orders of magnitude smaller than the event stream — so
the chained joins shuffle only aggregate-sized inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel view → click → purchase: a user counts at
    a stage only if the stage event happened strictly AFTER the previous
    stage's first completion (min-timestamp chaining).

    r12 shape: ONE user_id exchange total. The three stage thresholds
    are chained unordered-frame window mins over the same user
    partitioning (no per-window sort, no re-exchange); the old shape
    re-scanned events and re-aggregated stage frames in each of the
    three union branches (6 scans, 8 exchanges → 1 scan, 1 data-scale
    exchange). Chaining semantics are identical: a null previous
    threshold nulls the `ts > prev` predicate, so the conditional min
    ignores the row — exactly the old inner-join-then-filter gate."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "vts",
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "cts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("vts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "pts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("cts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    # one row per user, exchange-free (user_id-clustered already);
    # count(col) counts non-null = users that completed the stage
    per_user = staged.select("user_id", "vts", "cts", "pts").distinct()
    counts = per_user.agg(
        F.count("vts").alias("nv"),
        F.count("cts").alias("nc"),
        F.count("pts").alias("np"),
    )
    return counts.select(
        F.expr(
            "stack(3, '1_view', nv, '2_click', nc, '3_purchase', np)"
            " as (stage, n_users)"
        )
    )


EVENT_FUNNEL_SQL = """
WITH v AS (SELECT user_id, MIN(ts) AS vts FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS cts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.vts GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS pts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.cts GROUP BY e.user_id)
SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL
SELECT '2_click' AS stage, COUNT(*) AS n_users FROM c
UNION ALL
SELECT '3_purchase' AS stage, COUNT(*) AS n_users FROM p
"""


def event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity day,
    counted distinct on each later active day. One scan of events: the
    (user, day) distinct is partial-aggregated map-side, then cohort is
    an unordered per-user window over the deduped rows (no second scan
    or broadcast of a first-day aggregate) before the cohort-cell agg."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    # cohort = min(day) over the user's distinct days == min over raw days;
    # deriving it as an unordered window over `active` reads events ONCE
    # (the two-aggregate formulation scans it twice — the optimizer strips
    # the distinct under min(), so the subtrees diverge and nothing reuses).
    # The extra user_id exchange carries only the deduped user-day rows.
    withc = active.withColumn(
        "cohort", F.min("day").over(Window.partitionBy("user_id"))
    )
    return (
        withc.groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").cast("int").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


EVENT_RETENTION_SQL = """
WITH firsts AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
    FROM events GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', f.cohort, a.day) AS INT) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM active a JOIN firsts f ON a.user_id = f.user_id
GROUP BY f.cohort, date_diff('day', f.cohort, a.day)
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts (first-order Markov edges): lag over
    the per-user timeline, then a global pair count. One window shuffle
    on user_id + one partial-agg shuffle on the 25-row pair space."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


EVENT_TRANSITIONS_SQL = """
WITH lagged AS (
    SELECT event_type AS next_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT prev_type, next_type, COUNT(*) AS n_transitions
FROM lagged WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


def net_changes(
    changes: DataFrame, key: str, ts_col: str, tiebreak: str
) -> DataFrame:
    """Net-effect compaction of a change batch: per key, collapse the op
    sequence to its net result (Kafka topic-compaction / Delta CDF
    semantics): i…d ⇒ none (row never existed for a reader of the
    compacted batch), i…x ⇒ i, x…d ⇒ d, else u. Carries the last image.

    ``changes`` columns: key, op ('i'|'u'|'d'), val, ts, tiebreak.

    ONE partial-aggregated shuffle: min_by/max_by on the (ts, tiebreak)
    ordering struct replace a window + distinct (which costs a second
    exchange on the full row). min_by/max_by are algebraic, so map-side
    combine compresses each partition to one row per key before the
    exchange — the shape that survives 100 TB."""
    order = F.struct(ts_col, tiebreak)
    return (
        changes.groupBy(key)
        .agg(
            F.min_by("op", order).alias("first_op"),
            F.max_by("op", order).alias("last_op"),
            F.max_by("val", order).alias("last_val"),
            F.count(F.lit(1)).alias("n_ops"),
        )
        .withColumn(
            "net_op",
            F.when(
                (F.col("first_op") == "i") & (F.col("last_op") == "d"), "none"
            )
            .when(F.col("first_op") == "i", "i")
            .when(F.col("last_op") == "d", "d")
            .otherwise("u"),
        )
        .select(key, "net_op", "last_val", "n_ops")
    )


def cdc_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-change compaction over a change stream derived from events
    (signup ⇒ insert, error ⇒ delete, else update), keyed by user."""
    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        F.when(F.col("event_type") == "signup", "i")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
        .alias("op"),
        F.round("value", 6).alias("val"),
        "ts",
        "event_id",
    )
    return net_changes(changes, "user_id", "ts", "event_id")


CDC_NET_CHANGES_SQL = """
WITH changes AS (
    SELECT user_id,
           CASE event_type WHEN 'signup' THEN 'i'
                           WHEN 'error' THEN 'd' ELSE 'u' END AS op,
           ROUND(value, 6) AS val, ts, event_id
    FROM events
),
spanned AS (
    SELECT DISTINCT user_id,
        FIRST_VALUE(op) OVER w AS first_op,
        LAST_VALUE(op) OVER w AS last_op,
        LAST_VALUE(val) OVER w AS last_val,
        COUNT(*) OVER w AS n_ops
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       CASE WHEN first_op = 'i' AND last_op = 'd' THEN 'none'
            WHEN first_op = 'i' THEN 'i'
            WHEN last_op = 'd' THEN 'd'
            ELSE 'u' END AS net_op,
       last_val, n_ops
FROM spanned
"""


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals in exact integer cents
    (bucket = floor(total)·100 cents DIV 25000_00): binning and sums stay
    in integer space so no float rounding can diverge engines. Map-side
    partial agg; one exchange over ≤ ~25 bucket rows."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")
    return (
        o.select(cents.alias("cents"))
        .groupBy(F.expr("cents DIV 2500000").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
    )


AGG_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) // 2500000 AS bucket,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
GROUP BY 1
"""


def event_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust telemetry anomaly flags: per event_type, values further
    than K median-absolute-deviations from the median are anomalous —
    the outlier gate a data pipeline runs over ingestion metrics before
    trusting a batch. EXACT medians (percentile, not approx) so the
    oracle matches bit-for-bit; two grouped passes over a broadcast
    per-type model (type count is tiny), no window over the fact
    stream."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad"), F.first("med").alias("med")
    )
    flagged = (
        ev.join(F.broadcast(mad), "event_type")
        # a constant-valued type has MAD 0 — nothing there can be an
        # outlier (and ANSI division would reject it)
        .filter(F.col("mad") > 0)
        .withColumn(
            "score",
            F.abs(F.col("value") - F.col("med")) / F.col("mad"),
        )
        .filter(F.col("score") > 8.0)
    )
    return flagged.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round("score", 4).alias("mad_score"),
    )


EVENT_ANOMALY_MAD_SQL = """
WITH med AS (
    SELECT event_type, median(value) AS med
    FROM events GROUP BY event_type
), mad AS (
    SELECT e.event_type, median(ABS(e.value - m.med)) AS mad, ANY_VALUE(m.med) AS med
    FROM events e JOIN med m USING (event_type)
    GROUP BY e.event_type
)
SELECT e.event_id, e.event_type,
       ROUND(e.value, 6) AS value,
       ROUND(ABS(e.value - m.med) / m.mad, 4) AS mad_score
FROM events e JOIN mad m USING (event_type)
WHERE m.mad > 0 AND ABS(e.value - m.med) / m.mad > 8.0
"""


QUERIES = {
    "event_anomaly_mad": event_anomaly_mad,
    "event_funnel": event_funnel,
    "event_retention": event_retention,
    "event_transitions": event_transitions,
    "cdc_net_changes": cdc_net_changes,
    "agg_histogram": agg_histogram,
}

ORACLE = {
    "event_anomaly_mad": EVENT_ANOMALY_MAD_SQL,
    "event_funnel": EVENT_FUNNEL_SQL,
    "event_retention": EVENT_RETENTION_SQL,
    "event_transitions": EVENT_TRANSITIONS_SQL,
    "cdc_net_changes": CDC_NET_CHANGES_SQL,
    "agg_histogram": AGG_HISTOGRAM_SQL,
}
