"""The declared relational operator surface (SURVEY.md §2.2).

Each query is a (spark, sf_dir) -> DataFrame callable registered in
``QUERIES``; the matching DuckDB oracle SQL lives in ``ORACLE``. Numeric
discipline for oracle-hash stability (the driver hashes ``str(v)`` over
pandas-converted results — Spark ``toPandas()`` vs DuckDB ``.df()`` — so
every numeric output column must land in pandas as the same int64/float64
on both engines; DuckDB converts EVERY decimal to float64 while Spark
keeps ``Decimal`` objects, so decimal-typed *outputs* are forbidden):

- per-row money: emit the raw parquet double (or a per-row double
  expression — same bits in both engines); never a decimal cast;
- money sums: summed in exact decimal (order-independent), then CAST AS
  DOUBLE as the final output on both sides — the exact-decimal → nearest-
  double conversion is deterministic IEEE, so the float64 bits agree;
- averages / irrational values: double + round(…, 4..6), far from the
  data's decimal granularity so engine rounding modes can't disagree;
- counts: BIGINT both sides — DuckDB SUM(int) yields HUGEINT (→ float64
  in pandas), so integer sums are CAST AS BIGINT in the oracle SQL.

Scale notes are inline per query: what shuffles, what broadcasts, and what
the 100-TB plan is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table


def _money(col):
    """Exact decimal(18,2) view of a 2-decimal money column (name or
    Column). Casting the raw double is safe because stored values sit
    ≥0.005 from any rounding boundary; downstream arithmetic then stays
    in exact decimals (products keep their natural scale) so aggregate
    hashes are order- and engine-independent. (The former _dec twin —
    same cast, never called at any other scale — merged here, r12
    review-pass-8.)"""
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("decimal(18,2)")


def _revenue():
    # exact decimal product summed exactly, emitted as double —
    # matches CAST(SUM(CAST(a AS DEC)*(1-CAST(d AS DEC))) AS DOUBLE)
    return (
        F.sum(_money("l_extendedprice") * (1 - _money("l_discount")))
        .cast("double")
        .alias("revenue")
    )


# DuckDB-side rendering of _revenue()
REVENUE_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)


# ---------------------------------------------------------------------------
# TPC-H-shaped analytics (aggregation + multi-join core)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy group-agg. One shuffle on a 6-value key;
    partial aggregation (map-side combine) does ~all the work. Scales
    linearly — the filter and the 7-column projection reach the parquet
    scan (PushedFilters/ReadSchema), so 100 TB reads only what it needs."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _money("l_extendedprice") * (1 - _money("l_discount"))
    charge = disc_price * (1 + _money("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_money("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
           * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 4)       AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)  AS avg_price,
       ROUND(AVG(l_discount), 6)       AS avg_disc,
       COUNT(*)                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → group → top-k.
    customer is broadcast (no shuffle); orders⋈lineitem shuffles on
    orderkey. Top-10 via exact-decimal revenue + full tiebreak so both
    engines pick the same rows."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _revenue()
        )
        .withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. All dims broadcast; the only shuffles
    are lineitem⋈orders on orderkey and the final 25-key agg. The
    c_nationkey = s_nationkey co-location predicate is applied post-join."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _revenue()
        )
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _revenue(),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Projection / filter (reference F1-F8: regex table selection & friends)
# ---------------------------------------------------------------------------

def proj_filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex filter + computed projection — the reference's owner/table
    regex selection (Schema.cpp:506-516) as a Catalyst filter. rlike is
    evaluated JVM-side inside WholeStageCodegen."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").rlike("^(ECO|SMA)"))
        .filter(F.col("p_size") >= 10)
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            "p_brand",
            # per-row double product: same input bits + same multiply in both
            # engines → bit-identical float64, no decimal cast needed
            (F.col("p_retailprice") * F.col("p_size")).alias("inventory_value"),
        )
    )


PROJ_FILTER_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       p_brand,
       p_retailprice * p_size AS inventory_value
FROM part
WHERE regexp_matches(p_type, '^(ECO|SMA)') AND p_size >= 10
"""


# ---------------------------------------------------------------------------
# Joins (reference T9 dict resolve = broadcast hash; F4 = anti; §2.2 surface)
# ---------------------------------------------------------------------------

def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-resolve analog: fact ⋈ broadcast dims, zero fact shuffle
    until the 25-key aggregate. At 100 TB the dims stay broadcast; only
    the agg shuffles (tiny after partial agg)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_money("o_totalprice")).cast("double").alias("total_value"),
        )
    )


JOIN_BROADCAST_SQL = """
SELECT n_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def join_shuffle_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact equi join (sort-merge/shuffled-hash territory): both
    sides shuffle on orderkey; AQE picks the physical strategy and splits
    skewed partitions."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            _revenue(),
        )
    )


JOIN_SHUFFLE_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: orders having at least one heavy line (qty > 45).
    Semi-join avoids materializing the match side — the reference's
    'is this table in the dictionary' check has the same shape."""
    orders = load_table(spark, sf_dir, "orders")
    heavy = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return orders.join(
        heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderstatus", F.col("o_totalprice").alias("o_total"))


JOIN_SEMI_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice AS o_total
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
"""


def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: orders with no heavy line — the reference's skip-xid
    list (F4, Parser.cpp:580-581) is exactly an anti join."""
    orders = load_table(spark, sf_dir, "orders")
    heavy = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return orders.join(
        heavy, orders.o_orderkey == heavy.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_orderstatus")


JOIN_ANTI_SQL = """
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
"""


def join_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for each purchase, the most recent view by the same
    user at or before it (the reference's schema-version-by-SCN resolve,
    SURVEY §1.3, has this exact shape).

    Implementation is the scalable union-window pattern: tag both sides,
    union, single shuffle on user_id, `last(ignorenulls)` over the
    time-ordered frame. No range join, no per-key loop; state is one
    carried value per partition row — this survives 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"), F.lit(0).alias("side")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("view_id"), F.lit(1).alias("side")
    )
    unioned = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "view_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_view = F.last(
        F.when(F.col("side") == 0, F.struct("ts", "view_id")), ignorenulls=True
    ).over(w)
    return (
        unioned.withColumn("lv", last_view)
        .filter(F.col("side") == 1)
        .select(
            F.col("view_id").alias("purchase_id"),
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
            F.col("lv.view_id").alias("last_view_id"),
            F.date_format("lv.ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_view_ts"),
        )
    )


JOIN_ASOF_SQL = """
WITH unioned AS (
    SELECT user_id, ts, event_id AS view_id, 0 AS side
    FROM events WHERE event_type = 'view'
    UNION ALL
    SELECT user_id, ts, event_id AS view_id, 1 AS side
    FROM events WHERE event_type = 'purchase'
), marked AS (
    SELECT *,
        LAST_VALUE(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS lv_ts,
        LAST_VALUE(CASE WHEN side = 0 THEN view_id END IGNORE NULLS) OVER w AS lv_id
    FROM unioned
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, view_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT view_id AS purchase_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       lv_id AS last_view_id,
       strftime(lv_ts, '%Y-%m-%d %H:%M:%S.%f') AS last_view_ts
FROM marked WHERE side = 1
"""


def join_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join — events within 1 hour after each signup by the same
    user. Implemented as a bucketized equi join: probe side explodes to
    the (at most 2) hour buckets its interval spans, join on
    (user_id, bucket) — an equi shuffle Catalyst can plan — then the
    exact interval filter. Avoids the O(n·m) nested-loop a naive
    inequality join would give at scale."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    probe = signups.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.date_trunc("hour", F.col("s_ts")),
                F.date_trunc("hour", F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
            )
        ),
    ).dropDuplicates(["signup_id", "bucket"])
    right = ev.select(
        "user_id", "ts", F.date_trunc("hour", F.col("ts")).alias("bucket")
    )
    return (
        probe.join(
            right,
            (probe.s_user == right.user_id) & (probe.bucket == right.bucket),
        )
        .filter(
            (F.col("ts") >= F.col("s_ts"))
            & (F.col("ts") < F.col("s_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("signup_id", "s_user")
        .agg(F.count(F.lit(1)).alias("n_events_1h"))
        .withColumnRenamed("s_user", "user_id")
    )


JOIN_RANGE_SQL = """
SELECT s.event_id AS signup_id, s.user_id, COUNT(*) AS n_events_1h
FROM events s
JOIN events e ON e.user_id = s.user_id
            AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 1 HOUR
WHERE s.event_type = 'signup'
GROUP BY s.event_id, s.user_id
"""


# ---------------------------------------------------------------------------
# Aggregation surface (counts, distinct, rollup/cube/grouping sets)
# ---------------------------------------------------------------------------

def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(_money("l_quantity")).cast("double").alias("sum_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
    )


AGG_STATS_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
       strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
FROM lineitem
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — partial agg then a single
    shuffle; Spark expands grouping sets before the exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_money("l_quantity")).cast("double").alias("sum_qty"),
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_money("o_totalprice")).cast("double").alias("total"),
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_olr_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM _olr_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). Sketches differ across
    engines, so the oracle-checkable surface is the *accuracy contract*:
    emit the exact distinct count plus a boolean asserting the sketch is
    within 2% of it; the oracle returns the exact count and literal TRUE.
    At 100 TB the sketch is the only viable distinct-count: fixed-size
    state, one shuffle of sketches, no giant hash table."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("n_exact"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("approx_users") - F.col("n_exact"))
                / F.col("n_exact")
                <= F.lit(0.02)
            ).alias("within_2pct"),
        )
    )


AGG_APPROX_DISTINCT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       TRUE AS within_2pct
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Window functions (reference T5 ordered emission / F5 before-after diff)
# ---------------------------------------------------------------------------

def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per user by value — row_number/rank/dense_rank over a
    user partition. One shuffle on user_id; at scale this is the
    standard top-n-per-group (no global sort)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("rk", F.rank().over(w))
        .withColumn("drk", F.dense_rank().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn", "rk", "drk",
                F.round("value", 6).alias("value_r"))
    )


WINDOW_RANK_SQL = """
SELECT user_id, event_id, rn, rk, drk, ROUND(value, 6) AS value_r
FROM (
    SELECT *,
        ROW_NUMBER() OVER w AS rn,
        RANK() OVER w AS rk,
        DENSE_RANK() OVER w AS drk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
)
WHERE rn <= 3
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over the per-user event timeline — the reference's
    before/after image pairing (F5) is a lag over the row's history."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
    )


WINDOW_LAG_SQL = """
SELECT user_id, event_id, event_type,
       LAG(event_type)  OVER w AS prev_type,
       LEAD(event_type) OVER w AS next_type,
       ROUND(value - LAG(value) OVER w, 6) AS value_delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user sum with an explicit rowsBetween frame. Sequential
    double adds happen in identical order in both engines → bit-identical
    before the final round."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


WINDOW_RUNNING_SQL = """
SELECT user_id, event_id,
       ROUND(SUM(value) OVER w, 6) AS running_value,
       COUNT(*) OVER w AS running_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------

def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + single merge, no full sort. Deterministic via tiebreak."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").alias("o_total"),
        )
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice AS o_total
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets — archived ∪ online log lists in
    the reference (S4)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


SETOP_UNION_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
UNION
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — the reference's schema compareTo diff (Schema.cpp:113-143)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.subtract(b)  # EXCEPT (distinct) semantics


SETOP_EXCEPT_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.intersect(b)


SETOP_INTERSECT_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
"""


def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.dropDuplicates(["l_returnflag", "l_linestatus"]).select(
        "l_returnflag", "l_linestatus"
    )


DISTINCT_PAIRS_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


# ---------------------------------------------------------------------------
# Scalar function surface (string / datetime / math / json / array / map)
# ---------------------------------------------------------------------------

def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 1, 5).alias("pre5"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devowel"),
        F.trim(F.lpad("p_brand", 12, "x")).alias("padded"),
    )


SCALAR_STRING_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS up,
       LOWER(p_brand) AS lo,
       SUBSTR(p_name, 1, 5) AS pre5,
       LENGTH(p_name) AS name_len,
       CONCAT_WS('-', p_brand, p_type) AS brand_type,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
       TRIM(LPAD(p_brand, 12, 'x')) AS padded
FROM part
"""


def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch_start"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


SCALAR_DATETIME_SQL = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate)::INT  AS y,
       EXTRACT(month FROM o_orderdate)::INT AS m,
       EXTRACT(day FROM o_orderdate)::INT   AS d,
       EXTRACT(quarter FROM o_orderdate)::INT AS q,
       strftime(o_orderdate, '%Y-%m') AS ym,
       date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)::INT
           AS days_since_epoch_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
"""


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.floor("l_extendedprice").cast("bigint").alias("floor_price"),
        F.ceil("l_extendedprice").cast("bigint").alias("ceil_price"),
        F.abs(F.col("l_discount") - 0.05).cast("double").alias("abs_disc"),
        (F.col("l_linenumber") % 3).cast("int").alias("mod3"),
        F.round(F.pow("l_quantity", 2), 4).alias("qty_sq"),
    )


SCALAR_MATH_SQL = """
SELECT l_orderkey,
       ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
       ROUND(LN(l_extendedprice + 1), 6) AS ln_price,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_price,
       CAST(ABS(l_discount - 0.05) AS DOUBLE) AS abs_disc,
       CAST(l_linenumber % 3 AS INT) AS mod3,
       ROUND(POW(l_quantity, 2), 4) AS qty_sq
FROM lineitem WHERE l_linenumber = 1
"""


def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events.props column (reference emits JSON
    payloads; consumers parse them back — get_json_object is the Spark
    path, codegen'd, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_val", F.get_json_object("props", "$.k").cast("int")
        )
        .groupBy("event_type", "k_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("k_val") < 10)
    )


SCALAR_JSON_SQL = """
SELECT event_type, CAST(props->>'k' AS INT) AS k_val, COUNT(*) AS n
FROM events
GROUP BY event_type, k_val
HAVING k_val < 10
"""


def array_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode + aggregate — the reference's multi-row QMI/QMD expand (B4)
    is exactly explode(rows)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 5)
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
    )


ARRAY_EXPLODE_SQL = """
SELECT lang, word, COUNT(*) AS n
FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS word FROM documents)
WHERE LENGTH(word) >= 5
GROUP BY lang, word
HAVING COUNT(*) >= 20
"""


def higher_order_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / aggregate lambdas over arrays — all JVM-side
    (no Python), exactly how per-event column lists are processed."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.filter(words, lambda w: F.length(w) > 5)).alias("n_long"),
        F.element_at(words, 1).alias("first_word"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


HIGHER_ORDER_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       len(list_filter(string_split(text, ' '), w -> LENGTH(w) > 5)) AS n_long,
       string_split(text, ' ')[1] AS first_word,
       list_sum(list_transform(string_split(text, ' '), w -> LENGTH(w)))::INT
           AS total_chars
FROM documents
"""


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element access — the before/after/attrs images
    are MapType columns in the event model."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, F.lit("type")).alias("type_from_map"),
        F.element_at(m, F.lit("uid")).cast("bigint").alias("uid_from_map"),
        F.size(m).alias("map_size"),
    )


MAP_FUNCS_SQL = """
SELECT event_id, event_type AS type_from_map, user_id AS uid_from_map,
       2 AS map_size
FROM events WHERE event_id % 100 = 0
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q10_returned_items": q10_returned_items,
    "proj_filter_rlike": proj_filter_rlike,
    "join_broadcast_dim": join_broadcast_dim,
    "join_shuffle_facts": join_shuffle_facts,
    "join_left_semi": join_left_semi,
    "join_left_anti": join_left_anti,
    "join_asof_attribution": join_asof_attribution,
    "join_range_window": join_range_window,
    "agg_stats": agg_stats,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_approx_distinct": agg_approx_distinct,
    "window_rank_topn": window_rank_topn,
    "window_lag_lead": window_lag_lead,
    "window_running_sum": window_running_sum,
    "topk_orders": topk_orders,
    "setop_union": setop_union,
    "setop_except": setop_except,
    "setop_intersect": setop_intersect,
    "distinct_pairs": distinct_pairs,
    "scalar_string_funcs": scalar_string_funcs,
    "scalar_datetime_funcs": scalar_datetime_funcs,
    "scalar_math_funcs": scalar_math_funcs,
    "scalar_json_funcs": scalar_json_funcs,
    "array_explode_wordcount": array_explode_wordcount,
    "higher_order_array_funcs": higher_order_array_funcs,
    "map_funcs": map_funcs,
}

ORACLE = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q10_returned_items": Q10_SQL,
    "proj_filter_rlike": PROJ_FILTER_SQL,
    "join_broadcast_dim": JOIN_BROADCAST_SQL,
    "join_shuffle_facts": JOIN_SHUFFLE_SQL,
    "join_left_semi": JOIN_SEMI_SQL,
    "join_left_anti": JOIN_ANTI_SQL,
    "join_asof_attribution": JOIN_ASOF_SQL,
    "join_range_window": JOIN_RANGE_SQL,
    "agg_stats": AGG_STATS_SQL,
    "agg_rollup": AGG_ROLLUP_SQL,
    "agg_cube": AGG_CUBE_SQL,
    "agg_grouping_sets": AGG_GROUPING_SETS_SQL,
    "agg_approx_distinct": AGG_APPROX_DISTINCT_SQL,
    "window_rank_topn": WINDOW_RANK_SQL,
    "window_lag_lead": WINDOW_LAG_SQL,
    "window_running_sum": WINDOW_RUNNING_SQL,
    "topk_orders": TOPK_SQL,
    "setop_union": SETOP_UNION_SQL,
    "setop_except": SETOP_EXCEPT_SQL,
    "setop_intersect": SETOP_INTERSECT_SQL,
    "distinct_pairs": DISTINCT_PAIRS_SQL,
    "scalar_string_funcs": SCALAR_STRING_SQL,
    "scalar_datetime_funcs": SCALAR_DATETIME_SQL,
    "scalar_math_funcs": SCALAR_MATH_SQL,
    "scalar_json_funcs": SCALAR_JSON_SQL,
    "array_explode_wordcount": ARRAY_EXPLODE_SQL,
    "higher_order_array_funcs": HIGHER_ORDER_SQL,
    "map_funcs": MAP_FUNCS_SQL,
}
