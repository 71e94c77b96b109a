"""Relational surface, part 4: the remaining TPC-H query shapes
expressible over the driver's column set — q6 (scan-bound filter-agg),
q8 (market share: two-level conditional ratio per group), q9 (profit by
nation/year with a synthetic cost model — no partsupp table exists),
q13 (distribution of counts: outer join + double aggregation),
q15 (top supplier via aggregate-equals-max scalar subquery).

TPC-H q2/q11/q16/q20/q21 need the partsupp table / l_shipmode /
l_commitdate columns, which the driver's dataset does not carry; they
are documented as out of data-model scope in COVERAGE.md rather than
approximated beyond recognition.

All money math follows the repo rule (testing/compare.py): aggregate in
exact DECIMAL, CAST AS DOUBLE only at the output boundary, never emit a
decimal-typed column. Ratio outputs are ROUNDed to 6 digits on both
engines so float formatting can't diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openlogreplicator_spark.operators.relational import _money
from openlogreplicator_spark.sources.tables import load_table


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-bound filter + single aggregate. All three
    predicates push down to the parquet scan; no shuffle beyond the
    final single-row reduce."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.04))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_money("l_extendedprice") * _money("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of STANDARD-part
    revenue sold into one region's customers, per order year. Dims all
    broadcast; the lineitem→orders join is the only fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    nat_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_rkey")
    )
    nat_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _money("l_extendedprice") * (1 - _money("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat_s), F.col("s_nationkey") == F.col("sn_key"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "CHINA", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


Q8_SQL = """
SELECT EXTRACT(year FROM o_orderdate)::INT AS o_year,
       ROUND(
         CAST(SUM(CASE WHEN n2.n_name = 'CHINA'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year). The
    dataset has no partsupp/ps_supplycost, so cost is the deterministic
    model 0.6 × p_retailprice × l_quantity (stated in both engines).
    Part filter: name contains 'aa' (plays '%green%')."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("aa"))
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    profit = _money("l_extendedprice") * (1 - _money("l_discount")) - (
        F.lit(0.6).cast("decimal(8,2)")
        * _money("p_retailprice")
        * _money("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate)::INT AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(0.6 AS DECIMAL(8,2))
                  * CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%aa%'
GROUP BY n_name, o_year
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, including
    zero-order customers (left outer join, count of non-null keys, then
    re-aggregate the counts). Two shuffles — join on custkey, then the
    tiny distribution groupBy."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) whose quarterly revenue equals the maximum
    (revenue view + scalar-max subquery). Revenue stays exact DECIMAL
    through the equality comparison — comparing doubles for == would be
    engine-dependent — and casts to double only in the output."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(_money("l_extendedprice") * (1 - _money("l_discount"))).alias(
                "total_rev"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_rev == max_rev.max_rev)
        .join(F.broadcast(supp), revenue.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("total_rev").cast("double").alias("total_rev"),
        )
    )


Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
"""


def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per user, the trailing-1-hour event count,
    integer cent-sum, and min/max value at every event — the sliding
    time-window aggregate shape (rate limiting, rolling spend, burst
    detection). Spark's rangeBetween needs a numeric sort key, so the
    frame orders by unix_micros(ts) with a ±μs-exact 1-hour bound —
    identical peer semantics to the oracle's RANGE BETWEEN INTERVAL.
    The summed metric is an integer cent value: a moving FLOAT sum is
    evaluated in frame order by Spark but segment-tree order by DuckDB,
    so only order-free (integer / order-stat) aggregates are emitted.
    One shuffle on user_id; state per row is O(frame occupancy)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    us = F.unix_micros("ts")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(cents).over(w).cast("bigint").alias("cents_1h"),
        F.round(F.min("value").over(w), 6).alias("min_1h"),
        F.round(F.max("value").over(w), 6).alias("max_1h"),
    )


WINDOW_RANGE_INTERVAL_SQL = """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
           AS cents_1h,
       ROUND(MIN(value) OVER w, 6) AS min_1h,
       ROUND(MAX(value) OVER w, 6) AS max_1h
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna / KLL-style sketch) under the
    accuracy contract: per order-priority, emit the EXACT p50/p90 of
    o_totalprice in cents plus booleans asserting the sketch lands
    within the 1%-relative-rank tolerance band (checked against the
    exact empirical CDF bounds). The oracle returns the exact values and
    literal TRUE — the sketch value itself never crosses engines. At
    100 TB the sketch is the only viable quantile: bounded state,
    mergeable partials, one shuffle of sketches."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")
    base = o.select(
        "o_orderpriority", cents.alias("cents")
    )
    agg = base.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_approx(cents, array(0.5, 0.9), 10000)"
        ).alias("apx"),
        F.expr("percentile(cents, 0.5)").alias("ex50"),
        F.expr("percentile(cents, 0.9)").alias("ex90"),
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "percentile(cents, array(0.49, 0.51, 0.89, 0.91))"
        ).alias("band"),
    )
    # within-band check: the sketch's rank error eps=1/10000 means the
    # returned value's true rank is within [p-eps, p+eps]; with 1% slack
    # the value must lie between the exact 49th/51st (89th/91st)
    # percentile values
    return agg.select(
        "o_orderpriority",
        F.floor("ex50").cast("bigint").alias("exact_p50"),
        F.floor("ex90").cast("bigint").alias("exact_p90"),
        (
            (F.element_at("apx", 1) >= F.element_at("band", 1))
            & (F.element_at("apx", 1) <= F.element_at("band", 2))
        ).alias("p50_in_band"),
        (
            (F.element_at("apx", 2) >= F.element_at("band", 3))
            & (F.element_at("apx", 2) <= F.element_at("band", 4))
        ).alias("p90_in_band"),
    )


AGG_APPROX_QUANTILE_SQL = """
SELECT o_orderpriority,
       CAST(FLOOR(quantile_cont(CAST(FLOOR(o_totalprice * 100) AS BIGINT),
            0.5)) AS BIGINT) AS exact_p50,
       CAST(FLOOR(quantile_cont(CAST(FLOOR(o_totalprice * 100) AS BIGINT),
            0.9)) AS BIGINT) AS exact_p90,
       TRUE AS p50_in_band,
       TRUE AS p90_in_band
FROM orders
GROUP BY o_orderpriority
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "window_range_interval": window_range_interval,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "agg_approx_quantile": agg_approx_quantile,
}

ORACLE = {
    "q6_forecast_revenue": Q6_SQL,
    "window_range_interval": WINDOW_RANGE_INTERVAL_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "agg_approx_quantile": AGG_APPROX_QUANTILE_SQL,
}
