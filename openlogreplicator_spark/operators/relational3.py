"""Relational surface, part 3: more TPC-H query shapes adapted to the
driver's column set — conditional aggregation, disjunctive predicates,
anti-join + aggregate subqueries, multi-dim volume analysis."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openlogreplicator_spark.operators.relational import (
    REVENUE_SQL,
    _money,
    _revenue,
)
from openlogreplicator_spark.sources.tables import load_table


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders in a quarter having at least one late line
    (EXISTS → left-semi), counted per priority."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00')
GROUP BY o_orderpriority
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation → customer-nation flows by year.
    Both nation joins broadcast; the fact pipeline shuffles once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(_money("l_extendedprice") * (1 - _money("l_discount")))
            .cast("double")
            .alias("volume")
        )
        .filter(F.col("l_year").isin(1997, 1998))
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate)::INT AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND EXTRACT(year FROM l_shipdate) IN (1997, 1998)
GROUP BY supp_nation, cust_nation, l_year
"""


def q12_late_lines_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts (CASE inside SUM) — high- vs
    low-priority orders among lines shipped in a window, per returnflag
    (the dataset has no shipmode column; returnflag plays its role)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional revenue to total revenue
    (ECONOMY parts play PROMO's role). Exact decimal revenue both sides;
    the final ratio is double, rounded inside the noise floor."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _money("l_extendedprice") * (1 - _money("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            (
                F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )).cast("double")
                * 100.0
                / F.sum(rev).cast("double")
            ),
            6,
        ).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT ROUND(
    CAST(SUM(CASE WHEN p_type = 'ECONOMY'
             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
    6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate batteries across the join —
    Catalyst pushes the common conjuncts and keeps the disjunction."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity") >= 5)
            & (F.col("l_quantity") <= 25)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 35)
        )
        | (
            (F.col("p_type") == "STANDARD")
            & (F.col("l_discount") < 0.03)
        )
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n_lines"),
        # the shared money-discipline aggregate (r12 review-pass-10:
        # this was a verbatim re-spelling of relational._revenue)
        _revenue(),
    )


Q19_SQL = f"""
SELECT COUNT(*) AS n_lines,
       {REVENUE_SQL} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 5 AND 25)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_type = 'STANDARD' AND l_discount < 0.03)
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the average balance of their
    cohort with no orders at all (scalar subquery + anti join)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_urgent = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_urgent.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum(_money("c_acctbal")).cast("double").alias("total_bal"),
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


_SALT_BUCKETS = 8


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit skew-salted join: the fact side (events, hot user_ids)
    carries a deterministic salt; the dim side replicates once per salt
    value, so a hot key's rows spread across _SALT_BUCKETS reducers
    instead of piling onto one. This is the manual form of what AQE's
    skew-join split does at runtime — kept as a first-class operator
    because a 100-TB pipeline wants the salt BEFORE the shuffle when the
    skew is known (AQE only splits after a stage materializes). Results
    are salt-invariant, so the oracle is the plain join."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "_salt", F.pmod(F.col("event_id"), F.lit(_SALT_BUCKETS))
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn(
            "_salt",
            F.explode(F.array(*[F.lit(i) for i in range(_SALT_BUCKETS)])),
        )
    )
    joined = ev.join(
        dim.hint("shuffle_hash"),
        (ev.user_id == dim.c_custkey) & (ev._salt == dim._salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        # exact decimal accumulation: double partial sums are
        # order-dependent across shuffles; decimals aren't
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


JOIN_SKEW_SALTED_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c_mktsegment
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q7_volume_shipping": q7_volume_shipping,
    "q12_late_lines_by_flag": q12_late_lines_by_flag,
    "q14_promo_share": q14_promo_share,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "join_skew_salted": join_skew_salted,
}

ORACLE = {
    "join_skew_salted": JOIN_SKEW_SALTED_SQL,
    "q4_order_priority": Q4_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q12_late_lines_by_flag": Q12_SQL,
    "q14_promo_share": Q14_SQL,
    "q19_disjunctive_predicates": Q19_SQL,
    "q22_global_sales_opportunity": Q22_SQL,
}
