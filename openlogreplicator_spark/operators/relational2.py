"""Relational surface, part 2: subqueries (IN / correlated EXISTS /
scalar), having, pivot, statistical aggregates, ranking-distribution
window functions, null-handling scalars. Same oracle discipline as
relational.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openlogreplicator_spark.operators.relational import _money
from openlogreplicator_spark.sources.tables import load_table


def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join (Catalyst rewrites it; same shape as
    the reference's dictionary membership check)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_o2")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_c2")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM _o2
        WHERE o_custkey IN (SELECT c_custkey FROM _c2 WHERE c_acctbal > 5000)
        GROUP BY o_orderstatus
        """
    )


SUBQUERY_IN_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
GROUP BY o_orderstatus
"""


def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an inner predicate referencing the outer row."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_c3")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_o3")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM _c3
        WHERE EXISTS (
            SELECT 1 FROM _o3
            WHERE o_custkey = c_custkey
              AND o_totalprice > c_acctbal * 10
        )
        GROUP BY c_mktsegment
        """
    )


SUBQUERY_EXISTS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > c_acctbal * 10
)
GROUP BY c_mktsegment
"""


def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (TPC-H Q17 flavor): lineitems above the global
    average quantity. Catalyst plans the scalar as a broadcast."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_l4")
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n_above,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_above
        FROM _l4
        WHERE l_quantity > (SELECT AVG(l_quantity) FROM _l4)
        GROUP BY l_returnflag
        """
    )


SUBQUERY_SCALAR_SQL = """
SELECT l_returnflag, COUNT(*) AS n_above,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_above
FROM lineitem
WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)
GROUP BY l_returnflag
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part correlated average via a window (no self-join): lineitems
    under half their part's average quantity. The window shares the
    partkey shuffle with nothing else — one exchange total, vs. the
    naive plan's join + two scans."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    flagged = li.withColumn("part_avg_qty", F.avg("l_quantity").over(w))
    return flagged.filter(
        F.col("l_quantity") < 0.5 * F.col("part_avg_qty")
    ).agg(
        F.count(F.lit(1)).alias("n_small"),
        F.sum(_money("l_extendedprice")).cast("double").alias("small_revenue"),
    )


Q17_SQL = """
SELECT COUNT(*) AS n_small,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
FROM (
    SELECT l_quantity, l_extendedprice,
           AVG(l_quantity) OVER (PARTITION BY l_partkey) AS part_avg_qty
    FROM lineitem
)
WHERE l_quantity < 0.5 * part_avg_qty
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped fact, joined back to dims."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_money("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "total_qty",
        )
    )


Q18_SQL = """
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date, total_qty
FROM (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150
)
JOIN orders ON o_orderkey = l_orderkey
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = conditional aggregation after Catalyst's rewrite; explicit
    value list keeps it a single pass (no distinct-scan)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .fillna(0, ["F", "O", "P"])
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority
"""


def agg_statistical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev / correlation / covariance — error-bounded doubles rounded
    well inside the cross-engine reduction-order noise floor."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_discount"), 8).alias("sd_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 8).alias("cov_qty_disc"),
        F.count(F.lit(1)).alias("n"),
    )


AGG_STATISTICAL_SQL = """
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_discount), 8) AS sd_disc,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(COVAR_SAMP(l_quantity, l_discount), 8) AS cov_qty_disc,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont). approx_percentile exists for the 100-TB path but is
    sketch-based, so the exact form is what's oracle-checked."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


AGG_PERCENTILES_SQL = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderstatus
"""


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist — rank-derived exact rationals."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.first("event_id").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("first_id"),
    )


WINDOW_DISTRIBUTION_SQL = """
SELECT user_id, event_id,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pr,
       ROUND(CUME_DIST() OVER w, 6) AS cd,
       FIRST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY value, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS first_id
FROM events
WHERE user_id < 10
WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
"""


def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / nvl2-style conditionals over generated nulls."""
    orders = load_table(spark, sf_dir, "orders")
    maybe_null = F.when(F.col("o_orderstatus") == "P", None).otherwise(
        F.col("o_orderpriority")
    )
    return orders.select(
        "o_orderkey",
        F.coalesce(maybe_null, F.lit("(pending)")).alias("prio_or_default"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_not_o"),
        F.when(maybe_null.isNull(), "missing").otherwise("present").alias(
            "presence"
        ),
    )


SCALAR_NULL_SQL = """
SELECT o_orderkey,
       COALESCE(CASE WHEN o_orderstatus = 'P' THEN NULL
                     ELSE o_orderpriority END, '(pending)') AS prio_or_default,
       NULLIF(o_orderstatus, 'O') AS status_not_o,
       CASE WHEN (CASE WHEN o_orderstatus = 'P' THEN NULL
                       ELSE o_orderpriority END) IS NULL
            THEN 'missing' ELSE 'present' END AS presence
FROM orders
"""


QUERIES = {
    "subquery_in": subquery_in,
    "subquery_exists_correlated": subquery_exists_correlated,
    "subquery_scalar_avg": subquery_scalar_avg,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_orders": q18_large_orders,
    "pivot_status_by_priority": pivot_status_by_priority,
    "agg_statistical": agg_statistical,
    "agg_percentiles": agg_percentiles,
    "window_distribution": window_distribution,
    "scalar_null_handling": scalar_null_handling,
}

ORACLE = {
    "subquery_in": SUBQUERY_IN_SQL,
    "subquery_exists_correlated": SUBQUERY_EXISTS_SQL,
    "subquery_scalar_avg": SUBQUERY_SCALAR_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_orders": Q18_SQL,
    "pivot_status_by_priority": PIVOT_SQL,
    "agg_statistical": AGG_STATISTICAL_SQL,
    "agg_percentiles": AGG_PERCENTILES_SQL,
    "window_distribution": WINDOW_DISTRIBUTION_SQL,
    "scalar_null_handling": SCALAR_NULL_SQL,
}
