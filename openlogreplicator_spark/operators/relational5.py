"""TPC-H tail — q2/q11/q16/q20/q21 shapes, completing the 22-query suite.

The dataset has no partsupp table, so the four queries that need one run
over a SYNTHESIZED supply relation, declared identically in both engines
(the established q9/q17 adaptation pattern):

    supply(p_partkey, s_suppkey)  iff  (p_partkey + s_suppkey) % 5 = 0
    cost_cents  = (p_partkey * 7 + s_suppkey * 13) % 1000
    avail_qty   = (p_partkey * 3 + s_suppkey) % 100 + 1

All synthetic arithmetic stays in integers (cents / whole quantities) so
value hashes are engine-independent. q21's missing l_commitdate /
l_receiptdate lateness is modeled as l_shipdate > o_orderdate + 60 days,
stated in both engines.

100-TB notes: `supplier`, `part`, `nation`, `region` are dimension-scale
and broadcast; the synthesized supply relation is built ON the broadcast
side (part ⋈ supplier is a broadcast join with a residual modulo
predicate — in a real deployment this is the partsupp table scan and the
note is moot). The only big-table shuffles are the lineitem aggregations
(q20) and the q21 order-grouped existence checks, which run as one
map-side-combined aggregation over l_orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table


def _supply(part: DataFrame, supp: DataFrame) -> DataFrame:
    """The synthesized supply relation: broadcast part ⋈ supplier on the
    modulo-5 residue (an equi-join on a derived key, not a cross join),
    carrying the deterministic cost/availability columns."""
    p = part.withColumn("_r", F.pmod(F.col("p_partkey"), F.lit(5)))
    s = supp.withColumn(
        "_rs", F.pmod(F.lit(5) - F.pmod(F.col("s_suppkey"), F.lit(5)), F.lit(5))
    )
    return (
        p.join(F.broadcast(s), F.col("_r") == F.col("_rs"))
        .drop("_r", "_rs")
        .withColumn(
            "cost_cents",
            F.pmod(
                F.col("p_partkey") * 7 + F.col("s_suppkey") * 13, F.lit(1000)
            ).cast("bigint"),
        )
        .withColumn(
            "avail_qty",
            (
                F.pmod(F.col("p_partkey") * 3 + F.col("s_suppkey"), F.lit(100))
                + 1
            ).cast("bigint"),
        )
    )


_SUPPLY_SQL = """
    SELECT p.*, s.*,
           CAST((p_partkey * 7 + s_suppkey * 13) % 1000 AS BIGINT)
               AS cost_cents,
           CAST((p_partkey * 3 + s_suppkey) % 100 + 1 AS BIGINT)
               AS avail_qty
    FROM part p JOIN supplier s ON (p_partkey + s_suppkey) % 5 = 0
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every EUROPE-supplied part of size ≤ 10,
    the supplier(s) achieving the region-minimum supply cost — the
    correlated-min-subquery pattern, expressed as a window min over the
    part key (one shuffle on p_partkey; every dimension broadcast)."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    sup = (
        _supply(part, supp)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        sup.withColumn("_min_cost", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("_min_cost"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "cost_cents",
        )
    )


Q2_SQL = f"""
WITH supply AS ({_SUPPLY_SQL}),
sup AS (
    SELECT * FROM supply
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size <= 10 AND r_name = 'EUROPE'
)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name,
       n_name AS nation, p_partkey, cost_cents
FROM sup
WHERE cost_cents = (SELECT MIN(s2.cost_cents) FROM sup s2
                    WHERE s2.p_partkey = sup.p_partkey)
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value from AMERICA's suppliers,
    kept only when it exceeds 0.1% of the region's total — the
    scalar-aggregate-subquery pattern (HAVING > fraction of a global
    sum). The global total is a 1-row aggregate broadcast into the
    filter; the per-part aggregation is the only shuffle."""
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    part = load_table(spark, sf_dir, "part")
    sup = (
        _supply(part, supp)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    value = (F.col("cost_cents") * F.col("avail_qty")).cast("bigint")
    per_part = sup.groupBy("p_partkey").agg(
        F.sum(value).alias("value_cents")
    )
    total = sup.agg(F.sum(value).alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("_total"))
        .select("p_partkey", "value_cents")
    )


Q11_SQL = f"""
WITH supply AS ({_SUPPLY_SQL}),
sup AS (
    SELECT * FROM supply
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
)
SELECT p_partkey, CAST(SUM(cost_cents * avail_qty) AS BIGINT) AS value_cents
FROM sup
GROUP BY p_partkey
HAVING SUM(cost_cents * avail_qty) * 1000 >
       (SELECT SUM(cost_cents * avail_qty) FROM sup)
"""


def q16_parts_supplier_relationship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    for non-PROMO parts outside Brand#3, excluding "complaint" suppliers
    (name contains '9' — models the comment LIKE '%Complaints%' NOT IN
    subquery) — the anti-join + count-distinct pattern."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36, 45)
    )
    supp = load_table(spark, sf_dir, "supplier")
    complaints = supp.filter(F.col("s_name").contains("9")).select(
        "s_suppkey"
    )
    sup = _supply(part, supp).join(
        F.broadcast(complaints), "s_suppkey", "left_anti"
    )
    return (
        sup.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("s_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = f"""
WITH supply AS ({_SUPPLY_SQL})
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT s_suppkey) AS supplier_cnt
FROM supply
WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45)
  AND s_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '%9%')
GROUP BY p_brand, p_type, p_size
"""


def q20_potential_part_promotion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape: ASIA suppliers holding surplus stock of a
    'small %' part — avail_qty exceeds half the quantity that
    (part, supplier) shipped during 1996 — the nested-IN-subqueries
    pattern: a correlated aggregate on lineitem joined back to the
    supply relation, then a distinct semi-join up to supplier."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1996
    )
    shipped = li.groupBy(
        F.col("l_partkey").alias("p_partkey"),
        F.col("l_suppkey").alias("s_suppkey"),
        # FLOOR on BOTH sides (r12 review-pass-10): a bare double→bigint
        # cast TRUNCATES in Spark but ROUNDS in DuckDB — identical today
        # only because quantities are whole numbers
    ).agg(
        F.sum(F.floor("l_quantity").cast("bigint")).alias("qty_1996")
    )
    sup = (
        _supply(part, supp)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(shipped, ["p_partkey", "s_suppkey"])
        .filter(F.col("avail_qty") * 2 > F.col("qty_1996"))
    )
    return sup.select("s_suppkey", "s_name").distinct()


Q20_SQL = f"""
WITH supply AS ({_SUPPLY_SQL}),
shipped AS (
    SELECT l_partkey, l_suppkey,
           SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS qty_1996
    FROM lineitem
    WHERE EXTRACT(year FROM l_shipdate) = 1996
    GROUP BY l_partkey, l_suppkey
)
SELECT DISTINCT s_suppkey, s_name
FROM supply
JOIN nation  ON s_nationkey = n_nationkey
JOIN region  ON n_regionkey = r_regionkey
JOIN shipped ON l_partkey = p_partkey AND l_suppkey = s_suppkey
WHERE r_name = 'ASIA' AND p_name LIKE 'small%'
  AND avail_qty * 2 > qty_1996
"""


def q21_suppliers_kept_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 shape: AFRICA suppliers who were the SOLE late
    supplier on a finished multi-supplier order. Lateness is modeled as
    l_shipdate > o_orderdate + 60 days (no l_receiptdate/l_commitdate
    in this dataset; stated in both engines). The two correlated
    EXISTS / NOT EXISTS become one aggregation over l_orderkey
    (per-order supplier/late-supplier distinct counts) joined back to
    the late lines — one lineitem shuffle instead of two self-joins."""
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AFRICA"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    # one distinct layer instead of two countDistincts: pre-aggregate to
    # (order, supplier, had-late-line), then plain counts. Same result;
    # removes the double-distinct Expand AND a fingerprint flap —
    # Catalyst's RewriteDistinctAggregates assigns its gid groups in
    # nondeterministic order for two distinct aggregates, so the
    # optimized plan (and its noise-detector fingerprint) differed run
    # to run (found r10 when only this query's fingerprint moved in a
    # round that never touched it)
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(late.cast("int")).alias("any_late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count(F.when(F.col("any_late") == 1, 1)).alias("n_late"),
    )
    late_lines = (
        # a (order, supplier) pair had a late line ⟺ any_late == 1:
        # exactly the old `li.filter(late).select(...).distinct()` set,
        # but derived from per_pair so lineitem is scanned and exchanged
        # once, not twice
        per_pair.filter(F.col("any_late") == 1)
        .select("l_orderkey", "l_suppkey")
        .join(per_order, "l_orderkey")
        # sole late supplier on a multi-supplier order
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        late_lines.join(
            F.broadcast(
                supp.join(
                    F.broadcast(nat),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).join(
                    F.broadcast(reg),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


Q21_SQL = """
WITH li AS (
    SELECT l.*, o_orderdate,
           l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
    FROM lineitem l
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
),
per_order AS (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
    FROM li GROUP BY l_orderkey
)
SELECT s_name, COUNT(DISTINCT ll.l_orderkey) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE is_late) ll
JOIN per_order USING (l_orderkey)
JOIN supplier ON ll.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE n_supp > 1 AND n_late = 1 AND r_name = 'AFRICA'
GROUP BY s_name
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q16_parts_supplier_relationship": q16_parts_supplier_relationship,
    "q20_potential_part_promotion": q20_potential_part_promotion,
    "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
}

ORACLE = {
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_stock": Q11_SQL,
    "q16_parts_supplier_relationship": Q16_SQL,
    "q20_potential_part_promotion": Q20_SQL,
    "q21_suppliers_kept_waiting": Q21_SQL,
}
