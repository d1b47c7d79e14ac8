"""TPC-H-style multi-join analytics over the testdata star schema — the
"queries a reference user runs today" layer: shipping priority (Q3-like),
local supplier volume (Q5-like), returned-item customer revenue (Q10-like).

Determinism: money sums use the scaled-long pattern (relational._xsum):
round(x * 10000) is the same IEEE multiply + round in both engines, the
long sum is exact/associative, one final double division — ~2x faster than
decimal-cast sums. Broadcast hints on every dimension; fact tables shuffle only on
join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from btrblocks_spark.queries import register
from btrblocks_spark.queries.tpch_more import _rev_x
from btrblocks_spark.tables import load_table

_REVENUE_X = "SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0"


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey AS orderkey,
       {_REVENUE_X.replace('l_extendedprice', 'l.l_extendedprice').replace('(1 - l_discount)', '(1 - l.l_discount)')} AS revenue,
       o.o_orderdate AS orderdate,
       o.o_orderpriority AS priority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-01'
  AND l.l_shipdate > TIMESTAMP '1997-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 20
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: top-20 unshipped orders by revenue for a segment."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    revenue_x = _rev_x()
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg((F.sum(revenue_x) / F.lit(10000.0)).alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "priority")
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(20)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0
         AS revenue,
       count(*) AS n_lineitems
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: revenue where supplier and customer share a nation
    within one region — the 6-way join with a two-column join condition."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue_x = _rev_x()
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == F.col("n_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            (F.sum(revenue_x) / F.lit(10000.0)).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT SUM(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) / 10000.0 AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure filter + global agg — the query whose whole cost
    is the scan, so pushdown quality is directly visible in the plan."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(F.round((F.col("l_extendedprice") * F.col("l_discount")) * 10000).cast("long"))
             / F.lit(10000.0)).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o.o_orderpriority AS priority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
ORDER BY priority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: correlated EXISTS → left-semi join (equi key plus a
    non-equi residual l_shipdate > o_orderdate), then small agg.

    The testdata lineitem has no commitdate/receiptdate (TESTDATA.md), so the
    "late line" predicate is shipdate-after-order-date."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("order_count"))
        .orderBy("priority")
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT 100.0 * ((SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
                 ELSE 0 END) / 10000.0)
            / nullif(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0, 0.0))
       AS promo_pct,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-06-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: broadcast dim join + conditional aggregate ratio."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-06-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_x = _rev_x()
    promo_x = F.when(F.col("p_type").like("PROMO%"), rev_x).otherwise(F.lit(0).cast("long"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            # all-zero window revenue: denominator 0 → NULL pct on both
            # engines (nullif in the oracle), never an ANSI abort
            (F.lit(100.0) * F.try_divide(
                F.sum(promo_x) / F.lit(10000.0),
                F.sum(rev_x) / F.lit(10000.0),
            )).alias("promo_pct"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
       o.o_orderdate AS orderdate, o.o_totalprice AS totalprice,
       CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, orderkey
LIMIT 20
""",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: IN (grouped HAVING subquery) → aggregate once, then
    semi-join the fact on the qualifying keys; customers broadcast."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey")
    )
    return (
        l.join(F.broadcast(big.withColumnRenamed("l_orderkey", "big_key")),
               F.col("l_orderkey") == F.col("big_key"), "inner")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(20)
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey AS custkey,
       c.c_name AS name,
       SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0
         AS revenue,
       n.n_name AS nation,
       CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: top-20 customers by revenue lost to returns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue_x = _rev_x()
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg((F.sum(revenue_x) / F.lit(10000.0)).alias("revenue"))
        .select("custkey", "name", "revenue", "nation", "acctbal")
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )
