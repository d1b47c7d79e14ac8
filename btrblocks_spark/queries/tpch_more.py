"""Remaining TPC-H-style analogs (Q2/Q7/Q8/Q9/Q11/Q13/Q16/Q17/Q19/Q20/Q21)
adapted to the testdata schema: lineitem stands in for partsupp (it carries
l_partkey x l_suppkey), and predicates use the generator's actual value
domains (NATION_0..24, Brand#1..25, single-word p_type, p_size 1..50,
integer-valued l_quantity 1..50).

Determinism rules (see relational._xsum / memory notes):
- money sums go through scaled-long (round(x*10000) -> BIGINT sum) so
  accumulation order can't differ between Spark and DuckDB;
- ratio outputs divide one double by another only after each side is a
  fully-determined double;
- threshold comparisons (Q11) are pure integer compares on the scaled sums;
- quantity sums/averages are exact (integer-valued doubles < 2^53).

Scale notes: every dimension side is broadcast; the only shuffles are fact
aggregations on their group keys. Q21's correlated EXISTS/NOT EXISTS pair is
rewritten as one per-order aggregate (distinct-supplier counts) + a
broadcast join — no per-row subquery probes, survives 100x data.

Reference parity: the reference has no SQL layer (SURVEY.md §2b — declared
query surface); these exercise the operator set its relations imply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from btrblocks_spark.queries import register
from btrblocks_spark.tables import load_table

_REV_X_SQL = "CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)"


def _rev_x():
    return F.round(
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))) * 10000
    ).cast("long")


@register(
    "q2_min_price_supplier",
    oracle="""
SELECT partkey, sname, price FROM (
  SELECT p.p_partkey AS partkey, s.s_name AS sname,
         l.l_extendedprice / nullif(l.l_quantity, 0) AS price,
         row_number() OVER (
             PARTITION BY p.p_partkey
             ORDER BY l.l_extendedprice / nullif(l.l_quantity, 0) NULLS LAST, s.s_suppkey,
                      l.l_orderkey, l.l_linenumber) AS rn
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE p.p_size = 15
) t WHERE rn = 1
ORDER BY partkey
""",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: per part, the supplier quoting the minimum unit price
    (lineitem as the partsupp stand-in). Correlated-min rewritten as one
    row_number window; full tie-break chain makes row choice deterministic."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_quantity",
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    price = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")).alias("price")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .select(F.col("p_partkey").alias("partkey"), F.col("s_name").alias("sname"), price,
                "s_suppkey", "l_orderkey", "l_linenumber")
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("partkey").orderBy(
                F.asc_nulls_last("price"), "s_suppkey", "l_orderkey", "l_linenumber")))
        .filter(F.col("rn") == 1)
        .select("partkey", "sname", "price")
        .orderBy("partkey")
    )


@register(
    "q7_nation_trade",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
       SUM({_REV_X_SQL}) / 10000.0 AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: bilateral trade volume between two nations by year.
    Both nation joins broadcast; the disjunctive pair predicate runs after
    them, on already-reduced rows."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(_rev_x()) / F.lit(10000.0)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       (SUM(CASE WHEN n1.n_name = 'NATION_5' THEN {_REV_X_SQL} ELSE 0 END) / 10000.0)
       / nullif(SUM({_REV_X_SQL}) / 10000.0, 0.0) AS mkt_share,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n2.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: NATION_5 suppliers' share of PROMO-part revenue sold
    to ASIA customers, per year. Share = double / double, each side an exact
    scaled-long sum, so cross-engine bits match."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_x()
    nation_rev = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0).cast("long"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.try_divide(
                F.sum(nation_rev) / F.lit(10000.0),
                F.sum(rev) / F.lit(10000.0),
            ).alias("mkt_share"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       SUM({_REV_X_SQL}) / 10000.0 AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog: profit on '%gear%' parts by supplier nation and year
    (no ps_supplycost in the testdata, so profit = discounted revenue)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(_rev_x()) / F.lit(10000.0)).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q11_important_parts",
    oracle=f"""
SELECT l.l_partkey AS partkey, SUM({_REV_X_SQL}) / 10000.0 AS total_value
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
GROUP BY l.l_partkey
HAVING SUM({_REV_X_SQL}) * 400 > (
    SELECT SUM(CAST(round(l2.l_extendedprice * (1 - l2.l_discount) * 10000) AS BIGINT))
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation nn ON nn.n_nationkey = s2.s_nationkey
    WHERE nn.n_name = 'NATION_3')
ORDER BY total_value DESC, partkey
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: parts whose NATION_3-supplied value exceeds 1/400 of
    the nation total. The HAVING threshold is a pure BIGINT compare
    (sum*400 > total) — no float boundary. The grouped frame is referenced
    twice in one plan (groups + total) so Spark reuses the exchange instead
    of rescanning lineitem."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    grouped = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_rev_x()).alias("value_x"))
    )
    total = grouped.agg(F.sum("value_x").alias("total_x"))
    return (
        grouped.join(F.broadcast(total))
        .filter(F.col("value_x") * 400 > F.col("total_x"))
        .select("partkey", (F.col("value_x") / F.lit(10000.0)).alias("total_value"))
        .orderBy(F.desc("total_value"), F.asc("partkey"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: distribution of non-urgent order counts per customer
    — left outer join with an ON-clause filter (keeps order-less customers),
    then a second, tiny aggregation over the counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY brand, type, size
ORDER BY supplier_cnt DESC, brand, type, size
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: distinct suppliers per (brand, type, size) with a
    NOT IN exclusion subquery → broadcast left-anti join (s_suppkey is
    non-null, so NOT IN == anti-join semantics)."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "type", "size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT SUM(CAST(round(l.l_extendedprice * 10000) AS BIGINT)) / 10000.0 / 7.0 AS avg_yearly,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_type = 'MEDIUM'
  AND l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey)
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: revenue from below-half-average-quantity lines.
    Correlated scalar avg → one per-part aggregate + broadcast join.
    l_quantity is integer-valued so avg = exact-sum / count is bit-identical
    across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    part_avg = (
        l.groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg(F.avg("l_quantity").alias("avg_qty"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(part_avg), F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            (F.sum(F.round(F.col("l_extendedprice") * 10000).cast("long"))
             / F.lit(10000.0) / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q19_disjunctive_filter",
    oracle=f"""
SELECT SUM({_REV_X_SQL}) / 10000.0 AS revenue, count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: three OR'd brand/size/quantity branches across the
    join — the mixed-predicate disjunction Catalyst must split into a
    pushable part-side filter (brand IN ...) plus a post-join residual."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            (F.sum(_rev_x()) / F.lit(10000.0)).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q20_excess_suppliers",
    oracle="""
SELECT s.s_name AS name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
  AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey
      HAVING SUM(l.l_quantity) > 50)
ORDER BY name
""",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: suppliers in three nations who shipped > 50 units of
    'small%' parts in 1997 — IN(grouped-HAVING subquery) → aggregate once,
    broadcast left-semi join."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_name").alias("name"), F.col("n_name").alias("nation"))
        .orderBy("name")
    )


@register(
    "q21_sole_failing_supplier",
    oracle="""
SELECT s.s_name AS name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, name
LIMIT 25
""",
)
def q21_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: suppliers who were the *only* supplier returning
    goods ('R') on a multi-supplier finished order. The EXISTS / NOT EXISTS
    pair is rewritten without correlated probes as a two-level aggregation:
    level 1 groups lineitem by (order, supplier) counting that supplier's R
    lines; level 2 rolls up per order (supplier count, R-supplier count, the
    sole R supplier and its R-line count). EXISTS(other supplier) ==
    n_supp >= 2; NOT EXISTS(other R supplier) == n_r_supp == 1, in which
    case max(R supplier) IS the line's supplier — so the raw R-lines never
    need re-joining, and no countDistinct expand doubles the shuffle. One
    shuffle of lineitem on (orderkey, suppkey); everything after is
    order-cardinality or broadcast."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    per_supp = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("l_returnflag") == "R", F.lit(1))).alias("n_r_lines")
    )
    has_r = F.col("n_r_lines") > 0
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(has_r.cast("int")).alias("n_r_supp"),
        F.max(F.when(has_r, F.col("l_suppkey"))).alias("r_suppkey"),
        F.sum(F.when(has_r, F.col("n_r_lines"))).alias("r_line_cnt"),
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("r_suppkey") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.sum("r_line_cnt").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("name"))
        .limit(25)
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
SELECT l.l_returnflag AS returnflag,
       count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
GROUP BY returnflag
ORDER BY returnflag
""",
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog: order-priority class counts per shipping category.
    The testdata has no l_shipmode/l_commitdate/l_receiptdate, so
    l_returnflag stands in for the ship mode and "shipped >= 60 days after
    the order date" stands in for the late-delivery predicate. The year
    filter is pushed to the lineitem scan; the lateness predicate needs both
    sides so it runs right after the join, before aggregation. One fact-fact
    equi-join on orderkey, then a 3-group aggregation — count(when) avoids a
    second pass. Reference parity: SURVEY.md §2b filter/join/agg surface."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
        .orderBy("returnflag")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l.l_suppkey AS suppkey, SUM({_REV_X_SQL}) AS rev_x
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY suppkey)
SELECT s.s_suppkey AS suppkey, s.s_name AS sname,
       r.rev_x / 10000.0 AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.suppkey
WHERE r.rev_x = (SELECT max(rev_x) FROM revenue)
ORDER BY suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog: supplier(s) with the maximum quarterly revenue.
    The scalar max-revenue subquery is a broadcast join of a 1-row aggregate
    against the (supplier-cardinality) revenue aggregate — no second scan of
    lineitem, no window over a single partition. The max-equality compare
    happens on the scaled-long revenue (exact integers), so "ties with the
    max" is deterministic across engines. One shuffle of filtered lineitem
    on suppkey; everything downstream is supplier-cardinality."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_rev_x()).alias("rev_x")
    )
    mx = rev.agg(F.max("rev_x").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("rev_x") == F.col("mx"))
        .join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "suppkey",
            F.col("s_name").alias("sname"),
            (F.col("rev_x") / 10000.0).alias("total_revenue"),
        )
        .orderBy("suppkey")
    )


@register(
    "q22_dormant_customers",
    oracle="""
WITH bal AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_x
  FROM customer
  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
thresh AS (
  SELECT SUM(bal_x) AS total_x, COUNT(*) AS n FROM bal WHERE bal_x > 0),
ord_cnt AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
SELECT b.c_nationkey AS cntrycode,
       count(*) AS numcust,
       SUM(b.bal_x) / 100.0 AS totacctbal
FROM bal b
CROSS JOIN thresh t
LEFT JOIN ord_cnt f ON f.o_custkey = b.c_custkey
WHERE b.bal_x * t.n > t.total_x
  AND COALESCE(f.n_orders, 0) < 5
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: wealthy-but-dormant customers per country code.
    Adaptations to the testdata schema: c_nationkey stands in for the phone
    country code; "no orders at all" (empty in this generator — every
    customer has orders) becomes "fewer than 5 orders". The
    above-average-balance threshold avoids double averaging entirely:
    compare bal_x * n > total_x on scaled-long cents — exact integer
    cross-multiplication, deterministic in both engines. The 1-row
    threshold aggregate joins back via broadcast (BroadcastNestedLoopJoin,
    not a cartesian); the order-count side shuffles orders once on custkey
    at order cardinality. Reference parity: SURVEY.md §2b agg + anti-ish
    pattern."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_x"),
    )
    thresh = c.filter(F.col("bal_x") > 0).agg(
        F.sum("bal_x").alias("total_x"), F.count("*").alias("n")
    )
    ord_cnt = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("bal_x") * F.col("n") > F.col("total_x"))
        .join(ord_cnt, F.col("c_custkey") == F.col("o_custkey"), "left")
        .filter(F.coalesce(F.col("n_orders"), F.lit(0)) < 5)
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_x") / 100.0).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "part_supplier_hhi",
    oracle="""
WITH sq AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem GROUP BY 1, 2
),
tot AS (
  SELECT pk, SUM(q) AS qt, SUM(q * q) AS sq2, count(*) AS n_suppliers
  FROM sq GROUP BY pk
)
SELECT pk AS partkey, n_suppliers::BIGINT AS n_suppliers, qt::BIGINT AS total_qty,
       round(sq2 / nullif(CAST(qt AS DOUBLE) * CAST(qt AS DOUBLE), 0.0), 6) AS hhi
FROM tot
WHERE n_suppliers >= 2
ORDER BY hhi DESC, partkey
LIMIT 15
""",
)
def part_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration index per part: the Herfindahl-Hirschman index
    of supplier quantity shares, HHI = Σ(qᵢ/Q)² = Σqᵢ²/Q² — the
    sourcing-risk metric (1.0 = single supplier; 1/n = evenly split).
    Top-15 most concentrated multi-supplier parts.

    Exactness: quantities are integers, so Σqᵢ² and Q² are exact; ONE
    double division per part at the end. Two map-side-combinable rollups
    ((part, supplier) then part), top-k via TakeOrderedAndProject."""
    sq = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    tot = sq.groupBy("pk").agg(
        F.sum("q").alias("qt"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
        F.count("*").alias("n_suppliers"),
    )
    return (
        tot.filter(F.col("n_suppliers") >= 2)
        .select(
            F.col("pk").alias("partkey"),
            F.col("n_suppliers").cast("long"),
            F.col("qt").cast("long").alias("total_qty"),
            F.round(
                F.try_divide(
                    F.col("sq2").cast("double"),
                    F.col("qt").cast("double") * F.col("qt").cast("double"),
                ),
                6,
            ).alias("hhi"),
        )
        .orderBy(F.desc("hhi"), "partkey")
        .limit(15)
    )
