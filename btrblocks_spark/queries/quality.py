"""Data-quality queries: constraint auditing and corpus-diversity profiling.

The reference's own integrity check is block-level round-trip verification
(``tools/conversion/csvtobtr.cpp:49-66``); these queries are the pipeline-
scale generalization — declarative constraints checked in bulk, one output
row per constraint — plus the source-entropy statistic curation jobs use to
balance corpus mixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from btrblocks_spark.queries import register
from btrblocks_spark.tables import load_table


@register(
    "quality_constraint_audit",
    oracle="""
WITH o_agg AS (
  SELECT count(*)::BIGINT AS checked,
    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_null_cust,
    sum(CASE WHEN coalesce(NOT (o_totalprice > 0), TRUE) THEN 1 ELSE 0 END)::BIGINT AS v_price_pos,
    sum(CASE WHEN coalesce(NOT (o_orderstatus IN ('O','F','P')), TRUE) THEN 1 ELSE 0 END)::BIGINT
      AS v_status_dom,
    sum(CASE WHEN coalesce(o_orderdate < DATE '1992-01-01'
               OR o_orderdate > DATE '1998-12-31', TRUE) THEN 1 ELSE 0 END)::BIGINT
      AS v_date_range
  FROM orders
),
l_agg AS (
  SELECT count(*)::BIGINT AS checked,
    sum(CASE WHEN coalesce(NOT (l_quantity BETWEEN 1 AND 50), TRUE) THEN 1 ELSE 0 END)::BIGINT
      AS v_qty,
    sum(CASE WHEN coalesce(NOT (l_discount BETWEEN 0.0 AND 0.1), TRUE) THEN 1 ELSE 0 END)::BIGINT
      AS v_disc,
    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_ship
  FROM lineitem
),
audit AS (
  SELECT 'orders.o_custkey_not_null' AS constraint_name, 'orders' AS tbl,
         checked, v_null_cust AS violations FROM o_agg
  UNION ALL SELECT 'orders.o_totalprice_positive', 'orders', checked, v_price_pos
  FROM o_agg
  UNION ALL SELECT 'orders.o_orderstatus_domain', 'orders', checked, v_status_dom
  FROM o_agg
  UNION ALL SELECT 'orders.o_orderdate_range', 'orders', checked, v_date_range
  FROM o_agg
  UNION ALL SELECT 'lineitem.l_quantity_range', 'lineitem', checked, v_qty
  FROM l_agg
  UNION ALL SELECT 'lineitem.l_discount_range', 'lineitem', checked, v_disc
  FROM l_agg
  UNION ALL SELECT 'lineitem.l_shipdate_not_null', 'lineitem', checked, v_ship
  FROM l_agg
  UNION ALL
  SELECT 'customer.c_custkey_unique', 'customer',
         (SELECT count(*) FROM customer)::BIGINT,
         coalesce((SELECT sum(n - 1) FROM
             (SELECT count(*) AS n FROM customer GROUP BY c_custkey) g
             WHERE n > 1), 0)::BIGINT
  UNION ALL
  SELECT 'lineitem.pk_unique', 'lineitem',
         (SELECT count(*) FROM lineitem)::BIGINT,
         coalesce((SELECT sum(n - 1) FROM
             (SELECT count(*) AS n FROM lineitem
              GROUP BY l_orderkey, l_linenumber) g
             WHERE n > 1), 0)::BIGINT
  UNION ALL
  SELECT 'orders.o_custkey_fk_customer', 'orders',
         (SELECT count(*) FROM orders)::BIGINT,
         (SELECT count(*) FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))::BIGINT
  UNION ALL
  SELECT 'lineitem.l_orderkey_fk_orders', 'lineitem',
         (SELECT count(*) FROM lineitem)::BIGINT,
         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))::BIGINT
)
SELECT constraint_name, tbl, checked, violations,
       violations = 0 AS passed
FROM audit ORDER BY constraint_name
""",
)
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from btrblocks_spark.pipeline.validation import constraint_audit

    return constraint_audit(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "curation_domain_entropy",
    oracle="""
WITH counts AS (
  SELECT lang AS grp, source AS stratum, count(*) AS c
  FROM documents GROUP BY 1, 2
),
t AS (SELECT grp, c, sum(c) OVER (PARTITION BY grp) AS n FROM counts),
terms AS (
  SELECT grp, c, n,
         CAST(round((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS term
  FROM t
)
SELECT grp,
       count(*)::BIGINT AS n_strata,
       sum(c)::BIGINT AS n_docs,
       round(0.0 - CAST(sum(term) AS DOUBLE), 6) AS entropy_nats,
       round(max(c) / CAST(max(n) AS DOUBLE), 6) AS top_share,
       CASE WHEN count(*) > 1
            THEN round(round(0.0 - CAST(sum(term) AS DOUBLE), 6)
                       / ln(CAST(count(*) AS DOUBLE)), 6)
            ELSE 0.0 END AS entropy_norm
FROM terms GROUP BY grp ORDER BY grp
""",
)
def q_domain_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from btrblocks_spark.pipeline.curation import domain_entropy

    return domain_entropy(load_table(spark, sf_dir, "documents"))


_CARD_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

_DATASET_CARD_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, count(*)::BIGINT AS n_rows FROM {t}"
    for t in _CARD_TABLES
) + "\nORDER BY table_name"


@register("quality_dataset_card", _DATASET_CARD_ORACLE)
def quality_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: one row per table with its row count — the catalog
    overview a data consumer reads first (and the cheapest cross-table
    freshness check: any ingest/delete changes a count).

    Scale: ten independent count jobs, each a metadata-cheap scan; at
    100 TB every count comes from format sidecars/footers
    (format_metadata_only_agg shows that path) rather than data reads."""
    parts = None
    for t in _CARD_TABLES:
        row = load_table(spark, sf_dir, t).agg(
            F.count("*").cast("long").alias("n_rows")
        ).select(F.lit(t).alias("table_name"), "n_rows")
        parts = row if parts is None else parts.unionAll(row)
    return parts.orderBy("table_name")


@register(
    "quality_k_anonymity",
    oracle="""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS grp
  FROM customer GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_groups,
       SUM(grp)::BIGINT AS n_rows,
       MIN(grp)::BIGINT AS min_group,
       SUM(CASE WHEN grp < 5 THEN 1 ELSE 0 END)::BIGINT AS n_small_groups,
       SUM(CASE WHEN grp < 5 THEN grp ELSE 0 END)::BIGINT AS n_rows_at_risk,
       round(SUM(CASE WHEN grp < 5 THEN grp ELSE 0 END)
             / CAST(SUM(grp) AS DOUBLE), 6) AS frac_at_risk
FROM g
""",
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nationkey, mktsegment) quasi-identifier:
    how many customers sit in equivalence classes smaller than k=5 — the
    re-identification risk measure a privacy review runs before releasing
    a dataset (rows in small groups need suppression or generalization).

    Scale: one map-side-combinable groupBy on the quasi-identifier, one
    tiny rollup; integer-exact with a single display division."""
    g = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("grp"))
    )
    small = F.when(F.col("grp") < 5, F.col("grp")).otherwise(0)
    return g.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("grp").cast("long").alias("n_rows"),
        F.min("grp").cast("long").alias("min_group"),
        F.sum(F.when(F.col("grp") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_small_groups"),
        F.sum(small).cast("long").alias("n_rows_at_risk"),
        F.round(F.sum(small) / F.sum("grp").cast("double"), 6).alias(
            "frac_at_risk"
        ),
    )
