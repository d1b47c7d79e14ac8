"""Format-layer queries: distributed per-chunk stats + scheme selection
exposed as a DataFrame (the btrmeta / scheme-plan surface, reference
tools/conversion/btrmeta.cpp + compression/SchemePicker.hpp).

The plan itself runs the numpy scheme picker inside executors via
``applyInPandas`` — not SQL-expressible, so these are rows-only checks
(deterministic, stable schema)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from btrblocks_spark.config import DEFAULT_CONFIG
from btrblocks_spark.queries import register
from btrblocks_spark.tables import load_table


@register("format_scheme_plan")
def format_scheme_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per chunk×column compression plan of lineitem (2048-row chunks at test
    scale). One row per column-chunk: chosen scheme, est ratio, stats."""
    from btrblocks_spark.format.chunker import with_chunk_id
    from btrblocks_spark.format.writer import plan_chunks

    df = load_table(spark, sf_dir, "lineitem")
    cfg = DEFAULT_CONFIG.with_(block_size=2048)
    col_types = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    chunked = with_chunk_id(df, ["l_orderkey", "l_linenumber"], cfg.block_size)
    return (
        plan_chunks(chunked, col_types, cfg)
        .select("chunk", "column", "scheme", "n_rows", "null_count", "unique_count")
        .orderBy("chunk", "column")
    )


@register(
    "scan_predicate_bitmap",
    oracle="""
    WITH idx AS (
      SELECT l_quantity, l_discount,
             row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS _idx
      FROM lineitem
    ), chunked AS (
      SELECT *, CAST(FLOOR(_idx / 2048) AS BIGINT) AS chunk FROM idx
    )
    SELECT chunk,
           count(*) AS n_rows,
           sum(CASE WHEN l_quantity > 30 AND l_discount >= 0.05 THEN 1 ELSE 0 END)
             AS n_selected,
           coalesce(sum(CASE WHEN l_quantity > 30 AND l_discount >= 0.05
                             THEN _idx END), -1) AS sel_idx_sum
    FROM chunked GROUP BY chunk ORDER BY chunk
    """,
)
def scan_predicate_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's unimplemented ``IntegerScheme::scan(Predicate,
    BITMAP*)`` stub (scheme/CompressionScheme.hpp:47), implemented for real:
    a predicate scan producing a per-chunk selection summary (selected count
    + index checksum — the verifiable digest of the selection bitmap).
    Catalyst pushes the predicate into the parquet scan."""
    from btrblocks_spark.format.chunker import with_chunk_id

    df = load_table(spark, sf_dir, "lineitem")
    chunked = with_chunk_id(df, ["l_orderkey", "l_linenumber"], 2048)
    sel = (F.col("l_quantity") > 30) & (F.col("l_discount") >= 0.05)
    return (
        chunked.groupBy(F.col("_chunk").alias("chunk"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(sel, 1).otherwise(0)).alias("n_selected"),
            F.coalesce(F.sum(F.when(sel, F.col("_idx"))), F.lit(-1)).alias("sel_idx_sum"),
        )
        .orderBy("chunk")
    )


@register(
    "point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey IN (7, 1000, 29999, 58368)
    """,
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's unimplemented ``lookup(u32 id)`` stub
    (scheme/CompressionScheme.hpp:45), implemented for real: key lookup via
    an IN filter that Catalyst pushes to the parquet scan (row-group
    min/max skipping — the chunk-stats analog of compressed-domain lookup)."""
    df = load_table(spark, sf_dir, "orders")
    return df.filter(F.col("o_orderkey").isin(7, 1000, 29999, 58368)).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@register(
    "format_chunk_stats",
    oracle="""
    WITH idx AS (
      SELECT l_quantity, l_discount, l_returnflag,
             row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS _idx
      FROM lineitem
    ), chunked AS (
      SELECT *, CAST(FLOOR(_idx / 2048) AS BIGINT) AS chunk FROM idx
    )
    SELECT chunk,
           COUNT(*) AS n_rows,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           COUNT(DISTINCT l_quantity) AS uniq_qty,
           ROUND(SUM(l_discount), 4) AS sum_disc,
           COUNT(DISTINCT l_returnflag) AS uniq_flag
    FROM chunked GROUP BY chunk ORDER BY chunk
    """,
)
def format_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity stats (T1 analog) verified against the oracle: the
    chunker's global index must agree with SQL row_number()."""
    from btrblocks_spark.format.chunker import with_chunk_id

    df = load_table(spark, sf_dir, "lineitem")
    chunked = with_chunk_id(df, ["l_orderkey", "l_linenumber"], 2048)
    return (
        chunked.groupBy(F.col("_chunk").alias("chunk"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.countDistinct("l_quantity").alias("uniq_qty"),
            F.round(F.sum("l_discount"), 4).alias("sum_disc"),
            F.countDistinct("l_returnflag").alias("uniq_flag"),
        )
        .orderBy("chunk")
    )
