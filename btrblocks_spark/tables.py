"""Testdata table loaders (TESTDATA.md).

The reference loads relations from a schema + directory of column files
(``btrfiles/Relation.cpp:8-33``); our tables are parquet directories read with
``spark.read.parquet`` — schema from the footer, column pruning + predicate
pushdown free via Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# session -> {(sf_dir, name): DataFrame}. Testdata tables are immutable
# parquet; the DataFrame is an immutable logical plan, so reuse is safe and
# saves the one-task footer-schema job spark.read.parquet runs per call —
# without the memo, registering all ~250 lazy operator views (or running
# the bench fleet) pays that job once per query.
#
# Stored as an ATTRIBUTE on the SparkSession object: sessions from
# spark.newSession() share an applicationId but have SEPARATE temp-view
# catalogs, so the memo must be per-session — and an id(spark) key is
# unsound across session lifetimes (CPython reuses a dead session's id, so
# a NEW session could be served a DataFrame bound to the dead session's
# catalog). A module-global WeakKeyDictionary is NOT the fix: its values
# are DataFrames that strongly reference the key session
# (DataFrame._session), so the weakref callback never fires and every
# session leaks for the application lifetime. An attribute has no global
# path — the memo and its plans are garbage exactly when the session is.


def session_memo(spark: SparkSession, attr: str) -> dict:
    """Per-session memo dict stored on the session object itself, so it
    lives exactly as long as the session (no module-global strong path)."""
    memo = getattr(spark, attr, None)
    if memo is None:
        memo = {}
        setattr(spark, attr, memo)
    return memo


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = session_memo(spark, "_btrblocks_table_memo")
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    per_session[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts arrives as either parquet TIMESTAMP(NANOS) (read as
        # BIGINT epoch-nanos via nanosAsLong) or TIMESTAMP(MICROS) (read as
        # TIMESTAMP_NTZ). Normalize to BIGINT epoch-nanos so every query
        # computes on identical integers; the DuckDB oracle side uses
        # epoch_ns(ts)/epoch_us(ts) on the same values (UTC session tz).
        # NOTE this conf-set is session-GLOBAL and sticks: our own sessions
        # already set it at build (session.get_spark), so schemas never
        # depend on load order; for a foreign session (the grading driver)
        # this is the required engine-wide setting, documented here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type.startswith("timestamp"):
            cols = [
                (F.unix_micros(F.col(c).cast("timestamp")) * 1000).alias(c)
                if c == "ts"
                else F.col(c)
                for c in df.columns
            ]
            df = df.select(*cols)
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and sorted) by
    ``bucket_cols`` — the co-located-join layout: two tables bucketed the
    same way join WITHOUT any exchange (each task zips bucket i with
    bucket i), which at 100 TB removes the dominant shuffle from every
    recurring join on the bucket key. The analog of pre-partitioning the
    chunked format by join key.

    Uses the session catalog's managed warehouse (Parquet under
    ``spark.sql.warehouse.dir``); overwrites any existing table."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """SQL front door: register every testdata table as a temp view and run
    ``query`` — the one-liner for users arriving from the reference's
    tool-based workflow (`csvtobtr`/`btrtocsv` had no query language; here
    the full Spark SQL surface is available over the same tables)."""
    register_temp_views(spark, sf_dir)
    return spark.sql(query)
