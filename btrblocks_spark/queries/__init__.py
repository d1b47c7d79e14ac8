"""Query registry: every declared operator from SURVEY.md §2 gets a named
query (spark, sf_dir) -> DataFrame and (where SQL-expressible) a DuckDB
oracle SQL string with identical column names and deterministic values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # import for registration side effects
    from btrblocks_spark.queries import (  # noqa: F401
        events_queries,
        extras,
        format_queries,
        pipeline_queries,
        quality,
        relational,
        stats,
        tpch_more,
        tpch_queries,
    )


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(ORACLE)


def register_query_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Expose every registered operator as a SQL temp view, so the whole
    engine surface is reachable from plain ``spark.sql``:

        register_query_views(spark, "/data/sf0.1")
        spark.sql("SELECT * FROM text_source_divergence ORDER BY source")

    Views are LAZY DataFrames — nothing executes until queried, and
    Catalyst fuses any outer SQL (filters, projections, joins over the
    view) into the operator's own plan, so view-wrapped operators compose
    without materialization. Base tables are registered too (same names the
    oracle layer uses). Returns the registered view names."""
    from btrblocks_spark.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    queries = all_queries()
    todo = names if names is not None else sorted(queries)
    out = []
    for name in todo:
        queries[name](spark, sf_dir).createOrReplaceTempView(name)
        out.append(name)
    return out
