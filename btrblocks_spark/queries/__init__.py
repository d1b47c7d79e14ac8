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
