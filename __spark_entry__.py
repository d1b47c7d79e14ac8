"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H Q1-style pricing summary) at
  sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 as
  (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (omitted for genuinely
  non-SQL-expressible ops — those get the rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from btrblocks_spark.queries import all_queries

    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from btrblocks_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from btrblocks_spark.queries import all_oracles

    return all_oracles()
