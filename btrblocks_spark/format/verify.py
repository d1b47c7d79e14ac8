"""Round-trip verification (reference X3: csvtobtr -verify,
tools/conversion/csvtobtr.cpp:49-66 + null-aware equality
storage/Chunk.cpp:143-231).

Spark formulation: symmetric ``exceptAll`` emptiness + row-count equality —
null-aware by construction (exceptAll treats nulls as equal), and fully
distributed (no driver collect)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from btrblocks_spark.format.reader import read_table


def frames_equal(a: DataFrame, b: DataFrame) -> bool:
    if [f.dataType for f in a.schema.fields] != [f.dataType for f in b.schema.fields]:
        return False
    cols = sorted(a.columns)
    a, b = a.select(cols), b.select(cols)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def round_trip_verify(original: DataFrame, spark: SparkSession, path: str) -> bool:
    """True iff the written table scans back to exactly the original rows."""
    readback, _meta = read_table(spark, path)
    return frames_equal(original.select(*sorted(original.columns)), readback.select(*sorted(readback.columns)))
