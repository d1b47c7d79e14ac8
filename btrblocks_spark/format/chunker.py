"""Deterministic chunking — the analog of ``Relation::getRanges``
(reference storage/Relation.cpp:42-69): slice a table into consecutive
``block_size``-row chunks in a stable order.

Scale note (100 TB): a naive ``row_number() OVER (ORDER BY keys)`` is a
single-partition window — a non-starter. We instead compute a *global* index
with per-partition parallelism:

  1. range-partition + sort by the order keys (one shuffle, the same one the
     write needs anyway);
  2. count rows per partition (cheap metadata-sized agg);
  3. cumulative offsets on the driver (one tiny array);
  4. partition-local row_number + broadcast offset.

This is the distributed zipWithIndex pattern; every step is parallel and the
driver state is O(num_partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel


def with_global_index(
    df: DataFrame,
    order_keys: list[str],
    index_col: str = "_idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 0-based dense global row index ordered by ``order_keys``.

    CORRECTNESS: ``repartitionByRange`` samples its range boundaries per job,
    so the partitioning is NOT stable across the counts job and later jobs —
    the partitioned frame must be persisted BEFORE counting, else offsets can
    mismatch the recomputed partitions and produce duplicate indexes.
    MEMORY_AND_DISK: at 100 TB this is a disk-backed staging copy (the same
    cost every deterministic distributed zipWithIndex pays). Callers release
    it via ``unpersist_index``.
    """
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    part = df.repartitionByRange(num_partitions, *order_keys).sortWithinPartitions(*order_keys)
    part = part.withColumn("_pid", F.spark_partition_id())
    part.persist(StorageLevel.MEMORY_AND_DISK)

    counts = {r["_pid"]: r["cnt"] for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    spark = df.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*order_keys)
    out = (
        part.join(offsets_df, "_pid")
        .withColumn(index_col, F.row_number().over(w) + F.col("_offset") - 1)
        .drop("_pid", "_offset")
    )
    out._btr_persisted = part  # release via unpersist_index
    out._btr_total_rows = acc  # row count, free byproduct of the offset job
    return out


def unpersist_index(df: DataFrame) -> None:
    """Release the staging persistence created by ``with_global_index``."""
    persisted = getattr(df, "_btr_persisted", None)
    if persisted is not None:
        persisted.unpersist()


def with_chunk_id(
    df: DataFrame,
    order_keys: list[str],
    block_size: int,
    chunk_col: str = "_chunk",
    index_col: str = "_idx",
) -> DataFrame:
    """Add chunk id = global_index // block_size (SEQUENTIAL split strategy,
    reference storage/Relation.hpp:7)."""
    indexed = with_global_index(df, order_keys, index_col=index_col)
    out = indexed.withColumn(
        chunk_col, F.floor(F.col(index_col) / F.lit(block_size)).cast("long")
    )
    out._btr_persisted = getattr(indexed, "_btr_persisted", None)
    out._btr_total_rows = getattr(indexed, "_btr_total_rows", None)
    return out
