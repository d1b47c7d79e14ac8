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
  4. partition-local ordinal + offset as a NARROW ``mapInArrow`` pass over
     the already-sorted persisted partitions (a ``row_number() OVER
     (PARTITION BY _pid)`` window would hash-shuffle and re-sort the whole
     table a second time — Catalyst can't see that the cached layout
     already satisfies the window's distribution).

This is the distributed zipWithIndex pattern; every step is parallel, the
driver state is O(num_partitions), and the full data moves exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.storagelevel import StorageLevel


def _local_ordinal_fn(offsets: dict[int, int], pid_idx: int, index_col: str):
    """mapInArrow kernel: append ``index_col`` = partition offset + local
    ordinal. Rows arrive in the persisted partition's sorted order; the
    partition is identified by its ``_pid`` column (constant per task)."""

    def add_index(batches):
        import pyarrow as pa

        base: int | None = None
        seen = 0
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            if base is None:
                base = offsets[batch.column(pid_idx)[0].as_py()]
            idx = pa.array(range(base + seen, base + seen + n), type=pa.int64())
            arrays = [batch.column(i) for i in range(batch.num_columns)] + [idx]
            names = list(batch.schema.names) + [index_col]
            yield pa.RecordBatch.from_arrays(arrays, names=names)
            seen += n

    return add_index


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
    DISK_ONLY: a disk-backed staging copy (the same cost every deterministic
    distributed zipWithIndex pays). Measured faster than MEMORY_AND_DISK on
    both build and re-read — the in-memory columnar cache encoding costs
    more than it saves for write-once/read-twice staging. Callers release
    it via ``unpersist_index``.
    """
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    part = df.repartitionByRange(num_partitions, *order_keys).sortWithinPartitions(*order_keys)
    part = part.withColumn("_pid", F.spark_partition_id())
    part.persist(StorageLevel.DISK_ONLY)

    counts = {r["_pid"]: r["cnt"] for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    pid_idx = len(part.schema.fields) - 1  # _pid is the last column
    out_schema = StructType(part.schema.fields + [StructField(index_col, LongType(), False)])
    out = part.mapInArrow(
        _local_ordinal_fn(offsets, pid_idx, index_col), out_schema
    ).drop("_pid")
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
