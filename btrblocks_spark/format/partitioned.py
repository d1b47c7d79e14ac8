"""Hive-style partitioned table layout — the coarse pruning layer ABOVE
chunk skipping.

The reference prunes I/O per column file (``btrfiles/Relation.cpp:23`` type
filter; per-column part files); our format adds chunk-stats skipping
(``format/reader.prune_chunks``). At 100 TB the first and cheapest pruning
level is directory partitioning: a `p_col=value/` layout lets Spark's
catalog eliminate whole directories at PLANNING time (static partition
pruning) or at RUNTIME from a joined dimension's filter (dynamic partition
pruning) — no footer, no row group, not even a file listing for pruned
partitions.

Guidance encoded here: partition by a LOW-cardinality, query-aligned key
(date grain: one dir per day ≈ 2.7 GB/day at 1 TB/yr; never a high-card
key — millions of dirs kill the listing). Chunked files nest INSIDE each
partition dir, so both pruning layers compose: partition dirs → chunk
stats → parquet row groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, expr: Column
) -> None:
    """Write ``df`` hive-partitioned by ``partition_col = expr``.

    One directory per distinct value; within a partition, files keep the
    writer's natural task parallelism. ``maxRecordsPerFile`` caps file size
    so a hot partition still splits into parallel scan tasks.
    """
    (
        df.withColumn(partition_col, expr)
        # co-locate each partition's rows before the write: without this,
        # every write task emits a file into every partition dir (tasks ×
        # partitions small files — the classic 100 TB small-file explosion)
        .repartition(partition_col)
        .write.option("maxRecordsPerFile", 1_000_000)
        .partitionBy(partition_col)
        .mode("overwrite")
        .parquet(path)
    )
