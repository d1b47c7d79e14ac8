"""Small-file compaction — the maintenance op that closes the loop between
the streaming append sink (streaming/ops.chunked_append, many per-microbatch
files) and the chunk-aligned table layout the writer produces.

The reference packs compressed chunks into ≥16 MiB ColumnPart files at write
time (storage/Chunk.cpp:233-266) and never appends, so it needs no
compaction; a streaming lakehouse ingest does. Compaction here is simply a
re-run of the chunked writer over the accumulated small files: one staging
shuffle, fresh per-chunk scheme planning (data distribution may have drifted
since the files were written), block_size-aligned output, new metadata
sidecar.

Scale: the rewrite is a full scan + one shuffle of the compacted partition —
at 100 TB you compact per partition/day, not per table, and the operation is
embarrassingly parallel across partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from btrblocks_spark.config import DEFAULT_CONFIG, BtrBlocksConfig
from btrblocks_spark.format.writer import write_table


# Spark-visible listing (underscore/hidden components excluded): the
# input_files stat must count exactly the files the read compacts — a raw
# os.walk would count staged-but-uncommitted batch files under
# _stream_stage/ that the Spark read skips, overstating the stat and
# tempting an operator to delete rows that were never rewritten.
from btrblocks_spark.format.fs import list_parquet_files as _parquet_files


def compact_table(
    spark: SparkSession,
    src_dir: str,
    dest_path: str,
    order_keys: list[str],
    config: BtrBlocksConfig = DEFAULT_CONFIG,
    table_name: str | None = None,
) -> dict:
    """Rewrite a directory of (small) parquet files as one chunk-aligned,
    scheme-annotated table at ``dest_path``. Returns the writer metadata
    plus a ``compaction`` section with the file-count delta."""
    n_in = len(_parquet_files(src_dir))
    df = spark.read.parquet(src_dir)
    meta = write_table(df, dest_path, order_keys, config=config, table_name=table_name)
    n_out = len(_parquet_files(os.path.join(dest_path, "data")))
    meta["compaction"] = {
        "source": src_dir,
        "input_files": n_in,
        "output_files": n_out,
    }
    return meta
