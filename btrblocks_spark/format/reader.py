"""Chunked table reader + metadata inspection (reference S5/S8:
compression/BtrReader.cpp:31-121, tools/conversion/btrmeta.cpp).

The scan itself is a Parquet scan (vectorized, JVM-side, with predicate
pushdown and column pruning from Catalyst); the metadata sidecar adds the
scheme/stats lineage per column chunk and supports chunk-granularity column
reads (the ``readColumn(chunk_i)`` analog)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_metadata(path: str) -> dict:
    with open(os.path.join(path, "_btr_metadata.json")) as fh:
        return json.load(fh)


def read_table(spark: SparkSession, path: str, with_index: bool = False):
    """Scan the chunked table. Returns (DataFrame, metadata)."""
    meta = read_metadata(path)
    df = spark.read.parquet(os.path.join(path, "data"))
    if not with_index:
        df = df.drop("_idx")
    return df, meta


def read_column_chunk(spark: SparkSession, path: str, column: str, chunk: int) -> DataFrame:
    """Read one column of one chunk — the ``BtrReader::readColumn`` analog
    (compression/BtrReader.cpp:31-74). Parquet row-group pruning on the _idx
    range keeps this an O(chunk) read, not a table scan."""
    meta = read_metadata(path)
    bs = meta["block_size"]
    lo, hi = chunk * bs, (chunk + 1) * bs
    df = spark.read.parquet(os.path.join(path, "data"))
    return df.filter((F.col("_idx") >= lo) & (F.col("_idx") < hi)).select("_idx", column)


def scheme_summary(spark: SparkSession, path: str) -> DataFrame:
    """btrmeta analog: one row per column×chunk with scheme + stats + sizes
    (tools/conversion/btrmeta.cpp:22-60, BtrReader::getSchemeDescription)."""
    meta = read_metadata(path)
    rows = []
    for col, info in meta["columns"].items():
        for ch in info["chunks"]:
            rows.append(
                (
                    col,
                    info["type"],
                    ch["chunk"],
                    ch["scheme"],
                    float(ch["est_ratio"]),
                    ch["raw_size"],
                    ch["est_size"],
                    ch["n_rows"],
                    ch["null_count"],
                    ch["unique_count"],
                )
            )
    return spark.createDataFrame(
        rows,
        "column string, col_type string, chunk long, scheme string, est_ratio double, "
        "raw_size long, est_size long, n_rows long, null_count long, unique_count long",
    )
