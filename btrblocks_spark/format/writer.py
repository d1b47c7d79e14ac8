"""Chunked table writer — the compression pipeline (reference S4/P1-P4,
tools/conversion/csvtobtr.cpp:148-190 + compression/Datablock.cpp:54-148).

Pipeline (all distributed; driver holds only the chunk×column plan, which is
O(num_chunks · num_columns) small rows):

  1. chunk the table: global index over ``order_keys`` → chunk_id
     (storage/Relation.cpp:42-69 analog).
  2. stage: ONE hash shuffle by chunk_id (uniform by construction — equal
     row counts per chunk, no skew), sorted by the global index within
     partitions, persisted. Both the planner and the data write consume this
     staging, so the whole pipeline is exactly two full-data shuffles (index
     + stage) regardless of table size.
  3. plan: ``mapInPandas`` over the staging — streams Arrow batches, holds
     at most one chunk in memory, computes per-column stats (T1/T2) and runs
     the scheme planner on a run-preserving sample. The reference's
     per-column TBB loop becomes Spark tasks; no extra shuffle.
  4. write data as Parquet from the same staging with
     ``maxRecordsPerFile = block_size`` — rows are _idx-sorted within
     partitions and every non-final chunk has exactly block_size rows, so
     files split on exact chunk boundaries (one file ≈ one chunk — the
     ColumnPart sizing analog, storage/Chunk.cpp:233-266), ZSTD pages,
     per-column dictionary on/off driven by the chosen scheme.
  5. write the metadata sidecar ``_btr_metadata.json`` (the btr ``metadata``
     file, compression/Datablock.hpp:23-35): schema, chunking, per
     column-chunk scheme + stats + size estimate.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrblocks_spark.config import DEFAULT_CONFIG, BtrBlocksConfig
from btrblocks_spark.format.chunker import unpersist_index, with_chunk_id
from btrblocks_spark.format.planner import choose_scheme, kind_of

_PLAN_SCHEMA = (
    "chunk long, column string, col_type string, scheme string, est_ratio double, "
    "raw_size long, est_size long, n_rows long, null_count long, unique_count long, "
    "min_repr string, max_repr string, avg_run_length double, is_sorted boolean"
)

# schemes whose physical layout benefits from Parquet dictionary pages
_DICT_SCHEMES = {"dict", "one_value", "rle", "frequency", "truncation"}


def _column_stats_and_plan(col: str, col_type: str, series: pd.Series, config: BtrBlocksConfig):
    kind = kind_of(col_type)
    n = len(series)
    null_mask = series.isna().to_numpy()
    null_count = int(null_mask.sum())
    if kind == "skip":
        return {
            "column": col, "col_type": col_type, "scheme": "skip", "est_ratio": 1.0,
            "raw_size": 0, "est_size": 0, "n_rows": n, "null_count": null_count,
            "unique_count": int(series.nunique()), "min_repr": "", "max_repr": "",
            "avg_run_length": 1.0, "is_sorted": False,
        }
    if kind == "int":
        values = series.fillna(0).to_numpy(dtype=np.int64)
    elif kind == "double":
        values = series.to_numpy(dtype=np.float64)
        values = np.where(null_mask, 0.0, values)
    else:
        values = series.to_numpy(dtype=object)
    mask = ~null_mask

    set_vals = values[mask]
    if len(set_vals) > 1 and kind != "string":
        runs = 1 + int((set_vals[1:] != set_vals[:-1]).sum())
        avg_run = len(set_vals) / runs
        is_sorted = bool(np.all(set_vals[1:] >= set_vals[:-1]))
    else:
        avg_run, is_sorted = float(len(set_vals) or 1), True

    if len(set_vals):
        if kind == "string":
            uniq = len(set(set_vals.tolist()))
            mn, mx = min(set_vals.tolist()), max(set_vals.tolist())
        else:
            uu = np.unique(set_vals)
            uniq, mn, mx = len(uu), uu[0], uu[-1]
    else:
        uniq, mn, mx = 0, "", ""

    plan = choose_scheme(col_type, values, mask, config)
    return {
        "column": col, "col_type": col_type, "scheme": plan["scheme"],
        "est_ratio": float(plan["est_ratio"]), "raw_size": int(plan["raw_size"]),
        "est_size": int(plan["est_size"]), "n_rows": n, "null_count": null_count,
        "unique_count": int(uniq), "min_repr": str(mn), "max_repr": str(mx),
        "avg_run_length": float(avg_run), "is_sorted": is_sorted,
    }


def _plan_pdf(pdf: pd.DataFrame, chunk: int, col_types, config) -> pd.DataFrame:
    rows = []
    for col, col_type in col_types:
        row = _column_stats_and_plan(col, col_type, pdf[col], config)
        row["chunk"] = chunk
        rows.append(row)
    return pd.DataFrame(rows)


def _plan_partition_fn(col_types: list[tuple[str, str]], config: BtrBlocksConfig):
    """mapInPandas kernel: stream Arrow batches of a chunk-staged partition
    (ascending ``_idx`` ⇒ ascending ``_chunk``, each chunk contiguous),
    flushing one chunk's plan at a time — memory stays O(block_size) however
    many chunks a partition holds."""

    def plan_stream(batches):
        buf: list[pd.DataFrame] = []
        cur = None
        for pdf in batches:
            if not len(pdf):
                continue
            for ck, g in pdf.groupby("_chunk", sort=True):
                if cur is None:
                    cur = ck
                elif ck != cur:
                    yield _plan_pdf(pd.concat(buf, ignore_index=True), int(cur), col_types, config)
                    buf, cur = [], ck
                buf.append(g)
        if buf:
            yield _plan_pdf(pd.concat(buf, ignore_index=True), int(cur), col_types, config)

    return plan_stream


def _stage_by_chunk(chunked: DataFrame, num_chunks: int) -> DataFrame:
    """Hash-partition by chunk id (co-locates every chunk whole), sorted by
    the global index within partitions. Partition count is capped so a task
    handles several chunks at large num_chunks (streamed, O(block_size)
    memory) instead of scheduling millions of tiny tasks."""
    spark = chunked.sparkSession
    cap = max(spark.sparkContext.defaultParallelism * 4, 8)
    num_parts = int(max(1, min(num_chunks, cap)))
    return chunked.repartition(num_parts, "_chunk").sortWithinPartitions("_idx")


def plan_chunks(
    chunked: DataFrame,
    col_types: list[tuple[str, str]],
    config: BtrBlocksConfig,
    num_chunks: int | None = None,
) -> DataFrame:
    """Distributed per-chunk stats + scheme selection (one row per
    chunk×column). One hash shuffle by chunk id; planning itself streams
    inside partitions with no further movement."""
    if num_chunks is None:
        total = getattr(chunked, "_btr_total_rows", None)
        num_chunks = (
            (total + config.block_size - 1) // config.block_size if total else 10**9
        )
    staged = _stage_by_chunk(chunked, int(num_chunks))
    return staged.mapInPandas(_plan_partition_fn(col_types, config), _PLAN_SCHEMA)


def write_table(
    df: DataFrame,
    path: str,
    order_keys: list[str],
    config: BtrBlocksConfig = DEFAULT_CONFIG,
    table_name: str | None = None,
) -> dict:
    """Write ``df`` as a chunked, scheme-annotated table. Returns metadata."""
    t0 = time.time()
    spark = df.sparkSession
    col_types = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]

    # with_chunk_id persists the range-partitioned staging frame itself
    # (required for a stable index across jobs — see chunker.py)
    chunked = with_chunk_id(df, order_keys, config.block_size)
    staged = None
    try:
        num_rows = chunked._btr_total_rows  # free byproduct of the offset job
        num_chunks = max((num_rows + config.block_size - 1) // config.block_size, 1)

        # single chunk-staging shuffle, shared by the plan job and the data
        # write (persisted so the second job reads cache, not a re-shuffle;
        # DISK_ONLY — see chunker.py on why it beats the columnar cache)
        from pyspark.storagelevel import StorageLevel

        staged = _stage_by_chunk(chunked, int(num_chunks))
        staged.persist(StorageLevel.DISK_ONLY)
        # _idx is only for ordering the staged write; don't ship it through
        # Arrow to the plan kernel (column-pruned pass, ~8 bytes/row less)
        plan_rows = [
            r.asDict()
            for r in staged.drop("_idx")
            .mapInPandas(_plan_partition_fn(col_types, config), _PLAN_SCHEMA)
            .collect()
        ]

        data_path = os.path.join(path, "data")
        # chunk-aligned layout: rows are _idx-sorted within partitions and
        # every non-final chunk has exactly block_size rows, so
        # maxRecordsPerFile splits files on exact chunk boundaries → one
        # output file ≈ one chunk (the ColumnPart sizing analog)
        writer = (
            staged.drop("_chunk")
            .write.mode("overwrite")
            .option("compression", config.compression_codec)
            .option("maxRecordsPerFile", config.block_size)
        )
        # per-column dictionary toggle from the chosen (majority) scheme
        scheme_by_col: dict[str, dict[str, int]] = {}
        for r in plan_rows:
            scheme_by_col.setdefault(r["column"], {}).setdefault(r["scheme"], 0)
            scheme_by_col[r["column"]][r["scheme"]] += 1
        majority = {
            c: max(counts, key=counts.get) for c, counts in scheme_by_col.items()
        }
        for col, scheme in majority.items():
            writer = writer.option(
                f"parquet.enable.dictionary#{col}", str(scheme in _DICT_SCHEMES).lower()
            )
        # stats-driven bloom filters on the lookup keys: the reader's point
        # lookup (the reference's `lookup` stub, scheme/CompressionScheme.hpp:45)
        # then skips row groups whose bloom rejects the key — the chunk-stats
        # min/max pruning analog for equality on non-sorted keys. Expected NDV
        # comes from the planner's own unique_count stats (T1), so bloom size
        # tracks the actual chunk cardinality instead of parquet's 1M default.
        # Dict-scheme keys are excluded on purpose: their chunks are fully
        # dictionary-encoded, where the dict page already answers membership
        # exactly (and parquet-mr omits blooms for such chunks anyway).
        bloom_cols = {}
        if config.bloom_filter_keys:
            ndv_by_col: dict[str, int] = {}
            for r in plan_rows:
                if (
                    r["column"] in order_keys
                    and r["scheme"] != "skip"
                    and majority.get(r["column"]) not in _DICT_SCHEMES
                ):
                    ndv_by_col[r["column"]] = max(
                        ndv_by_col.get(r["column"], 0), int(r["unique_count"])
                    )
            for col, ndv in ndv_by_col.items():
                bloom_cols[col] = max(ndv, 1)
                writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
                writer = writer.option(
                    f"parquet.bloom.filter.expected.ndv#{col}", str(max(ndv, 1))
                )
        writer.parquet(data_path)
    finally:
        if staged is not None:
            staged.unpersist()
        unpersist_index(chunked)

    columns: dict[str, dict] = {}
    for r in sorted(plan_rows, key=lambda x: (x["column"], x["chunk"])):
        col = r.pop("column")
        columns.setdefault(col, {"type": r["col_type"], "chunks": []})
        columns[col]["chunks"].append({k: v for k, v in r.items() if k != "col_type"})

    total_raw = sum(r["raw_size"] for c in columns.values() for r in c["chunks"])
    total_est = sum(r["est_size"] for c in columns.values() for r in c["chunks"])
    metadata = {
        "format": "btrblocks-spark/v1",
        "table": table_name or os.path.basename(path.rstrip("/")),
        "schema": [{"name": c, "type": t} for c, t in col_types],
        "order_keys": order_keys,
        "block_size": config.block_size,
        "num_rows": num_rows,
        "num_chunks": int(num_chunks),
        "bloom_filters": bloom_cols,
        "columns": columns,
        "totals": {
            "raw_bytes": total_raw,
            "est_compressed_bytes": total_est,
            "est_compression_ratio": round(total_raw / max(total_est, 1), 4),
        },
        "write_seconds": round(time.time() - t0, 3),
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_btr_metadata.json"), "w") as fh:
        json.dump(metadata, fh, indent=1, default=str)
    return metadata
