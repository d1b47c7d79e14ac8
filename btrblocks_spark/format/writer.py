"""Chunked table writer — the compression pipeline (reference S4/P1-P4,
tools/conversion/csvtobtr.cpp:148-190 + compression/Datablock.cpp:54-148).

Pipeline (all distributed; driver holds only the chunk×column plan, which is
O(num_chunks · num_columns) small rows):

  1. chunk the table: global index over ``order_keys`` → chunk_id
     (storage/Relation.cpp:42-69 analog).
  2. per (chunk) group, inside executors via ``applyInPandas``: compute
     per-column stats (T1/T2) and run the scheme planner on a run-preserving
     sample — the reference's per-column TBB loop becomes Spark tasks.
  3. write data as Parquet sorted by the global index with
     ``maxRecordsPerFile = block_size`` (one file ≈ one chunk — the
     ColumnPart sizing analog, storage/Chunk.cpp:233-266), ZSTD pages,
     per-column dictionary on/off driven by the chosen scheme.
  4. write the metadata sidecar ``_btr_metadata.json`` (the btr ``metadata``
     file, compression/Datablock.hpp:23-35): schema, chunking, per
     column-chunk scheme + stats + size estimate.

At 100 TB: step 2's shuffle is by chunk_id (uniform by construction — equal
row counts per chunk, no skew); step 3 reuses the same range partitioning, so
the table is written with exactly one shuffle.
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


def plan_chunks(chunked: DataFrame, col_types: list[tuple[str, str]], config: BtrBlocksConfig) -> DataFrame:
    """Distributed per-chunk stats + scheme selection (one row per
    chunk×column)."""

    def plan_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_idx")
        chunk = int(pdf["_chunk"].iloc[0])
        rows = []
        for col, col_type in col_types:
            row = _column_stats_and_plan(col, col_type, pdf[col], config)
            row["chunk"] = chunk
            rows.append(row)
        return pd.DataFrame(rows)

    return chunked.groupBy("_chunk").applyInPandas(plan_one, _PLAN_SCHEMA)


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
    try:
        num_rows = chunked._btr_total_rows  # free byproduct of the offset job
        num_chunks = max((num_rows + config.block_size - 1) // config.block_size, 1)
        plan_rows = [r.asDict() for r in plan_chunks(chunked, col_types, config).collect()]

        data_path = os.path.join(path, "data")
        # chunk-aligned layout: one range partition per chunk, sorted by the
        # global index → one output file ≈ one chunk (the ColumnPart sizing
        # analog); maxRecordsPerFile caps stragglers if range sampling merges
        # adjacent chunks into one partition
        writer = (
            chunked.repartitionByRange(int(num_chunks), "_chunk", "_idx")
            .sortWithinPartitions("_idx")
            .drop("_chunk")
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
        writer.parquet(data_path)
    finally:
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
