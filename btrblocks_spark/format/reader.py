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

from btrblocks_spark.format import fs as _fs


def _repair_pending_journals(path: str) -> None:
    """Read-path crash repair: a compaction (or COPY INTO) that died between
    its journal commit point and the apply leaves adopted files coexisting
    with the fragments they replace — every reader would see duplicate rows
    for an unbounded interval if repair only ran at the NEXT maintenance
    call. So the metadata read (the front door of every scan) finishes a
    pending journal first, under the table's commit lock. The existence
    check is two stats — free on the no-journal fast path; non-local URIs
    skip (journal applies are os-level renames)."""
    if "://" in str(path):
        return
    has_journal = os.path.exists(
        os.path.join(path, "_compact_journal.json")
    ) or os.path.exists(os.path.join(path, "_copy_journal.json"))
    if not has_journal:
        return
    from btrblocks_spark.format.maintenance import (
        _apply_compact_journal,
        commit_lock,
    )
    from btrblocks_spark.sources.copy_into import _apply_copy_journal

    with commit_lock(path):  # re-checks inside: appliers no-op if gone
        _apply_compact_journal(path)
        _apply_copy_journal(path)


def read_metadata(path: str, spark: SparkSession | None = None) -> dict:
    """Sidecar read. Local paths use plain ``open``; URI paths
    (``s3a://…``, ``file://…``) go through the Hadoop FileSystem client
    (format/fs.py — the S7 object-store path, decompression-speed-s3.cpp:37+),
    which needs the session's Hadoop conf, hence the optional ``spark``.
    Applies any pending compact/copy journal first (crash repair) so a
    reader never serves the duplicate-row window a crashed maintenance op
    left behind."""
    _repair_pending_journals(path)
    return _fs.read_json(_fs.join(path, "_btr_metadata.json"), spark)


def read_table(spark: SparkSession, path: str, with_index: bool = False):
    """Scan the chunked table. Returns (DataFrame, metadata)."""
    meta = read_metadata(path, spark)
    df = spark.read.parquet(_fs.join(path, "data"))
    if not with_index:
        df = df.drop("_idx")
    return df, meta


def read_column_chunk(spark: SparkSession, path: str, column: str, chunk: int) -> DataFrame:
    """Read one column of one chunk — the ``BtrReader::readColumn`` analog
    (compression/BtrReader.cpp:31-74). Parquet row-group pruning on the _idx
    range keeps this an O(chunk) read, not a table scan."""
    meta = read_metadata(path, spark)
    bs = meta["block_size"]
    lo, hi = chunk * bs, (chunk + 1) * bs
    df = spark.read.parquet(_fs.join(path, "data"))
    return df.filter((F.col("_idx") >= lo) & (F.col("_idx") < hi)).select("_idx", column)


def prune_chunks(meta: dict, column: str, lo=None, hi=None) -> list[int]:
    """Chunk ids whose [min, max] stats range intersects [lo, hi] — the
    driver-side half of stats-based data skipping (SURVEY §4.1: our T1 chunk
    stats feeding row-group-skipping, the reference's implied use of
    per-chunk min/max). O(num_chunks) sidecar rows, no data read.

    Chunks with any nulls are kept when the bound check can't exclude them
    (a null row never matches a range predicate, but the chunk may hold
    non-null matches — min/max already exclude nulls, so no correction is
    needed beyond empty-chunk handling)."""
    info = meta["columns"][column]
    kind = info["type"]
    if kind in ("double", "float"):
        cast = float
    elif kind == "string":
        cast = str  # lexicographic zone maps (BETWEEN/prefix predicates)
    else:
        cast = int
    keep = []
    for ch in info["chunks"]:
        if ch["n_rows"] == ch["null_count"]:  # all-null chunk: no match possible
            continue
        mn, mx = cast(ch["min_repr"]), cast(ch["max_repr"])
        if (lo is None or mx >= lo) and (hi is None or mn <= hi):
            keep.append(ch["chunk"])
    return keep


def read_table_skipping(
    spark: SparkSession, path: str, column: str, lo=None, hi=None
) -> tuple[DataFrame, list[int]]:
    """Range scan with chunk skipping: the sidecar stats select surviving
    chunks; each becomes an ``_idx`` interval filter, which the Parquet
    reader executes as row-group skipping (data is written sorted by
    ``_idx``, so chunk ↔ contiguous row groups). The residual value
    predicate still applies — stats pruning is conservative.

    Returns (DataFrame, pruned chunk ids). At 100 TB this is the difference
    between scanning every file and touching only the chunks a range query
    needs — without any shuffle, and composable with Catalyst's own
    pushdown (both filters land in PushedFilters)."""
    meta = read_metadata(path, spark)
    bs = meta["block_size"]
    chunks = prune_chunks(meta, column, lo, hi)
    df = spark.read.parquet(_fs.join(path, "data"))
    if not chunks:
        cond = F.lit(False)
    else:
        # coalesce adjacent chunk ids into maximal _idx intervals
        intervals: list[list[int]] = []
        for c in sorted(chunks):
            if intervals and intervals[-1][1] == c:
                intervals[-1][1] = c + 1
            else:
                intervals.append([c, c + 1])
        cond = None
        for a, b in intervals:
            clause = (F.col("_idx") >= a * bs) & (F.col("_idx") < b * bs)
            cond = clause if cond is None else cond | clause
    out = df.filter(cond)
    if lo is not None:
        out = out.filter(F.col(column) >= lo)
    if hi is not None:
        out = out.filter(F.col(column) <= hi)
    return out.drop("_idx"), chunks


def scheme_summary(spark: SparkSession, path: str) -> DataFrame:
    """btrmeta analog: one row per column×chunk with scheme + stats + sizes
    (tools/conversion/btrmeta.cpp:22-60, BtrReader::getSchemeDescription)."""
    meta = read_metadata(path, spark)
    rows = []
    for col, info in meta["columns"].items():
        for ch in info["chunks"]:
            rows.append(
                (
                    col,
                    info["type"],
                    ch["chunk"],
                    ch["scheme"],
                    # recursive cascade tree (BtrReader::getSchemeDescription);
                    # older sidecars predate the field
                    ch.get("scheme_tree", ch["scheme"]),
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
        "column string, col_type string, chunk long, scheme string, scheme_tree string, "
        "est_ratio double, "
        "raw_size long, est_size long, n_rows long, null_count long, unique_count long",
    )


def metadata_agg(path: str, columns: list[str] | None = None, spark: SparkSession | None = None) -> list[dict]:
    """Metadata-only aggregates: COUNT / COUNT(col) / MIN / MAX answered
    purely from the sidecar's per-chunk stats — zero data files touched
    (the aggregate-pushdown-to-footer trick of Parquet/Iceberg readers,
    applied to our btr sidecar; reference's FileMetadata role,
    compression/Datablock.hpp:30-35).

    At 100 TB this is O(num_chunks) driver-side JSON rows instead of a
    full-table scan; correctness holds because the writer computes the
    chunk stats from the exact same rows it persists (null-excluded
    min/max, all-null chunks carry empty reprs and are skipped).

    Returns one dict per column: {column, n_rows, n_nulls, min, max}
    (min/max None for skip-typed or all-null columns)."""
    meta = read_metadata(path, spark)
    out = []
    for name, info in meta["columns"].items():
        if columns is not None and name not in columns:
            continue
        # route through the planner's kind map: temporal columns plan (and
        # store min/max reprs) as epoch int64 — comparing their reprs as
        # strings would return lexicographic min/max ('9…' > '15…', and
        # pre-1970 '-…' sorts before digits)
        from btrblocks_spark.format.planner import kind_of

        kind = kind_of(info["type"])
        if kind == "double":
            cast = float
        elif kind == "int":
            cast = int
        else:
            cast = str
        n_rows = n_nulls = 0
        mn = mx = None
        for ch in info["chunks"]:
            n_rows += ch["n_rows"]
            n_nulls += ch["null_count"]
            if ch["scheme"] == "skip" or ch["n_rows"] == ch["null_count"]:
                continue
            cmn, cmx = cast(ch["min_repr"]), cast(ch["max_repr"])
            mn = cmn if mn is None else min(mn, cmn)
            mx = cmx if mx is None else max(mx, cmx)
        out.append(
            {"column": name, "n_rows": n_rows, "n_nulls": n_nulls, "min": mn, "max": mx}
        )
    return out


def sample_chunks(
    spark: SparkSession, path: str, fraction: float, seed: int = 0
) -> tuple[DataFrame, list[int]]:
    """Chunk-granular table sample: deterministically keep ~``fraction`` of
    chunks (xxhash of chunk id + seed, threshold on the hash — the same
    RNG-free device as the RANDOM split strategy / stratified sampler) and
    scan ONLY those, via the same ``_idx`` interval pushdown as
    read_table_skipping.

    This is TABLESAMPLE SYSTEM for the chunk format: I/O scales with the
    fraction (whole chunks skip at the row-group level), unlike row-iid
    Bernoulli sampling which still reads every byte. Chunks are
    row-position slices of the write order, so on naturally-ordered data a
    chunk sample behaves like a cluster sample — estimate accordingly
    (run-correlated columns need more chunks for the same confidence).

    Returns (DataFrame, kept chunk ids); deterministic for a given
    (table, fraction, seed)."""
    import hashlib

    meta = read_metadata(path, spark)
    n = meta["num_chunks"]
    bs = meta["block_size"]
    threshold = int(fraction * (1 << 32))
    keep = [
        c
        for c in range(n)
        if int.from_bytes(
            hashlib.blake2b(f"{seed}:{c}".encode(), digest_size=4).digest(), "big"
        )
        < threshold
    ]
    df = spark.read.parquet(_fs.join(path, "data"))
    if not keep:
        return df.filter(F.lit(False)).drop("_idx"), []
    intervals: list[list[int]] = []
    for c in keep:
        if intervals and intervals[-1][1] == c:
            intervals[-1][1] = c + 1
        else:
            intervals.append([c, c + 1])
    cond = None
    for a, b in intervals:
        clause = (F.col("_idx") >= a * bs) & (F.col("_idx") < b * bs)
        cond = clause if cond is None else cond | clause
    return df.filter(cond).drop("_idx"), keep
