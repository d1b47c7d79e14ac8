"""Deterministic chunking — the analog of ``Relation::getRanges``
(reference storage/Relation.cpp:42-69): slice a table into consecutive
``block_size``-row chunks in a stable order.

Scale note (100 TB): a naive ``row_number() OVER (ORDER BY keys)`` is a
single-partition window — a non-starter. We instead compute a *global* index
with per-partition parallelism and DETERMINISTIC range boundaries:

  1. sample the order keys with a fixed hash predicate (no RNG) and cut
     driver-side quantile boundaries — unlike ``repartitionByRange``, whose
     per-job boundary sampling is nondeterministic and therefore forces a
     full-row persist of the shuffled table to keep later jobs consistent;
  2. tag each row with its range id (``_pid``) = count of boundaries below
     its key tuple, as a pure JVM struct-comparison expression (codegens
     inside the scan stage, no Python worker) — a pure function of the key
     columns, so every job recomputes identical tags;
  3. count rows per range (key-columns-only scan, map-side agg) and build
     cumulative offsets on the driver (one tiny array);
  4. hash-exchange on ``_pid`` + sort by (``_pid``, keys) within partitions,
     then a narrow ``mapInArrow`` pass assigns index = offset[pid] +
     local ordinal.

Every step is parallel, driver state is O(num_partitions), and the full
rows move exactly once (the single ``_pid`` exchange). Because steps 1-4
are deterministic end-to-end, NO staging persist is needed: downstream
jobs that re-execute the lineage reproduce bit-identical indexes. The
three driver jobs before the exchange read only the (parquet-pruned)
key columns.

Order keys must be non-null and should be unique (ties get an arbitrary
but schema-stable order, same as any ORDER BY on a non-unique key).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_SAMPLES_PER_PART = 128


def _pid_column(df: DataFrame, order_keys: list[str], bounds: list[tuple]):
    """Range-id column: number of boundary tuples lexicographically below
    the row's key tuple. Pure JVM expression (Spark structs compare
    lexicographically), so it codegens inside the scan stage — no Python
    worker, no Arrow transfer, deterministic across jobs.

    Shape: a BALANCED binary-search WHEN tree, not a chain of P adds — the
    chain evaluated all P comparisons per row (and at cluster-scale
    partition counts its O(P)-deep tree risks a Catalyst stack overflow);
    the balanced tree evaluates log2(P) struct comparisons per row and its
    depth is log P, so it survives a 4000-partition boundary list whether
    codegen'd or interpreted."""
    if not bounds:
        return F.lit(0).cast("long")
    key_types = {f.name: f.dataType for f in df.schema.fields}
    key_struct = F.struct(*[F.col(k) for k in order_keys])

    def bound_struct(b: tuple):
        return F.struct(
            *[F.lit(v).cast(key_types[k]) for k, v in zip(order_keys, b)]
        )

    def search(lo: int, hi: int):
        # rows with exactly `pid` bounds below them get pid; invariant:
        # bounds[lo-1] < key (when lo > 0) and key <= bounds[hi] (when
        # hi < len(bounds)) — converges to pid in [lo, hi]
        if lo == hi:
            return F.lit(lo).cast("long")
        mid = (lo + hi) // 2
        return F.when(
            key_struct > bound_struct(bounds[mid]), search(mid + 1, hi)
        ).otherwise(search(lo, mid))

    return search(0, len(bounds))


def _sample_boundaries(
    df: DataFrame, order_keys: list[str], num_partitions: int, total_rows: int
) -> list[tuple]:
    """Quantile boundaries from a fixed-hash sample (deterministic, no RNG):
    keep rows where hash(keys) % mod == 0, sized for ~_SAMPLES_PER_PART
    samples per target partition; sort on the driver; cut evenly."""
    if total_rows == 0 or num_partitions <= 1:
        return []
    mod = max(1, total_rows // (num_partitions * _SAMPLES_PER_PART))
    sample = (
        df.select(*order_keys)
        .filter(F.pmod(F.hash(*[F.col(k) for k in order_keys]), F.lit(mod)) == 0)
        .collect()
    )
    if not sample:
        return []
    vals = sorted(tuple(r) for r in sample)
    m = len(vals)
    bounds: list[tuple] = []
    for i in range(1, num_partitions):
        b = vals[min(i * m // num_partitions, m - 1)]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def _local_index_fn(offsets: dict[int, int], pid_idx: int, index_col: str):
    """mapInArrow kernel: rows arrive sorted by (_pid, keys) with each pid's
    rows contiguous; assign index = offset[pid] + running per-pid ordinal.
    Vectorized over runs of equal pid."""

    def add_index(batches):
        import pyarrow as pa

        seen: dict[int, int] = {}
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            pids = batch.column(pid_idx).to_numpy(zero_copy_only=False)
            idx = np.empty(n, dtype=np.int64)
            change = np.flatnonzero(np.diff(pids)) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [n]))
            for s, e in zip(starts, ends):
                p = int(pids[s])
                base = offsets[p] + seen.get(p, 0)
                idx[s:e] = np.arange(base, base + (e - s))
                seen[p] = seen.get(p, 0) + int(e - s)
            arrays = [batch.column(i) for i in range(batch.num_columns)]
            arrays.append(pa.array(idx, type=pa.int64()))
            names = list(batch.schema.names) + [index_col]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return add_index


def with_global_index(
    df: DataFrame,
    order_keys: list[str],
    index_col: str = "_idx",
    num_partitions: int | None = None,
    total_rows: int | None = None,
    bounds: list[tuple] | None = None,
) -> DataFrame:
    """Add a 0-based dense global row index ordered by ``order_keys``.

    Deterministic end-to-end (fixed boundaries + pure-function range tags +
    stable hash exchange), so the result needs NO persist for cross-job
    consistency — re-executions reproduce identical indexes. The count,
    boundary-sample, and per-range-count jobs each scan only the key
    columns (parquet column pruning); full rows move once.

    ``total_rows``: pass a known-exact row count to skip the count job —
    callers that already ran an aggregate over ``df`` (e.g. the writer's
    NDV pass) fold the count into that job and hand it down, saving one
    full pass over the source at scale.

    ``bounds``: pass precomputed range boundaries (tuples over a PREFIX of
    ``order_keys``) to skip the boundary-sample job as well — the writer
    rides ``percentile_approx`` of the first key in its NDV job (round-9,
    guide §1.2: the boundaries only steer partition BALANCE, so any
    deterministic cut list yields identical output; prefix bounds leave
    ties on the later keys in one range, which only skews balance when the
    first key is heavily duplicated — callers fall back to the sample job
    in that case).
    """
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    if "_pid" in df.columns:
        # the tagging below appends its own _pid and indexes it positionally
        # (last column); a pre-existing _pid would be silently overwritten
        # and mis-indexed
        raise ValueError("input already has a '_pid' column; rename it first")
    if index_col in df.columns:
        # the kernel appends index_col to the schema; a pre-existing one
        # would yield DUPLICATE column names and ambiguous-reference
        # errors far downstream (e.g. re-indexing a read-back table that
        # still carries _idx — drop it first)
        raise ValueError(
            f"input already has a {index_col!r} column; drop or rename it "
            "before re-indexing"
        )

    total = df.count() if total_rows is None else int(total_rows)
    if bounds is None:
        bounds = _sample_boundaries(df, order_keys, num_partitions, total)
    else:
        bounds = [tuple(b) for b in bounds if b is not None]
    key_prefix = order_keys[: len(bounds[0])] if bounds else order_keys
    tagged = df.withColumn("_pid", _pid_column(df, key_prefix, bounds))

    counts = {
        r["_pid"]: r["cnt"]
        for r in tagged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    part = tagged.repartition(num_partitions, "_pid").sortWithinPartitions(
        "_pid", *order_keys
    )
    pid_idx = len(part.schema.fields) - 1  # _pid is the last column
    out_schema = StructType(part.schema.fields + [StructField(index_col, LongType(), False)])
    out = part.mapInArrow(
        _local_index_fn(offsets, pid_idx, index_col), out_schema
    ).drop("_pid")
    out._btr_total_rows = acc
    return out


def unpersist_index(df: DataFrame) -> None:
    """Back-compat no-op: the deterministic index path persists nothing."""
    persisted = getattr(df, "_btr_persisted", None)
    if persisted is not None:
        persisted.unpersist()


def with_chunk_id(
    df: DataFrame,
    order_keys: list[str],
    block_size: int,
    chunk_col: str = "_chunk",
    index_col: str = "_idx",
    strategy: str = "sequential",
    total_rows: int | None = None,
    bounds: list[tuple] | None = None,
) -> DataFrame:
    """Add chunk id = global_index // block_size (``SplitStrategy``,
    reference storage/Relation.hpp:7, storage/Relation.cpp:42-69).

    ``sequential`` chunks in key order; ``random`` decorrelates chunk
    contents by indexing on a *deterministic* 64-bit hash of the keys
    (the reference shuffles ranges with an RNG — here the permutation is
    a pure function of the keys, so chunk membership is reproducible
    across jobs and engines, which the write pipeline's share-the-staging
    design requires)."""
    if strategy == "random":
        tagged = df.withColumn("_rnd", F.xxhash64(*[F.col(k) for k in order_keys]))
        indexed = with_global_index(
            tagged, ["_rnd", *order_keys], index_col=index_col, total_rows=total_rows
        )
        total = getattr(indexed, "_btr_total_rows", None)
        indexed = indexed.drop("_rnd")
        indexed._btr_total_rows = total
    elif strategy == "sequential":
        indexed = with_global_index(
            df, order_keys, index_col=index_col, total_rows=total_rows,
            bounds=bounds,
        )
    else:
        raise ValueError(f"unknown split strategy: {strategy!r}")
    out = indexed.withColumn(
        chunk_col, F.floor(F.col(index_col) / F.lit(block_size)).cast("long")
    )
    out._btr_total_rows = getattr(indexed, "_btr_total_rows", None)
    return out
