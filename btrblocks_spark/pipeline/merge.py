"""Incremental table maintenance: MERGE / upsert (last-writer-wins) — the
operation that keeps a curated table current as new batches arrive, without
rewriting rows that didn't change.

``merge_upsert`` implements Delta-style MERGE semantics on plain
DataFrames:
  matched (key in both)        -> the update row wins         op = 'update'
  not matched (update only)    -> the update row is inserted  op = 'insert'
  not matched by source        -> the target row is kept      op = 'keep'

Shape: union + ONE window over the merge key — a single hash shuffle on
the key, no join. (A full-outer-join formulation shuffles both sides too,
but then needs per-column coalesce; the union/window form generalizes to
multi-row update batches via the ``order_by`` tie-break and keeps column
handling trivial.) At 100 TB the shuffle is on the merge key — the same
partitioning the chunked writer uses for the table, so with a pre-bucketed
target this becomes a one-sided shuffle of just the (small) update batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Merge ``updates`` into ``target`` by ``keys``, update-wins.

    Both frames must share a schema (unionByName). ``order_by`` breaks ties
    *within* a multi-row update batch (e.g. a version / event-time column,
    descending = latest wins); update rows always beat target rows.
    Returns the merged table plus an ``op`` column ('update' | 'insert' |
    'keep') so downstream audit/stats can count row-level effects.
    """
    tagged = target.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    # final content-hash tie-break: rows tied on (_src, order_by) would
    # otherwise be ranked in partition order — a crash-replayed batch could
    # commit a DIFFERENT winner than the original run (CDC streaming_upsert
    # relies on same-batch → same-merged-content). Identical full rows
    # remain interchangeable; differing rows pick one deterministically.
    non_keys = [c for c in target.columns if c not in keys]
    # xxhash64 rejects MapType inputs outright (AnalysisException): hash
    # map columns via their canonical JSON instead, so CDC tables with a
    # properties map still get the deterministic tie-break
    ntypes = {f.name: f.dataType.typeName() for f in target.schema.fields}
    hashable = [
        F.to_json(F.col(c)) if ntypes.get(c) == "map" else F.col(c)
        for c in non_keys
    ]
    # key-only MERGE: every column is a key, so tied rows are identical by
    # construction — no content hash to break ties on (and F.xxhash64() with
    # zero args is an analysis error)
    content_tie = [F.xxhash64(*hashable).asc()] if non_keys else []
    order = [F.desc("_src")] + list(order_by or []) + content_tie
    w = Window.partitionBy(*keys).orderBy(*order)
    wp = Window.partitionBy(*keys)
    op = (
        F.when((F.col("_src") == 1) & (F.col("_has_target") == 1), F.lit("update"))
        .when(F.col("_src") == 1, F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .withColumn("_has_target", F.max(F.when(F.col("_src") == 0, 1).otherwise(0)).over(wp))
        .withColumn("_has_update", F.max("_src").over(wp))
        # not-matched-by-source keys pass through WHOLE: a target key with
        # duplicate rows and no update keeps every row (MERGE leaves them
        # untouched); only keys an update touches collapse to one winner
        .filter((F.col("_has_update") == 0) | (F.col("_rn") == 1))
        .withColumn("op", op)
        .drop("_src", "_rn", "_has_target", "_has_update")
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    attrs: list[str],
    effective: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply a new attribute snapshot to
    a history-keeping dimension. ``dim`` carries (keys, attrs, valid_from,
    valid_to, is_current); ``updates`` carries (keys, attrs). For each key
    whose CURRENT attrs differ from the update: the current row is closed
    (valid_to = effective, is_current = false) and a new current row opens
    at ``effective``. Unchanged keys, historical rows, and keys absent
    from the update pass through untouched; update rows for unknown keys
    insert as new current rows.

    Shape: one equi-join of the update batch against the CURRENT slice on
    the key (historical rows never join), then map-side unions — at scale
    the join shuffles only keys+attrs of the update batch and the current
    slice, never the full history.

    Multi-row update batches are collapsed to ONE row per key first
    (deterministically: the lexicographically-smallest attr tuple) — a raw
    full join would otherwise fan out, closing the same current row twice
    and opening several is_current rows per key. Callers with a version /
    event-time column should pre-reduce to latest-wins themselves (e.g.
    via merge_upsert's order_by) before calling.
    """
    # NULL-total partition: filter(col) and filter(~col) BOTH exclude a
    # NULL is_current under three-valued logic — such a row would vanish
    # from the returned dimension entirely (silent data loss). Treat NULL
    # as not-current (history) so every input row lands somewhere.
    is_cur = F.coalesce(F.col("is_current"), F.lit(False))
    cur = dim.filter(is_cur)
    hist = dim.filter(~is_cur)

    updates = (
        updates.groupBy(*keys)
        .agg(F.min(F.struct(*attrs)).alias("_a"))
        .select(*keys, *[F.col(f"_a.{a}").alias(a) for a in attrs])
    )

    diff = None
    for a in attrs:
        ne = ~F.col(f"u_{a}").eqNullSafe(F.col(a))
        diff = ne if diff is None else (diff | ne)
    upd = updates.select(
        *keys,
        *[F.col(a).alias(f"u_{a}") for a in attrs],
        F.lit(True).alias("_has_upd"),
    )
    # explicit presence markers (not attr NULL-ness — attrs may be NULL)
    joined = cur.withColumn("_has_cur", F.lit(True)).join(upd, keys, "full")
    has_cur = F.col("_has_cur").isNotNull()
    has_upd = F.col("_has_upd").isNotNull()

    unchanged_cur = joined.filter(has_cur & (~has_upd | ~diff)).select(*dim.columns)
    closed = joined.filter(has_cur & has_upd & diff).select(
        *keys,
        *attrs,
        "valid_from",
        F.lit(effective).cast("date").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = joined.filter(has_upd & (~has_cur | diff)).select(
        *keys,
        *[F.col(f"u_{a}").alias(a) for a in attrs],
        F.lit(effective).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    out = hist.select(*dim.columns)
    for part in (unchanged_cur, closed, opened):
        out = out.unionByName(part)
    return out
