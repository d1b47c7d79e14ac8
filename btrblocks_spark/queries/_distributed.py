"""Distributed replacements for global (unpartitioned) window functions.

A bare ``row_number()/lag() OVER (ORDER BY key)`` is a single-task sort of
the whole table — the one plan shape that can never survive a 100× scale-up.
Every helper here computes the same result with the two-phase pattern the
chunker uses for its global index (format/chunker.py):

  phase 1 (parallel): bucket rows by a key-range expression that is
      monotone in the global order, and run the window per bucket;
  phase 2 (tiny): aggregate ONE row per bucket, fix up cross-bucket state
      (row offsets, run continuations) with a window over that bucket
      table — its row count is table_rows/bucket_width, driver-scale —
      and broadcast it back.

Results are bit-identical to the single-window formulation for any unique
(possibly sparse) order key, at any partition count.

NULL order-column contract: within buckets these helpers follow Spark's
default ASC NULLS FIRST, and the phase-2 fix-ups (struct min/max over the
key tuple) use the same nulls-smallest field ordering — the two phases are
internally consistent, but DuckDB's default is ASC NULLS LAST. An oracle
over NULLABLE order columns must therefore spell ``ORDER BY k NULLS
FIRST`` (every current oracle either has non-null order keys or does);
the Long.MAX sentinel below covers only a NULL *bucket expression*, not
NULLs in non-leading order columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucketed_row_number(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    idx_col: str = "idx",
) -> DataFrame:
    """Global 1-based row_number over ``order_cols`` without a global sort.

    ``bucket`` must be monotone non-decreasing in the ``order_cols`` order
    (a key-range expression like ``k div 4096``). Adds ``idx_col``; keeps
    every input column; drops nothing else.

    NULL order keys (NULL bucket expr) are coalesced to a Long.MAX
    sentinel bucket: the plain equi-join on _b would silently DROP them
    (NULL never equals NULL), and the sentinel orders them LAST — the
    DuckDB single-window oracle's ASC NULLS LAST placement."""
    b = df.withColumn("_b", F.coalesce(bucket, F.lit(9223372036854775807)))
    wb = Window.partitionBy("_b").orderBy(*order_cols)
    local = b.withColumn("_local_rn", F.row_number().over(wb))

    meta = (
        local.groupBy("_b")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_row_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_b", "_row_offset")
    )
    return (
        local.join(F.broadcast(meta), "_b")
        .withColumn(idx_col, F.col("_local_rn") + F.col("_row_offset"))
        .drop("_b", "_local_rn", "_row_offset")
    )


def bucketed_runs(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Equal-value run detection in global ``order_cols`` order: returns
    (run_id, run_value, idx) per input row, where run_id is 1-based over
    the whole table and runs crossing bucket boundaries share one id.

    Run-start semantics mirror ``lag(v) IS DISTINCT FROM v`` exactly,
    including its null quirks: a leading NULL value does NOT start a run
    (its rows get run_id 0), and a NULL following a NULL continues the
    run. Phase 1 forces every bucket's first row to is_start=0 (its true
    start flag cannot be known locally); phase 2 computes that flag per
    bucket as ``first_v IS DISTINCT FROM prev_bucket_last_v`` — the lag
    over the bucket table is NULL for the first bucket, which is exactly
    the NULL the global lag would have produced. Global run_id =
    local_run + first_start(bucket) + Σ earlier buckets' starts.
    NULL order keys ride in a Long.MAX sentinel bucket (ordered LAST,
    DuckDB-style) instead of being dropped by the _b equi-join."""
    b = df.select(
        F.coalesce(bucket, F.lit(9223372036854775807)).alias("_b"),
        *order_cols,
        F.col(value_col).alias("_v"),
    )
    wb = Window.partitionBy("_b").orderBy(*order_cols)
    key_struct = F.struct(*[F.col(c) for c in order_cols])
    prev_exists = F.lag(F.lit(1)).over(wb)
    local = b.select(
        "_b",
        "_v",
        F.row_number().over(wb).alias("_local_rn"),
        F.when(prev_exists.isNull(), 0)  # first row: resolved in phase 2
        .when(~F.lag("_v").over(wb).eqNullSafe(F.col("_v")), 1)
        .otherwise(0)
        .alias("_is_start"),
        key_struct.alias("_key"),
    ).withColumn(
        "_local_run",
        F.sum("_is_start").over(
            Window.partitionBy("_b")
            .orderBy("_key")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )

    wseq = Window.orderBy("_b")
    wcum = wseq.rowsBetween(Window.unboundedPreceding, -1)
    meta = (
        local.groupBy("_b")
        .agg(
            F.count("*").alias("_n"),
            F.sum("_is_start").alias("_starts"),
            F.min(F.struct("_key", "_v")).getField("_v").alias("_first_v"),
            F.max(F.struct("_key", "_v")).getField("_v").alias("_last_v"),
        )
        .withColumn(
            "_first_start",
            F.when(
                F.col("_first_v").eqNullSafe(F.lag("_last_v").over(wseq)), 0
            ).otherwise(1),
        )
        .withColumn("_row_offset", F.coalesce(F.sum("_n").over(wcum), F.lit(0)))
        .withColumn(
            "_run_offset",
            F.coalesce(
                F.sum(F.col("_starts") + F.col("_first_start")).over(wcum), F.lit(0)
            ),
        )
        .select("_b", "_first_start", "_row_offset", "_run_offset")
    )

    return local.join(F.broadcast(meta), "_b").select(
        (F.col("_local_run") + F.col("_run_offset") + F.col("_first_start")).alias(
            "run_id"
        ),
        F.col("_v").alias("run_value"),
        (F.col("_local_rn") + F.col("_row_offset")).alias("idx"),
    )


def bucketed_order_profile(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """One-row profile of ``value_col`` in global order: run count and
    global sortedness, plus the plain aggregates — the distributed T1
    stats pass (reference stats/NumberStats.hpp:78-130) without a global
    lag window.

    total_runs = Σ local_starts − Σ boundary_continuations;
    is_sorted  = every bucket locally sorted AND every boundary pair
    ordered. Null values follow the SQL three-valued single-window
    formulation exactly (``prev IS NULL OR v <> prev``): a NULL-preceded
    row always starts a run, so consecutive NULLs each count as their own
    run — intentionally DIFFERENT from bucketed_runs' eqNullSafe grouping,
    because this profile's oracle is the plain SQL LAG formulation. Use it
    on non-null columns (or expect SQL semantics) when runs matter.
    NULL order keys ride in a Long.MAX sentinel bucket (ordered LAST,
    DuckDB-style) instead of being dropped by the _b equi-join."""
    b = df.select(
        F.coalesce(bucket, F.lit(9223372036854775807)).alias("_b"),
        *order_cols,
        F.col(value_col).alias("_v"),
    )
    wb = Window.partitionBy("_b").orderBy(*order_cols)
    key_struct = F.struct(*[F.col(c) for c in order_cols])
    prev = F.lag("_v").over(wb)
    local = b.select(
        "_b",
        "_v",
        key_struct.alias("_key"),
        F.when(prev.isNull() | (F.col("_v") != prev), 1).otherwise(0).alias("_is_start"),
        F.when(prev.isNull() | (F.col("_v") >= prev), 1).otherwise(0).alias("_ok"),
    )
    # first/last value by key via struct min/max (keys unique, so the
    # struct compares on key alone; null values ride along — min_by/max_by
    # would drop them)
    per_bucket = local.groupBy("_b").agg(
        F.count("*").alias("n"),
        F.count("_v").alias("n_set"),
        F.min("_v").alias("mn"),
        F.max("_v").alias("mx"),
        F.sum("_is_start").alias("starts"),
        F.min("_ok").alias("sorted_local"),
        F.min(F.struct("_key", "_v")).getField("_v").alias("first_v"),
        F.max(F.struct("_key", "_v")).getField("_v").alias("last_v"),
    )
    wseq = Window.orderBy("_b")
    prev_last = F.lag("last_v").over(wseq)
    # SQL three-valued boundary semantics, matching the global-lag
    # formulation exactly: the bucket's first row CONTINUES the previous
    # run iff prev_last is not null and (first_v <> prev_last) is not true
    # (a null first_v therefore continues); it breaks sortedness unless
    # (first_v >= prev_last) is true or prev_last is null.
    continues = prev_last.isNotNull() & ~F.coalesce(
        F.col("first_v") != prev_last, F.lit(False)
    )
    fixed = per_bucket.select(
        "n",
        "n_set",
        "mn",
        "mx",
        "sorted_local",
        (F.col("starts") - F.when(continues, 1).otherwise(0)).alias("starts_adj"),
        F.when(prev_last.isNull() | (F.col("first_v") >= prev_last), 1)
        .otherwise(0)
        .alias("boundary_ok"),
    )
    return fixed.agg(
        F.sum("n").alias("n_rows"),
        F.sum("n_set").alias("n_set"),
        F.min("mn").alias("min_v"),
        F.max("mx").alias("max_v"),
        F.sum("starts_adj").alias("total_runs"),
        (F.min("sorted_local") * F.min("boundary_ok")).cast("boolean").alias("is_sorted"),
    )


def hash_positions(
    key_col: str,
    hashes: list[tuple[int, int, int]],
    width: int,
    prime: int = 2147483647,
    pos_name: str = "pos",
) -> Column:
    """Deterministic multiplicative-hash bucket positions, exploded as
    (d, <pos_name>) structs under alias ``h`` — the shared kernel of the
    bloom-filter join (join_bloom_filtered) and the count-min sketch
    (stats_count_min_sketch). Each query's hand-written oracle SQL mirrors
    these exact constants; keeping the kernel in one place keeps the two
    Spark sides and their oracles from drifting independently."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    (
                        (
                            # reduce the key mod prime BEFORE multiplying:
                            # key*a overflows BIGINT (ANSI abort) once keys
                            # pass ~3.47e9; (key%p)*(a<p) stays under 2^62.
                            # Identical values for key < prime — and the
                            # oracles mirror this exact form.
                            (
                                (F.col(key_col).cast("long") % F.lit(prime))
                                * F.lit(a)
                                + F.lit(b)
                            )
                            % F.lit(prime)
                        )
                        % F.lit(width)
                    )
                    .cast("long")
                    .alias(pos_name),
                )
                for d, a, b in hashes
            ]
        )
    ).alias("h")
