"""Property tests: the two-phase bucketed helpers (queries/_distributed.py)
must be bit-identical to the naive single-window formulation on arbitrary
data — sparse keys, nulls, every-row-distinct, all-equal runs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from btrblocks_spark.queries._distributed import (
    bucketed_order_profile,
    bucketed_row_number,
    bucketed_runs,
)

# rows: (unique sparse key, small value domain so runs form, ~10% nulls)
_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    ),
    min_size=1,
    max_size=120,
    unique_by=lambda t: t[0],
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v int").repartition(5)


@given(rows=_rows)
@settings(**_SETTINGS)
def test_bucketed_row_number_matches_window(spark, rows):
    df = _df(spark, rows)
    got = sorted(
        (r.k, r.idx)
        for r in bucketed_row_number(df, F.expr("k div 64"), ["k"]).collect()
    )
    want = sorted(
        (r.k, r.idx)
        for r in df.select(
            "k", F.row_number().over(Window.orderBy("k")).alias("idx")
        ).collect()
    )
    assert got == want


@given(rows=_rows)
@settings(**_SETTINGS)
def test_bucketed_runs_matches_window(spark, rows):
    df = _df(spark, rows)
    got = sorted(
        (
            (r.run_id, r.idx, r.run_value)
            for r in bucketed_runs(df, F.expr("k div 64"), ["k"], "v").collect()
        ),
        key=lambda t: t[:2],
    )
    w = Window.orderBy("k")
    naive = (
        df.select(
            "v",
            F.row_number().over(w).alias("idx"),
            F.when(~F.lag("v").over(w).eqNullSafe(F.col("v")), 1)
            .otherwise(0)
            .alias("s"),
        )
        .withColumn(
            "run_id",
            F.sum("s").over(
                Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    want = sorted(
        ((r.run_id, r.idx, r.v) for r in naive.collect()), key=lambda t: t[:2]
    )
    assert got == want


@given(rows=_rows)
@settings(**_SETTINGS)
def test_bucketed_order_profile_matches_window(spark, rows):
    df = _df(spark, rows)
    prof = bucketed_order_profile(df, F.expr("k div 64"), ["k"], "v").collect()[0]

    w = Window.orderBy("k")
    prev = F.lag("v").over(w)
    naive = (
        df.select(
            "v",
            F.when(prev.isNull() | (F.col("v") != prev), 1).otherwise(0).alias("s"),
            F.when(prev.isNull() | (F.col("v") >= prev), 1).otherwise(0).alias("ok"),
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.count("v").alias("n_set"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum("s").alias("total_runs"),
            F.min("ok").cast("boolean").alias("is_sorted"),
        )
        .collect()[0]
    )
    for field in ("n_rows", "n_set", "min_v", "max_v", "total_runs", "is_sorted"):
        assert getattr(prof, field) == getattr(naive, field), field


def test_results_invariant_to_shuffle_partitioning(spark, sf_dir):
    """Partitioning-invariance: the hash-deterministic operators must
    return IDENTICAL rows under different shuffle-partition counts — the
    property that makes results reproducible when a job is re-run on a
    different cluster size. (rand()/monotonically_increasing_id-based
    designs fail exactly this.)"""
    from btrblocks_spark.queries import all_queries

    names = [
        "curation_stratified_sample",
        "curation_shuffle_order",
        "curation_train_split",
        "curation_global_sample",
        "dedup_minhash_lsh",
        "text_hash_features",
    ]
    queries = all_queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                rows = sorted(
                    tuple(r) for r in queries[n](spark, sf_dir).collect()
                )
                results.setdefault(n, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for n, (a, b) in results.items():
        assert a == b, f"{n}: result depends on shuffle partitioning"
        assert len(a) > 0, n
