"""Scheme-planner decision tests — the reference pins schemes per shaped
column (test/test-cases/V1.cpp, EnforceScheme TestHelper.hpp:15-35); we
assert the SAMPLE-mode planner picks a sane scheme per shape and that the
trivial-case/regression-guard rules (SchemePicker.hpp:118-190) hold."""

from __future__ import annotations

import numpy as np
import pytest

from btrblocks_spark.config import DEFAULT_CONFIG, SchemeSelection
from btrblocks_spark.format.planner import choose_scheme, kind_of
from btrblocks_spark.format.sampling import run_sample_indices

RNG = np.random.default_rng(7)
N = 65_536


def test_kind_mapping():
    assert kind_of("integer") == "int"
    assert kind_of("bigint") == "int"
    assert kind_of("double") == "double"
    assert kind_of("string") == "string"
    # the reference SKIPs dates (btrfiles/btrfiles.hpp:20-22); we plan them
    # as epoch int64 — declared extension (SURVEY §1.2)
    assert kind_of("timestamp") == "int"
    assert kind_of("date") == "int"
    assert kind_of("array<float>") == "skip"  # genuinely unsupported kinds skip


def test_one_value_short_circuit():
    plan = choose_scheme("integer", np.full(N, 9, dtype=np.int64))
    assert plan["scheme"] == "one_value"
    assert plan["est_ratio"] > 1000


def test_all_null_is_one_value():
    plan = choose_scheme("integer", np.zeros(N, dtype=np.int64), np.zeros(N, dtype=bool))
    assert plan["scheme"] == "one_value"


def test_regression_guard_random_ints():
    """Full-range random int32 is incompressible → UNCOMPRESSED
    (SchemePicker.hpp:181-190)."""
    vals = RNG.integers(-(2**31), 2**31 - 1, N)
    plan = choose_scheme("integer", vals)
    assert plan["scheme"] == "uncompressed"
    assert plan["est_size"] == plan["raw_size"]


def test_rle_shape_picks_run_aware_scheme():
    """30-long runs of 1000 distinct values: RLE and dict-with-RLE'd-codes
    model within ~5% of each other — either is a correct argmax."""
    vals = np.repeat(RNG.integers(0, 1000, N // 30 + 1), 30)[:N].astype(np.int64)
    plan = choose_scheme("integer", vals)
    assert plan["scheme"] in ("rle", "dict")
    assert plan["est_ratio"] > 5
    # long-run low-cardinality: dict-with-RLE'd-codes or RLE, at a huge ratio
    # (the reference's own codes-RLE auto-switch, DynamicDictionary.cpp:183-196)
    vals2 = np.repeat(RNG.integers(0, 10, N // 200 + 1), 200)[:N].astype(np.int64)
    plan2 = choose_scheme("integer", vals2)
    assert plan2["scheme"] in ("rle", "dict")
    assert plan2["est_ratio"] > 50


def test_small_range_picks_packing_class():
    vals = RNG.integers(0, 200, N)
    plan = choose_scheme("integer", vals)
    assert plan["scheme"] in ("truncation", "bp", "pfor", "for", "dict")
    assert plan["est_ratio"] > 2


def test_decimal_doubles_pick_decimal_scheme():
    # pseudodecimal is the reference's signature pick; with ALP enabled the
    # chunk-wide (e, f) variant wins the size race on fixed-scale decimals
    vals = np.round(RNG.random(N) * 1000, 2)
    plan = choose_scheme("double", vals)
    assert plan["scheme"] in ("pseudodecimal", "alp")
    assert plan["est_ratio"] > 1.5
    forced = choose_scheme(
        "double", vals, config=DEFAULT_CONFIG.with_(double_schemes=(
            "uncompressed", "one_value", "dict", "rle", "frequency", "pseudodecimal",
        ))
    )
    assert forced["scheme"] == "pseudodecimal"


def test_low_cardinality_strings_pick_dict():
    vals = np.array(RNG.choice(["aa", "bb", "cc", "dd"], N), dtype=object)
    plan = choose_scheme("string", vals)
    assert plan["scheme"] == "dict"


def test_high_cardinality_strings_pick_fsst():
    vals = np.array([f"https://example.com/user/{i}/profile" for i in range(N)], dtype=object)
    plan = choose_scheme("string", vals)
    assert plan["scheme"] == "fsst"


def test_forced_scheme_override():
    cfg = DEFAULT_CONFIG.with_(force_integer_scheme="dict")
    vals = np.repeat(np.arange(100), N // 100 + 1)[:N].astype(np.int64)
    plan = choose_scheme("integer", vals, config=cfg)
    assert plan["scheme"] == "dict"


def test_try_all_not_worse_than_sample():
    vals = np.where(RNG.random(N) < 0.95, 5, RNG.integers(0, 10**6, N)).astype(np.int64)
    sample = choose_scheme("integer", vals, config=DEFAULT_CONFIG)
    try_all = choose_scheme(
        "integer", vals, config=DEFAULT_CONFIG.with_(scheme_selection=SchemeSelection.TRY_ALL)
    )
    assert try_all["est_size"] <= sample["raw_size"]
    assert try_all["scheme"] in ("frequency", "rle", "dict", "pfor")


def test_run_sample_preserves_runs():
    """T3: contiguous 64-value runs, n*len total (stats/NumberStats.hpp:34-76)."""
    idx = run_sample_indices(100_000, 10, 64)
    assert len(idx) == 640
    # each run contiguous
    runs = np.split(idx, 10)
    for r in runs:
        assert np.all(np.diff(r) == 1)
    # whole chunk when small
    assert len(run_sample_indices(500, 10, 64)) == 500


def test_suggest_order_keys_improves_compression(spark, sf_dir):
    """Auto-selected order keys are chosen by evaluating candidate sorts
    through the codec cost model on a sample: the written table must
    clearly beat a correlation-destroying random order, and stay within
    5% of a hand-picked id-first ordering."""
    import tempfile

    from pyspark.sql import functions as F

    from btrblocks_spark.config import DEFAULT_CONFIG
    from btrblocks_spark.format.planner import suggest_order_keys
    from btrblocks_spark.format.writer import write_table
    from btrblocks_spark.tables import load_table

    df = load_table(spark, sf_dir, "lineitem")
    keys = suggest_order_keys(df)
    assert keys, "no keys suggested"

    cfg = DEFAULT_CONFIG.with_(block_size=2048)
    good = write_table(
        df, tempfile.mkdtemp(prefix="btr_auto_"), keys, cfg, "lineitem"
    )
    # random permutation order: correlation destroyed, runs destroyed
    shuffled = df.withColumn("_rkey", F.xxhash64("l_orderkey", "l_linenumber"))
    rand = write_table(
        shuffled,
        tempfile.mkdtemp(prefix="btr_rand_"),
        ["_rkey"],
        cfg,
        "lineitem",
    )
    manual = write_table(
        df,
        tempfile.mkdtemp(prefix="btr_manual_"),
        ["l_orderkey", "l_linenumber"],
        cfg,
        "lineitem",
    )
    g = good["totals"]["est_compression_ratio"]
    assert g > rand["totals"]["est_compression_ratio"]
    assert g >= 0.95 * manual["totals"]["est_compression_ratio"]
