"""Golden-shape fixture tables (FIXTURES.md §A, mirroring the reference's
test/DatasetGenerator.cpp): each shape must (1) round-trip bit-exactly
through its codec and (2) make the planner pick the expected scheme class."""

from __future__ import annotations

import numpy as np
import pytest

from btrblocks_spark.format import codecs
from btrblocks_spark.format.planner import choose_scheme

N = 65_000
RNG = np.random.default_rng(123)


def _round_robin(values: np.ndarray, n: int) -> np.ndarray:
    return np.tile(values, n // len(values) + 1)[:n]


# fixture name -> (spark_type, values, expected scheme classes)
def _fixtures():
    smallint_max = 32767
    fx = {}
    fx["int_one_value"] = ("integer", np.full(N, 100, dtype=np.int64), {"one_value"})
    fx["int_truncate_8"] = (
        "integer", smallint_max + RNG.integers(0, 127, N), {"truncation", "bp", "pfor", "for", "dict"},
    )
    fx["int_truncate_16"] = (
        "integer", (2**31 // 2) + RNG.integers(0, 32767, N), {"truncation", "bp", "pfor", "for", "dict"},
    )
    fx["int_dict_8"] = (
        "integer", _round_robin(RNG.choice(2**30, 255, replace=False), N), {"dict"},
    )
    fx["int_dict_16"] = (
        "integer", _round_robin(RNG.choice(2**30, 1020, replace=False), N), {"dict"},
    )
    # ~80% chance of extending a 20-long run
    runs = np.repeat(RNG.integers(0, 10_000, N // 16 + 1), 20)[:N]
    fx["int_rle"] = ("integer", runs, {"rle"})
    # FREQUENCY is legacy/off in the default integer scheme set (reference
    # btrblocks.hpp defaults; SURVEY I7) — the default planner picks RLE or
    # DICT here; test_int_frequency_enabled covers the enabled path.
    fx["int_frequency"] = (
        "integer",
        np.where(RNG.random(N) < 0.98, 42, RNG.integers(0, 2**30, N)),
        {"frequency", "rle", "dict"},
    )
    fx["int_random"] = (
        "integer", RNG.integers(-(2**31), 2**31 - 1, N), {"uncompressed", "bp", "pfor"},
    )
    fx["int_sorted"] = (
        "integer", np.sort(RNG.integers(0, 2**31 - 1, N)), {"delta", "bp", "pfor", "for"},
    )
    fx["double_one_value"] = ("double", np.full(N, 100.0), {"one_value"})
    fx["double_dict_8"] = (
        "double", _round_robin(RNG.uniform(-999999, 999999, 255), N), {"dict"},
    )
    fx["double_dict_16"] = (
        "double", _round_robin(RNG.uniform(-999999, 999999, 1020), N), {"dict"},
    )
    fx["double_random"] = (
        # the reference leaves random doubles uncompressed; ALP-RD's
        # left-bits dictionary still shaves the clustered exponent bits of a
        # bounded uniform, so it may win the size race — both are correct
        "double", RNG.uniform(-999999, 999999, N), {"uncompressed", "alp_rd"},
    )
    fx["double_frequency"] = (
        "double",
        np.where(RNG.random(N) < 0.98, 2.5, RNG.uniform(0, 100, N)),
        {"frequency", "rle"},
    )
    p = RNG.integers(0, 5, N)
    fx["double_decimal"] = (
        "double", np.round(RNG.uniform(0, 100, N), 4) * 10.0**0, {"pseudodecimal", "alp"},
    )
    dec = np.round(RNG.uniform(0, 100, N), 2)
    irr = RNG.standard_normal(N)
    patched = np.where(RNG.random(N) < 0.95, dec, irr)
    patched[0] = -0.0
    fx["double_decimal_patched"] = ("double", patched, {"pseudodecimal", "alp"})
    fx["string_one_value"] = (
        "string", np.array(["Hello Compression !"] * N, dtype=object), {"one_value"},
    )
    alnum = np.array(
        ["".join(RNG.choice(list("abcdefghij0123456789"), 10)) for _ in range(255)],
        dtype=object,
    )
    # 255 distinct values: both the cascaded dict and the legacy fixed
    # u8-code dict (FixedDictionary.cpp) are valid winners
    fx["string_dict_8"] = ("string", _round_robin(alnum, N), {"dict", "dict8"})
    big = np.array(
        ["".join(RNG.choice(list("abcdefghijklmno"), 6)) for _ in range(32_000)],
        dtype=object,
    )
    fx["string_compressed_dict"] = ("string", _round_robin(big, N), {"dict", "fsst"})
    fx["string_fsst"] = (
        "string",
        np.array(["".join(RNG.choice(list("abcde"), 12)) + str(i) for i in range(N)], dtype=object),
        {"fsst"},
    )
    return fx


FIXTURES = _fixtures()


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_fixture_planner_and_roundtrip(name):
    spark_type, values, expected = FIXTURES[name]
    plan = choose_scheme(spark_type, values)
    assert plan["scheme"] in expected, f"{name}: got {plan['scheme']}, want {expected}"

    kind = {"integer": "int", "double": "double", "string": "string"}[spark_type]
    if kind == "int":
        values = np.asarray(values, dtype=np.int64)
    enc = codecs.encode(kind, plan["scheme"], values)
    out = codecs.decode(kind, enc)
    if kind == "double":
        np.testing.assert_array_equal(
            np.asarray(out).view(np.int64), np.asarray(values).view(np.int64)
        )
    elif kind == "int":
        np.testing.assert_array_equal(out, values)
    else:
        assert out.tolist() == values.tolist()


def test_int_frequency_enabled():
    """With FREQUENCY enabled (legacy scheme set), the 98%-top-value shape
    picks it (templated/Frequency.hpp:23-48 gate)."""
    from btrblocks_spark.config import DEFAULT_CONFIG

    vals = np.where(RNG.random(N) < 0.98, 42, RNG.integers(0, 2**30, N)).astype(np.int64)
    cfg = DEFAULT_CONFIG.with_(
        integer_schemes=("uncompressed", "one_value", "dict", "rle", "frequency")
    )
    plan = choose_scheme("integer", vals, config=cfg)
    assert plan["scheme"] in ("frequency", "rle")
    assert plan["est_ratio"] > 3


# --- null-handling fixtures (FIXTURES.md nulls_*) ---------------------------


@pytest.mark.parametrize("null_frac,label", [(1.0, "all"), (0.0, "none"), (0.05, "sparse"), (0.95, "dense")])
def test_null_shapes(null_frac, label):
    values = RNG.integers(0, 100, 10_000)
    mask = RNG.random(10_000) >= null_frac
    if label == "all":
        mask[:] = False
    plan = choose_scheme("integer", values, mask)
    if label == "all":
        assert plan["scheme"] == "one_value"
        return
    enc = codecs.encode("int", plan["scheme"], values, mask)
    out = codecs.decode("int", enc)
    np.testing.assert_array_equal(np.asarray(out)[mask], values[mask])
    # nullmap cost model: ALLONES free, sparse/dense cheap (roaring-ish)
    from btrblocks_spark.format.codecs import _mask_size

    if label == "none":
        assert _mask_size(mask) == 0
    else:
        assert _mask_size(mask) <= len(mask) // 8 + 16


def test_fixed_width_string_dict():
    """Legacy DICTIONARY_8/16 (scheme/string/FixedDictionary.cpp,
    templated/VarDictionary.hpp): fixed u8/u16 code slots, hard capacity,
    exact round-trip; dict16 engages above 256 distinct values."""
    import numpy as np

    from btrblocks_spark.format import codecs

    vals8 = _round_robin(
        np.array([f"seg-{i:03d}" for i in range(200)], dtype=object), 10_000
    )
    e8 = codecs.encode("string", "dict8", vals8)
    assert e8.streams["codes"].dtype == np.uint8
    np.testing.assert_array_equal(codecs.decode("string", e8), vals8)

    vals16 = _round_robin(
        np.array([f"k-{i:05d}" for i in range(1000)], dtype=object), 20_000
    )
    with pytest.raises(ValueError):
        codecs.encode("string", "dict8", vals16)
    e16 = codecs.encode("string", "dict16", vals16)
    assert e16.streams["codes"].dtype == np.uint16
    np.testing.assert_array_equal(codecs.decode("string", e16), vals16)

    plan = choose_scheme("string", vals16)
    assert "dict16" in plan["candidates"]
    forced = choose_scheme("string", vals8, forced="dict8")
    assert forced["scheme_tree"] == "dict8(codes:u8)"
