"""FSST codec unit tests (format/fsst.py) — the reference's signature string
scheme (scheme/string/Fsst.cpp:17-127), here a pure-Python implementation of
the published algorithm."""

import numpy as np
import pytest

from btrblocks_spark.format import codecs, fsst


def test_round_trip_urls():
    strings = [f"https://example.com/user/{i}/profile".encode() for i in range(5000)]
    table = fsst.train(strings)
    assert 0 < len(table.symbols) <= fsst.MAX_SYMBOLS
    assert all(1 <= len(s) <= fsst.MAX_SYMBOL_LEN for s in table.symbols)
    enc = [fsst.compress(table, s) for s in strings]
    assert [fsst.decompress(table, e) for e in enc] == strings
    # shared structure must actually compress
    assert sum(map(len, enc)) < 0.5 * sum(map(len, strings))


def test_escape_path_round_trips_unseen_bytes():
    table = fsst.train([b"aaaaaaaabbbbbbbb"] * 4)
    data = bytes(range(256))  # mostly bytes the table never saw
    assert fsst.decompress(table, fsst.compress(table, data)) == data


def test_training_is_deterministic():
    strings = [f"row-{i % 97}-suffix".encode() for i in range(2000)]
    t1, t2 = fsst.train(strings), fsst.train(strings)
    assert t1.symbols == t2.symbols


def test_empty_and_non_ascii():
    strings = [b"", "naïve café — ünïcode".encode("utf-8"), b"", b"plain"]
    table = fsst.train(strings)
    for s in strings:
        assert fsst.decompress(table, fsst.compress(table, s)) == s


def test_estimate_tracks_actual_size():
    data = b"".join(f"prefix/{i % 1000}/tail;".encode() for i in range(20000))
    est = fsst.estimate_compressed_size(data)
    table = fsst.train([data])
    actual = len(fsst.compress(table, data)) + table.serialized_size()
    assert 0.5 * actual <= est <= 2 * actual


def test_codec_layer_round_trip_with_nulls():
    values = np.array(
        [f"https://host/{i}/x" if i % 7 else None for i in range(4000)], dtype=object
    )
    mask = np.array([v is not None for v in values])
    filled = values.copy()
    filled[~mask] = ""
    enc = codecs.encode_string("fsst", filled, mask)
    out = codecs.decode_string(enc)
    np.testing.assert_array_equal(out[mask], filled[mask])
    assert enc.size_bytes < sum(len(x) for x in filled[mask])


def test_symbols_never_span_strings():
    # two strings that would form an attractive cross-boundary symbol if
    # training concatenated them
    strings = [b"ABCD", b"EFGH"] * 3000
    table = fsst.train(strings)
    assert b"DEFG" not in table.symbols
    assert b"CDEF" not in table.symbols


@pytest.mark.parametrize("scheme", ["fsst", "dict"])
def test_planner_estimates_with_real_fsst(scheme):
    from btrblocks_spark.format.planner import choose_scheme

    vals = np.array([f"https://example.com/user/{i}/profile" for i in range(20000)], dtype=object)
    plan = choose_scheme("string", vals, forced=scheme)
    assert plan["est_ratio"] > 1.5


def test_batch_codec_matches_scalar():
    """compress_batch/decompress_batch (C fast path when available, NumPy
    otherwise) must be byte-for-byte identical to the scalar reference
    encoder — same greedy longest-match, same escapes."""
    rng = np.random.default_rng(11)
    words = ["the", "fox", "http://", "www.", "example.com", "GET ", "?q="]
    strings = [
        ("".join(rng.choice(words, rng.integers(0, 9))) + str(i % 31)).encode()
        for i in range(3000)
    ]
    strings += [b"", b"\x00", b"\xff" * 5, bytes(range(256))]
    table = fsst.train(strings[:300])
    scalar_enc = [fsst.compress(table, s) for s in strings]
    batch_enc = fsst.compress_batch(table, strings)
    assert batch_enc == scalar_enc
    batch_dec = fsst.decompress_batch(table, batch_enc)
    assert batch_dec == strings


def test_batch_numpy_fallback_matches_scalar(monkeypatch):
    """The NumPy fallback (no C library) must also match the scalar path."""
    from btrblocks_spark.format import fsst_native

    monkeypatch.setattr(fsst_native, "lib", None)
    strings = [f"user-{i%57}@example.com".encode() for i in range(2000)] + [b""]
    table = fsst.train(strings[:200])
    assert fsst.compress_batch(table, strings) == [
        fsst.compress(table, s) for s in strings
    ]
    enc = fsst.compress_batch(table, strings)
    assert fsst.decompress_batch(table, enc) == strings


def test_decode_string_arrow_matches_object_decode():
    """The Arrow hand-off path must produce exactly the strings the object
    decode does, for both fsst and dict (DictionaryArray) schemes."""
    import numpy as np
    import pyarrow as pa

    from btrblocks_spark.format import codecs

    rng = np.random.default_rng(5)
    vals = np.array(
        ["".join(rng.choice(list("abcdef "), rng.integers(3, 30))) for _ in range(2000)],
        dtype=object,
    )
    mask = np.ones(len(vals), dtype=bool)
    low_card = np.array(list(rng.choice(["aa", "bb", "cc", "dd"], len(vals))), dtype=object)
    for scheme, data in (
        ("fsst", vals),
        ("dict", vals),
        ("dict8", low_card),
        ("uncompressed", vals),
    ):
        vals = data
        enc = codecs.encode_string(scheme, vals, mask)
        obj = codecs.decode_string(enc)
        arr = codecs.decode_string_arrow(enc)
        if isinstance(arr, pa.DictionaryArray):
            arr = arr.cast(pa.large_utf8())
        got = arr.to_pylist()
        assert got == list(obj), scheme


def test_compress_column_rejects_nulls_and_normalizes_slices():
    """(a) A null-containing array must raise, not fall back to encoding
    str(None)=='None' into null cells (review finding: the guard was
    swallowed by the fallback except). (b) A sliced or plain-utf8 array is
    normalized before the buffer math (a slice's buffers cover the PARENT,
    so the kernel would encode the wrong strings)."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from btrblocks_spark.format import fsst

    vals = [f"string number {i} with shared prefix" for i in range(64)]
    table = fsst.train([v.encode() for v in vals])

    with _pytest.raises(ValueError, match="null"):
        fsst.compress_column(
            table, None, arr=pa.array(["a", None, "b"], type=pa.large_utf8())
        )

    full = pa.array(vals, type=pa.large_utf8())
    sliced = full.slice(32)
    ref_payload, ref_lens = fsst.compress_column(
        table, np.array(vals[32:], dtype=object)
    )
    got_payload, got_lens = fsst.compress_column(table, None, arr=sliced)
    assert got_payload == ref_payload and list(got_lens) == list(ref_lens)

    # plain (int32-offset) utf8 array: normalized, not misread
    plain = pa.array(vals[32:], type=pa.utf8())
    got2_payload, got2_lens = fsst.compress_column(table, None, arr=plain)
    assert got2_payload == ref_payload and list(got2_lens) == list(ref_lens)


def test_native_train_matches_python_counter_loop():
    """The C-tokenized + lexsort gain counting must produce the SAME table
    as the pure-Python Counter loop (the round-8 lexsort rewrite changed
    the ordering machinery; byte-order ties across lengths are the subtle
    part: left-aligned value asc + length asc == bytes asc)."""
    import numpy as np

    from btrblocks_spark.format import fsst, fsst_native

    if fsst_native.lib is None:
        pytest.skip("no C kernel")
    rng = np.random.default_rng(7)
    words = [b"the", b"quick", b"http://", b"example.com", b"aa", b"\xff\xfe"]
    cases = [
        [bytes(rng.choice(words)) + str(i % 97).encode() for i in range(3000)],
        [bytes(rng.integers(97, 100, rng.integers(1, 25))) for _ in range(4000)],
        [b"", b"aaaaaaaaaaaaaaaa", b"abcabcabc"] * 500,
    ]
    for data in cases:
        fast = fsst.train(data)
        lib = fsst_native.lib
        fsst_native.lib = None
        try:
            slow = fsst.train(data)
        finally:
            fsst_native.lib = lib
        assert fast.symbols == slow.symbols


def test_fsst_table_reuse_identical_payload():
    """codecs.encode(..., fsst_table=...) (the per-column-part training
    contract, round-8 VERDICT #3) must produce byte-identical streams to
    the train-per-call path when given that call's own table — reuse is a
    pure amortization, never a different encoding."""
    import numpy as np

    from btrblocks_spark.format import codecs

    rng = np.random.default_rng(3)
    values = np.array(
        ["user_" + str(int(x)) + "@example.com" for x in rng.integers(0, 5000, 20000)],
        dtype=object,
    )
    cold = codecs.encode("string", "fsst", values)
    warm = codecs.encode(
        "string", "fsst", values, fsst_table=cold.streams["table"]
    )
    assert warm.streams["payload"] == cold.streams["payload"]
    assert (warm.streams["code_lengths"] == cold.streams["code_lengths"]).all()
    assert warm.size_bytes == cold.size_bytes
    back = codecs.decode("string", warm)
    assert back.tolist() == values.tolist()
