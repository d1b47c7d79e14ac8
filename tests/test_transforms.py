"""DataFrame-level encode/decode round-trips for every signature transform
(format/transforms.py) on real testdata columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.format import transforms as T
from btrblocks_spark.tables import load_table


def _vals(df, key, col):
    return {r["k"]: r["v"] for r in df.select(F.col(key).alias("k"), F.col(col).alias("v")).collect()}


def test_dict_round_trip(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer")
    encoded, dictionary = T.dict_encode(df, "c_mktsegment", "c_custkey")
    assert dictionary.count() == df.select("c_mktsegment").distinct().count()
    # codes are dense 0..n-1
    codes = sorted(r["code"] for r in dictionary.collect())
    assert codes == list(range(len(codes)))
    decoded = T.dict_decode(encoded, dictionary)
    assert _vals(decoded, "key", "value") == _vals(df, "c_custkey", "c_mktsegment")


def test_rle_round_trip_chunk_local(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", (F.col("o_orderkey") % 4).alias("part_key")
    )
    runs = T.rle_encode(df, "o_orderstatus", "o_orderkey", "part_key")
    # compression: far fewer runs than rows
    assert runs.count() < df.count()
    decoded = T.rle_decode(runs)
    assert decoded.count() == df.count()
    # per-(part,value) cardinalities survive
    a = sorted(map(tuple, df.groupBy("part_key", "o_orderstatus").count().collect()))
    b = sorted(map(tuple, decoded.groupBy("part", "value").count().collect()))
    assert [(x[2]) for x in a] == [(x[2]) for x in b]


def test_for_round_trip(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    encoded, bias = T.for_encode(df, "o_custkey", "o_orderkey")
    assert encoded.agg(F.min("residual")).first()[0] == 0
    decoded = T.for_decode(encoded, bias)
    assert _vals(decoded, "key", "value") == _vals(df, "o_orderkey", "o_custkey")


def test_delta_round_trip(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").select("o_orderkey").distinct()
    encoded = T.delta_encode(df, "o_orderkey", "o_orderkey")
    decoded = T.delta_decode(encoded)
    got = {r["key"]: r["value"] for r in decoded.collect()}
    assert all(k == v for k, v in got.items())


def test_frequency_round_trip(spark, sf_dir):
    # orders: o_orderkey is unique (lineitem's (orderkey, linenumber) is NOT
    # unique in this testdata) and o_orderstatus is heavily skewed
    df = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    exceptions, top = T.frequency_encode(df, "o_orderstatus", "o_orderkey")
    assert exceptions.count() < df.count()
    decoded = T.frequency_decode(df, exceptions, top, "o_orderkey", "o_orderstatus")
    assert _vals(decoded, "key", "o_orderstatus") == _vals(df, "o_orderkey", "o_orderstatus")


def test_pseudodecimal_round_trip(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    encoded = T.pseudodecimal_encode(df, "o_totalprice", "o_orderkey")
    # totalprice is a 2-decimal value -> all exact, no patches
    assert encoded.filter(F.col("patch").isNotNull()).count() == 0
    assert encoded.agg(F.max("exponent")).first()[0] <= 2
    decoded = T.pseudodecimal_decode(encoded)
    assert _vals(decoded, "key", "value") == _vals(df, "o_orderkey", "o_totalprice")


def test_pseudodecimal_patches_irrationals(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 1.0 / 3.0), (3, 123.456), (4, float("nan"))],
        "key long, v double",
    )
    encoded = T.pseudodecimal_encode(df, "v", "key")
    rows = {r["key"]: r for r in encoded.collect()}
    assert rows[1]["patch"] is None and rows[1]["exponent"] == 1
    assert rows[2]["patch"] is not None  # 1/3 has no exact decimal form
    assert rows[3]["exponent"] == 3
    import math

    assert math.isnan(rows[4]["patch"])


def test_fsst_round_trip_distributed(spark, sf_dir):
    """FSST as a distributed transform: per-chunk symbol tables trained in
    executors, vectorized decode (scheme/string/Fsst.cpp analog)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 4).alias("chunk")
    )
    encoded, tables = T.fsst_encode(docs, "text", "doc_id", part_col="chunk")
    assert tables.count() == 4
    # compression actually happened on real text
    sizes = (
        encoded.join(docs, encoded.key == docs.doc_id)
        .agg(
            F.sum(F.length("codes")).alias("enc"),
            F.sum(F.octet_length("text")).alias("raw"),
        )
        .first()
    )
    assert sizes["enc"] < sizes["raw"]
    decoded = T.fsst_decode(encoded, tables)
    assert _vals(decoded, "key", "value") == _vals(docs, "doc_id", "text")


def test_generic_chunk_codec_distributed_round_trip(spark, sf_dir):
    """Any codec runs as a distributed per-chunk kernel: encode lineitem
    columns with the kernel-only schemes (pseudodecimal, xor, dod) via
    applyInPandas, decode back, and match the source bit-exactly."""
    from btrblocks_spark.format.transforms import (
        codec_decode_chunks,
        codec_encode_chunks,
    )

    l = load_table(spark, sf_dir, "lineitem").limit(5000)
    src = l.select(F.expr("l_orderkey * 8 + l_linenumber").alias("k"), "l_extendedprice")

    for kind, scheme, col in (
        ("double", "pseudodecimal", "l_extendedprice"),
        ("double", "xor", "l_extendedprice"),
        ("int", "dod", "k"),
    ):
        base = src.select("k", F.col(col).alias("c")) if col != "k" else src.select(
            "k", F.col("k").alias("c")
        )
        enc = codec_encode_chunks(base, "c", kind, scheme, "k", block_size=1024)
        n_chunks = enc.count()
        assert n_chunks == (base.count() + 1023) // 1024
        dec = codec_decode_chunks(enc, kind, block_size=1024)
        got = [r["value"] for r in dec.orderBy("idx").collect()]
        exp = [r["c"] for r in base.orderBy("k").collect()]
        assert got == exp, (kind, scheme)


def test_frequency_round_trip_with_nulls(spark):
    """NULL values must round-trip as NULL (they are exceptions), never be
    rewritten to the top value."""
    rows = [(i, "A" if i % 3 else None) for i in range(30)] + [(100, "B")]
    df = spark.createDataFrame(rows, "k long, v string")
    exceptions, top = T.frequency_encode(df, "v", "k")
    assert top == "A"
    decoded = T.frequency_decode(df, exceptions, top, "k", "v")
    got = {r["key"]: r["v"] for r in decoded.collect()}
    want = {k: v for k, v in rows}
    assert got == want  # nulls stay null, B stays B


def test_zorder_null_dims_never_null_key(spark):
    """A NULL in either dimension quantizes to bucket 0 — the zkey itself is
    never NULL (the chunker requires non-null order keys)."""
    from btrblocks_spark.format.zorder import with_zorder, zorder_key

    rows = [(1, 10, 20), (2, None, 5), (3, 7, None), (4, None, None)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    for zdf in (
        df.select("id", zorder_key("a", "b").alias("zkey")),
        with_zorder(df, "a", "b", quantize_bits=4).select("id", "zkey"),
    ):
        vals = {r["id"]: r["zkey"] for r in zdf.collect()}
        assert all(v is not None for v in vals.values())


def test_codec_chunks_preserve_nullable_int64_past_2_53(spark):
    """applyInArrow keeps int64-with-nulls exact: the pandas path upcast to
    float64 and corrupted values past 2^53 on BOTH encode and decode
    (review finding). Epoch-nanos magnitudes with NULLs must round-trip
    bit-exact."""
    big = (1 << 53) + 17
    rows = [(i, big + i) for i in range(6)] + [(6, None), (7, big + 99)]
    df = spark.createDataFrame(rows, "k long, v long")
    enc = T.codec_encode_chunks(df, "v", "int", "bp", "k", block_size=4)
    dec = T.codec_decode_chunks(enc, "int", block_size=4)
    got = {r["idx"]: r["value"] for r in dec.collect()}
    assert got[0] == big and got[5] == big + 5 and got[7] == big + 99
    assert got[6] is None


def test_codec_chunks_keep_nan_distinct_from_null(spark):
    """The codec kernels preserve NaN bit-exactly and distinct from NULL;
    the pandas wrapper folded genuine NaN into NULL (review finding). A
    double chunk with both must round-trip both."""
    import math

    rows = [(0, 1.5), (1, None), (2, float("nan")), (3, -0.0)]
    df = spark.createDataFrame(rows, "k long, v double")
    enc = T.codec_encode_chunks(df, "v", "double", "dict", "k", block_size=8)
    dec = T.codec_decode_chunks(enc, "double", block_size=8)
    got = {r["idx"]: r["value"] for r in dec.collect()}
    assert got[0] == 1.5
    assert got[1] is None  # NULL stays NULL
    assert got[2] is not None and math.isnan(got[2])  # NaN stays a VALUE
    assert math.copysign(1.0, got[3]) == -1.0  # -0.0 sign survives


def test_delta_transform_null_safe(spark):
    """delta over a column with NULLs: deltas base on the last NON-NULL
    predecessor and null rows decode to NULL — review finding: lag+coalesce
    reset the base to 0 after a null and shifted every later row."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 20), (4, 25)], "k long, v long"
    )
    dec = T.delta_decode(T.delta_encode(df, "v", "k"), "v")
    got = {r["key"]: r["v"] for r in dec.collect()}
    assert got == {1: 10, 2: None, 3: 20, 4: 25}


def test_fsst_transform_null_safe(spark):
    """NULL strings round-trip as NULL through the fsst transform, never as
    '' (review finding)."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, ""), (4, "hello again")],
        "k long, v string",
    )
    enc, tables = T.fsst_encode(df, "v", "k")
    dec = T.fsst_decode(enc, tables, "v")
    got = {r["key"]: r["v"] for r in dec.collect()}
    assert got == {1: "hello world", 2: None, 3: "", 4: "hello again"}


def test_frequency_transform_all_null_column(spark):
    """An all-NULL column must encode (no top value; every row an
    exception decoding to NULL) instead of crashing on None[0]."""
    df = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    exc, top = T.frequency_encode(df, "v", "k")
    assert top is None
    dec = T.frequency_decode(df, exc, top, "k", "v")
    assert [r["v"] for r in dec.collect()] == [None, None]


def test_rle_positions_dense_for_sparse_orders(spark):
    """Run positions are DENSE per part regardless of gaps in the order
    keys — review finding: pos = min(order) + offset emitted positions
    mapping to no original row for sparse keys."""
    df = spark.createDataFrame(
        [(1, "A"), (5, "A"), (7, "B"), (11, "B"), (13, "B")], "o long, v string"
    )
    runs = T.rle_encode(df, "v", "o")
    dec = T.rle_decode(runs)
    got = sorted((r["pos"], r["value"]) for r in dec.collect())
    assert got == [(0, "A"), (1, "A"), (2, "B"), (3, "B"), (4, "B")]
