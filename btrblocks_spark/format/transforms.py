"""Signature encodings as explicit DataFrame↔DataFrame transforms
(SURVEY M5): each scheme maps a (key, value) table to its encoded
representation and back, entirely with Spark built-ins — the relational
formulation of the codec kernels in codecs.py.

  dict     encode: sorted-distinct dictionary via dense_rank; probe via
           broadcast join → (key, code) + (code, value) dictionary
           decode: broadcast join back
  rle      encode: run detection via lag()+cumsum windows per partition key
           decode: sequence+explode
  for/delta encode: min-bias / lag-difference; decode: bias add / cumsum
  frequency encode: top value + exception rows; decode: coalesce over
           exceptions
  pseudodecimal encode: (significand, exponent) where exact; decode:
           significand / 10^exponent (exceptions carried as raw doubles)
  fsst     encode: one symbol table per chunk trained+applied inside
           executors (applyInPandas, Arrow-batched); decode: broadcast the
           per-chunk tables, vectorized pandas UDF

Scale notes: dict builds shuffle only the distinct set; rle windows
partition by the chunk key (chunk-local runs, reference-faithful —
Datablock::compress is chunk-at-a-time); fsst shuffles each chunk to one
task (the writer's chunk staging) and ships back one ~2 KiB table per
chunk; everything else is a projection.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# --- dictionary -------------------------------------------------------------

def dict_encode(df: DataFrame, col: str, key: str) -> tuple[DataFrame, DataFrame]:
    """Returns (encoded, dictionary): encoded = (key, code), dictionary =
    (code, value) with codes = dense rank of sorted distinct values."""
    dictionary = (
        df.select(F.col(col).alias("value"))
        .where(F.col(col).isNotNull())
        .distinct()
        .withColumn("code", F.dense_rank().over(Window.orderBy("value")) - 1)
        .select("code", "value")
    )
    encoded = (
        df.join(F.broadcast(dictionary), df[col] == dictionary["value"], "left")
        .select(F.col(key).alias("key"), "code")
    )
    return encoded, dictionary


def dict_decode(encoded: DataFrame, dictionary: DataFrame, col: str = "value") -> DataFrame:
    return (
        encoded.join(F.broadcast(dictionary), "code", "left")
        .select("key", F.col("value").alias(col))
    )


# --- RLE (chunk-local: runs partition by part_col) --------------------------

def rle_encode(df: DataFrame, col: str, order: str, part_col: str | None = None) -> DataFrame:
    """(part, run_no, value, run_length) — runs never cross partitions
    (the chunk-locality of the reference's RLE)."""
    part = F.col(part_col) if part_col else F.lit(0)
    w = Window.partitionBy(part).orderBy(order)
    flagged = df.select(
        part.alias("part"),
        F.col(order).alias("_o"),
        # DENSE per-part position: raw order values may have gaps (sparse
        # keys), and decode reconstructs positions as start + offset — a
        # gapped position space would emit positions that map to no
        # original row while skipping real ones
        (F.row_number().over(w) - 1).alias("_pos"),
        F.col(col).alias("value"),
        F.when(
            F.lag(col).over(w).isNull() | (F.lag(col).over(w) != F.col(col)), 1
        ).otherwise(0).alias("is_start"),
    )
    runs = flagged.withColumn(
        "run_no",
        F.sum("is_start").over(
            Window.partitionBy("part").orderBy("_o").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return runs.groupBy("part", "run_no", "value").agg(
        F.count("*").alias("run_length"),
        F.min("_o").alias("start_order"),
        F.min("_pos").alias("start_pos"),
    )


def rle_decode(runs: DataFrame) -> DataFrame:
    """Explode runs back to one row per original DENSE position
    (part, pos, value): pos = start_pos + offset-within-run, contiguous per
    part by construction regardless of gaps in the original order keys."""
    return runs.select(
        "part", "value", "start_pos",
        F.posexplode(F.sequence(F.lit(1), F.col("run_length"))).alias("off", "_one"),
    ).select("part", "value", (F.col("start_pos") + F.col("off")).alias("pos"))


# --- FOR / delta ------------------------------------------------------------

def for_encode(df: DataFrame, col: str, key: str) -> tuple[DataFrame, int]:
    bias = df.agg(F.min(col)).first()[0]
    return (
        df.select(F.col(key).alias("key"), (F.col(col) - F.lit(bias)).alias("residual")),
        bias,
    )


def for_decode(encoded: DataFrame, bias: int, col: str = "value") -> DataFrame:
    return encoded.select("key", (F.col("residual") + F.lit(bias)).alias(col))


def delta_encode(df: DataFrame, col: str, order: str) -> DataFrame:
    """NULL-safe delta: each non-null value's delta is against the LAST
    NON-NULL predecessor (plain lag would reset the base to 0 after a null
    and the running-sum decode — which skips null deltas — would shift
    every later row); null rows carry a NULL delta and decode to NULL."""
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    prev = F.last(col, ignorenulls=True).over(w)
    return df.select(
        F.col(order).alias("key"),
        F.when(
            F.col(col).isNotNull(),
            F.col(col) - F.coalesce(prev, F.lit(0)),
        ).alias("delta"),
    )


def delta_decode(encoded: DataFrame, col: str = "value") -> DataFrame:
    w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, 0)
    # sum() skips NULL deltas, so the running sum over non-null deltas
    # reconstructs each non-null value; null-delta rows decode to NULL
    return encoded.select(
        "key",
        F.when(F.col("delta").isNotNull(), F.sum("delta").over(w)).alias(col),
    )


# --- frequency --------------------------------------------------------------

def frequency_encode(df: DataFrame, col: str, key: str) -> tuple[DataFrame, object]:
    top_row = (
        df.where(F.col(col).isNotNull())
        .groupBy(col).count().orderBy(F.desc("count"), F.asc(col)).first()
    )
    # all-NULL (or empty) column: no top value exists — every row is an
    # exception and decodes from its stored exc_value (NULL), instead of
    # crashing on None[0]
    top = top_row[0] if top_row is not None else None
    # null-safe inequality: NULL rows ARE exceptions (plain != is NULL for
    # them, silently excluding them — they would decode to `top`)
    exceptions = df.where(~F.col(col).eqNullSafe(F.lit(top))).select(
        F.col(key).alias("key"), F.col(col).alias("exc_value")
    )
    return exceptions, top


def frequency_decode(df_keys: DataFrame, exceptions: DataFrame, top, key: str, col: str = "value") -> DataFrame:
    # the exception-row marker (not exc_value itself) decides: an exception
    # row with a NULL value must decode to NULL, not to `top`
    exc = exceptions.withColumn("_is_exc", F.lit(True))
    return (
        df_keys.select(F.col(key).alias("key"))
        .join(exc, "key", "left")
        .select(
            "key",
            F.when(F.coalesce("_is_exc", F.lit(False)), F.col("exc_value"))
            .otherwise(F.lit(top))
            .alias(col),
        )
    )


# --- FSST (chunk-local symbol tables, scheme/string/Fsst.cpp analog) --------

def fsst_encode(
    df: DataFrame, col: str, key: str, part_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Returns (encoded, tables): encoded = (part, key, codes binary),
    tables = (part, table binary) — one FSST symbol table per chunk, trained
    and applied inside executors. Rows are key-sorted in the kernel so the
    trained table (and therefore the encoding) is deterministic regardless
    of Spark's partition-internal row order."""
    from btrblocks_spark.format import fsst

    part = F.col(part_col) if part_col else F.lit(0).cast("long")
    src = df.select(
        part.alias("part"), F.col(key).alias("key"), F.col(col).alias("value")
    )

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("key")
        # NULLs must round-trip as NULLs (the frequency transform's rule):
        # the codes column is NULL for a null input, never the encoding of
        # "". The table trains on non-null payloads only.
        is_null = pdf["value"].isna().to_numpy()
        raw = [
            b"" if n else x.encode("utf-8")
            for n, x in zip(is_null, pdf["value"])
        ]
        table = fsst.train([r for n, r in zip(is_null, raw) if not n] or [b""])
        # ONE kernel emits codes AND the group's symbol table (on the first
        # row only) — the previous shape ran a second groupBy('part') kernel
        # that re-shuffled and re-trained identical data just to produce the
        # tables frame, doubling the dominant cost of the encode path
        blob = fsst.serialize(table)
        tables_col = [blob] + [None] * (len(raw) - 1)
        codes = fsst.compress_batch(table, raw)
        return pd.DataFrame(
            {
                "part": pdf["part"],
                "key": pdf["key"],
                "codes": [None if n else c for n, c in zip(is_null, codes)],
                "table": tables_col,
            }
        )

    combined = src.groupBy("part").applyInPandas(
        encode_group, "part long, key long, codes binary, table binary"
    )
    encoded = combined.select("part", "key", "codes")
    tables = combined.filter(F.col("table").isNotNull()).select("part", "table")
    # both outputs are views over the SAME single-shuffle plan; a caller
    # materializing both in separate actions should persist `encoded`
    # (or write it first) to avoid re-executing the kernel
    return encoded, tables


def fsst_decode(encoded: DataFrame, tables: DataFrame, col: str = "value") -> DataFrame:
    """Join the (tiny) per-chunk tables broadcast, then decode vectorized in
    Arrow batches. Table blobs are deserialized once per distinct blob, not
    per row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _decode(codes: pd.Series, blobs: pd.Series) -> pd.Series:
        from btrblocks_spark.format import fsst

        # group rows by table blob, batch-decode each group (per-chunk
        # tables → typically one group per Arrow batch)
        out = [None] * len(codes)
        by_blob: dict[bytes, list[int]] = {}
        for i, b in enumerate(blobs):
            if codes[i] is None:  # NULL input row: stays NULL, never ""
                continue
            by_blob.setdefault(bytes(b), []).append(i)
        for blob, idxs in by_blob.items():
            t = fsst.deserialize(blob)
            dec = fsst.decompress_batch(t, [bytes(codes[i]) for i in idxs])
            for i, d in zip(idxs, dec):
                out[i] = d.decode("utf-8")
        return pd.Series(out, dtype="object")

    return encoded.join(F.broadcast(tables), "part").select(
        "part", "key", _decode("codes", "table").alias(col)
    )


# --- pseudodecimal ----------------------------------------------------------

def pseudodecimal_encode(df: DataFrame, col: str, key: str, max_exp: int = 6) -> DataFrame:
    """(key, significand, exponent, patch): smallest exponent e with an exact
    round-trip; non-convertible values keep the raw double in ``patch``.
    Pure expression tree — no UDF."""
    c = F.col(col)
    result = None
    for e in range(max_exp + 1):
        scaled = F.round(c * F.lit(float(10**e)))
        ok = (
            (F.abs(scaled) <= F.lit(float(2**31 - 1)))
            & (scaled / F.lit(float(10**e)) == c)
        )
        cand = F.when(ok, F.struct(scaled.cast("long").alias("sig"), F.lit(e).alias("exp")))
        result = cand if result is None else F.coalesce(result, cand)
    return df.select(
        F.col(key).alias("key"),
        result.getField("sig").alias("significand"),
        result.getField("exp").alias("exponent"),
        F.when(result.isNull(), c).alias("patch"),
    )


def pseudodecimal_decode(encoded: DataFrame, col: str = "value") -> DataFrame:
    return encoded.select(
        "key",
        F.coalesce(
            F.col("patch"),
            F.col("significand") / F.pow(F.lit(10.0), F.col("exponent")),
        ).alias(col),
    )


def codec_encode_chunks(
    df: DataFrame,
    col: str,
    kind: str,
    scheme: str,
    order: str,
    block_size: int = 65536,
) -> DataFrame:
    """Distributed encode of ANY codec-family scheme (incl. pseudodecimal,
    xor, dod — the kernels with no Parquet delegate): chunk the column
    deterministically, run the numpy codec per chunk inside applyInPandas,
    return one row per chunk carrying the pickled stream payload + modeled
    size — the executor-side btr encode path (reference
    Datablock::compress per InputChunk, compression/Datablock.cpp:54-148),
    where the planner/microbench run the same kernels driver-side.

    Scale: one chunk-id shuffle; each chunk encodes independently; the
    output is O(chunks) rows of compressed payloads.

    The kernel runs over ARROW groups (applyInArrow), not pandas: the
    Arrow→pandas conversion destroys exactly what the codecs guarantee —
    int64-with-nulls upcasts to float64 (values past 2^53 lose low bits)
    and both NULL and genuine NaN collapse to pandas NaN (the kernels
    keep NaN bit-exact and distinct from NULL via the set-mask)."""
    import pickle

    from btrblocks_spark.format.chunker import with_chunk_id

    chunked = with_chunk_id(df.select(order, col), [order], block_size).select(
        "_chunk", "_idx", F.col(col).alias("v")
    )

    def encode_group(t):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from btrblocks_spark.format import codecs

        t = t.sort_by("_idx")
        chunk = int(t.column("_chunk")[0].as_py())
        v = t.column("v").combine_chunks()
        # validity = NULL only; a float NaN is a VALUE and stays in-band
        mask = ~v.is_null().to_numpy(zero_copy_only=False)
        if kind == "int":
            vals = pc.fill_null(v, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        elif kind == "double":
            vals = (
                pc.fill_null(v, 0.0)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
        else:
            vals = np.array(v.to_pylist(), dtype=object)
        enc = codecs.encode(kind, scheme, vals, mask)
        blob = pickle.dumps((enc.streams, enc.mask), protocol=4)
        return pa.table(
            {
                "chunk": pa.array([chunk], type=pa.int64()),
                "scheme": pa.array([scheme]),
                "n": pa.array([enc.n], type=pa.int64()),
                "size_bytes": pa.array([int(enc.size_bytes)], type=pa.int64()),
                "blob": pa.array([blob], type=pa.binary()),
            }
        )

    return chunked.groupBy("_chunk").applyInArrow(
        encode_group, "chunk long, scheme string, n long, size_bytes long, blob binary"
    )


def codec_decode_chunks(
    encoded: DataFrame, kind: str, block_size: int = 65536
) -> DataFrame:
    """Inverse of codec_encode_chunks: decode every chunk's payload back to
    (idx, value) rows — the distributed btr scan path for the kernel-only
    schemes. Null positions are restored from the stored set-mask (the
    reference's null-masked equality contract, storage/Chunk.cpp:48-96).

    Arrow in/out (applyInArrow): building the output as a pandas Series
    would upcast int64 to float64 on the null assignment (corrupting
    values past 2^53) and fold genuine NaN doubles into NULL — the Arrow
    array carries validity separately, so both survive bit-exact."""
    import pickle

    def decode_group(t):
        import numpy as np
        import pyarrow as pa

        from btrblocks_spark.format import codecs

        idx_parts: list = []
        val_parts: list = []
        for r in t.to_pylist():
            streams, mask = pickle.loads(r["blob"])
            e = codecs.Encoded(
                scheme=r["scheme"], n=int(r["n"]), streams=streams, mask=mask
            )
            vals = codecs.decode(kind, e)
            base = int(r["chunk"]) * block_size
            nulls = ~np.asarray(mask, dtype=bool)
            if kind == "string":
                arr = pa.array(
                    [None if nulls[i] else vals[i] for i in range(int(r["n"]))],
                    type=pa.string(),
                )
            else:
                arr = pa.array(vals, mask=nulls)
            idx_parts.append(
                pa.array(np.arange(base, base + int(r["n"]), dtype=np.int64))
            )
            val_parts.append(arr)
        return pa.table(
            {
                "idx": pa.concat_arrays(idx_parts),
                "value": pa.concat_arrays(val_parts),
            }
        )

    vtype = {"int": "long", "double": "double", "string": "string"}[kind]
    return encoded.groupBy("chunk").applyInArrow(
        decode_group, f"idx long, value {vtype}"
    )
