"""Round-trip verification (reference X3: csvtobtr -verify,
tools/conversion/csvtobtr.cpp:49-66 + null-aware equality
storage/Chunk.cpp:143-231).

Spark formulation: symmetric ``exceptAll`` emptiness + row-count equality —
null-aware by construction (exceptAll treats nulls as equal), and fully
distributed (no driver collect)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from btrblocks_spark.format.reader import read_table


def frames_equal(a: DataFrame, b: DataFrame) -> bool:
    if [f.dataType for f in a.schema.fields] != [f.dataType for f in b.schema.fields]:
        return False
    cols = sorted(a.columns)
    a, b = a.select(cols), b.select(cols)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def round_trip_verify(original: DataFrame, spark: SparkSession, path: str) -> bool:
    """True iff the written table scans back to exactly the original rows."""
    readback, _meta = read_table(spark, path)
    return frames_equal(original.select(*sorted(original.columns)), readback.select(*sorted(readback.columns)))


def _chunk_digests(spark: SparkSession, path: str):
    """Per-chunk order-invariant content digests of the stored rows:
    xxhash64 over every user column, combined with commutative
    count/sum/xor per chunk — one map-side-combinable pass, no shuffle of
    data columns beyond the hash."""
    import os

    from pyspark.sql import functions as F

    from btrblocks_spark.format.reader import read_metadata

    meta = read_metadata(path)
    bs = meta["block_size"]
    df = spark.read.parquet(os.path.join(path, "data"))
    cols = [c for c in df.columns if c != "_idx"]
    # 32-bit truncation keeps the commutative long sum overflow-free (ANSI
    # mode) to ~2^31 rows per chunk — far past any block_size
    h = F.xxhash64(*[F.col(c) for c in cols]).bitwiseAND(F.lit(0xFFFFFFFF))
    return (
        df.select(F.expr(f"_idx div {bs}").alias("chunk"), h.alias("h"))
        .groupBy("chunk")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("h").cast("long").alias("sum"),
            F.expr("bit_xor(h)").cast("long").alias("xor"),
        )
    )


def add_chunk_checksums(spark: SparkSession, path: str) -> dict:
    """Record per-chunk content checksums in the metadata sidecar — at-rest
    integrity the round-trip verifier can't give once the source DataFrame
    is gone (Parquet page CRCs detect storage bit-rot; these detect
    logical tampering/corruption at chunk granularity and travel with the
    table). One extra scan at write/maintenance time; verification later
    needs no source of truth besides the sidecar."""
    import json
    import os

    from btrblocks_spark.format.reader import read_metadata

    sums = {
        str(r["chunk"]): {"n": r["n"], "sum": r["sum"], "xor": r["xor"]}
        for r in _chunk_digests(spark, path).collect()
    }
    meta = read_metadata(path)
    meta["chunk_checksums"] = sums
    tmp = os.path.join(path, "_btr_metadata.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1, default=str)
    os.replace(tmp, os.path.join(path, "_btr_metadata.json"))
    return sums


def verify_chunk_checksums(spark: SparkSession, path: str) -> dict:
    """Recompute per-chunk digests and compare with the sidecar's recorded
    checksums. Returns {"ok": bool, "bad_chunks": [chunk ids], "missing":
    bool} — bad_chunks pinpoints corruption to a chunk, so a repair only
    re-fetches/rewrites that chunk, not the table."""
    from btrblocks_spark.format.reader import read_metadata

    meta = read_metadata(path)
    recorded = meta.get("chunk_checksums")
    if recorded is None:
        return {"ok": False, "bad_chunks": [], "missing": True}
    actual = {
        str(r["chunk"]): {"n": r["n"], "sum": r["sum"], "xor": r["xor"]}
        for r in _chunk_digests(spark, path).collect()
    }
    bad = sorted(
        {int(c) for c in set(recorded) | set(actual) if recorded.get(c) != actual.get(c)}
    )
    return {"ok": not bad, "bad_chunks": bad, "missing": False}
