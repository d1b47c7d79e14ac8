"""Z-order (Morton) clustering — a multi-dimensional sort key for the
chunked writer, so chunk min/max stats prune on EVERY interleaved column,
not just the leading sort key.

Linear order `ORDER BY a, b` makes chunk stats selective on `a` only: a
filter on `b` alone touches every chunk. Interleaving the bits of `a` and
`b` gives a space-filling curve — rows close in (a, b) space land in the
same chunk, so min/max intervals are tight in BOTH dimensions and the
reader's ``prune_chunks`` (format/reader.py) skips chunks for 2-D box
predicates. This is the standard lakehouse technique (Delta/Iceberg
Z-ORDER); here it composes with the reference's chunk-stats metadata
(stats/NumberStats.hpp:78-130 analog) instead of Parquet row-group stats.

The key is a pure JVM-side bit expression (shiftleft / AND / OR on
longs) — identical arithmetic runs in DuckDB for the oracle compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-number bit spreading: x (16 bits) -> x with a zero bit between
# every original bit (32 bits). Classic Morton encode, expressible with
# shifts and masks in any engine.
_SPREAD_STEPS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(col: Column) -> Column:
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _spread16_sql(expr: str) -> str:
    x = f"({expr} & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zorder_key(col_a: Column | str, col_b: Column | str) -> Column:
    """32-bit Morton key interleaving the low 16 bits of two integer
    columns (a in even bit positions, b in odd). Values are masked to 16
    bits — callers with wider domains should first quantize (e.g. rank or
    divide) to 2^16 buckets; for chunk pruning only the *ordering* of the
    key matters, not exact bit width. NULL dims map to bucket 0 so the key
    is never NULL (the chunker's order keys must be non-null); note the
    SQL twin (zorder_key_sql) does NOT coalesce — keep oracle columns
    null-free or wrap them yourself."""
    a = F.col(col_a).cast("long") if isinstance(col_a, str) else col_a.cast("long")
    b = F.col(col_b).cast("long") if isinstance(col_b, str) else col_b.cast("long")
    a = F.coalesce(a, F.lit(0))
    b = F.coalesce(b, F.lit(0))
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1)).alias("zkey")


def zorder_key_sql(expr_a: str, expr_b: str) -> str:
    """The identical key as ANSI/DuckDB SQL text (for oracle parity)."""
    return f"({_spread16_sql(expr_a)} | ({_spread16_sql(expr_b)} << 1))"


def with_zorder(
    df: DataFrame,
    col_a: str,
    col_b: str,
    out_col: str = "zkey",
    quantize_bits: int | None = None,
) -> DataFrame:
    """Attach the Morton key; write the table with ``order_keys=[out_col]``
    to get 2-D-prunable chunks from the ordinary chunked writer.

    ``quantize_bits``: when set, each dimension is first normalized to
    [0, 2^bits) over its own min..max. REQUIRED when the dimensions have
    very different ranges — raw interleaving lets the wider dimension's
    high bits dominate the curve, and chunks then span the narrow
    dimension's whole range (no pruning). Bounds are a one-row broadcast
    aggregate, so the whole thing stays one lazy narrow plan.

    NULL handling: a NULL in either dimension quantizes to bucket 0, so the
    zkey is never NULL — the chunker's order keys must be non-null
    (chunker.py boundary sampling sorts key tuples), and null rows cluster
    at the curve's origin where min/max chunk stats still prune them."""
    if quantize_bits is None:
        return df.withColumn(out_col, zorder_key(col_a, col_b))
    scale = 1 << quantize_bits

    def _nan_free(col: str) -> Column:
        # a single NaN row would poison BOTH bounds (Spark orders NaN above
        # everything, so max() returns NaN), making span NaN and the whole
        # dimension's quantization degenerate (ANSI: floor(NaN) cast error)
        c = F.col(col).cast("double")
        return F.when(~F.isnan(c), c)

    bounds = df.agg(
        F.min(_nan_free(col_a)).alias("_alo"), F.max(_nan_free(col_a)).alias("_ahi"),
        F.min(_nan_free(col_b)).alias("_blo"), F.max(_nan_free(col_b)).alias("_bhi"),
    )

    def _quantize(col: str, lo: str, hi: str) -> Column:
        # All arithmetic in DOUBLE: multiplying (col - lo) by scale in the
        # column's native integer type overflows int32 once the range
        # exceeds 2^31/scale (ANSI mode — this session's default — throws;
        # non-ANSI silently scrambles the curve), and an epoch-nanos long
        # range × 65536 blows past 2^63 the same way. Dividing by the REAL
        # span (not span+1, which collapses a fractional-range double
        # column like [0, 0.001] to a handful of buckets) with a
        # least()-clamp maps lo..hi onto exactly [0, scale-1].
        x = F.col(col).cast("double")
        lo_d, hi_d = F.col(lo).cast("double"), F.col(hi).cast("double")
        span = hi_d - lo_d
        q = F.when(
            # NaN rows quantize to the TOP bucket (Spark sorts NaN greatest,
            # so they cluster at the curve's high corner where chunk stats
            # still prune finite ranges away from them)
            F.isnan(x), F.lit(scale - 1)
        ).when(
            span > 0,
            F.least(F.lit(scale - 1), F.floor((x - lo_d) / span * scale).cast("long")),
        ).otherwise(F.lit(0))  # constant (or empty/all-NaN) dim: one bucket
        return F.coalesce(q, F.lit(0))

    qa = _quantize(col_a, "_alo", "_ahi")
    qb = _quantize(col_b, "_blo", "_bhi")
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, _spread16(qa).bitwiseOR(F.shiftleft(_spread16(qb), 1)))
        .drop("_alo", "_ahi", "_blo", "_bhi")
    )
