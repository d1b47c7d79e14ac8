"""JSONL (JSON-lines) ingest/export — the training-corpus workhorse format.

The reference ships CSV as its only text ingest (S1, btrfiles/Parser.cpp);
large-scale document pipelines overwhelmingly exchange JSONL (one JSON
object per line: Common-Crawl derivatives, instruction sets, eval suites).
This module extends the S1/S6 source family to JSONL with the same
contract as csv_source:

  - schema is DECLARED, never inferred (btrfiles/btrfiles.hpp:8-38 analog —
    inference at 100 TB means a second full scan and non-deterministic
    types across drops)
  - unsupported declared types are SKIPped at ingest
  - malformed lines go to a quarantine lane, not a crash and not silence
  - export keeps explicit nulls so ingest(export(df)) == df

Scale: ``spark.read.json`` with an explicit schema is a single splittable
distributed scan (uncompressed / bzip2 files split; a .gz file is one
task — shard corpora into many files). Column pruning reaches the JSON
parser: with a declared schema Spark parses ONLY the requested fields per
line. All null/type normalization is projection-only (whole-stage codegen,
no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from btrblocks_spark.sources.csv_source import _c, schema_from_decl

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    columns: list[dict],
) -> DataFrame:
    """Typed JSONL scan from a [{name, type}] declaration (the YAML schema
    analog). Fields present in the file but not declared are never parsed
    (pushed-down pruning); declared-but-absent fields are NULL; skip-typed
    columns are dropped. Malformed lines degrade to all-NULL rows here —
    use :func:`read_jsonl_quarantine` to capture them instead."""
    schema, _skipped = schema_from_decl(columns)
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(path)
        # backtick-quoted: JSON keys legally contain dots, and a bare
        # F.col would parse them as nested-field paths (csv_source._c)
        .select(*[_c(f.name) for f in schema.fields])
    )


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    columns: list[dict],
) -> tuple[DataFrame, DataFrame]:
    """Ingest with a quarantine lane: (good, bad). ``bad`` holds one row per
    malformed input line with the raw line text preserved for repair —
    csv_source.read_csv_quarantine's JSONL twin. A line is malformed iff the
    JSON parser could not produce a row for the declared schema (syntax
    error or type mismatch under PERMISSIVE mode).

    Scale: ONE text scan; parsing happens in a from_json projection, so both
    lanes are narrow filters of the same raw read — no shuffle, no second
    pass, and (unlike spark.read.json's corrupt-record column, which
    requires caching the scan to query) no materialization of the corpus.
    """
    schema, _skipped = schema_from_decl(columns)
    with_corrupt = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType(), True)]
    )
    raw = spark.read.text(path).select(F.col("value").alias("raw_line"))
    parsed = raw.select(
        "raw_line",
        F.from_json(
            "raw_line",
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("j"),
    )
    # blank/whitespace-only lines are SEPARATORS, not data: spark.read.json
    # silently skips them, so the quarantine lane must too — otherwise the
    # two ingest paths disagree on the same file and a bad.count()==0 gate
    # fails spuriously on hand-concatenated shards
    parsed = parsed.filter(F.trim("raw_line") != "")
    is_bad = F.col("j").isNull() | F.col("j").getField(_CORRUPT).isNotNull()
    good = parsed.filter(~is_bad).select(
        *[F.col("j").getField(f.name).alias(f.name) for f in schema.fields]
    )
    bad = parsed.filter(is_bad).select("raw_line")
    return good, bad


def export_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines export. ``ignoreNullFields=false`` keeps explicit
    ``"field": null`` entries so a null round-trips as a null under any
    reader (Spark's default silently drops null fields, which breaks
    strict-schema consumers). Compression is the caller's choice via
    standard writer options; sharding follows the input partitioning —
    at corpus scale that means many ~100 MB files, which is exactly what
    the splittability note in the module docstring wants."""
    df.write.mode("overwrite").option("ignoreNullFields", "false").json(path)
