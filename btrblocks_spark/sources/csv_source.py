"""CSV ingest/export with the reference's parser semantics.

Ingest (reference S1, btrfiles/Parser.cpp:21-192):
  - '|' default separator
  - non-string fields are trimmed before parse
  - empty string and the literal "null" parse as NULL for int/double
    (Parser.cpp:99-127); for strings the literal "null" is NULL, a QUOTED
    empty string ("") stays an empty string, and an UNQUOTED empty field
    is NULL (Spark's CSV reader rule; the exporter below quotes empty
    strings, so empty-vs-null round-trips exactly — external files that
    mean "" must quote it)
  - schema is declared externally (YAML in the reference,
    btrfiles/btrfiles.hpp:8-38) — never inferred
  - unsupported declared types are SKIPped (dropped at ingest,
    btrfiles/btrfiles.hpp:20-22)

Export (reference S6, tools/conversion/btrtocsv.cpp:37-170):
  - '|' separator, nulls as the literal "null"

Scale: `spark.read.csv` is a splittable distributed scan; the trim/null
normalization is a projection (whole-stage codegen, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

# Declared-type mapping. The reference supports {integer, double, string} and
# aliases smallint→integer, float→double (btrfiles/Relation.cpp:17-21); our
# engine keeps the wider Spark types natively (SURVEY §1.2).
_TYPE_MAP = {
    "integer": IntegerType(),
    "int": IntegerType(),
    "smallint": ShortType(),
    "bigint": LongType(),
    "double": DoubleType(),
    "float": FloatType(),
    "string": StringType(),
}

NULL_LITERAL = "null"
DEFAULT_SEP = "|"


def _c(name: str):
    """Column reference by LITERAL name: a bare F.col parses dots as
    nested-field paths, so a declared column named 'user.id' would resolve
    as field `id` of column `user` (UNRESOLVED_COLUMN). Backtick-quote."""
    return F.col(f"`{name}`")


def schema_from_decl(columns: list[dict]) -> tuple[StructType, list[str]]:
    """Build a StructType from a [{name, type}] declaration (the YAML schema
    analog). Unsupported types are SKIPped: returned separately and dropped
    at ingest. All fields nullable (nulls are first-class, SURVEY §1.2)."""
    fields, skipped = [], []
    for col in columns:
        t = col["type"].lower()
        if t in _TYPE_MAP:
            fields.append(StructField(col["name"], _TYPE_MAP[t], nullable=True))
        else:
            skipped.append(col["name"])
    return StructType(fields), skipped


def _raw_read(
    spark: SparkSession, path: str, columns: list[dict], sep: str, header: bool
) -> DataFrame:
    """Shared raw scan: every DECLARED column as a string (including
    skip-typed ones, so field positions line up with the file; skipped
    columns are dropped only in the typed projection).

    Null handling: the CSV reader (univocity) maps *unquoted* empty fields
    to NULL unconditionally; *quoted* empty strings ("") survive via
    emptyValue. That matches the exporter (it quotes empty strings), so
    empty-vs-null round-trips exactly. nullValue is pinned to a U+0000
    sentinel so the literal-"null" rule is applied by our expressions, not
    the reader — KNOWN LIMIT: a field whose real value is exactly one NUL
    character reads as NULL (pick data without lone-NUL fields, or a
    different sentinel)."""
    raw_schema = StructType(
        [StructField(col["name"], StringType(), True) for col in columns]
    )
    return spark.read.csv(
        path,
        schema=raw_schema,
        sep=sep,
        header=header,
        nullValue="\u0000",
        emptyValue="",
    )


def _typed_exprs(schema: StructType) -> list:
    """The reference's trim/null/cast semantics as one shared projection —
    read_csv and read_csv_quarantine MUST agree on these rules, so they are
    defined once (a prior copy-paste risked the two ingest paths' semantics
    silently forking)."""
    exprs = []
    for f in schema.fields:
        c = _c(f.name)
        if isinstance(f.dataType, StringType):
            # strings: only the literal "null" is NULL; no trim
            e = F.when(c == NULL_LITERAL, F.lit(None)).otherwise(c)
        else:
            trimmed = F.trim(c)
            e = (
                F.when((trimmed == "") | (trimmed == NULL_LITERAL), F.lit(None))
                .otherwise(trimmed)
                # try_cast, not cast: malformed numeric text degrades to
                # NULL instead of failing the scan under ANSI mode — the
                # reference parser is tolerant the same way (garbage fields
                # become the null sentinel, Parser.cpp:99-127)
                .try_cast(f.dataType)
            )
        exprs.append(e.alias(f.name))
    return exprs


def read_csv(
    spark: SparkSession,
    path: str,
    columns: list[dict],
    sep: str = DEFAULT_SEP,
    header: bool = False,
) -> DataFrame:
    """Typed CSV scan with the reference's parse semantics. Reads every
    declared column as a string first, then applies trim + null rules and
    casts — so "  42 " parses as 42 and "null"/"" parse as NULL exactly like
    the reference parser (Parser.cpp:88-127)."""
    schema, _skipped = schema_from_decl(columns)
    raw = _raw_read(spark, path, columns, sep, header)
    return raw.select(*_typed_exprs(schema))


def export_csv(df: DataFrame, path: str, sep: str = DEFAULT_SEP, header: bool = False) -> None:
    """btrtocsv-style export: '|' separator, nulls as the literal "null"."""
    (
        df.write.mode("overwrite")
        .option("sep", sep)
        .option("nullValue", NULL_LITERAL)
        .option("header", str(header).lower())
        .csv(path)
    )


def _load_yaml_columns(path: str) -> list[dict]:
    """Load + validate the reference's YAML schema file (btrfiles.hpp:8-38:
    a ``columns:`` list of ``{name, type}`` entries). Shared by the schema
    builder and the ingest entry point."""
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover - yaml ships with pyspark
        raise RuntimeError(
            "PyYAML not available; pass the declaration to schema_from_decl"
        ) from exc
    with open(path) as fh:
        doc = yaml.safe_load(fh)
    if not isinstance(doc, dict) or "columns" not in doc:
        raise ValueError(f"{path}: expected a YAML mapping with a 'columns' list")
    return doc["columns"]


def schema_from_yaml(path: str) -> tuple[StructType, list[str]]:
    """Parse the reference's YAML schema file format into a Spark schema +
    skip list."""
    return schema_from_decl(_load_yaml_columns(path))


def read_csv_with_yaml_schema(
    spark: SparkSession, csv_path: str, yaml_path: str, sep: str = DEFAULT_SEP
) -> DataFrame:
    """convertCSV parity entry point (btrfiles/Parser.cpp:21): CSV + YAML
    schema file → typed DataFrame with the reference's trim/null semantics
    and skip-typed columns dropped."""
    return read_csv(spark, csv_path, _load_yaml_columns(yaml_path), sep=sep)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    columns: list[dict],
    sep: str = DEFAULT_SEP,
    header: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Ingest with a quarantine lane: returns (good, bad) where ``bad``
    holds rows any of whose non-string fields failed to parse (malformed
    numeric text that try_cast would silently NULL), with the offending
    raw values preserved for repair - the badRecordsPath pattern without a
    side-channel directory, so the quarantine is just another DataFrame to
    audit, count, or re-ingest after fixing.

    A field is malformed iff the trimmed raw text is non-empty, not the
    null literal, and fails the cast. Rows where every field parses (or is
    legitimately null) go to ``good`` with full reference semantics (the
    SAME shared projection read_csv uses).

    Scale: ONE scan; both outputs are narrow projections of the same raw
    read (two cheap passes over the same file split set, no shuffle)."""
    schema, _skipped = schema_from_decl(columns)
    raw = _raw_read(spark, path, columns, sep, header)
    bad_flags = []
    for f in schema.fields:
        if isinstance(f.dataType, StringType):
            continue
        t = F.trim(_c(f.name))
        # coalesce: a NULL raw field (reader-level null) is NOT malformed —
        # without it the NULL flag would drop the row from BOTH lanes
        bad_flags.append(
            F.coalesce(
                (t != "") & (t != NULL_LITERAL) & t.try_cast(f.dataType).isNull(),
                F.lit(False),
            )
        )
    is_bad = F.lit(False)
    for b in bad_flags:
        is_bad = is_bad | b
    bad = raw.filter(is_bad)
    good_raw = raw.filter(~is_bad)
    return good_raw.select(*_typed_exprs(schema)), bad
