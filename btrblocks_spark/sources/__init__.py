"""Sources/sinks beyond Parquet: CSV ingest with the reference parser's
null/trim semantics, CSV export, and schema handling (YAML-style declared
schemas → StructType)."""

from btrblocks_spark.sources.csv_source import (
    export_csv,
    read_csv,
    schema_from_decl,
)

__all__ = ["read_csv", "export_csv", "schema_from_decl"]
