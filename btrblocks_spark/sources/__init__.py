"""Sources/sinks beyond Parquet: CSV ingest with the reference parser's
null/trim semantics, CSV export, schema handling (YAML-style declared
schemas → StructType), and the `btrblocks` Python DataSource
(spark.read.format("btrblocks") over written chunked tables)."""

from btrblocks_spark.sources.btr_datasource import (
    BtrBlocksDataSource,
    load_btr_table,
)
from btrblocks_spark.sources.csv_source import (
    export_csv,
    read_csv,
    schema_from_decl,
)
from btrblocks_spark.sources.jsonl_source import (
    export_jsonl,
    read_jsonl,
    read_jsonl_quarantine,
)

__all__ = [
    "read_csv",
    "export_csv",
    "schema_from_decl",
    "BtrBlocksDataSource",
    "load_btr_table",
    "read_jsonl",
    "export_jsonl",
    "read_jsonl_quarantine",
]
