"""btrblocks_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of maxi-k/btrblocks (SIGMOD 2023).

Layers (see SURVEY.md):
  - ``format``   : chunked columnar storage model — per-chunk stats, sampling
                   based compression-scheme selection, cascading, writer/reader,
                   round-trip verification (reference: compression/*, scheme/*).
  - ``queries``  : the declared relational query surface (SURVEY.md §2b) —
                   pure Spark DataFrame built-ins, DuckDB-oracle-verified.
  - ``pipeline`` : large-scale training-data operators — dedup (exact/minhash/
                   simhash/jaccard/embedding), similarity search, text analysis,
                   multimodal column plumbing.
  - ``streaming``: Structured Streaming ingest into the chunked format.
"""

from btrblocks_spark.config import BtrBlocksConfig
from btrblocks_spark.session import get_spark
from btrblocks_spark.tables import TABLE_NAMES, load_table, load_tables

__all__ = [
    "BtrBlocksConfig",
    "get_spark",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
]

__version__ = "0.1.0"
