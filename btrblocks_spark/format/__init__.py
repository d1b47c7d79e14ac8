"""Format layer: chunked columnar storage model with per-chunk stats and
sampling-based compression-scheme selection (the reference's actual surface).

Design (SURVEY.md M3): the *semantic* layer — chunking, stats, scheme
selection, cascading, metadata — is ours and fully re-implemented; the
*physical* bit-twiddling (dictionary pages, RLE hybrid, bit-packing, ZSTD) is
delegated to Parquet, which implements the same encoding family natively and
JVM-side. Scheme choices are recorded in a metadata sidecar (the btr
``metadata`` file analog, compression/Datablock.hpp:30-35) and drive writer
options + decode hints. The signature codecs (pseudodecimal, RLE, dict,
frequency, FOR/delta, FSST-class) additionally exist as real encode/decode
transforms in ``codecs.py`` with bit-exact round-trip tests.
"""

from btrblocks_spark.format.chunker import with_chunk_id, with_global_index
from btrblocks_spark.format.planner import choose_scheme
from btrblocks_spark.format.reader import read_table, scheme_summary
from btrblocks_spark.format.writer import write_table

__all__ = [
    "with_global_index",
    "with_chunk_id",
    "choose_scheme",
    "write_table",
    "read_table",
    "scheme_summary",
]
