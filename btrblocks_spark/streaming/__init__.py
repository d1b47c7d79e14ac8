"""Structured Streaming layer.

The reference format is stream-friendly by construction — chunks are
append-only (SURVEY §2b/§7) — so the streaming layer provides:

  stream_source       readStream over a growing directory of event files
  windowed_rollup     watermark + tumbling-window aggregation (late data
                      handled by the watermark, not by reprocessing)
  chunked_append      foreachBatch sink writing block_size-aligned Parquet
                      chunks through the format writer's sizing rules
  sessionize          custom stateful operator (session windows with idle
                      gap) via applyInPandasWithState
  enrich_stream       stream-static broadcast enrichment join (per-batch
                      dimension snapshot, no stream shuffle)
  dedup_stream        watermark-bounded exact dedup
                      (dropDuplicatesWithinWatermark) — streaming twin of
                      pipeline.dedup.dedup_exact

Scale notes: every operator keys state by user/session id — state is
hash-partitioned across executors and bounded by the watermark (expired
state is dropped). The append sink writes whole chunks per microbatch; at
100 TB/day this is the same pattern as any lakehouse streaming ingest
(small-file problem handled by chunk-size alignment + periodic compaction).
"""

from btrblocks_spark.streaming.ops import (
    chunked_append,
    docs_stream_source,
    enrich_stream,
    dedup_stream,
    near_dedup_stream,
    sessionize,
    stream_source,
    windowed_rollup,
)

__all__ = [
    "stream_source",
    "enrich_stream",
    "windowed_rollup",
    "chunked_append",
    "sessionize",
    "dedup_stream",
    "docs_stream_source",
    "near_dedup_stream",
]
