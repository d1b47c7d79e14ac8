"""`spark.read.format("btrblocks")` — the chunked format as a first-class
Spark data source (Python DataSource API, Spark 4).

This is the integration BASELINE.json's north star names ("columnar
compression library could be integrated as Spark data source"): after
``spark.dataSource.register(BtrBlocksDataSource)``, any table written by
``format.writer.write_table`` reads back with

    spark.read.format("btrblocks").option("path", table_dir).load()

Design (mirrors the reference's read path, compression/BtrReader.cpp):
  - schema comes from the metadata sidecar (the btr ``metadata`` file
    analog) — not file inference, the declared schema of the written
    relation; the internal ``_idx`` column never surfaces.
  - one InputPartition per chunk FILE (the writer emits one file per
    block_size chunk) → scan parallelism = chunk count, exactly the
    reference's parallel-decompress shape (decompression-speed.cpp:40-64).
  - ``pushFilters`` prunes whole chunk files from the parquet FOOTER
    min/max statistics of the filtered column — metadata-only reads, no
    data IO for excluded chunks (the chunk-stats skipping the sidecar
    models, executed at file granularity). All filters are returned as
    unhandled so Spark re-applies them — pruning is an optimization,
    never a semantics change.
  - ``read`` yields Arrow record batches (pyarrow), so rows stream
    through the Python worker in columnar form.

Scale: at 100 TB the partition list is one entry per chunk file; listing
and footer pruning are O(files) driver-side metadata work, and every data
byte moves only inside executor tasks. For the JVM-native fast path a
plain ``spark.read.parquet(dir/"data")`` remains available (reader.
read_table); this source adds the format-aware contract on top.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    LessThan,
)

from btrblocks_spark.format.reader import read_metadata


@dataclass
class ChunkFilePartition(InputPartition):
    file_path: str
    columns: tuple


def _footer_range(pq_meta, col_name: str):
    """(min, max) of a column across a file's row groups from footer stats,
    or None when stats are missing."""
    lo = hi = None
    for rg in range(pq_meta.num_row_groups):
        group = pq_meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            if col.path_in_schema != col_name:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return None
    return lo, hi


def _file_may_match(path: str, filters: list[Filter]) -> bool:
    """Conservative footer-stats check: False only when a pushed filter
    provably excludes every row group of the file."""
    import pyarrow.parquet as pq

    try:
        meta = pq.ParquetFile(path).metadata
    except Exception:  # unreadable footer: never prune
        return True
    if meta.num_rows == 0:  # empty shuffle partition file: nothing to read
        return False
    for f in filters:
        col = f.attribute[0] if isinstance(f.attribute, tuple) else str(f.attribute)
        rng = _footer_range(meta, col)
        if rng is None:
            continue
        lo, hi = rng
        try:
            if isinstance(f, EqualTo) and not (lo <= f.value <= hi):
                return False
            if isinstance(f, GreaterThan) and not (hi > f.value):
                return False
            if isinstance(f, LessThan) and not (lo < f.value):
                return False
        except TypeError:  # incomparable types: never prune
            continue
    return True


class BtrBlocksReader(DataSourceReader):
    def __init__(self, options: dict, schema_fields: list[str]):
        self.path = options["path"]
        self.data_dir = os.path.join(self.path, "data")
        self.columns = tuple(schema_fields)
        self._filters: list[Filter] = []

    def pushFilters(self, filters):  # noqa: N802 (API name)
        supported = []
        for f in filters:
            if isinstance(f, (EqualTo, GreaterThan, LessThan)):
                supported.append(f)
            yield f  # every filter is re-applied by Spark (pruning only)
        self._filters = supported

    def partitions(self):
        files = sorted(
            os.path.join(self.data_dir, f)
            for f in os.listdir(self.data_dir)
            if f.endswith(".parquet")
        )
        if self._filters:
            files = [p for p in files if _file_may_match(p, self._filters)]
        return [ChunkFilePartition(p, self.columns) for p in files]

    def read(self, partition: ChunkFilePartition):
        import pyarrow.parquet as pq

        if partition is None:  # Spark passes None when partitions() was empty
            return
        pf = pq.ParquetFile(partition.file_path)
        yield from pf.iter_batches(columns=list(partition.columns))


class BtrBlocksStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("btrblocks")`` — stream a chunked table as
    chunks are appended.

    The format is stream-friendly by construction: chunks are immutable
    append-only files (SURVEY.md §7), so a streaming offset is simply "the
    set of chunk files seen so far". Each microbatch plans one
    InputPartition per NEW chunk file — scan parallelism = newly appended
    chunks, the same per-chunk task shape as the batch reader.

    Offsets embed the sorted processed-file list, making
    ``partitions(start, end)`` a pure set difference — deterministic replay
    from the checkpoint without driver state. Offset size grows with chunk
    count (fine for the chunk counts a microbatch checkpoint sees; a
    production source would roll processed files into a compacted manifest
    the same way the writer's metadata sidecar records chunks)."""

    def __init__(self, options: dict, schema_fields: list[str]):
        self.data_dir = os.path.join(options["path"], "data")
        self.columns = tuple(schema_fields)

    def _list_files(self) -> list:
        return sorted(
            f for f in os.listdir(self.data_dir) if f.endswith(".parquet")
        )

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"files": []}

    def latestOffset(self) -> dict:  # noqa: N802 (API name)
        return {"files": self._list_files()}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["files"]) - set(start["files"]))
        return [
            ChunkFilePartition(os.path.join(self.data_dir, f), self.columns)
            for f in new
        ]

    def read(self, partition: ChunkFilePartition):
        import pyarrow.parquet as pq

        if partition is None:
            return
        pf = pq.ParquetFile(partition.file_path)
        yield from pf.iter_batches(columns=list(partition.columns))

    def commit(self, end: dict) -> None:
        pass


class BtrBlocksDataSource(DataSource):
    """Readable (batch + streaming) data source over a `write_table`
    directory."""

    @classmethod
    def name(cls) -> str:
        return "btrblocks"

    def schema(self) -> str:
        meta = read_metadata(self.options["path"])
        return ", ".join(f"`{c['name']}` {c['type']}" for c in meta["schema"])

    def reader(self, schema) -> BtrBlocksReader:
        return BtrBlocksReader(self.options, [f.name for f in schema.fields])

    def streamReader(self, schema) -> BtrBlocksStreamReader:  # noqa: N802
        return BtrBlocksStreamReader(self.options, [f.name for f in schema.fields])
