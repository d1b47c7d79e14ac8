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
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    LessThan,
    WriterCommitMessage,
)

from btrblocks_spark.format.reader import read_metadata


@dataclass
class ChunkFilePartition(InputPartition):
    file_path: str
    columns: tuple
    # column-group reconstruction payload: ((det, dep, mapping_dir), ...)
    # for requested dependents — empty for ungrouped tables
    groups: tuple = ()


def _read_batches_reconstructed(file_path: str, columns: tuple, groups: tuple):
    """Stream a chunk file's Arrow batches, reconstructing column-group
    dependents (write_table stores them as mapping tables, not streams):
    per dependent, ``pc.index_in`` the determinant against the mapping's
    det column (null matches null — Arrow's set lookup is null-safe) and
    ``take`` the dep column — a vectorized dictionary lookup per batch,
    never a per-row Python loop. Mapping tables load once per task (they
    are capped at ``max_group_entries`` by the writer)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    deps = {dep: (det, mdir) for det, dep, mdir in groups}
    read_cols = list(dict.fromkeys(
        [c for c in columns if c not in deps]
        + [deps[c][0] for c in columns if c in deps]
    ))
    maps = {
        dep: pq.read_table(mdir) for dep, (_det, mdir) in deps.items()
    }
    pf = pq.ParquetFile(file_path)
    for batch in pf.iter_batches(columns=read_cols):
        arrays = []
        for c in columns:
            if c in deps:
                det, _mdir = deps[c]
                m = maps[c]
                idx = pc.index_in(
                    batch.column(batch.schema.get_field_index(det)),
                    value_set=m.column(det).combine_chunks(),
                )
                arrays.append(pc.take(m.column(c).combine_chunks(), idx))
            else:
                arrays.append(batch.column(batch.schema.get_field_index(c)))
        yield pa.RecordBatch.from_arrays(arrays, names=list(columns))


def _footer_range(pq_meta, col_name: str):
    """(min, max, is_floating) of a column across a file's row groups from
    footer stats, or None when stats are missing."""
    lo = hi = None
    floating = False
    for rg in range(pq_meta.num_row_groups):
        group = pq_meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            if col.path_in_schema != col_name:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                return None
            floating = col.physical_type in ("FLOAT", "DOUBLE")
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return None
    # Spark's parquet writer emits NaN min/max for NaN-containing columns
    # (observed: x=[1.0, nan, 0.5] -> min=0.5, max=nan). Python NaN
    # comparisons are always False, so a NaN bound would silently flip
    # "may match" into "prune" (e.g. lo <= v <= hi for EqualTo) — treat
    # NaN-poisoned stats as no stats at all.
    import math

    if any(isinstance(v, float) and math.isnan(v) for v in (lo, hi)):
        return None
    return lo, hi, floating


def _file_may_match(path: str, filters: list[Filter]) -> bool:
    """Conservative footer-stats check: False only when a pushed filter
    provably excludes every row group of the file.

    NaN semantics (the trap that turns "optimization" into wrong answers):
    parquet footer min/max EXCLUDE NaN, but Spark orders NaN greater than
    every value and NaN = NaN as true. So for FLOAT/DOUBLE columns a file
    whose stats say max=1.0 may still hold NaN rows matching ``x > 5.0`` —
    GreaterThan may never prune on floating stats. LessThan stays safe (a
    NaN row never satisfies x < v), and EqualTo with a finite value stays
    safe (NaN equals only NaN). A NaN *filter value* disables pruning for
    that predicate entirely (Python's nan comparisons disagree with
    Spark's total ordering)."""
    import math

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
        lo, hi, floating = rng
        if isinstance(f.value, float) and math.isnan(f.value):
            continue
        try:
            if isinstance(f, EqualTo) and not (lo <= f.value <= hi):
                return False
            if isinstance(f, GreaterThan) and not floating and not (hi > f.value):
                return False
            if isinstance(f, LessThan) and not (lo < f.value):
                return False
        except TypeError:  # incomparable types: never prune
            continue
    return True


def _groups_payload(path: str, columns: tuple) -> tuple:
    """((det, dep, abs_mapping_dir), ...) for the requested column-group
    dependents of the table at ``path`` — () for ungrouped tables, and ()
    when no sidecar is readable (the stream reader is constructed against
    bare data dirs in recovery paths; a sidecar-less table cannot carry
    groups, so reading it plain is the correct degradation)."""
    try:
        meta = read_metadata(path)
    except Exception:  # noqa: BLE001 — no/unreadable sidecar: no groups
        return ()
    return tuple(
        (g["det"], g["dep"], os.path.join(path, g["path"]))
        for g in (meta.get("column_groups") or [])
        if g["dep"] in columns
    )


class BtrBlocksReader(DataSourceReader):
    def __init__(self, options: dict, schema_fields: list[str]):
        self.path = options["path"]
        self.data_dir = os.path.join(self.path, "data")
        self.columns = tuple(schema_fields)
        self.groups = _groups_payload(self.path, self.columns)
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
        return [ChunkFilePartition(p, self.columns, self.groups) for p in files]

    def read(self, partition: ChunkFilePartition):
        if partition is None:  # Spark passes None when partitions() was empty
            return
        yield from _read_batches_reconstructed(
            partition.file_path, partition.columns, partition.groups
        )


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
        self.groups = _groups_payload(options["path"], self.columns)

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
            ChunkFilePartition(
                os.path.join(self.data_dir, f), self.columns, self.groups
            )
            for f in new
        ]

    def read(self, partition: ChunkFilePartition):
        import pyarrow.parquet as pq

        if partition is None:
            return
        try:
            pf = pq.ParquetFile(partition.file_path)
        except FileNotFoundError:
            # A file captured in a checkpointed offset can legitimately
            # vanish before this task reads it: (a) a torn batch append's
            # abort retracted an already-renamed dest (_rollback_aborted) —
            # that data was never committed and the retried job re-appends
            # it under NEW names the stream will pick up; (b) compact()
            # rewrote the tail — the rows live on in the compacted files,
            # which arrive as new offsets (at-least-once under concurrent
            # maintenance). Raising here would wedge the query forever:
            # restart replays the SAME planned offset range containing the
            # vanished name and fails identically every time.
            return
        del pf  # existence probed; the shared helper re-opens the file
        yield from _read_batches_reconstructed(
            partition.file_path, partition.columns, partition.groups
        )

    def commit(self, end: dict) -> None:
        pass


@dataclass
class AppendCommit(WriterCommitMessage):
    """Per-task commit message: the chunk files this task appended."""

    files: tuple
    rows: int


def _write_chunk_files(
    iterator, path: str, columns, block_size: int, prefix: str, suffix: str
) -> tuple[list[str], int]:
    """Executor-side chunk emit shared by the batch and streaming writers:
    slice the task's Arrow batches into block_size chunks and write each as
    one zstd parquet file named ``{prefix}-{uuid}{suffix}``. Readers only
    list ``*.parquet``, so a non-final suffix keeps in-flight files
    invisible until the driver-side commit renames them.

    Streams the iterator: at most ~block_size rows are buffered per task
    regardless of partition size (a multi-GB input partition must not be
    materialized whole in the Python worker)."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    files: list[str] = []
    total = 0
    buf: list = []
    buf_rows = 0
    order = list(columns)

    def flush(batches: list, n_rows: int) -> None:
        table = pa.Table.from_batches(batches)
        for off in range(0, n_rows, block_size):
            part = table.slice(off, block_size)
            # leading dot: Spark's file listing skips dot-files, so a
            # staged (or crashed-task-orphaned) file is invisible to the
            # plain-parquet fast path too, not just to the datasource's
            # *.parquet listing. The commit rename strips it (_final_name).
            fname = os.path.join(
                path, "data", f".{prefix}-{uuid.uuid4().hex}{suffix}"
            )
            pq.write_table(part, fname, compression="zstd")
            files.append(fname)

    for b in iterator:
        if b.num_rows == 0:
            continue
        # normalize EVERY raw batch to the declared column order before it
        # enters the buffer: the constructor accepts any incoming order, and
        # a carry-over remainder (re-sliced from an already-normalized
        # table) must never be mixed with raw incoming-order batches in one
        # from_batches call — pyarrow rejects the inconsistent schemas
        # mid-append (ArrowInvalid) once a partition spans >1 batch and
        # block_size doesn't divide the batch size
        if b.schema.names != order:
            b = b.select(order)
        buf.append(b)
        buf_rows += b.num_rows
        total += b.num_rows
        # flush only whole chunks; carry the remainder so chunk files stay
        # block_size-full instead of fragmenting at batch boundaries
        if buf_rows >= block_size:
            whole = (buf_rows // block_size) * block_size
            table = pa.Table.from_batches(buf)
            flush_part = table.slice(0, whole)
            flush(flush_part.to_batches(), whole)
            rest = table.slice(whole)
            buf = rest.to_batches() if rest.num_rows else []
            buf_rows = rest.num_rows
    if buf_rows:
        flush(buf, buf_rows)
    return files, total


# --- shared write-ahead append log (batch + streaming commits) ---------------

def _final_name(src: str) -> str:
    """Final visible name of a staged file: strip the ``.inflight`` suffix
    AND the leading staging dot (dot-files are invisible to Spark's file
    listing — that is the point of the staging name; the final name must
    not keep it)."""
    d, b = os.path.split(src)
    b = b[: -len(".inflight")]
    if b.startswith("."):
        b = b[1:]
    return os.path.join(d, b + ".parquet")


def _log_path(path: str) -> str:
    return os.path.join(path, "_appends.json")


def read_json_log(file_path: str) -> list:
    """Load a JSON WAL file (empty list when absent) — shared by this
    module's append log and the foreachBatch sink's `_stream_batches.json`
    so the two WALs' serialization behavior can never drift."""
    import json

    if os.path.exists(file_path):
        with open(file_path) as fh:
            return json.load(fh)
    return []


def write_json_log(file_path: str, log: list) -> None:
    """Atomic-replace write of a JSON WAL file (shared, see read_json_log)."""
    import json

    tmp = file_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(log, fh)
    os.replace(tmp, file_path)


def _read_log(path: str) -> list:
    return read_json_log(_log_path(path))


def _write_log(path: str, log: list) -> None:
    write_json_log(_log_path(path), log)


def _finish_renames(entry: dict) -> None:
    """Complete the entry's inflight→final renames idempotently: a source
    already renamed (inflight gone, FINAL PRESENT) is skipped, so this is
    safe to re-run from any crash point. A source that is gone with no
    final file is data loss (stage cleaned up, or clobbered by a rival
    restage) — raise so the entry stays pending and the loss surfaces,
    instead of being silently flipped to committed with rows dropped."""
    for src, dest in entry["renames"].items():
        if os.path.exists(src):
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.replace(src, dest)
        elif not os.path.exists(dest):
            raise RuntimeError(
                f"append commit: staged file {src} is gone and {dest} was "
                "never created — rows lost; entry left pending"
            )


def _finish_all_pending(log: list) -> bool:
    """Finish every *pending* entry's renames and flip it committed —
    recovery for a driver that crashed mid-commit. Caller holds the table's
    commit lock (any pending entry observed under the lock belongs to a
    crashed committer, never a live one). Returns True when the log
    changed."""
    changed = False
    for e in log:
        if e.get("state") == "pending":
            _finish_renames(e)
            e["state"] = "committed"
            changed = True
    return changed


def _rollback_aborted(path: str, files: list) -> None:
    """Abort-side WAL rollback. A commit that wrote its pending intent and
    then failed mid-rename leaves some files visible and some ``.inflight``;
    a bare delete of the inflight sources (the old abort) would strand the
    pending entry with src AND dest missing — recovery would then raise
    "rows lost" on every future commit, wedging the table. Since the driver
    is alive enough to call abort, roll the attempt back WHOLE instead:
    undo any renames already performed (dest names are attempt-unique, so
    deleting them can't touch other commits' data), drop the entry, and
    only then clear this attempt's staged files."""
    from btrblocks_spark.format.maintenance import commit_lock

    fileset = set(files)
    if os.path.exists(_log_path(path)):
        with commit_lock(path):
            log = _read_log(path)
            kept, changed = [], False
            for e in log:
                if e.get("state") == "pending" and fileset & set(
                    e.get("renames", {})
                ):
                    for src, dest in e["renames"].items():
                        for p in (dest, src):
                            try:
                                os.remove(p)
                            except OSError:
                                pass
                    changed = True
                    continue
                kept.append(e)
            if changed:
                _write_log(path, kept)
    for f in files:  # task-attempt orphans that never reached a commit
        try:
            os.remove(f)
        except OSError:
            pass


_FENCE_KEEP = 16  # committed stream entries retained per scope (fence window)
_BATCH_AUDIT_KEEP = 64  # committed batch-kind entries retained (audit trail)


def prune_committed_entries(log: list, keep: int = _FENCE_KEEP) -> list:
    """Bound the append WAL: an unbounded stream writes one entry per
    microbatch, and every commit rewrites the WHOLE json — at one batch per
    10 s that is a multi-MB read-modify-write within a month, a driver-side
    cost growing with stream lifetime, not stream rate. Structured Streaming
    only ever replays the single in-flight batch of a checkpoint lineage,
    so a committed stream entry older than the scope's newest ``keep``
    batches can never be offered again; drop it. Kept unconditionally:
    pending entries (crash recovery), batch-kind entries (audit trail —
    ``compact`` clears those when it re-syncs metadata — and a rolling
    ``_BATCH_AUDIT_KEEP`` newest are always retained so frequent small
    batch appends can't grow the log unbounded between compactions either),
    and legacy entries without a scope key (unknown lineage)."""
    latest: dict = {}
    n_batch = 0
    for e in log:
        if e.get("state") == "committed" and "scope" in e:
            latest[e["scope"]] = max(latest.get(e["scope"], -1), e.get("batch", -1))
        if e.get("kind") == "batch" and e.get("state") == "committed":
            n_batch += 1
    drop_batch = max(0, n_batch - _BATCH_AUDIT_KEEP)  # oldest first
    out = []
    for e in log:
        if (
            e.get("state") == "committed"
            and "scope" in e
            and e.get("batch", -1) <= latest[e["scope"]] - keep
        ):
            continue
        if drop_batch and e.get("kind") == "batch" and e.get("state") == "committed":
            drop_batch -= 1
            continue
        out.append(e)
    return out


def recover_pending_appends(path: str) -> int:
    """Public crash-recovery hook: finish any pending append entries left by
    a committer that died between the WAL intent write and the final flip.
    Runs automatically at the start of every batch/stream commit; callable
    directly (e.g. before maintenance) to bound the invisibility window.
    Returns the number of entries recovered."""
    from btrblocks_spark.format.maintenance import commit_lock

    with commit_lock(path):
        log = _read_log(path)
        n = sum(1 for e in log if e.get("state") == "pending")
        if n and _finish_all_pending(log):
            _write_log(path, log)
    return n


def _validate_append_schema(path: str, schema) -> tuple[list[str], int]:
    """Shared append-path schema gate (batch + streaming writers): the
    table must exist, the incoming column NAME set must match the sidecar,
    and so must every TYPE — a long appended into an int column would
    silently corrupt the chunk layout the sidecar declares. Returns
    (declared column order, block_size)."""
    meta = read_metadata(path)  # table must exist
    if meta.get("column_groups"):
        # a grouped table is immutable: appended rows could introduce new
        # determinant values (or violate the FD) the mapping table doesn't
        # carry — rewrite via format.writer.write_table instead
        raise ValueError(
            "append to a column-grouped table is not supported; rewrite "
            "with format.writer.write_table"
        )
    declared = [c["name"] for c in meta["schema"]]
    incoming = [f.name for f in schema.fields]
    if sorted(incoming) != sorted(declared):
        raise ValueError(
            f"schema mismatch: table has {declared}, write has {incoming}"
        )
    declared_types = {c["name"]: c["type"] for c in meta["schema"]}
    bad = [
        (f.name, f.dataType.simpleString(), declared_types[f.name])
        for f in schema.fields
        if f.dataType.simpleString() != declared_types[f.name]
    ]
    if bad:
        raise ValueError(f"schema type mismatch (col, write, table): {bad}")
    return declared, int(meta["block_size"])


def _vacuum_inflight_locked(path: str, max_age_sec: float = 3600.0) -> int:
    """Remove staged ``.inflight`` files no pending WAL entry references and
    idle past ``max_age_sec``. A task attempt that crashes (or loses a
    speculative race) before returning its commit message is referenced by
    NEITHER commit nor abort — without this sweep its invisible dot-files
    leak storage forever, proportional to failure count x partition size.
    Caller must hold the table's commit lock (a pending entry observed
    under the lock pins its sources; everything else old enough is
    garbage — live tasks keep their file mtimes fresh while writing)."""
    import time

    data_dir = os.path.join(path, "data")
    if not os.path.isdir(data_dir):
        return 0
    log = _read_log(path)
    referenced = {
        src
        for e in log
        if e.get("state") == "pending"
        for src in e.get("renames", {})
    }
    now = time.time()
    removed = 0
    for f in os.listdir(data_dir):
        if not f.endswith(".inflight"):
            continue
        full = os.path.join(data_dir, f)
        if full in referenced:
            continue
        try:
            if now - os.path.getmtime(full) > max_age_sec:
                os.remove(full)
                removed += 1
        except OSError:
            pass
    return removed


def vacuum_inflight(path: str, max_age_sec: float = 3600.0) -> int:
    """Public orphan-stage GC hook (see ``_vacuum_inflight_locked``); also
    runs automatically at every ``maintenance.compact`` start."""
    from btrblocks_spark.format.maintenance import commit_lock

    with commit_lock(path):
        return _vacuum_inflight_locked(path, max_age_sec)


class BtrBlocksWriter(DataSourceArrowWriter):
    """``df.write.format("btrblocks").mode("append")`` — the fast append
    path into an existing chunked table. Each task writes its partition as
    zstd parquet files capped at block_size rows (chunk-shaped, but not
    globally _idx-aligned — appends are the streaming-sink contract,
    ``maintenance.compact`` re-aligns chunks and re-syncs the sidecar).
    Tasks stage ``.inflight`` files (invisible to readers — failed/retried
    attempts leave no visible orphans); the driver-side commit renames the
    winning attempts' files to final ``.parquet`` names under the table's
    commit lock and appends an entry to the ``_appends.json`` log;
    ``abort`` deletes every staged file — all-or-nothing at the job level.

    Append-only by design: overwrite of a chunked table must go through
    ``format.writer.write_table`` (chunk alignment + scheme planning is
    the write path's whole point)."""

    def __init__(self, options: dict, schema, overwrite: bool):
        if overwrite:
            raise ValueError(
                "btrblocks source is append-only; use format.writer.write_table "
                "to (re)create a table"
            )
        self.path = options["path"]
        self.columns, self.block_size = _validate_append_schema(self.path, schema)

    def write(self, iterator):
        # stage as .inflight (invisible to readers): a failed/retried task
        # attempt's files would otherwise be final-named orphans that every
        # directory-listing reader counts as duplicate rows forever. The
        # driver-side commit renames the winning attempts' files.
        files, total = _write_chunk_files(
            iterator, self.path, self.columns, self.block_size, "append", ".inflight"
        )
        return AppendCommit(tuple(files), total)

    def commit(self, messages) -> None:
        # Write-ahead commit (same WAL as the streaming twin): (1) append a
        # *pending* entry recording every inflight→final rename, (2) perform
        # the renames, (3) flip the entry to committed. The old order
        # (rename first, journal last) left a torn append on a driver crash
        # mid-loop — some files visible, some .inflight, no log entry —
        # contradicting the all-or-nothing docstring. With the WAL, a crash
        # before the intent write leaves nothing visible (abort semantics);
        # a crash after it is finished by recovery at the next commit on
        # this table (or an explicit recover_pending_appends call).
        # The whole sequence runs under the table's commit lock: the log
        # update is read-modify-write, and a concurrent committer would
        # otherwise drop our entry.
        from btrblocks_spark.format.maintenance import commit_lock

        inflight = [f for m in messages if m for f in m.files]
        with commit_lock(self.path):
            log = _read_log(self.path)
            _finish_all_pending(log)  # adopt any crashed predecessor first
            entry = {
                "kind": "batch",
                "renames": {
                    f: _final_name(f) for f in inflight
                },
                "files": [_final_name(f) for f in inflight],
                "rows": sum(m.rows for m in messages if m),
                "state": "pending",
            }
            log.append(entry)
            _write_log(self.path, log)  # intent durable BEFORE anything visible
            _finish_renames(entry)
            entry["state"] = "committed"
            _write_log(self.path, prune_committed_entries(log))

    def abort(self, messages) -> None:
        # roll back a failed commit's pending intent whole (see
        # _rollback_aborted) before clearing task-attempt orphans
        _rollback_aborted(
            self.path, [f for m in messages if m for f in m.files]
        )


class BtrBlocksStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("btrblocks")`` — exactly-once streaming
    append into an existing chunked table.

    Per microbatch: each task writes its Arrow batches as chunk-shaped
    ``.inflight`` files (invisible to every reader — they all list only
    ``*.parquet``); the driver-side ``commit(messages, batchId)`` runs a
    write-ahead protocol against ``_appends.json``: append a *pending*
    entry recording every inflight→final rename, perform the renames, flip
    the entry to *committed*. The intent write is the single atomic
    decision point, so a crash anywhere recovers exactly-once on replay:
    a pending entry's renames are completed from the FIRST attempt's
    still-on-disk inflight files (no loss), a committed entry deletes the
    rerun's files (no duplicates).

    Exactly-once: Spark replays a microbatch only after a failure between
    the sink commit and the checkpoint commit, with the SAME batchId from
    the SAME checkpoint. The fence scope is the sink's
    ``checkpointLocation`` option (override with ``commitScope`` when the
    checkpoint comes from the session default conf; the writer refuses to
    start without one — a shared guessed scope would let two queries
    shadow each other's batchIds and silently drop data). Re-running with
    a FRESH checkpoint is a new scope and appends normally. ``abort``
    removes every in-flight file, so a failed epoch leaves no visible
    data: all-or-nothing per microbatch.

    Scale: data bytes move only inside executor tasks; commit is O(files
    in this epoch) driver-side renames — on an object store route these
    through format/fs.py's Hadoop FS handle instead of os.rename."""

    def __init__(self, options: dict, schema, overwrite: bool = False):
        if overwrite:
            # pyspark passes overwrite=True for outputMode('complete')/
            # truncate semantics — silently appending would accumulate one
            # full stale copy of the result per microbatch
            raise ValueError(
                "btrblocks streaming sink is append-only; outputMode "
                "'complete'/'update' (overwrite per microbatch) is not "
                "supported — use outputMode('append')"
            )
        self.path = options["path"]
        self.columns, self.block_size = _validate_append_schema(self.path, schema)
        # the fence is only sound per checkpoint lineage — two queries with
        # different checkpoints MUST get different scopes, or one's batchIds
        # shadow the other's and its data is silently dropped as "replays".
        # Never guess a shared default; fail loudly instead.
        self.scope = options.get("commitScope", options.get("checkpointLocation"))
        if not self.scope:
            raise ValueError(
                "btrblocks streaming sink requires a per-query fence scope: "
                "set .option('checkpointLocation', ...) on the writeStream "
                "(or .option('commitScope', <unique id>) when the checkpoint "
                "comes from the session default conf)"
            )

    def write(self, iterator):
        files, total = _write_chunk_files(
            iterator, self.path, self.columns, self.block_size, "stream", ".inflight"
        )
        return AppendCommit(tuple(files), total)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        # Write-ahead commit: (1) append an intent entry mapping each
        # inflight file to its final name, (2) perform the renames,
        # (3) flip the entry to committed. A crash at any point recovers on
        # replay: a pending entry's renames are COMPLETED from the original
        # attempt's still-on-disk inflight files (deterministic names in the
        # log — no loss), a committed entry drops the rerun (no duplicates).
        # The intent write is the single atomic decision point (os.replace).
        # The whole sequence runs under the table's commit lock: the log
        # update is read-modify-write, and a concurrent committer (another
        # query on this table, or a batch append) would otherwise drop our
        # entry — losing a pending entry means the renames never finish and
        # the microbatch's data stays invisible forever.
        from btrblocks_spark.format.maintenance import commit_lock

        inflight = [f for m in messages if m for f in m.files]
        with commit_lock(self.path):
            log = _read_log(self.path)
            prior = next(
                (
                    e
                    for e in log
                    if e.get("batch") == batchId and e.get("scope") == self.scope
                ),
                None,
            )
            if prior is not None:
                if prior.get("state") == "pending":
                    # first attempt crashed mid-rename: finish ITS renames,
                    # then mark committed — the rerun's files are duplicates
                    _finish_renames(prior)
                    prior["state"] = "committed"
                    _write_log(self.path, log)
                for f in inflight:
                    try:
                        os.remove(f)
                    except OSError:
                        pass
                return
            # adopt any OTHER crashed committer's pending entries (a torn
            # batch append, or another query's microbatch) while we hold
            # the lock — bounds the invisibility window to the next commit
            _finish_all_pending(log)
            entry = {
                "batch": batchId,
                "scope": self.scope,
                "renames": {f: _final_name(f) for f in inflight},
                "files": [_final_name(f) for f in inflight],
                "rows": sum(m.rows for m in messages if m),
                "state": "pending",
            }
            log.append(entry)
            _write_log(self.path, log)  # intent durable BEFORE any file is visible
            _finish_renames(entry)
            entry["state"] = "committed"
            # bound the log: committed entries beyond the scope's replay
            # window can never be offered again (see prune_committed_entries)
            _write_log(self.path, prune_committed_entries(log))

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        # roll back a failed commit's pending intent whole — Spark will
        # replay this batch, and the replay must find a clean slate, not a
        # half-renamed entry whose sources a bare delete would strand
        _rollback_aborted(
            self.path, [f for m in messages if m for f in m.files]
        )


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

    def writer(self, schema, overwrite: bool) -> BtrBlocksWriter:
        return BtrBlocksWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> BtrBlocksStreamWriter:  # noqa: N802
        return BtrBlocksStreamWriter(self.options, schema, overwrite)


# session-memo cap convention (_PAIRS_MEMO_CAP / _CC_MEMO_CAP are also 16):
# entries here are unpersisted DataFrames (cheap), but each key pins the full
# file listing — a session sweeping thousands of tables must stay bounded
_BTR_READ_MEMO_CAP = 16


def load_btr_table(spark, table_dir: str):
    """Identity-stable load of a btrblocks table — the entry point memo-aware
    consumers should use instead of a raw ``spark.read.format("btrblocks")``.

    Two raw ``.load()`` calls on the SAME table do NOT unify under Spark's
    plan canonicalization: each load pickles a fresh Python DataSource
    instance, so ``sameSemantics`` is False and ``semanticHash`` differs —
    which means every plan-keyed session memo (``dedup._memoized_by_plan``
    pair tables, the CC label memo) sees the second read of an unchanged
    table as a brand-new corpus and rebuilds from scratch. This helper
    restores the memo contract by keying on the SIDECAR's table identity
    instead of the plan: (realpath, md5 of the ``_btr_metadata.json``
    content, sorted data-file listing — appends/compacts/commits all move
    at least one of those) and returning the SAME DataFrame object for an
    unchanged table, which then unifies everywhere downstream for free.
    Object-store URIs (no local listing) skip the memo and always load
    fresh — correct, just unmemoized. The listing fingerprints each data
    file as (name, size, mtime_ns), so even a same-name in-place rewrite
    that leaves the sidecar byte-identical rotates the key; the memo is
    FIFO-capped at ``_BTR_READ_MEMO_CAP`` entries (eviction is always
    safe — it only forfeits plan unification for that table)."""
    import hashlib
    import json as _json

    from btrblocks_spark.format.reader import _local_path
    from btrblocks_spark.tables import session_memo

    def _load():
        return spark.read.format("btrblocks").option("path", table_dir).load()

    local = _local_path(table_dir)
    if local is None:
        return _load()
    meta = read_metadata(table_dir, spark)
    sidecar = hashlib.md5(
        _json.dumps(meta, sort_keys=True, default=str).encode()
    ).hexdigest()
    data_dir = os.path.join(local, "data")
    if os.path.isdir(data_dir):
        entries = []
        for name in sorted(os.listdir(data_dir)):
            try:
                st = os.stat(os.path.join(data_dir, name))
                entries.append((name, st.st_size, st.st_mtime_ns))
            except OSError:
                # raced with a compactor delete — name alone still rotates
                entries.append((name, -1, -1))
        listing = tuple(entries)
    else:
        listing = ()
    key = (os.path.realpath(local), sidecar, listing)
    memo = session_memo(spark, "_btrblocks_btr_read_memo")
    hit = memo.get(key)
    if hit is not None:
        # refresh dict position so FIFO eviction behaves LRU-ish: a hot,
        # repeatedly-opened table must outlive stale one-shot entries
        del memo[key]
        memo[key] = hit
        return hit
    # one live entry per table path: a changed table must not pin its
    # predecessor's DataFrame (or grow one entry per historical version)
    for k in [k for k in memo if k[0] == key[0]]:
        del memo[k]
    while len(memo) >= _BTR_READ_MEMO_CAP:
        del memo[next(iter(memo))]
    df = _load()
    memo[key] = df
    return df
