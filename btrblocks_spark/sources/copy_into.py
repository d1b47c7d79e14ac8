"""COPY INTO: file-level idempotent batch ingest (lakehouse `COPY INTO`
semantics — Delta `COPY INTO` / Snowflake `COPY`): load a set of source
files into a chunked table, skipping any file that was already loaded, so
re-running the same command after a partial failure (or on an overlapping
file listing) never duplicates rows.

Idempotence key = (absolute path, size, mtime_ns) recorded in the table's
``_copy_log.json``. At 100 TB of daily drops this is the ingestion contract
that makes orchestration retries safe: the log is O(files), the skip check
is pure metadata, and only genuinely-new files are read.

Appends land as block_size-row-capped zstd parquet in ``data/`` — the same
shape the streaming chunk sink and the datasource append writer produce,
and the fragmented tail ``maintenance.compact`` later bin-packs and
re-plans, so COPY INTO inherits the append→compact lifecycle."""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from btrblocks_spark.format.reader import read_metadata


def _log_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_copy_log.json")


def _load_log(table_dir: str) -> dict:
    p = _log_path(table_dir)
    if not os.path.exists(p):
        return {"files": {}}
    with open(p) as fh:
        return json.load(fh)


def _file_key(path: str) -> str:
    st = os.stat(path)
    return f"{os.path.abspath(path)}|{st.st_size}|{st.st_mtime_ns}"


def _apply_copy_journal(table_dir: str) -> bool:
    """Finish (or replay) a journaled COPY INTO: adopt the staged files into
    data/, merge the file keys into the copy log, clear the journal. Every
    step is idempotent, so a crash anywhere after the journal write is
    recovered by the next copy_into() call (or a reader's journal-repair
    pass). Callers hold the table's commit lock. Returns True if applied.

    A staged file that vanished WITHOUT its destination existing is data
    loss (a rival clobbered the stage, or manual cleanup): raise so the
    journal stays pending and the loss surfaces — flipping it applied would
    mark the source files loaded while their rows never reached data/, and
    retries would then skip them forever."""
    jpath = os.path.join(table_dir, "_copy_journal.json")
    if not os.path.exists(jpath):
        return False
    with open(jpath) as fh:
        journal = json.load(fh)
    os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
    for src, dest in journal["adds"].items():
        if os.path.exists(src):
            os.replace(src, dest)
        elif not os.path.exists(dest):
            raise RuntimeError(
                f"copy_into: staged file {src} lost before rename to {dest}; "
                "journal left pending"
            )
    log = _load_log(table_dir)
    log["files"].update(journal["log_files"])
    tmp = _log_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(log, fh, indent=1)
    os.replace(tmp, _log_path(table_dir))
    os.remove(jpath)
    import shutil

    # per-call stage dirs since round 4; the fixed _copy_tmp is the legacy
    # location a pre-upgrade journal may still point at
    stage_dir = journal.get("stage_dir", os.path.join(table_dir, "_copy_tmp"))
    shutil.rmtree(stage_dir, ignore_errors=True)
    return True


def copy_into(
    spark: SparkSession,
    table_dir: str,
    files: list[str],
    fmt: str = "parquet",
    csv_options: dict | None = None,
) -> dict:
    """Load ``files`` into the chunked table at ``table_dir``; skip files
    already recorded in the copy log. Returns {loaded_files, skipped_files,
    appended_rows}.

    Idempotence mechanics: duplicate listings within one call dedupe on the
    file key; the append is STAGED to a per-call ``_copy_tmp-<uuid>`` dir
    and committed via a journal (adds + log entries + stage dir) written
    atomically BEFORE any file becomes visible — a crash before the journal
    leaves only stage garbage (the retry reloads from scratch), a crash
    after it is replayed to completion at the next call, so the retry can
    never double-append.

    Concurrency-safe: the journal write + apply is read-modify-write of the
    copy log, so it runs under the table's ``commit_lock`` (the same lock
    every other commit on the table takes), and the skip-check is REDONE
    under the lock — a rival call that loaded an overlapping file while we
    were staging is detected, our stage is discarded, and the call retries
    (the overlap now skips). Two concurrent calls can therefore never
    double-load a file, clobber each other's stage (per-call dirs), or mark
    a file loaded whose rows never reached ``data/``."""
    import shutil
    import uuid

    from btrblocks_spark.format.maintenance import commit_lock

    with commit_lock(table_dir):
        _apply_copy_journal(table_dir)  # finish a crashed predecessor first
        log = _load_log(table_dir)
    meta = read_metadata(table_dir)
    pending_by_key: dict[str, str] = {}
    skipped = []
    for f in sorted(files):
        key = _file_key(f)
        if key in log["files"]:
            skipped.append(f)
        else:
            # dedupe within the call: the same file listed twice is one load
            pending_by_key.setdefault(key, f)
    pending = sorted((f, k) for k, f in pending_by_key.items())

    appended = 0
    if pending:
        paths = [f for f, _k in pending]
        cols = [c["name"] for c in meta["schema"]]
        if fmt == "parquet":
            df = spark.read.parquet(*paths)
        elif fmt == "csv":
            opts = {"header": "true", **(csv_options or {})}
            schema = ", ".join(f"{c['name']} {c['type']}" for c in meta["schema"])
            df = spark.read.options(**opts).schema(schema).csv(paths)
        else:
            raise ValueError(f"unsupported format {fmt!r}")
        # per-call stage dir: concurrent calls must not overwrite each
        # other's staged rows (the fixed-path round-3 clobber bug)
        tmp_dir = os.path.join(table_dir, f"_copy_tmp-{uuid.uuid4().hex}")
        (
            df.select(*cols)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", meta["block_size"])
            .option("compression", "zstd")
            .parquet(tmp_dir)
        )
        # row count from the staged footers — no second data scan
        import pyarrow.parquet as pq

        staged = sorted(
            os.path.join(r, x)
            for r, _s, fs in os.walk(tmp_dir)
            for x in fs
            if x.endswith(".parquet")
        )
        appended = sum(pq.ParquetFile(s).metadata.num_rows for s in staged)
        adds = {
            s: os.path.join(
                table_dir, "data", f"copy-{uuid.uuid4().hex}-{i:05d}.parquet"
            )
            for i, s in enumerate(staged)
        }
        lost_race = False
        with commit_lock(table_dir):
            _apply_copy_journal(table_dir)
            log2 = _load_log(table_dir)
            if any(key in log2["files"] for _f, key in pending):
                # lost a race: a rival loaded an overlapping file while we
                # staged. Discard our stage and retry OUTSIDE the lock (the
                # lock is not re-entrant) — the overlap is now recorded in
                # the log and skips cleanly.
                shutil.rmtree(tmp_dir, ignore_errors=True)
                lost_race = True
            else:
                journal = {
                    "adds": adds,
                    "log_files": {
                        key: {"path": os.path.abspath(f), "rows": None}
                        for f, key in pending
                    },
                    "stage_dir": tmp_dir,
                }
                jpath = os.path.join(table_dir, "_copy_journal.json")
                with open(jpath + ".tmp", "w") as fh:
                    json.dump(journal, fh)
                os.replace(jpath + ".tmp", jpath)  # commit point
                _apply_copy_journal(table_dir)
        if lost_race:
            return copy_into(spark, table_dir, files, fmt, csv_options)

    return {
        "loaded_files": len(pending),
        "skipped_files": len(skipped),
        "appended_rows": int(appended),
    }
