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
    recovered by the next copy_into() call. Returns True if applied."""
    jpath = os.path.join(table_dir, "_copy_journal.json")
    if not os.path.exists(jpath):
        return False
    with open(jpath) as fh:
        journal = json.load(fh)
    for src, dest in journal["adds"].items():
        if os.path.exists(src):
            os.replace(src, dest)
    log = _load_log(table_dir)
    log["files"].update(journal["log_files"])
    tmp = _log_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(log, fh, indent=1)
    os.replace(tmp, _log_path(table_dir))
    os.remove(jpath)
    import shutil

    shutil.rmtree(os.path.join(table_dir, "_copy_tmp"), ignore_errors=True)
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
    file key; the append is STAGED to ``_copy_tmp`` and committed via a
    journal (adds + log entries) written atomically BEFORE any file becomes
    visible — a crash before the journal leaves only tmp garbage (the retry
    reloads from scratch), a crash after it is replayed to completion at
    the next call, so the retry can never double-append."""
    import uuid

    _apply_copy_journal(table_dir)
    meta = read_metadata(table_dir)
    log = _load_log(table_dir)
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
        tmp_dir = os.path.join(table_dir, "_copy_tmp")
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
        journal = {
            "adds": adds,
            "log_files": {
                key: {"path": os.path.abspath(f), "rows": None}
                for f, key in pending
            },
        }
        jpath = os.path.join(table_dir, "_copy_journal.json")
        with open(jpath + ".tmp", "w") as fh:
            json.dump(journal, fh)
        os.replace(jpath + ".tmp", jpath)  # commit point
        _apply_copy_journal(table_dir)

    return {
        "loaded_files": len(pending),
        "skipped_files": len(skipped),
        "appended_rows": int(appended),
    }
