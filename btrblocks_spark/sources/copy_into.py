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


def copy_into(
    spark: SparkSession,
    table_dir: str,
    files: list[str],
    fmt: str = "parquet",
    csv_options: dict | None = None,
) -> dict:
    """Load ``files`` into the chunked table at ``table_dir``; skip files
    already recorded in the copy log. Returns {loaded_files, skipped_files,
    appended_rows}."""
    meta = read_metadata(table_dir)
    log = _load_log(table_dir)
    pending, skipped = [], []
    for f in sorted(files):
        key = _file_key(f)
        (skipped if key in log["files"] else pending).append((f, key))

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
        df = df.select(*cols)
        appended = df.count()
        (
            df.write.mode("append")
            .option("maxRecordsPerFile", meta["block_size"])
            .option("compression", "zstd")
            .parquet(os.path.join(table_dir, "data"))
        )
        for f, key in pending:
            log["files"][key] = {"path": os.path.abspath(f), "rows": None}
        tmp = _log_path(table_dir) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(log, fh, indent=1)
        os.replace(tmp, _log_path(table_dir))

    return {
        "loaded_files": len(pending),
        "skipped_files": len(skipped),
        "appended_rows": int(appended),
    }
