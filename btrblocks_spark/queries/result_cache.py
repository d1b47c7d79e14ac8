"""Query result cache — the warehouse result-cache feature on top of the
engine: a query's materialized output is keyed by (query name, digest of
its input tables' file states), so an unchanged-input re-run is a parquet
read instead of a recompute, and ANY input change (new file, append,
compaction) invalidates automatically.

The digest is the same file-level identity copy_into uses for idempotent
ingest (path + size + mtime) — pure filesystem metadata, no data read.

Scale: the cache stores RESULTS (usually tiny: rollups, top-k, one-row
summaries); the check is O(input files) stat calls. A cluster deployment
points cache_root at shared storage and gains cross-session reuse."""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession


def _inputs_digest(input_paths: list[str]) -> str:
    entries = []
    for p in sorted(input_paths):
        if os.path.isdir(p):
            for r, _d, fs in sorted(os.walk(p)):
                for f in sorted(fs):
                    fp = os.path.join(r, f)
                    st = os.stat(fp)
                    entries.append(f"{fp}|{st.st_size}|{st.st_mtime_ns}")
        elif os.path.exists(p):
            st = os.stat(p)
            entries.append(f"{p}|{st.st_size}|{st.st_mtime_ns}")
    return hashlib.sha256("\n".join(entries).encode()).hexdigest()[:24]


def cached_result(
    spark: SparkSession,
    name: str,
    input_paths: list[str],
    compute,
    cache_root: str,
) -> tuple[DataFrame, bool]:
    """Return (result, hit). On miss, ``compute()`` runs and its output is
    materialized under the digest key; on hit the parquet result is read
    back and ``compute`` is never invoked."""
    digest = _inputs_digest(input_paths)
    slot = os.path.join(cache_root, f"{name}__{digest}")
    marker = os.path.join(slot, "_SUCCESS_META")
    if os.path.exists(marker):
        return spark.read.parquet(os.path.join(slot, "data")), True
    df = compute()
    os.makedirs(slot, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(slot, "data"))
    with open(marker, "w") as fh:
        json.dump({"name": name, "digest": digest}, fh)
    return spark.read.parquet(os.path.join(slot, "data")), False
