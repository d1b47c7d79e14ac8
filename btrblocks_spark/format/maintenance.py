"""Versioned-table maintenance: DELETE, VACUUM, time travel.

Complements the CDC path (streaming/ops.streaming_upsert writes immutable
``v=N`` version directories behind an atomically-swapped ``_latest``
pointer). The reference format is write-once with no row-level mutation
(chunks are immutable, compression/Datablock.cpp:27-52); a lakehouse table
needs the three ops layered on top — all copy-on-write against immutable
versions, never in-place edits:

  delete_where   anti-filter rewrite: new version = snapshot minus matching
                 rows. The filter is a Catalyst predicate, so at 100 TB the
                 rewrite scans with pushdown and only rewrites data — no
                 shuffle at all (narrow filter + write).
  vacuum         drop version directories no longer reachable (older than
                 the retained tail). Pure metadata/IO, never touches the
                 pointer target.
  read_version   time travel: read any still-vacuumed-in version.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from btrblocks_spark.streaming.ops import read_snapshot


def _versions(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("v=") and os.path.isdir(os.path.join(table_dir, d))
    )


def _latest_version(table_dir: str) -> int | None:
    ptr = os.path.join(table_dir, "_latest")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return int(fh.read().strip())


def read_version(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    """Time travel: read an explicit committed version."""
    path = os.path.join(table_dir, f"v={version}")
    if not os.path.isdir(path):
        raise ValueError(f"version {version} not present (vacuumed or never written)")
    return spark.read.parquet(path)


def delete_where(spark: SparkSession, table_dir: str, predicate: str) -> dict:
    """Row-level DELETE as a copy-on-write version commit: write a new
    version holding ``NOT predicate`` (null-safe: rows where the predicate
    is NULL are kept, matching SQL DELETE semantics), swap the pointer.

    Readers keep snapshot isolation — a concurrent reader on the old
    pointer sees the old version until it re-resolves ``_latest``."""
    current = read_snapshot(spark, table_dir)
    if current is None:
        raise ValueError(f"no committed table at {table_dir}")
    keep = current.filter(~F.coalesce(F.expr(predicate), F.lit(False)))
    deleted = current.count() - keep.count()
    next_v = (_versions(table_dir) or [-1])[-1] + 1
    keep.write.mode("overwrite").parquet(os.path.join(table_dir, f"v={next_v}"))
    tmp = os.path.join(table_dir, "_latest.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(next_v))
    os.replace(tmp, os.path.join(table_dir, "_latest"))
    return {"version": next_v, "deleted_rows": int(deleted)}


def vacuum(table_dir: str, keep_versions: int = 2) -> dict:
    """Remove version directories older than the newest ``keep_versions``.
    The pointer target is always retained regardless of age."""
    latest = _latest_version(table_dir)
    versions = _versions(table_dir)
    retain = set(versions[-max(keep_versions, 1):])
    if latest is not None:
        retain.add(latest)
    removed = []
    for v in versions:
        if v not in retain:
            shutil.rmtree(os.path.join(table_dir, f"v={v}"))
            removed.append(v)
    return {"removed_versions": removed, "retained_versions": sorted(retain)}
