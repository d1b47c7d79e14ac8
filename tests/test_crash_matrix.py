"""Systematic crash-injection matrix over the write-ahead commit protocols.

The round-3/4 write-path hardening claims "a crash at ANY point recovers
exactly-once". The existing tests each pin ONE hand-picked crash point;
this matrix pins ALL of them: every ``os.replace`` a commit performs (WAL
intent writes, state flips, file renames) is made to fail in turn, and
after each injected crash the protocol's recovery path must restore the
exactly-once invariant — no lost rows, no duplicates, no wedged table.

Injection patches ``os.replace`` process-wide for the driver-side commit
window only (the distributed data writes are JVM-side and never call the
Python os module), counting calls so run k fails exactly at the k-th
replace — the crash slides through the protocol step by step.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from btrblocks_spark.config import DEFAULT_CONFIG
from btrblocks_spark.format.writer import write_table
from btrblocks_spark.tables import load_table


class _CrashAfter:
    """os.replace stand-in that succeeds n times, then raises."""

    def __init__(self, n: int, real):
        self.n = n
        self.real = real
        self.calls = 0

    def __call__(self, src, dst):
        self.calls += 1
        if self.calls > self.n:
            raise OSError(f"injected crash at os.replace #{self.calls}")
        return self.real(src, dst)


def _visible_rows(path: str) -> int:
    """Rows a btrblocks reader sees: only final *.parquet files (plain
    spark.read.parquet would also read staged .inflight files — Spark's
    listing filters only _/. prefixes, not extensions)."""
    import pyarrow.parquet as pq

    from btrblocks_spark.format.fs import list_parquet_files

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in list_parquet_files(os.path.join(path, "data"))
    )


def _count_replaces(fn) -> int:
    """Total os.replace calls a clean run performs."""
    real = os.replace
    counter = _CrashAfter(10**9, real)
    os.replace = counter
    try:
        fn()
    finally:
        os.replace = real
    return counter.calls


@pytest.mark.slow  # excluded from the default (driver-window) run; see pytest.ini
def test_batch_append_commit_crash_matrix(spark, sf_dir, tmp_path):
    """df.write.format('btrblocks') commit: crash at every os.replace step;
    recover_pending_appends (or abort rollback) must land on exactly the
    committed-or-nothing row count, never a torn/wedged table."""
    from btrblocks_spark.sources.btr_datasource import (
        BtrBlocksWriter,
        recover_pending_appends,
    )

    nation = load_table(spark, sf_dir, "nation")
    pdf = nation.limit(10).toPandas()
    n_add = len(pdf)
    cfg = DEFAULT_CONFIG.with_(block_size=4)

    def fresh_table(tag: str) -> str:
        dst = str(tmp_path / f"bt_{tag}")
        write_table(nation.limit(0), dst, ["n_nationkey"], config=cfg)
        return dst

    def run_commit(dst: str):
        w = BtrBlocksWriter({"path": dst}, nation.schema, overwrite=False)
        msg = w.write(iter(pa.Table.from_pandas(pdf).to_batches()))
        w.commit([msg])
        return w, msg

    total = _count_replaces(lambda: run_commit(fresh_table("probe")))
    assert total >= 3  # intent write + >=1 rename + committed flip

    spark.dataSource.register  # noqa: B018 — datasource import side effects
    for k in range(total):
        dst = fresh_table(f"k{k}")
        w = BtrBlocksWriter({"path": dst}, nation.schema, overwrite=False)
        msg = w.write(iter(pa.Table.from_pandas(pdf).to_batches()))
        real = os.replace
        os.replace = _CrashAfter(k, real)
        try:
            with pytest.raises(OSError, match="injected"):
                w.commit([msg])
        finally:
            os.replace = real
        # recovery: either the intent never landed (nothing to do, data
        # stays invisible => re-run the append) or it did (finish it)
        recovered = recover_pending_appends(dst)
        got = _visible_rows(dst)
        if recovered:
            assert got == n_add, f"crash@{k}: torn append after recovery"
        else:
            assert got == 0, f"crash@{k}: rows visible without an intent"
            # the caller's retry path: a fresh commit must work
            run_commit(dst)
            assert (
                _visible_rows(dst) == n_add
            )
        with open(os.path.join(dst, "_appends.json")) as fh:
            assert all(e["state"] == "committed" for e in json.load(fh))


def test_exactly_once_append_crash_matrix(spark, sf_dir, tmp_path):
    """exactly_once_chunked_append: crash at every os.replace of the journal
    protocol, then REPLAY the same (scope, batch) — the replay must adopt or
    drop so the table holds the batch exactly once."""
    from btrblocks_spark.streaming.ops import exactly_once_chunked_append

    nation = load_table(spark, sf_dir, "nation")
    batch = nation.limit(7)
    n_add = batch.count()

    def run(path: str):
        exactly_once_chunked_append(batch, path, 0, block_size=4, scope="ck")

    probe = str(tmp_path / "eo_probe")
    os.makedirs(probe)
    total = _count_replaces(lambda: run(probe))
    assert total >= 3

    for k in range(total):
        path = str(tmp_path / f"eo_{k}")
        os.makedirs(path)
        real = os.replace
        os.replace = _CrashAfter(k, real)
        try:
            with pytest.raises(OSError, match="injected"):
                run(path)
        finally:
            os.replace = real
        run(path)  # Spark's at-least-once replay of the same batch
        got = _visible_rows(path)
        assert got == n_add, f"crash@{k}: not exactly-once after replay"
        with open(os.path.join(path, "_stream_batches.json")) as fh:
            log = json.load(fh)
        assert [e["state"] for e in log] == ["committed"], f"crash@{k}"


@pytest.mark.slow  # excluded from the default (driver-window) run; see pytest.ini
def test_copy_into_crash_matrix(spark, sf_dir, tmp_path):
    """copy_into: crash at every os.replace of the journal protocol, then
    RETRY the same call — each source file's rows must land exactly once
    and its key must only be logged once its rows are adoptable."""
    from btrblocks_spark.sources.copy_into import copy_into

    nation = load_table(spark, sf_dir, "nation")
    n_add = nation.count()
    stage = str(tmp_path / "mkdrop")
    nation.coalesce(1).write.mode("overwrite").parquet(stage)
    pf = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    drop = str(tmp_path / "drop.parquet")
    os.rename(os.path.join(stage, pf), drop)
    cfg = DEFAULT_CONFIG.with_(block_size=8)

    def fresh(tag: str) -> str:
        dst = str(tmp_path / f"ci_{tag}")
        write_table(nation.limit(0), dst, ["n_nationkey"], config=cfg)
        return dst

    probe = fresh("probe")
    total = _count_replaces(lambda: copy_into(spark, probe, [drop]))
    assert total >= 2  # journal commit + log write at minimum

    for k in range(total):
        dst = fresh(f"k{k}")
        real = os.replace
        os.replace = _CrashAfter(k, real)
        try:
            with pytest.raises(OSError, match="injected"):
                copy_into(spark, dst, [drop])
        finally:
            os.replace = real
        res = copy_into(spark, dst, [drop])  # orchestration retry
        got = _visible_rows(dst)
        assert got == n_add, f"crash@{k}: rows not exactly-once after retry"
        assert res["loaded_files"] + res["skipped_files"] == 1
        assert not os.path.exists(os.path.join(dst, "_copy_journal.json"))
        with open(os.path.join(dst, "_copy_log.json")) as fh:
            assert len(json.load(fh)["files"]) == 1, f"crash@{k}"
