"""Filesystem abstraction for the format layer — local paths use plain
``os``/``open`` (fast path, no JVM hop); URI paths (``s3a://``, ``hdfs://``,
``file://``, ``abfss://``…) route through Hadoop's FileSystem API via py4j,
the same client Spark's own parquet scan uses.

This is what makes the compressed format object-store native (reference S7:
``tools/conversion/decompression-speed-s3.cpp:25-40`` reads the ``metadata``
blob + column parts with S3 GetObject; ``tools/conversion/s3-management.hpp``
wraps the client). Here the data files already go through Spark's
Hadoop-backed writers/readers; these helpers close the gap for the sidecar
(``_btr_metadata.json``) and file-size listing so ``write_table`` /
``read_table`` work verbatim against ``s3a://bucket/table``.

Offline-testable: ``file:///tmp/...`` URIs exercise the exact Hadoop code
path (URI parse → FileSystem.get → FSDataInput/OutputStream) that an
``s3a://`` path would, no network needed.
"""

from __future__ import annotations

import json
import os
import re

_URI_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def is_uri(path: str) -> bool:
    """True for scheme-qualified paths (s3a://…, file://…); False for plain
    local paths, which take the ``os`` fast path."""
    return bool(_URI_RE.match(path))


def _jvm_fs(spark, path: str):
    """(FileSystem, Path) for a URI via the active Hadoop configuration —
    picks up every ``fs.s3a.*`` credential/endpoint conf set on the session
    (see sources/object_store.configure_s3)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jpath


def read_text(path: str, spark=None) -> str:
    if not is_uri(path):
        with open(path) as fh:
            return fh.read()
    if spark is None:
        raise ValueError(
            f"reading {path!r} needs an active SparkSession (Hadoop FileSystem client)"
        )
    fs, jpath = _jvm_fs(spark, path)
    stream = fs.open(jpath)
    try:
        # FSDataInputStream is a java.io.InputStream; readAllBytes (Java 9+)
        # drains it fully and py4j hands it back as Python bytes
        return bytes(stream.readAllBytes()).decode("utf-8")
    finally:
        stream.close()


def write_text(path: str, text: str, spark=None) -> None:
    if not is_uri(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(text)
        return
    if spark is None:
        raise ValueError(
            f"writing {path!r} needs an active SparkSession (Hadoop FileSystem client)"
        )
    fs, jpath = _jvm_fs(spark, path)
    stream = fs.create(jpath, True)  # overwrite — sidecar is rewritten whole
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def read_json(path: str, spark=None) -> dict:
    return json.loads(read_text(path, spark))


def write_json(path: str, obj: dict, spark=None) -> None:
    write_text(path, json.dumps(obj, indent=1, default=str), spark)


def list_file_sizes(path: str, suffix: str = ".parquet", spark=None) -> list[int]:
    """Sizes of all files under ``path`` matching ``suffix`` (recursive).
    Used by write_table to size ``maxPartitionBytes`` to the largest chunk
    file — an O(num_files) metadata listing, never a data read (on S3 this
    is LIST, not GET). Applies the same Spark-visibility filter as
    ``list_parquet_files`` (skip ``_``/``.`` components): a crashed rival's
    ``_temporary`` task attempt or a staged ``.inflight`` file must never
    size a read Spark will not perform."""

    def _visible(name: str) -> bool:
        return not name.startswith(("_", "."))

    if not is_uri(path):
        out_local: list[int] = []
        for r, dirs, fs_ in os.walk(path):
            dirs[:] = [d for d in dirs if _visible(d)]
            out_local.extend(
                os.path.getsize(os.path.join(r, f))
                for f in fs_
                if f.endswith(suffix) and _visible(f)
            )
        return out_local
    if spark is None:
        raise ValueError(
            f"listing {path!r} needs an active SparkSession (Hadoop FileSystem client)"
        )
    fs, jpath = _jvm_fs(spark, path)
    base = str(jpath.toString()).rstrip("/")
    out: list[int] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        status = it.next()
        p = status.getPath()
        name = p.getName()
        if not name.endswith(suffix) or not _visible(name):
            continue
        # every path component below the listing root must be visible too
        rel = str(p.toString())[len(base):].lstrip("/")
        if any(not _visible(c) for c in rel.split("/")[:-1]):
            continue
        out.append(int(status.getLen()))
    return out


def exists(path: str, spark=None) -> bool:
    if not is_uri(path):
        return os.path.exists(path)
    if spark is None:
        raise ValueError(f"existence check on {path!r} needs a SparkSession")
    fs, jpath = _jvm_fs(spark, path)
    return bool(fs.exists(jpath))


def join(base: str, *parts: str) -> str:
    """Path join that preserves URI schemes (os.path.join mangles
    ``s3a://bucket`` on absolute-looking parts)."""
    if not is_uri(base):
        return os.path.join(base, *parts)
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out

def list_parquet_files(path: str) -> list[str]:
    """Recursive parquet listing that sees EXACTLY what a Spark read of the
    same path sees: components starting with ``_`` or ``.`` (staging dirs
    like ``_stream_stage``, ``_copy_tmp-*``, hidden files) are skipped, the
    way Hadoop's default path filter skips them. Every lister feeding a
    file-identity decision (incremental fold state, compaction stats) MUST
    use this, or the counted set and the scanned set diverge — e.g. an
    os.walk that counts staged-but-uncommitted batch files Spark never
    read. Local paths only (sorted for deterministic identity)."""
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)
