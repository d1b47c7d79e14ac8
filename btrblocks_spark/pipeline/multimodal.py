"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas kernels.

The decode step itself is STUBBED (no image/audio libraries in this
environment — see ``decode_batch``); everything around it — schema,
deterministic metadata, batch shape, ``mapInPandas`` plumbing, partitioning
— is real and tested. Swapping the stub for PIL/libav is a one-function
change.

Scale notes: payloads ride in the DataFrame as binary columns → Parquet
keeps them page-compressed and column-pruned (a metadata-only query never
reads payload bytes). ``mapInPandas`` streams Arrow record batches through
Python, so executor memory is bounded by batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``), not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrblocks_spark.pipeline.text import hash32

FORMATS = ("png", "jpeg", "wav")

FEATURE_SCHEMA = (
    "doc_id long, fmt string, width int, height int, n_bytes long, "
    "byte_mean double, frames int"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic opaque binary payload + typed metadata per
    document (utf-8 bytes of the text stand in for media bytes; format and
    dimensions derive from the content hash)."""
    h = hash32(F.col("text"))
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.element_at(F.array(*[F.lit(f) for f in FORMATS]), (h % 3 + 1).cast("int")).alias("fmt"),
        (64 + h % 512).cast("int").alias("width"),
        (64 + F.shiftright(h, 4) % 512).cast("int").alias("height"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
    )


def decode_batch(pdf: pd.DataFrame, real_decode: bool = False) -> pd.DataFrame:
    """Per-batch feature extraction. ``real_decode=True`` is the hook for an
    actual media decoder and raises until one is wired in."""
    if real_decode:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "environment; the deterministic fake below exercises the full "
            "Spark plumbing (schema, batching, partitioning)"
        )
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "fmt": pdf["fmt"],
            "width": pdf["width"],
            "height": pdf["height"],
            "n_bytes": payloads.str.len().astype("int64"),
            # deterministic fake "decoded feature": mean byte value
            "byte_mean": [
                round(sum(b) / len(b), 6) if len(b) else 0.0 for b in payloads
            ],
            # fake frame count: one frame per 4 KiB, min 1
            "frames": [max(1, len(b) // 4096) for b in payloads],
        }
    )


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_batch(pdf, real_decode)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: passes payloads through the pandas boundary with new
    target dimensions in metadata (decode+resample stubbed)."""
    schema = "doc_id long, fmt string, width int, height int, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "fmt", "payload"]].copy()
            out["width"] = target_w
            out["height"] = target_h
            yield out[["doc_id", "fmt", "width", "height", "payload"]]

    return media.mapInPandas(run, schema)


def frame_sample_stub(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emits one row per
    sampled 'frame' (4 KiB slice) — demonstrates the 1→N mapInPandas shape."""
    schema = "doc_id long, frame_no int, frame_bytes binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r["payload"]
                n_frames = max(1, len(payload) // 4096)
                for f in range(0, n_frames, every_n):
                    rows.append((r["doc_id"], f, payload[f * 4096 : (f + 1) * 4096]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_bytes"])

    return media.mapInPandas(run, schema)


def audio_windows_stub(
    media: DataFrame, window_bytes: int = 1024, hop_bytes: int = 512
) -> DataFrame:
    """Audio-modality plumbing: slice each binary payload into overlapping
    fixed-size windows (the STFT-frame access pattern) and compute a
    deterministic per-window energy (sum of byte values — the stand-in for
    RMS until an audio library decodes real samples; the windowing,
    overlap, batch fan-out, and schema are the real, tested parts).

    Scale: narrow mapInPandas — each payload windows independently,
    no shuffle; fan-out is len/hop rows per document."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "window_idx": [], "start": [], "win_len": [], "energy": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx, start in enumerate(range(0, len(b), hop_bytes)):
                    w = b[start : start + window_bytes]
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(idx)
                    out["start"].append(start)
                    out["win_len"].append(len(w))
                    out["energy"].append(
                        int(np.frombuffer(w, dtype=np.uint8).astype(np.int64).sum())
                    )
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, window_idx int, start long, win_len int, energy long"
    )
