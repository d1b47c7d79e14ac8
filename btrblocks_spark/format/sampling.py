"""Run-preserving stratified sampling (reference T3,
stats/NumberStats.hpp:34-76): take n contiguous runs of ``run_len`` values
from a chunk. Unlike ``df.sample`` (row-iid), contiguous runs preserve the
run structure RLE/frequency estimation depends on.

Deterministic variant: runs start at evenly spaced offsets (the reference
randomizes; determinism keeps the planner reproducible and testable — the
estimate quality is equivalent for evenly spread strata)."""

from __future__ import annotations

import numpy as np


def run_sample_indices(n: int, sample_count: int = 10, run_len: int = 64) -> np.ndarray:
    total = sample_count * run_len
    if n <= total:
        return np.arange(n)
    stride = n // sample_count
    starts = np.arange(sample_count) * stride
    # clamp final run inside the chunk
    starts = np.minimum(starts, n - run_len)
    idx = (starts[:, None] + np.arange(run_len)[None, :]).ravel()
    return np.unique(idx)


def run_sample(values, mask, sample_count: int = 10, run_len: int = 64):
    idx = run_sample_indices(len(values), sample_count, run_len)
    return values[idx], (mask[idx] if mask is not None else None)
