"""Model-based document scoring — the batched-inference plumbing of a
training-data pipeline (fasttext-style quality classifier, toxicity filter,
educational-value scorer, ...).

The Spark shape is what matters and is fully real here: model parameters
ride to executors inside the serialized kernel closure (a real model would
broadcast a weights blob the same way), documents cross into Python as
Arrow batches via ``mapInPandas``, scoring is per-batch and stateless, and
the output is a narrow map — NO shuffle anywhere, so at 100 TB inference
cost is exactly one pass over the corpus at whatever parallelism the scan
has.

The stub "model" is a linear bag-of-words scorer with hash-derived integer
weights (weight(token) = hash32(token) mod 2001 - 1000, in milli-units):
deterministic, dependency-free, and exactly replayable in SQL — so the
oracle checks the REAL pipeline arithmetic end-to-end (integer-exact logit
accumulation; transcendentals only after rounding). Swapping in a real
classifier changes only the per-batch scoring function.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SCORE_SCHEMA = "doc_id long, n_tokens long, logit double, score double"


def _round6(x: float) -> float:
    """round(x, 6) with SQL semantics (half away from zero on the scaled
    double, like DuckDB/C++ std::round) — Python's builtin round is
    half-to-even and disagrees on exact .5 ties."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def _token_weight_millis(token: str) -> int:
    """hash32(token) % 2001 - 1000 — integer milli-weight in [-1000, 1000]."""
    h = int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16)
    return (h % 2001) - 1000


def _score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # yield PER ARROW BATCH: accumulating the whole partition into Python
    # lists before one final yield would make executor memory scale with
    # partition size instead of batch size (the contract the module
    # docstring promises), OOM-killing the worker on multi-GB partitions
    for pdf in it:
        out_ids, out_n, out_logit, out_score = [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            toks = (text or "").split(" ")
            n = len(toks)
            # exact integer accumulation; floats appear only at the final
            # division (then round) — bit-reproducible in any engine
            s = sum(_token_weight_millis(t) for t in toks)
            logit = _round6(s / (1000.0 * n))
            score = _round6(1.0 / (1.0 + math.exp(-logit)))
            out_ids.append(doc_id)
            out_n.append(n)
            out_logit.append(logit)
            out_score.append(score)
        yield pd.DataFrame(
            {"doc_id": out_ids, "n_tokens": out_n, "logit": out_logit, "score": out_score}
        )


def score_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score every document with the (stub) classifier: mean token weight
    as a logit, sigmoid to [0, 1]. One narrow mapInPandas pass."""
    slim = docs.select(
        docs[id_col].alias("doc_id"), docs[text_col].alias("text")
    )
    return slim.mapInPandas(_score_batches, SCORE_SCHEMA)
