"""Distributed, deterministic classifier training — the missing half of
model-based curation (pipeline/inference.py scores with a trained model;
this trains one). A 100-TB pipeline trains quality classifiers over corpus
features (fastText-style) and then scores/filters with them; here the
trainer is batch gradient descent for logistic regression expressed as
Spark aggregations, so it scales exactly like any other reduction.

Determinism contract (the repo-wide cross-engine pattern): every per-row
gradient contribution is rounded to 6 dp and summed as DECIMAL(38,6) —
distributed aggregation order can never move a bit — and the driver-side
weight update uses only IEEE operations both engines replicate verbatim
(CAST(decimal AS DOUBLE), multiply by an exactly-representable learning
rate, divide by the integer row count, fixed association order). The
whole training run is therefore SQL-oracle-checkable iteration by
iteration.

Scale shape: one narrow map + one map-side-combinable aggregate per
iteration over the feature frame; the driver holds only the O(features)
weight vector. No shuffle of the corpus, no collect of rows — the same
plan at 100 TB, with gradient partials combining tree-wise across
executors.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _z_expr(w: list[float], feature_cols: list[str]):
    """Fixed-association score: ((w0 + w1*x1) + w2*x2) + ... — the oracle
    SQL writes the identical chain, so both engines round identically."""
    z = F.lit(float(w[0]))
    for wj, c in zip(w[1:], feature_cols):
        z = z + F.lit(float(wj)) * F.col(c)
    return z


def logreg_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iterations: int = 2,
    lr: float = 0.0625,
) -> dict:
    """Train logistic regression by deterministic batch GD.

    Returns {"weights": [bias, w1, ...], "n": row_count}. ``lr`` must be
    exactly representable in binary (default 1/16) so the update arithmetic
    is reproducible from its decimal literal in SQL.

    Iteration 1 starts at w = 0 where sigmoid is exactly 0.5 — the first
    gradient is pure rational arithmetic; later iterations round the
    sigmoid-bearing contribution to 6 dp before the decimal sum (the
    round-then-decimal-sum contract used across the stats battery).
    """
    n = None
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(iterations):
        z = _z_expr(w, feature_cols)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = F.col(label_col) - p
        aggs = [F.count(F.lit(1)).alias("_n")]
        aggs.append(
            F.sum(F.round(resid, 6).cast("decimal(38,6)")).alias("g0")
        )
        for j, c in enumerate(feature_cols, start=1):
            aggs.append(
                F.sum(F.round(resid * F.col(c), 6).cast("decimal(38,6)")).alias(
                    f"g{j}"
                )
            )
        row = feats.agg(*aggs).collect()[0]
        n = int(row["_n"])
        for j in range(len(w)):
            g = row[f"g{j}"]
            g = float(g if g is not None else Decimal(0))
            # same IEEE sequence the oracle writes: w + (lr * CAST(g)) / n
            w[j] = w[j] + (lr * g) / n
    return {"weights": w, "n": n}


def logreg_predict(
    feats: DataFrame, weights: list[float], feature_cols: list[str]
) -> DataFrame:
    """Score rows with trained weights: adds ``z`` (margin) and ``pred``
    (z > 0). Decision threshold 0.5 on the sigmoid is exactly z > 0, so
    predictions never touch exp() — bit-stable everywhere."""
    z = _z_expr(weights, feature_cols)
    return feats.withColumn("z", z).withColumn(
        "pred", (F.col("z") > 0).cast("int")
    )


def second_moment_matrix(
    vectors: DataFrame, vec_col: str = "embedding", scale: int = 1_000_000
) -> DataFrame:
    """Exact distributed Gram/second-moment matrix of an embedding column —
    the reduction behind PCA whitening, covariance shrinkage, and linear
    probes over a corpus of vectors.

    Exactness contract: each ROW's outer product is quantized with
    floor(x_i * x_j * scale + 0.5) — round-half-up, the identical IEEE
    expression the SQL oracle writes — and the quantized contributions sum
    as int64, so the reduction is bit-exact under any partitioning and
    matches DuckDB's integer sum. Upper triangle only (i <= j).

    Scale: the corpus is read once, map-side reduced to d*(d+1)/2 integers
    per partition; the only shuffle is the tiny final combine. Same plan at
    100 TB x 4096 dims (partial sums stay O(d^2) per executor)."""
    import numpy as np

    d_probe = len(vectors.select(vec_col).first()[0])
    iu = np.triu_indices(d_probe)

    def run(batches):
        import pandas as pd_

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # per-row quantized outer products, summed exactly as int64
            prods = np.einsum("ni,nj->nij", x, x)[:, iu[0], iu[1]]
            q = np.floor(prods * scale + 0.5).astype(np.int64).sum(axis=0)
            yield pd_.DataFrame(
                {"i": iu[0] + 1, "j": iu[1] + 1, "s": q}
            )

    partial = vectors.select(vec_col).mapInPandas(run, "i int, j int, s long")
    return (
        partial.groupBy("i", "j")
        .agg(F.sum("s").alias("s_scaled"))
        .select(
            "i",
            "j",
            "s_scaled",
            (F.col("s_scaled").cast("double") / F.lit(float(scale))).alias("m"),
        )
    )


def pca_power_iteration(
    vectors: DataFrame, vec_col: str = "embedding", iterations: int = 8
) -> list[float]:
    """Dominant eigenvector of the second-moment matrix by power iteration.
    The matrix is an exact integer-quantized reduction (above), collected
    as O(d^2) scalars; iteration runs driver-side in numpy (deterministic:
    fixed start vector of ones, fixed iteration count, no data-dependent
    branching). Returns the unit eigenvector."""
    import numpy as np

    rows = second_moment_matrix(vectors, vec_col).collect()
    d = max(r["j"] for r in rows)
    m = np.zeros((d, d))
    for r in rows:
        m[r["i"] - 1, r["j"] - 1] = r["m"]
        m[r["j"] - 1, r["i"] - 1] = r["m"]
    v = np.ones(d) / np.sqrt(d)
    for _ in range(iterations):
        v = m @ v
        v = v / np.linalg.norm(v)
    return [float(x) for x in v]
