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


def _score_label(docs: DataFrame) -> DataFrame:
    """The (score, y) projection shared by threshold_sweep and
    calibration_bins — one definition so the operating-point sweep and the
    reliability diagram can never drift apart (it mirrors the oracle side's
    shared ``_SCORE_SQL`` CTE, queries/pipeline_queries.py). Score is the
    stream scorer's margin with weights scaled to EXACT INTEGERS (×20000):
    score = n_chars + 2·n_words − 4·n_periods; label y = (n_chars > 250)."""
    return docs.select(
        (
            F.col("n_chars")
            + 2 * F.size(F.split("text", " "))
            - 4 * (F.length("text") - F.length(F.regexp_replace("text", "\\.", "")))
        )
        .cast("long")
        .alias("score"),
        (F.col("n_chars") > 250).cast("long").alias("y"),
    )


def threshold_sweep(docs: DataFrame, n_steps: int = 10) -> DataFrame:
    """Operating-point selection for the quality filter: sweep an 11-point
    threshold grid over the classifier score and report the exact confusion
    matrix + precision/recall/F1 at each threshold — the curve a pipeline
    owner reads to pick the keep/drop cut before a 100 TB filter run.

    The score is the stream scorer's margin with weights scaled to EXACT
    INTEGERS (×20000): score = n_chars + 2·n_words − 4·n_periods, so every
    comparison, bin edge, and count is integer arithmetic — no FP
    reduction-order risk anywhere; the final P/R/F1 are single scalar
    divisions of exact counts. Label: the same separable length label the
    trainer uses (n_chars > 250).

    Shape: one scan computes (score, y); min/max reduce to a broadcast
    1-row frame; the grid cross-join fans each row to 11 threshold rows
    (bounded constant), then one map-side-combined groupBy(threshold)."""
    s = _score_label(docs)
    bounds = s.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_steps}), "
                f"i -> lo + CAST(i * (hi - lo) AS LONG) DIV {n_steps})"
            )
        ).alias("threshold")
    ).distinct()
    j = s.crossJoin(F.broadcast(grid))
    agg = j.groupBy("threshold").agg(
        F.sum(((F.col("score") >= F.col("threshold")) & (F.col("y") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("score") >= F.col("threshold")) & (F.col("y") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("score") < F.col("threshold")) & (F.col("y") == 1)).cast("long")).alias("fn"),
        F.sum(((F.col("score") < F.col("threshold")) & (F.col("y") == 0)).cast("long")).alias("tn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"), 6),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"), 6),
    )
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        F.round(
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
            6,
        ),
    )
    return agg.select(
        "threshold", "tp", "fp", "fn", "tn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def calibration_bins(docs: DataFrame, n_bins: int = 10) -> DataFrame:
    """Reliability diagram for the quality score: equal-width integer bins
    over the scaled score, each reporting its size, empirical positive
    rate, normalized mean score, and the calibration gap |rate − score| —
    the per-bin decomposition of expected calibration error.

    All bin edges and sums are exact integers (score is integer-scaled, the
    per-bin score sum is Σ(score−lo) as BIGINT); each reported double is a
    single scalar division of exact aggregates — bit-deterministic under
    any partition order."""
    s = _score_label(docs)
    bounds = s.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    b = s.crossJoin(F.broadcast(bounds)).select(
        "score",
        "y",
        "lo",
        "hi",
        F.least(
            F.lit(n_bins - 1),
            F.expr(f"CAST((score - lo) * {n_bins} AS LONG) DIV greatest(hi - lo + 1, 1)"),
        ).alias("bin"),
    )
    agg = b.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.col("score") - F.col("lo")).cast("long").alias("sum_off"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
    )
    frac = F.round(F.col("n_pos").cast("double") / F.col("n").cast("double"), 6)
    mean_norm = F.round(
        F.col("sum_off").cast("double")
        / (F.col("n") * F.greatest(F.col("hi") - F.col("lo"), F.lit(1))).cast("double"),
        6,
    )
    return agg.select(
        "bin",
        "n",
        F.col("n_pos"),
        frac.alias("frac_pos"),
        mean_norm.alias("mean_score_norm"),
        F.round(F.abs(frac - mean_norm), 6).alias("calibration_gap"),
    )
