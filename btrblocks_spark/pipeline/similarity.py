"""Similarity search over an embedding column (``array<float>``).

Two paths:
  cosine_topk        exact brute-force top-k — the correctness baseline.
                     Query set × corpus join; at scale the query set is
                     broadcast (small side) and the corpus is scanned once,
                     fully parallel, with a per-query top-k (window rank
                     partitioned by query — k small, no global sort).
  lsh_bucketed_topk  a scale path: sign-sketch LSH buckets (see
                     dedup.embedding_sketch); each query only scores vectors
                     in its own bucket — corpus scan is pruned by the
                     bucket join. Recall < 1.0 by construction; bucket
                     count / plane count trade recall for cost.
  ivf_topk           the other scale path: IVF (inverted-file) index with a
                     deterministic coarse quantizer. Every vector is assigned
                     to its nearest centroid's cell (one shuffle-free pass —
                     centroids are broadcast); queries probe only the
                     ``nprobe`` nearest cells. At 100 TB the cell assignment
                     is written once at ingest (partitionBy(cell)), so a
                     query touches nprobe/ncells of the data.

Cosine arithmetic uses a fixed left-fold over the array (zip_with +
aggregate, JVM-side) so results are bit-reproducible against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from btrblocks_spark.pipeline.dedup import cosine_expr, embedding_sketch


def _as_double(vecs: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return vecs.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )


def cosine_topk(
    vecs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query id. Ties broken by
    neighbor id (deterministic)."""
    corpus = _as_double(vecs, vec_col, id_col)
    queries = corpus.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr("qv", "v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "cosine")
    )


def ivf_cells(
    vecs: DataFrame,
    centroid_stride: int = 31,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every vector to its nearest coarse centroid (the IVF build
    step). Centroids are the vectors with ``vec_id % centroid_stride == 0``
    — deterministic, so the index is reproducible and oracle-checkable
    (k-means would converge data-dependently; the plumbing is identical).

    Returns (vec_id, v, cell). One broadcast-join pass over the corpus, no
    shuffle of the vectors themselves; at scale this is the ingest-time step
    whose output is written ``partitionBy("cell")``."""
    corpus = _as_double(vecs, vec_col, id_col)
    centroids = corpus.filter(F.col("vec_id") % centroid_stride == 0).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("c_id"))
    return (
        corpus.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id", "v", "c_id",
            F.round(cosine_expr("v", "cv"), 6).alias("c_cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("c_id").alias("cell"))
    )


def ivf_topk(
    vecs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    centroid_stride: int = 31,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via IVF: score only vectors in the ``nprobe``
    cells whose centroids are nearest to the query. Each corpus vector
    lives in exactly one cell, so no candidate dedup is needed."""
    corpus = _as_double(vecs, vec_col, id_col)
    centroids = corpus.filter(F.col("vec_id") % centroid_stride == 0).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    cells = ivf_cells(vecs, centroid_stride, vec_col, id_col)
    queries = corpus.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    wp = Window.partitionBy("q_id").orderBy(F.desc("p_cos"), F.asc("c_id"))
    probed = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "q_id", "qv", "c_id",
            F.round(cosine_expr("qv", "cv"), 6).alias("p_cos"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "qv", F.col("c_id").alias("cell"))
    )
    scored = (
        F.broadcast(probed)
        .join(cells, "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr("qv", "v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "cosine")
    )


def lsh_bucketed_topk(
    vecs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only same-bucket vectors. With 4 planes the
    corpus splits into <=16 buckets — each query scans ~1/16 of the data."""
    sk = embedding_sketch(vecs, num_planes, dim, vec_col, id_col)
    queries = sk.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    scored = (
        F.broadcast(queries)
        .join(sk, "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr("qv", "v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "cosine")
    )
