"""Similarity search over an embedding column (``array<float>``).

Two paths:
  cosine_topk        exact brute-force top-k — the correctness baseline.
                     Query set × corpus join; at scale the query set is
                     broadcast (small side) and the corpus is scanned once,
                     fully parallel, with a per-query top-k (window rank
                     partitioned by query — k small, no global sort).
  lsh_bucketed_topk  the scale path: sign-sketch LSH buckets (see
                     dedup.embedding_sketch); each query only scores vectors
                     in its own bucket — corpus scan is pruned by the
                     bucket join. An IVF analog: buckets play the role of
                     coarse cells. Recall < 1.0 by construction; bucket
                     count / plane count trade recall for cost.

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
