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

from btrblocks_spark.pipeline.dedup import cosine_try_expr, embedding_sketch


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
            F.round(cosine_try_expr("qv", "v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "cosine")
    )


def radius_search(
    vecs: DataFrame,
    query_ids: list[int],
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Range (radius) search: for each query id, ALL neighbors with cosine
    similarity >= ``threshold`` — the fixed-radius counterpart of
    ``cosine_topk`` (a vector-store range query; the reference's predicate
    scan analog over an embedding column, scheme/CompressionScheme.hpp:45).

    Scale shape: the query set is broadcast (small side), the corpus is
    scanned exactly once, and the threshold filter is applied inside the
    scan projection — no shuffle, no window, output size bounded by the
    selectivity of the radius. Unlike top-k there is no per-query rank
    state, so the operator is embarrassingly parallel at any corpus size."""
    corpus = _as_double(vecs, vec_col, id_col)
    queries = corpus.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    return (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_try_expr("qv", "v"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


_NORM = "sqrt(aggregate(zip_with({v}, {v}, (x, y) -> x * y), 0D, (acc, x) -> acc + x))"


def _with_norm(df: DataFrame, vec: str = "v", out: str = "_nv") -> DataFrame:
    """Precompute the L2 norm once per row — the scoring fold then does one
    dot product per centroid instead of re-deriving both norms per pair
    (measured ~3x on the assignment pass; the value is bit-identical, it's
    the same sqrt-of-fold expression evaluated once)."""
    return df.withColumn(out, F.expr(_NORM.format(v=vec)))


def _centroid_array(cents: DataFrame) -> DataFrame:
    """Centroids (c_id, cv) collected into ONE single-row array column
    ``_cents`` (struct<c_id, cv, cn> — norm precomputed) — broadcast to
    every task so centroid scoring is a per-row array fold, never a join."""
    return cents.select(
        F.struct("c_id", "cv", F.expr(_NORM.format(v="cv")).alias("cn")).alias("_c")
    ).agg(F.collect_list("_c").alias("_cents"))


def _stride_cents(corpus: DataFrame, centroid_stride: int) -> DataFrame:
    return corpus.filter(F.col("vec_id") % centroid_stride == 0).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )


def _scored_cents(vec: str, norm_col: str = "_nv") -> str:
    """SQL expr: centroid array scored against column ``vec`` — array of
    struct(cos, ncid) where ncid = -c_id, so the natural struct ordering
    (cos asc, ncid asc) makes the MAX element exactly the window winner
    ``ORDER BY cos DESC, c_id ASC`` (max cos, then min c_id). Norms come
    precomputed: ``norm_col`` for the row, c.cn for the centroid."""
    dot = f"aggregate(zip_with({vec}, c.cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    return (
        # try_divide: a zero-norm row or centroid yields NULL cos (loses
        # every comparison) instead of aborting under ANSI mode
        f"transform(_cents, c -> struct(round(try_divide({dot}, ({norm_col}) * (c.cn)), 6) AS cos, "
        "-c.c_id AS ncid))"
    )


def ivf_cells(
    vecs: DataFrame,
    centroid_stride: int = 31,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cents: DataFrame | None = None,
) -> DataFrame:
    """Assign every vector to its nearest coarse centroid (the IVF build
    step). Centroids are the vectors with ``vec_id % centroid_stride == 0``
    — deterministic, so the index is reproducible and oracle-checkable
    (k-means would converge data-dependently; the plumbing is identical).

    Returns (vec_id, v, cell). The nearest-centroid argmax is a map-side
    ``array_max`` fold over the broadcast centroid array — no corpus
    blowup, no shuffle, no window; at scale this is the ingest-time step
    whose output is written ``partitionBy("cell")``."""
    corpus = _with_norm(_as_double(vecs, vec_col, id_col))
    if cents is None:
        cents = _centroid_array(_stride_cents(corpus, centroid_stride))
    # coalesce(-1) makes `cell` non-nullable: a downstream equi-join on it
    # would otherwise infer an isnotnull(cell) filter, and because `cell` is
    # this whole fold expression the filter would evaluate it a SECOND time
    # per row (measured 2x cost at sf0.1)
    return corpus.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        F.expr(f"coalesce(-array_max({_scored_cents('v')}).ncid, -1)").alias("cell"),
    )


def ivf_topk(
    vecs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    centroid_stride: int = 31,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cells: DataFrame | None = None,
    cents: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: score only vectors in the ``nprobe``
    cells whose centroids are nearest to the query. Each corpus vector
    lives in exactly one cell, so no candidate dedup is needed.

    ``cells``/``cents`` let a caller sweeping several ``nprobe`` values
    share ONE cell assignment (the expensive corpus × centroid fold) across
    arms — the assignment is nprobe-independent, so results are unchanged
    (ann_operating_curve does this; same-results pinned by its oracle)."""
    scored = _ivf_scored(
        vecs, query_ids, centroid_stride, nprobe, vec_col, id_col, cells, cents
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "cosine")
    )


def _ivf_scored(
    vecs: DataFrame,
    query_ids: list[int],
    centroid_stride: int,
    nprobe: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cells: DataFrame | None = None,
    cents: DataFrame | None = None,
) -> DataFrame:
    """The IVF candidate set BEFORE the top-k rank: (q_id, neighbor_id,
    cosine) for every probed-cell pair. Split out so a sweep
    (ann_operating_curve) can union several arms' candidates and rank them
    in ONE window pass — row_number partitioned by (arm, q_id) over the
    same (cosine desc, neighbor_id asc) order is bit-identical per arm to
    the per-arm window ``ivf_topk`` applies."""
    corpus = _as_double(vecs, vec_col, id_col)
    if cents is None:
        cents = _centroid_array(_stride_cents(corpus, centroid_stride))
    if cells is None:
        # hand the centroid array down: building it is a corpus filter +
        # collect_list aggregation, and ivf_cells would otherwise redo it
        cells = ivf_cells(vecs, centroid_stride, vec_col, id_col, cents=cents)
    queries = _with_norm(
        corpus.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
        ),
        vec="qv",
    )
    # top-nprobe cells per query, map-side: sort the scored centroid array
    # descending (reverse of the natural asc struct order) and explode the
    # first nprobe — same result as a rank-window over a probe join
    probed = (
        queries.crossJoin(F.broadcast(cents))
        .select(
            "q_id",
            "qv",
            F.explode(
                F.expr(f"slice(reverse(array_sort({_scored_cents('qv')})), 1, {nprobe})")
            ).alias("_p"),
        )
        .select("q_id", "qv", F.expr("-_p.ncid").alias("cell"))
    )
    return (
        F.broadcast(probed)
        .join(cells, "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_try_expr("qv", "v"), 6).alias("cosine"),
        )
    )


def normalize_embeddings(
    vecs: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """L2-normalize every embedding to a unit vector (the standard pre-ANN /
    pre-clustering step): (vec_id, norm, unit array<double>), elements
    rounded to 6 decimals for engine-exact reproducibility. Zero vectors
    pass through as zeros (guarded division).

    Pure narrow map — the array fold and transform run JVM-side per row; at
    100 TB this fuses into the scan with no shuffle at all."""
    corpus = _as_double(vecs, vec_col, id_col)
    norm = "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x))"
    return corpus.select(
        F.col("vec_id").alias(id_col) if id_col != "vec_id" else F.col("vec_id"),
        F.expr(f"round({norm}, 6)").alias("norm"),
        F.expr(
            f"CASE WHEN {norm} = 0D THEN v "
            f"ELSE transform(v, x -> round(x / ({norm}), 6)) END"
        ).alias("unit"),
    )


def kmeans_refine(
    vecs: DataFrame,
    centroid_stride: int = 31,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One Lloyd iteration refining the IVF coarse quantizer: recompute
    each cell's centroid as the per-dimension mean of its members, then
    reassign every vector to its nearest refined centroid. Returns
    (vec_id, old_cell, new_cell, moved) — the iterative-algorithm shape
    (k-means / PageRank / label propagation) expressed purely on DataFrames;
    loop it to convergence by re-entering with the new assignment.

    Determinism (oracle-exact): the mean accumulates round(x, 6) in
    DECIMAL(28,6) — order-independent — then divides as double and rounds;
    the reassignment argmax reuses the broadcast array-fold with the same
    (cosine desc, cell asc) tie-break as ivf_cells.

    Scale: means are ONE groupBy(cell, dim) with map-side partials (k·dim
    groups — tiny); the refined centroids collapse to a broadcast array, so
    reassignment is again a shuffle-free narrow map over the corpus. The
    assignment pass runs ONCE (localCheckpoint) and feeds both the means
    and the reassignment — at cluster scale the checkpoint would be the
    ingest-time partitionBy(cell) table itself."""
    cells = ivf_cells(vecs, centroid_stride, vec_col, id_col).localCheckpoint(eager=False)
    dims = cells.select(
        "vec_id", "v", "cell", F.posexplode("v").alias("dim", "x")
    )
    cent = (
        dims.groupBy("cell", "dim")
        .agg(
            F.round(
                F.sum(F.round(F.col("x"), 6).cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("m")
        )
        .groupBy("cell")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)").alias(
                "cv"
            )
        )
    )
    refined = _centroid_array(cent.select(F.col("cell").alias("c_id"), "cv"))
    return _with_norm(cells).crossJoin(F.broadcast(refined)).select(
        "vec_id",
        F.col("cell").alias("old_cell"),
        F.expr(f"-array_max({_scored_cents('v')}).ncid").alias("new_cell"),
    ).withColumn(
        "moved", (F.col("old_cell") != F.col("new_cell")).cast("int")
    )


def lsh_bucketed_topk(
    vecs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sk: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: score only same-bucket vectors. With 4 planes the
    corpus splits into <=16 buckets — each query scans ~1/16 of the data.

    ``sk`` lets a caller sweeping several plane counts share one sketch:
    the p-plane bucket is exactly the low p bits of a wider sketch (bit j
    of the bucket is plane j's sign, independent of the plane count), so
    ``sketch(P).bucket & (2^p - 1) == sketch(p).bucket`` bit-for-bit —
    ann_operating_curve derives its three LSH arms from ONE 6-plane
    sketch that way (same-results pinned by its oracle)."""
    scored = _lsh_scored(vecs, query_ids, num_planes, dim, vec_col, id_col, sk)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "cosine")
    )


def _lsh_scored(
    vecs: DataFrame,
    query_ids: list[int],
    num_planes: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sk: DataFrame | None = None,
) -> DataFrame:
    """The LSH same-bucket candidate set BEFORE the top-k rank — the
    ``_ivf_scored`` counterpart for sweep callers that rank several arms'
    candidates in one window pass."""
    if sk is None:
        sk = embedding_sketch(vecs, num_planes, dim, vec_col, id_col)
    queries = sk.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    return (
        F.broadcast(queries)
        .join(sk, "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_try_expr("qv", "v"), 6).alias("cosine"),
        )
    )


def filtered_cosine_topk(
    vecs: DataFrame,
    query_ids: list[int],
    allowed_labels: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Filtered vector search: exact top-k cosine neighbors restricted to
    vectors whose ``label`` passes the predicate — the metadata-filtered
    ANN every retrieval stack needs (filter + search in one plan, not
    post-filtering a larger candidate list, which can silently return
    < k hits).

    The label predicate is applied BEFORE scoring, so Catalyst pushes it
    into the corpus scan (at scale: partition pruning on a label-
    partitioned table) and the distance fold runs only on surviving rows."""
    corpus = _as_double(vecs, vec_col, id_col)
    labels = vecs.select(F.col(id_col).alias("vec_id"), F.col(label_col).alias("_lbl"))
    corpus = corpus.join(labels, "vec_id").filter(F.col("_lbl").isin(allowed_labels))
    queries = _as_double(vecs, vec_col, id_col).filter(
        F.col("vec_id").isin(query_ids)
    ).select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("_lbl").alias("label"),
            F.round(cosine_try_expr("qv", "v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "label", "cosine")
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization — the vector analog of the reference's TRUNCATION
# integer scheme (scheme/integer/Truncation.cpp:12-66: subtract a bias, store
# narrow codes). Here: per-dimension [min,max] corpus ranges -> 8-bit codes,
# 4x smaller than float32 at a bounded per-dim reconstruction error of
# (max-min)/512.
# ---------------------------------------------------------------------------

# reconstructed value for dim i (0-based Spark lambda index; element_at is
# 1-based). Textually mirrors the DuckDB oracle so the float ops run in the
# same order. A NULL element must stay NULL through quantization — Spark's
# least() SKIPS nulls, so least(255D, NULL) = 255 would silently encode a
# dirty element as the MAXIMUM code and reconstruct it as ~max (a
# fabricated extreme inflating that vector's dot products); the leading
# `x IS NULL` arm keeps the module's degrade-to-NULL convention
# (try_divide/try_cast elsewhere) so the row loses comparisons instead.
_SQ8_RECON = (
    "transform(v, (x, i) -> CASE WHEN x IS NULL THEN NULL "
    "WHEN element_at(_mxs, i + 1) = element_at(_mns, i + 1) "
    "THEN element_at(_mns, i + 1) "
    "ELSE element_at(_mns, i + 1) + "
    "(least(255D, floor((x - element_at(_mns, i + 1)) / "
    "(element_at(_mxs, i + 1) - element_at(_mns, i + 1)) * 256D)) + 0.5D) * "
    "(element_at(_mxs, i + 1) - element_at(_mns, i + 1)) / 256D END)"
)

_SQ8_CODES = (
    "transform(v, (x, i) -> CASE WHEN x IS NULL THEN NULL "
    "WHEN element_at(_mxs, i + 1) = element_at(_mns, i + 1) "
    "THEN 0 ELSE cast(least(255D, floor((x - element_at(_mns, i + 1)) / "
    "(element_at(_mxs, i + 1) - element_at(_mns, i + 1)) * 256D)) as int) END)"
)


def sq8_ranges(corpus: DataFrame) -> DataFrame:
    """Per-dimension [min, max] over the whole corpus, as ONE single-row
    DataFrame with array columns ``_mns`` / ``_mxs`` (index = dim).

    Scale: posexplode is a narrow map; the groupBy key space is the
    dimension count (64), so the shuffle moves 64 rows per partition after
    map-side combine — O(dims), not O(rows). The single-row result is
    broadcast to the encode pass."""
    dims = corpus.select(F.posexplode("v").alias("dim", "x"))
    rg = dims.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    return rg.agg(
        F.expr("transform(array_sort(collect_list(struct(dim, mn))), s -> s.mn)").alias("_mns"),
        F.expr("transform(array_sort(collect_list(struct(dim, mx))), s -> s.mx)").alias("_mxs"),
    )


def sq8_quantize(
    vecs: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Encode every embedding to ``array<int>`` codes in [0, 255] — the SQ8
    build step. One O(dims) range agg + one narrow map; the codes column is
    what a 100 TB vector store persists (4x smaller, scan-friendly)."""
    corpus = _as_double(vecs, vec_col, id_col)
    rg = sq8_ranges(corpus)
    return corpus.crossJoin(F.broadcast(rg)).select(
        "vec_id", F.expr(_SQ8_CODES).alias("codes")
    )


def sq8_topk(
    vecs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k cosine over SQ8-reconstructed vectors (both sides
    quantized — symmetric distance, as in a code-resident vector store).
    Same shape as ``cosine_topk``: broadcast queries, one corpus scan, per-
    query window top-k. Ranks shift only where quantization error crosses a
    neighbor gap; the oracle replays the exact same arithmetic."""
    corpus = _as_double(vecs, vec_col, id_col)
    rg = sq8_ranges(corpus)
    recon = corpus.crossJoin(F.broadcast(rg)).select(
        "vec_id", F.expr(_SQ8_RECON).alias("rv")
    )
    queries = recon.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("rv").alias("qv")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(recon)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_try_expr("qv", "rv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "cosine")
    )


def sq8_recon_error(
    vecs: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """SQ8 quantization-error audit: per-vector reconstruction MSE
    ``Σ_i (v_i − recon_i)² / dims``, profiled to ONE row — n_vecs, mean
    MSE, max MSE, and the worst vector's id. This is the measurement that
    decides whether 8-bit scalar quantization is safe for a corpus (mean
    error well under typical neighbor gaps) or whether it needs PQ /
    full-precision re-ranking — the vector-store twin of the format
    layer's scheme regression guard (compression must not silently cost
    accuracy).

    Determinism: per-vector MSE is one left-fold IEEE expression rounded
    to 6 dp; the mean sums those 6-dp values in DECIMAL(18,6)
    (order-independent) before one final scalar division; the worst
    vector is max(struct(mse, −id)) — exact tie-break on smaller id.

    Scale: one O(dims) range aggregate (64 rows shuffled per partition),
    then one narrow map over the corpus and one map-side-combinable
    global aggregate — no joins, no windows, no per-vector shuffle."""
    corpus = _as_double(vecs, vec_col, id_col)
    rg = sq8_ranges(corpus)
    # try_divide by size(v): an empty array must degrade to NULL mse, not
    # raise DIVIDE_BY_ZERO under ANSI (the module's degrade-to-NULL
    # convention; round-7 review finding)
    err = corpus.crossJoin(F.broadcast(rg)).select(
        "vec_id",
        F.round(
            F.try_divide(
                F.expr(
                    f"aggregate(zip_with(v, {_SQ8_RECON}, "
                    "(x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
                ),
                F.expr("size(v)").cast("double"),
            ),
            6,
        ).alias("mse6"),
    )
    prof = err.agg(
        F.count("*").alias("n_vecs"),
        F.sum(F.col("mse6").cast("decimal(18,6)")).alias("mse_sum"),
        F.max(
            F.struct(F.col("mse6").alias("m"), (-F.col("vec_id")).alias("ni"))
        ).alias("worst"),
    )
    return prof.select(
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.round(
            F.try_divide(F.col("mse_sum").cast("double"), F.col("n_vecs")), 6
        ).alias("mean_mse"),
        F.col("worst.m").alias("max_mse"),
        (-F.col("worst.ni")).cast("long").alias("worst_vec_id"),
    )


def _pq_min_struct(j: int) -> str:
    """SQL expr: struct of (per-subspace L2 distance, centroid id, centroid
    sub-vector) minimized over the broadcast codebook array — natural struct
    ordering (d asc, c_id asc) makes array_min the deterministic argmin.

    Both sides are PRE-SLICED (row sub-vectors _v{j}, codebook sub-vectors
    c.sv{j}) so the inner fold does 16 multiply-adds per centroid and no
    per-centroid array allocation (measured ~2x over slicing inside the
    lambda)."""
    d = (
        f"round(aggregate(zip_with(_v{j}, c.sv{j}, "
        "(x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x), 6)"
    )
    # coalesce to +inf: struct ordering puts NULL fields FIRST, so a NULL
    # distance (one dirty donor vector nulling a centroid's sub-vector)
    # would WIN the array_min for EVERY row and collapse the whole
    # corpus's codes onto that centroid — NULL must lose, matching the
    # ivf _scored_cents convention and DuckDB's ORDER BY (NULLS LAST)
    return (
        f"array_min(transform(_cents, c -> struct("
        f"coalesce({d}, cast('Infinity' as double)) AS d, c.c_id AS cid, "
        f"c.sv{j} AS sv)))"
    )


def pq_encode(
    vecs: DataFrame,
    m: int = 4,
    dim: int = 64,
    centroid_stride: int = 17,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product quantization build step: split each vector into ``m``
    sub-vectors; each sub-vector is replaced by the id of its nearest
    codebook entry (per-subspace L2, ties to the smaller id). Codebook =
    sub-slices of the deterministic stride-sampled donor vectors (same
    reproducibility trick as ``ivf_cells`` — k-means would converge
    data-dependently; the plumbing is identical).

    Returns (vec_id, codes array<bigint>, rv reconstructed DOUBLE[dim]).
    The m-byte ``codes`` column is what a 100 TB vector store persists
    (vs SQ8's dim bytes); encoding is a map-side fold over the broadcast
    codebook — one corpus scan, no shuffle, no join."""
    sub = dim // m
    if dim % m != 0:
        # a truncating dim//m leaves the reconstruction short; zip_with
        # then null-pads and every downstream cosine silently becomes NULL
        raise ValueError(f"dim ({dim}) must be divisible by m ({m})")
    corpus = _as_double(vecs, vec_col, id_col)
    cents = _stride_cents(corpus, centroid_stride).select(
        F.struct(
            "c_id",
            *[
                F.expr(f"slice(cv, {j * sub + 1}, {sub})").alias(f"sv{j}")
                for j in range(m)
            ],
        ).alias("_c")
    ).agg(F.collect_list("_c").alias("_cents"))
    picks = [f"_p{j}" for j in range(m)]
    sliced = corpus.select(
        "vec_id",
        *[
            F.expr(f"slice(v, {j * sub + 1}, {sub})").alias(f"_v{j}")
            for j in range(m)
        ],
    )
    picked = sliced.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        *[F.expr(_pq_min_struct(j)).alias(p) for j, p in enumerate(picks)],
    )
    return picked.select(
        "vec_id",
        F.array(*[F.col(f"{p}.cid") for p in picks]).alias("codes"),
        F.flatten(F.array(*[F.col(f"{p}.sv") for p in picks])).alias("rv"),
    )


def pq_topk(
    vecs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 4,
    dim: int = 64,
    centroid_stride: int = 17,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k cosine via PQ with asymmetric distance (ADC):
    queries stay full-precision, the corpus is scored through its
    reconstructed codes — the standard IVF-PQ probe arithmetic. Same shape
    as ``cosine_topk``: broadcast queries, one (encoded) corpus scan,
    per-query window top-k."""
    corpus = _as_double(vecs, vec_col, id_col)
    recon = pq_encode(vecs, m, dim, centroid_stride, vec_col, id_col)
    queries = corpus.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(recon)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_try_expr("qv", "rv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "neighbor_id", "cosine")
    )


def binary_quantize(
    vecs: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """1-bit binary quantization: each dimension becomes its sign vs the
    corpus per-dimension mean, packed into two 32-bit words (64 dims →
    8 bytes/vector, 32x smaller than float32 — the cheapest tier of the
    SQ8 → PQ → binary quantization ladder).

    Threshold comparison is INTEGER-exact in any engine: with scaled
    values xs = round(x·1e6) and per-dim sums s over n rows, the bit is
    xs·n > s — a cross-multiplied mean comparison with no float division.

    Returns (vec_id, lo, hi) BIGINT words. One O(dims) agg broadcast +
    one narrow encode pass."""
    # try_cast: a dirty embedding element (NaN/Inf from a failed encode,
    # or |x| past the scaled-long range) degrades to a NULL scaled value —
    # its bit compares false and the row keeps encoding — instead of a
    # CAST_INVALID_INPUT abort of the whole corpus job under ANSI
    exploded = _as_double(vecs, vec_col, id_col).select(
        "vec_id", F.posexplode("v").alias("d0", "x")
    ).select(
        "vec_id", "d0", F.round(F.col("x") * 1000000).try_cast("long").alias("xs")
    )
    dim = exploded.groupBy("d0").agg(
        F.sum("xs").alias("s"), F.count("*").alias("n")
    )
    # two 32-bit words hold exactly 64 dims: d0 % 32 would WRAP past that
    # (dim 64 and dim 96 collide with dim 32's bit, the SUM carries into
    # higher bits, and the packed words stop being bit-sets at all — wrong
    # Hamming neighbors with no error). Fail fast like pq_encode's
    # dim-divisibility raise; wider embeddings need more words or PQ.
    n_dims = dim.count()
    if n_dims > 64:
        raise ValueError(
            f"binary_quantize packs at most 64 dims into (lo, hi); got "
            f"{n_dims} — use pq_encode/sq8 for wider embeddings"
        )
    bits = exploded.join(F.broadcast(dim), "d0").select(
        "vec_id",
        "d0",
        F.when(F.col("xs") * F.col("n") > F.col("s"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("b"),
    )
    shifted = F.expr("shiftleft(b, cast(d0 % 32 as int))")
    return bits.groupBy("vec_id").agg(
        F.sum(F.when(F.col("d0") < 32, shifted).otherwise(F.lit(0))).alias("lo"),
        F.sum(F.when(F.col("d0") >= 32, shifted).otherwise(F.lit(0))).alias("hi"),
    )


def binary_topk(
    vecs: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k nearest by Hamming distance over binary-quantized codes —
    symmetric code-domain search (both sides 8 bytes; XOR + popcount is
    the entire distance kernel, pure JVM bit ops in whole-stage codegen).

    Scale: the packed code table is 8 bytes/vector; queries broadcast;
    ranking is a per-query window over the corpus — at 100 TB the code
    table is the only thing scanned, never the float vectors."""
    from pyspark.sql.window import Window

    packed = binary_quantize(vecs, vec_col, id_col).localCheckpoint(eager=True)
    q = packed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("lo").alias("q_lo"),
        F.col("hi").alias("q_hi"),
    )
    scored = packed.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.bit_count(F.expr("cast(lo as bigint) ^ q_lo"))
            + F.bit_count(F.expr("cast(hi as bigint) ^ q_hi"))
        )
        .cast("long")
        .alias("hamming"),
    )
    w = Window.partitionBy("q_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", F.col("rnk").cast("long"), "neighbor_id", "hamming")
        .orderBy("q_id", "rnk")
    )


def _mmr_cand_sims(
    vecs: DataFrame,
    query_ids: list[int],
    k_candidates: int,
    vec_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared MMR inputs: the top-k candidate table (q_id, neighbor_id,
    r6 = 6-dp cosine ×1e6 as an exact integer) and the candidate-pairwise
    similarity table (q_id, na, nb, s6) — |queries|·k and |queries|·k²
    rows. Both are pinned (localCheckpoint) so the corpus top-k scan and
    the pairwise-sim joins run ONCE however many selection stages/rounds
    reference them (without the pin the unrolled plan re-derived the whole
    chain ~20×: 72 scans/99 exchanges, PLANS.md). The pins are LAZY
    (round-8): the plans are truncated identically, but materialization
    folds into the first consuming action instead of one scheduled job per
    pin — on the |q|·k-row working set the per-job overhead dominated
    (guide §1.2: fewer passes; the MMR family ran ~14 jobs per call).

    BROADCAST-RACE CAVEAT (ADVICE r8 #4): lazy pins are only safe while
    every consumer materializes them inside ONE job. If a future edit puts
    any reference to these tables under a BROADCAST exchange (AQE happily
    broadcasts tiny tables into self-joins), the broadcast subtree runs as
    its own job that races ahead of the pin's first materialization and
    re-derives the whole corpus top-k chain per reference — the exact
    failure that regressed dedup_pagerank 1.4→14.4 s before its pins were
    reverted to eager. If the MMR plans ever grow a broadcast over `cand`
    or `sims`, flip these two pins back to eager=True."""
    corpus = _as_double(vecs, vec_col, id_col)
    cand = cosine_topk(vecs, query_ids, k=k_candidates, vec_col=vec_col,
                       id_col=id_col).select(
        "q_id",
        "neighbor_id",
        F.round(F.col("cosine") * 1000000).cast("long").alias("r6"),
    ).localCheckpoint(eager=False)
    pairs = (
        cand.select("q_id", F.col("neighbor_id").alias("na"))
        .join(cand.select("q_id", F.col("neighbor_id").alias("nb")), "q_id")
        .filter(F.col("na") != F.col("nb"))
    )
    va = corpus.select(F.col("vec_id").alias("na"), F.col("v").alias("va"))
    vb = corpus.select(F.col("vec_id").alias("nb"), F.col("v").alias("vb"))
    sims = (
        pairs.join(va, "na")
        .join(vb, "nb")
        .select(
            "q_id", "na", "nb",
            F.round(F.round(cosine_try_expr("va", "vb"), 6) * 1000000)
            .cast("long").alias("s6"),
        )
        .localCheckpoint(eager=False)
    )
    return cand, sims


def _mmr_output(parts: list[DataFrame]) -> DataFrame:
    """Shared MMR result contract: union the per-rank pick frames (already
    shaped q_id/sel_rank/vec_id/mmr_num) and attach ``mmr_score`` =
    mmr_num / 1e7 (the exact-integer 7·r6 − 3·s6 score over its fixed
    scale). ONE owner for the output schema and the score divisor so the
    unrolled chain and the round-k loop cannot drift apart (their
    equivalence at picks=3 is test-pinned)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "q_id", "sel_rank", "vec_id", "mmr_num",
        (F.col("mmr_num").cast("double") / F.lit(10000000.0)).alias("mmr_score"),
    )


def mmr_rerank(
    vecs: DataFrame,
    query_ids: list[int],
    k_candidates: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998),
    λ=0.7: from each query's top-``k_candidates`` cosine neighbors, pick 3
    results greedily maximizing ``λ·rel(c) − (1−λ)·max_{s∈selected}
    sim(c, s)`` — relevance tempered by redundancy, the standard
    diversity re-rank between ANN retrieval and a result page (or between
    retrieval and a RAG context window, where near-duplicate passages
    waste the token budget the way they waste a corpus).

    The greedy loop is UNROLLED into three argmax stages (selection state
    is one id column per stage), so the whole operator is joins +
    aggregates — no iteration, no UDF, and an exactly-matching SQL oracle.
    Determinism: relevance and pairwise similarities are 6-dp cosines
    lifted to exact integers (×1e6), the MMR score is the exact integer
    ``7·r6 − 3·s6`` (λ folded into integer numerators — no
    constant-times-rounded-sum boundary), and every argmax breaks ties on
    the smaller id; ``mmr_score`` is that integer over 1e7.

    Scale: candidates are k per query (broadcast-sized); the pairwise sim
    table is |queries|·k² rows built from two id-keyed joins against the
    corpus; every later stage operates on those reduced tables keyed by
    q_id. The corpus is scanned once for the top-k and twice for
    candidate vectors — never pairwise against itself."""
    cand, sims = _mmr_cand_sims(vecs, query_ids, k_candidates, vec_col, id_col)

    def argmax(df, score, keep):
        b = df.groupBy(*keep).agg(
            F.max(
                F.struct(score.alias("sc"), (-F.col("neighbor_id")).alias("ni"))
            ).alias("b")
        )
        return b.select(
            *keep, (-F.col("b.ni")).alias("pick"), F.col("b.sc").alias("score")
        )

    s1 = argmax(cand, F.lit(7) * F.col("r6"), ["q_id"]).select(
        "q_id", F.col("pick").alias("s1"), F.col("score").alias("sc1")
    )

    lk1 = sims.select(
        "q_id", F.col("na").alias("neighbor_id"), F.col("nb").alias("s1"),
        F.col("s6").alias("p1"),
    )
    c2 = (
        cand.join(s1, "q_id")
        .filter(F.col("neighbor_id") != F.col("s1"))
        .join(lk1, ["q_id", "neighbor_id", "s1"])
    )
    s2 = argmax(
        c2, F.lit(7) * F.col("r6") - F.lit(3) * F.col("p1"), ["q_id", "s1", "sc1"]
    ).select(
        "q_id", "s1", "sc1", F.col("pick").alias("s2"), F.col("score").alias("sc2")
    )

    lk2 = sims.select(
        "q_id", F.col("na").alias("neighbor_id"), F.col("nb").alias("s2"),
        F.col("s6").alias("p2"),
    )
    c3 = (
        cand.join(s2, "q_id")
        .filter((F.col("neighbor_id") != F.col("s1")) & (F.col("neighbor_id") != F.col("s2")))
        .join(lk1, ["q_id", "neighbor_id", "s1"])
        .join(lk2, ["q_id", "neighbor_id", "s2"])
    )
    s3 = argmax(
        c3,
        F.lit(7) * F.col("r6") - F.lit(3) * F.greatest("p1", "p2"),
        ["q_id", "s1", "sc1", "s2", "sc2"],
    ).select(
        "q_id", "s1", "sc1", "s2", "sc2",
        F.col("pick").alias("s3"), F.col("score").alias("sc3"),
    ).localCheckpoint(eager=False)  # one row per query; unioned 3 ways below

    # each rank projects from ITS OWN stage frame: a query with fewer than
    # 3 candidates (tiny or heavily filtered corpus) still returns the 1-2
    # picks MMR could make, instead of vanishing because stage 3 was empty
    parts = [
        frame.select(
            "q_id",
            F.lit(rk).cast("long").alias("sel_rank"),
            F.col(pick).alias("vec_id"),
            F.col(sc).cast("long").alias("mmr_num"),
        )
        for rk, (frame, pick, sc) in enumerate(
            [(s1, "s1", "sc1"), (s2, "s2", "sc2"), (s3, "s3", "sc3")], start=1
        )
    ]
    return _mmr_output(parts)


def mmr_rerank_k(
    vecs: DataFrame,
    query_ids: list[int],
    picks: int = 3,
    k_candidates: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """MMR re-ranking for ARBITRARY result-set size — the generalization of
    the unrolled 3-pick ``mmr_rerank`` a RAG context window (k=10+) needs.
    Same semantics, scoring, and tie-breaks: greedy argmax of the exact
    integer ``7·r6 − 3·max_{s∈selected} s6`` per round, smaller id wins
    ties; a query with fewer than ``picks`` candidates returns the partial
    picks MMR could make.

    Shape: instead of unrolling one join-chain per pick (whose plan grows
    quadratically with k), the greedy state is carried ROUND to ROUND in
    two small tables — the per-query remaining-candidate table with a
    running ``maxp`` (max similarity to anything already selected) and the
    one-row-per-query pick — each fenced with localCheckpoint(eager=True)
    per round (the dedup_clusters iterative convention), so round t+1's
    plan starts from round t's materialized result instead of re-deriving
    t rounds of joins. ``maxp`` is updated INCREMENTALLY: one equi-join
    per round against the pairwise table restricted to the round's pick
    (nb = pick), never a rejoin against the whole selected set.

    Scale: per round, the working set is |queries|·k rows joined with
    |queries|·k pick-restricted sim rows — rounds cost O(picks · |q|·k),
    not O(|q|·k²), and nothing rescans the corpus after the shared
    candidate build. Equivalence to the unrolled chain at picks=3 is
    pinned by test_similarity."""
    if picks < 1:
        raise ValueError(f"mmr_rerank_k: picks must be >= 1, got {picks}")
    cand, sims = _mmr_cand_sims(vecs, query_ids, k_candidates, vec_col, id_col)

    rem = cand.withColumn("maxp", F.lit(None).cast("long"))
    parts: list[DataFrame] = []
    for rk in range(1, picks + 1):
        # round 1 has no selected set, so the score is the bare relevance
        # 7·r6 (matching the unrolled stage 1). Later rounds subtract
        # 3·maxp with NO coalesce: greatest() skips NULLs, so maxp is NULL
        # only when EVERY pairwise sim to the selected set was NULL (a
        # degenerate zero-norm/NULL-element vector) — and the unrolled
        # chain gives exactly that candidate a NULL score (7·r6 − 3·NULL),
        # which sorts below every real score in the argmax struct. A
        # coalesce(maxp, 0) here would instead score it UNPENALIZED and
        # let it win, diverging from the unrolled form (round-8 ADVICE).
        if rk == 1:
            score = F.lit(7) * F.col("r6")
        else:
            score = F.lit(7) * F.col("r6") - F.lit(3) * F.col("maxp")
        best = rem.groupBy("q_id").agg(
            F.max(
                F.struct(score.alias("sc"), (-F.col("neighbor_id")).alias("ni"))
            ).alias("b")
        )
        pick = best.select(
            "q_id", (-F.col("b.ni")).alias("pick"), F.col("b.sc").alias("score")
        ).localCheckpoint(eager=False)  # referenced by output AND the update
        parts.append(
            pick.select(
                "q_id",
                F.lit(rk).cast("long").alias("sel_rank"),
                F.col("pick").alias("vec_id"),
                F.col("score").cast("long").alias("mmr_num"),
            )
        )
        if rk == picks:
            break
        simt = sims.join(
            pick.select("q_id", F.col("pick").alias("nb")), ["q_id", "nb"]
        ).select("q_id", F.col("na").alias("neighbor_id"), F.col("s6").alias("pt"))
        rem = (
            rem.join(pick.select("q_id", "pick"), "q_id")
            .filter(F.col("neighbor_id") != F.col("pick"))
            .join(simt, ["q_id", "neighbor_id"], "left")
            # greatest skips NULLs: first update (maxp NULL) yields pt
            .select(
                "q_id", "neighbor_id", "r6",
                F.greatest("maxp", "pt").alias("maxp"),
            )
            .localCheckpoint(eager=False)
        )

    return _mmr_output(parts)
