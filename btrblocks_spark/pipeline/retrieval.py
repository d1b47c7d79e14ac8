"""Keyword retrieval over the document corpus: TF-IDF / BM25 scoring and
top-k search — the text-side complement of the embedding ANN operators
(similarity.py) in a training-data / retrieval pipeline.

Shape (all Spark built-ins, one linear chain):
  1. token stream with per-doc length carried through the explode
     (dl = whitespace token count — same tokenizer as text.py),
  2. term frequencies for the query terms only (map-side filter on a
     literal IN-list BEFORE the aggregation — the token stream for
     non-query terms never shuffles),
  3. document frequencies + corpus stats (N, avgdl) as tiny one-row /
     per-term aggregates, broadcast back onto the tf rows,
  4. per-term BM25 contribution, summed per doc through DECIMAL(18,6) so
     accumulation order cannot change the result across engines,
  5. global top-k by (score desc, doc_id asc) — k is small; Spark plans
     TakeOrderedAndProject, not a full sort.

Determinism: idf uses natural log — both engines are IEEE-754 doubles; each
per-term idf and contribution is rounded to 6 dp before the
order-independent decimal sum, so the compare is exact.

Scale: the only full-corpus work is the token scan + one groupBy(doc_id,
term) on query terms (map-side combinable). df/N/avgdl are scalar-sized.
At 100 TB this is the standard "score a keyword query without an index"
plan; a pre-built inverted index (postings as a chunked table) would
replace step 2's scan with a point read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    idf(t)  = round(ln((N - df + 0.5) / (df + 0.5) + 1), 6)   [BM25+ form]
    w(t, d) = round(idf * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)), 6)
    score   = Σ w(t, d)   (decimal-summed, order-independent)
    """
    terms = sorted({t.lower() for t in query_terms})
    # per-doc token stream with dl computed BELOW the Generate (explode of
    # a column reference — an inline explode would re-evaluate siblings per
    # token; see text.quality_scores)
    pre = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_toks"),
    ).select("doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("w"))
    tok = pre.select("doc_id", "dl", F.lower("w").alias("term")).filter(
        F.col("term").isin(*terms)
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    # corpus stats: N docs + average doc length (exact: long sum / count)
    stats = docs.select(
        F.size(F.split(F.col(text_col), " ")).alias("_dl")
    ).agg(
        F.count("*").alias("n_docs"), F.sum("_dl").alias("_sum_dl")
    ).select("n_docs", (F.col("_sum_dl") / F.col("n_docs")).alias("avgdl"))
    # document frequency per query term (tf already has one row per
    # (doc, term) — count(*) is the df)
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.round(
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0), 6
    )
    contrib = F.round(
        F.col("idf")
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        6,
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", idf)
        .withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("contrib").cast("decimal(18,6)")).cast("double").alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def tfidf_terms(
    docs: DataFrame,
    min_df: int = 2,
    top_terms_per_doc: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top TF-IDF terms per document (the classic keyword-extraction pass).

    tfidf = round(tf * round(ln(N / df), 6), 6); top terms per doc by
    (tfidf desc, term asc) via a per-doc rank window. df is computed over
    the distinct (term, doc) pairs of the SAME aggregated frame — the
    token stream is scanned once."""
    from pyspark.sql.window import Window

    pre = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_toks"),
    ).select("doc_id", F.explode("_toks").alias("w"))
    tf = (
        pre.select("doc_id", F.lower("w").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # df per term: window count over the (doc, term) rows — stays in the
    # same chain (no second scan, no self-join); N arrives as a broadcast
    # one-row aggregate (kept lazy — no driver action at plan-build time)
    w_term = Window.partitionBy("term")
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(w_term))
        .filter(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n))
    )
    tfidf = F.round(
        F.col("tf") * F.round(F.log(F.col("n_docs") / F.col("df")), 6), 6
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("tfidf", tfidf)
        .withColumn("rnk", F.row_number().over(w_doc))
        .filter(F.col("rnk") <= top_terms_per_doc)
        .select("doc_id", "rnk", "term", "tf", "df", "tfidf")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k_const: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists — the standard hybrid-
    retrieval combiner (lexical BM25 + vector ANN): each list contributes
    ``1/(k + rank)``; documents missing from a list contribute 0.

    Inputs carry (id_col, rank); both lists are top-k prefixes, so the
    full-outer join touches ≤ 2k rows — driver-scale regardless of corpus
    size. Determinism: each reciprocal is rounded to 6 dp (no decimal tie
    is possible at 1/(k+rank) for k+rank ≤ a few hundred except exactly
    terminating values), then decimal-summed."""
    a = ranked_a.select(F.col(id_col).alias("doc_id"), F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_col).alias("doc_id"), F.col("rank").alias("rank_b"))
    recip = lambda c: F.coalesce(  # noqa: E731
        F.round(F.lit(1.0) / (F.lit(k_const) + F.col(c)), 6).cast("decimal(18,6)"),
        F.lit(0).cast("decimal(18,6)"),
    )
    return (
        a.join(b, "doc_id", "full")
        .select(
            "doc_id",
            "rank_a",
            "rank_b",
            (recip("rank_a") + recip("rank_b")).cast("double").alias("rrf_score"),
        )
    )


def build_inverted_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize an inverted index: one row per term with document
    frequency, collection frequency, and doc_id-sorted postings (parallel
    ``posting_docs`` / ``posting_tfs`` arrays — the persisted artifact a
    BM25/TF-IDF serving stack reads instead of re-scanning the corpus).

    Two shuffles, both on uniform keys: (doc, term) for tf, then term for
    the postings agg. Hot terms make long posting lists — at corpus scale
    stopword-df capping (as in ngram_jaccard_pairs) bounds the worst list;
    the arrays here are per-term, never per-corpus."""
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = t.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.array_sort(F.collect_list(F.struct("doc_id", "tf"))).alias("_p"),
        )
        .select(
            "term",
            "df",
            "cf",
            F.expr("transform(_p, s -> s.doc_id)").alias("posting_docs"),
            F.expr("transform(_p, s -> s.tf)").alias("posting_tfs"),
        )
    )


def phrase_search(docs: DataFrame, phrase: list[str]) -> DataFrame:
    """Exact-phrase retrieval via a positional index: a doc matches iff the
    phrase's tokens occur at consecutive positions. Built as an m-way
    self-join of the (doc_id, pos, w) positional postings filtered to the
    phrase's terms BEFORE joining — at corpus scale the join touches only
    the phrase terms' postings (df(term) rows each), never the corpus.

    Returns (doc_id, n_occurrences, first_pos) per matching doc.
    """
    from btrblocks_spark.pipeline.text import tokens

    if not phrase:  # empty/whitespace-stripped query: fail with the cause,
        # not an IndexError deep in plan building
        raise ValueError("phrase_search requires at least one term")
    t = tokens(docs).withColumn("lw", F.lower("w"))
    first = t.filter(F.col("lw") == phrase[0].lower()).select(
        "doc_id", F.col("pos").alias("p0")
    )
    matched = first
    for i, term in enumerate(phrase[1:], start=1):
        nxt = t.filter(F.col("lw") == term.lower()).select(
            "doc_id", F.col("pos").alias(f"p{i}")
        )
        matched = matched.join(nxt, "doc_id").filter(
            F.col(f"p{i}") == F.col("p0") + i
        ).drop(f"p{i}")
    return (
        matched.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            # 1-based position, matching the oracle CTE's generate_subscripts
            (F.min("p0") + 1).cast("long").alias("first_pos"),
        )
    )


def query_likelihood_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    mu: float = 2000.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents under the Dirichlet-smoothed query-likelihood
    language model — the other classic lexical ranker beside BM25:

      score(q, d) = Σ_{t ∈ q∩d} round(ln(1 + tf·|C| / (μ·cf_t)), 6)
                    + |q| · round(ln(μ / (dl + μ)), 6)

    (the standard rank-equivalent decomposition, so unmatched terms never
    need a row). Per-term contributions are rounded then decimal-summed —
    order-independent, bit-identical to the SQL oracle. Only docs matching
    ≥ 1 query term are ranked (as with BM25).

    Scale: one token-stream scan; collection stats (cf_t, |C|) are a
    broadcast handful of rows; top-k is TakeOrdered, no global sort."""
    terms = sorted({t.lower() for t in query_terms})
    pre = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_toks"),
    ).select("doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("w"))
    tok = pre.select("doc_id", "dl", F.lower("w").alias("term"))
    matched = tok.filter(F.col("term").isin(*terms))
    tf = matched.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    cf = matched.groupBy("term").agg(F.count("*").alias("cf"))
    coll = docs.select(
        F.size(F.split(F.col(text_col), " ")).alias("_dl")
    ).agg(F.sum("_dl").alias("c_tokens"))

    term_part = F.round(
        F.log(
            1.0
            + (F.col("tf").cast("double") * F.col("c_tokens"))
            / (F.lit(mu) * F.col("cf"))
        ),
        6,
    )
    doc_part = F.round(F.log(F.lit(mu) / (F.col("dl") + F.lit(mu))), 6)
    scored = (
        tf.join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(coll))
        .withColumn("c_term", term_part)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c_term").cast("decimal(18,6)")).alias("_s_terms"),
            F.count("*").alias("n_terms_hit"),
            F.first("dl").alias("dl"),
        )
        .withColumn(
            "score",
            (
                F.col("_s_terms")
                + F.lit(len(terms)) * doc_part.cast("decimal(18,6)")
            ).cast("double"),
        )
        .select("doc_id", "score", "n_terms_hit")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
