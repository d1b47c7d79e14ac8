"""Corpus curation: deterministic stratified sampling and the end-to-end
retention pipeline (language filter + quality threshold + exact-dedup
canonicalization) — the composition a training-data job actually runs over
the documents table.

Determinism: sampling uses the portable hash32 (md5-derived) against a
per-stratum keep-rate in per-mille, so the *same rows* are kept on any
engine, any partitioning, any run — unlike ``df.sample``/``sampleBy``,
whose RNG is engine- and partitioning-dependent. That reproducibility is
what makes a 100 TB curation run auditable and resumable.

Scale: every step is shuffle-minimal — sampling is a map-side filter;
dedup canonicalization shuffles md5 hashes (16 bytes/row), never text;
quality/language aggregate per doc_id, combinable map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from btrblocks_spark.pipeline.text import hash32, normalized


def sample_bucket(stratum: Column, row_id: Column) -> Column:
    """Deterministic per-row bucket in [0, 1000): hash32 of 'stratum#id'."""
    key = F.concat_ws("#", stratum, row_id.cast("string"))
    return hash32(key) % 1000



def _stratum_suffix_parity(stratum_col: str):
    """Numeric suffix parity of a 'srcN'-style stratum name via try_cast —
    a stratum without a clean integer at position 4 ('web', 'wikipedia')
    degrades to NULL (treated as the odd/default rate) instead of aborting
    the job with CAST_INVALID_INPUT under ANSI mode."""
    return F.substring(F.col(stratum_col), 4, 10).try_cast("int") % 2


def stratified_sample(
    docs: DataFrame,
    even_rate_per_mille: int = 800,
    odd_rate_per_mille: int = 300,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows: strata with an
    even numeric suffix keep ``even_rate_per_mille``/1000 of their rows,
    odd keep ``odd_rate_per_mille``/1000 (models boosting/downsampling
    sources of different quality). Pure map-side filter — no shuffle, no
    RNG; pushes down to the scan."""
    suffix_even = _stratum_suffix_parity(stratum_col) == 0
    rate = F.when(suffix_even, F.lit(even_rate_per_mille)).otherwise(
        F.lit(odd_rate_per_mille)
    )
    bucket = sample_bucket(F.col(stratum_col), F.col(id_col))
    return docs.filter(bucket < rate)


def pack_sequences(
    docs: DataFrame,
    token_budget: int = 512,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-token-budget
    packs (training-batch construction for LLM pipelines). Documents are
    packed in deterministic (stratum, doc_id) order; a document goes to the
    pack its running-total START falls in — packs can overflow by at most
    one document, never split one.

    Shape: ONE window (running token sum per stratum, ordered by doc_id) —
    a single shuffle on the stratum key; pack_id arithmetic is map-side.
    At 100 TB strata are shards; each shard's window is independent."""
    from pyspark.sql.window import Window

    n_tok = F.size(F.split("text", " "))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        n_tok.alias("n_tokens"),
        (F.sum(n_tok).over(w) - n_tok).alias("tokens_before"),
    )
    return t.select(
        "doc_id",
        "stratum",
        "n_tokens",
        F.floor(F.col("tokens_before") / token_budget).cast("long").alias("pack_id"),
    )


def upsample_strata(
    docs: DataFrame,
    factor_minority: int = 3,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Class-balanced resampling by integer replication: strata with an odd
    numeric suffix (the 'minority' sources under stratified_sample's
    convention) are replicated ``factor_minority`` times, each copy tagged
    with a replica index (so downstream shuffles spread copies). Map-side
    only — explode of a generated sequence, no shuffle, no RNG."""
    suffix_odd = _stratum_suffix_parity(stratum_col) == 1
    factor = F.when(suffix_odd, F.lit(factor_minority)).otherwise(F.lit(1))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        F.explode(F.sequence(F.lit(1), factor)).alias("replica"),
    )


def train_val_test_split(
    docs: DataFrame,
    train_buckets: int = 8,
    val_buckets: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent hash
    of the document id: bucket = hash32('split#' || id) % 10; buckets
    [0, train) → train, [train, train+val) → val, rest → test.

    Unlike ``randomSplit`` (partitioning- and seed-order-dependent), the
    same document lands in the same split on every engine and every run —
    the property that keeps a 100 TB eval set leak-free across re-runs and
    incremental ingest. Pure map-side projection: no shuffle, no RNG."""
    total = 10
    bucket = hash32(F.concat(F.lit("split#"), F.col(id_col).cast("string"))) % total
    split = (
        F.when(bucket < train_buckets, F.lit("train"))
        .when(bucket < train_buckets + val_buckets, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        bucket.cast("int").alias("bucket"),
        split.alias("split"),
    )


def cap_per_stratum(
    docs: DataFrame,
    k: int = 15,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap every stratum (source/domain) at ``k`` documents, keeping a
    deterministic hash-ordered subset — the per-domain cap step of web-crawl
    curation (stops any single domain from dominating the corpus).

    The keep-rank is ``row_number`` over (hash32(stratum#id), id): a
    reproducible uniform choice of k per stratum, not "first k by doc_id"
    (which would bias toward old documents). One shuffle on the stratum key.
    Scale note: with very hot strata the rank window serializes one
    partition per stratum; since only ranks ≤ k survive, a 100 TB run first
    pre-filters with a per-partition partial top-k (the same two-phase
    shape Spark uses for LIMIT) — here k and strata counts are small enough
    that the single window is the right plan."""
    from pyspark.sql.window import Window

    h = hash32(F.concat_ws("#", F.col(stratum_col), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            F.row_number().over(w).alias("keep_rank"),
        )
        .filter(F.col("keep_rank") <= k)
    )


def training_batches(
    docs: DataFrame,
    vocab_size: int = 100,
    token_budget: int = 512,
    stratum_col: str = "source",
) -> DataFrame:
    """The end-of-pipeline deliverable: ready-to-train batches. Documents
    are tokenized to ids against the corpus frequency vocab
    (text.build_vocab / encode_docs), assigned to fixed-token-budget packs
    (pack_sequences), and each pack's id sequences are concatenated in
    deterministic doc_id order. Returns (stratum, pack_id, n_docs,
    n_tokens, token_ids) — one row per training batch.

    Shape: the encode path's one groupBy(doc_id) + the pack window share
    the doc_id/stratum keys; the final groupBy(stratum, pack_id) collects
    ~token_budget ids per group — bounded rows out, map-side combinable
    in. Nothing here changes shape with corpus size: packs are
    budget-bounded, the vocab probe is a broadcast."""
    from btrblocks_spark.pipeline.text import build_vocab, encode_docs

    enc = encode_docs(docs, build_vocab(docs, vocab_size))
    packs = pack_sequences(docs, token_budget, stratum_col=stratum_col)
    j = packs.join(enc.select("doc_id", "token_ids"), "doc_id")
    return j.groupBy("stratum", "pack_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.expr(
            "flatten(transform(array_sort(collect_list(struct(doc_id, token_ids))), "
            "s -> s.token_ids))"
        ).alias("token_ids"),
    )


def retained_docs(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en", "de", "fr"),
) -> DataFrame:
    """The curation composite: a document survives iff
      1. it is the canonical copy of its normalized content (min doc_id per
         content hash — exact dedup),
      2. its predicted language is in ``langs``,
      3. its composite quality score ≥ ``min_quality``.

    Returns (doc_id, pred_lang, quality, n_tokens), one row per survivor.
    """
    from btrblocks_spark.pipeline.text import _lang_pick, _lang_vote_aggs

    canon = (
        docs.select("doc_id", F.md5(normalized(F.col("text"))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # ONE token pass computes language votes AND quality inputs (the
    # text-level metrics ride through the explode, recovered with first())
    # — one scan + one groupBy(doc_id) instead of two explodes, a vocab
    # join, and a window
    # (the expensive exprs sit in a Project BELOW the Generate — exploding a
    # column reference, not an inline explode(...), else Catalyst evaluates
    # them per token; see quality_scores)
    pre = docs.select(
        "doc_id",
        F.length("text").alias("_n_chars"),
        F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), 0)).alias("_n_punct"),
        F.split("text", " ").alias("_toks"),
    )
    t = pre.select(
        "doc_id", "_n_chars", "_n_punct", F.explode("_toks").alias("w")
    ).withColumn("lw", F.lower("w"))
    per_doc = t.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("lw").alias("uniq_tokens"),
        F.first("_n_chars").alias("n_chars"),
        F.first("_n_punct").alias("n_punct"),
        *_lang_vote_aggs(),
    )
    pred, _best = _lang_pick()
    from btrblocks_spark.pipeline.text import quality_composite

    quality = quality_composite()
    scored = per_doc.select(
        "doc_id", pred.alias("pred_lang"), quality.alias("quality"), "n_tokens"
    )
    return (
        canon.join(scored, "doc_id")
        .filter(F.col("pred_lang").isin(*langs) & (F.col("quality") >= min_quality))
        .select("doc_id", "pred_lang", "quality", "n_tokens")
    )


def topk_per_stratum(
    docs: DataFrame,
    scores: DataFrame,
    k: int = 3,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Best-of-domain selection: the top ``k`` documents per stratum by a
    quality score (ties broken by doc_id asc) — the "keep only the best N
    per domain" curation step that pairs with ``cap_per_stratum``'s uniform
    cap.

    ``scores`` is (doc_id, score) — e.g. ``text.quality_scores`` output —
    joined on doc_id (co-keyed with the docs scan), then one rank window per
    stratum. Only ranks <= k survive, so at 100 TB the same two-phase
    partial-top-k pre-filter as cap_per_stratum applies before the window."""
    from pyspark.sql.window import Window

    joined = docs.select(
        F.col(id_col).alias("doc_id"), F.col(stratum_col).alias("stratum")
    ).join(scores.select("doc_id", F.col(score_col).alias("score")), "doc_id")
    w = Window.partitionBy("stratum").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("quality_rank", F.row_number().over(w))
        .filter(F.col("quality_rank") <= k)
        .select("stratum", "quality_rank", "doc_id", "score")
    )


def winsorize_stats(
    docs: DataFrame,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    value_col: str = "n_chars",
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum winsorization profile: clip ``value_col`` to its
    [p_lo, p_hi] discrete percentiles WITHIN each stratum, report per-stratum
    count, clip thresholds, clipped-row counts, and the winsorized mean —
    the standard outlier-robust length/quality normalization before
    training-mix decisions.

    Percentiles use interpolation-free rank selection (value at
    row_number == floor(p*(n-1))+1 under a (value, id) total order), so the
    whole profile is integer-exact except the final mean division.

    Shape at scale: the rank window partitions BY STRATUM — every stratum
    sorts in parallel, no global sort. The thresholds table is one row per
    stratum (tiny) and is broadcast back onto the corpus, so the clip pass
    is a narrow map; with a skewed giant stratum, swap rank selection for
    the bucketed two-phase row_number in queries/_distributed.py."""
    from pyspark.sql.window import Window

    ranked = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.col(stratum_col).alias("stratum"),
            F.col(value_col).alias("v"),
        )
        # winsorized statistics are over the stratum's NON-NULL values:
        # with NULLs in the rank base, cnt inflates the percentile ranks
        # (a >= (1-p_hi) null share elects a NULL hi = upper clipping
        # silently OFF), and the clip pass would impute each NULL as lo
        # (Spark greatest/least skip NULLs) — phantom lo values summed
        # into winsor_mean. Filter once; every downstream stat agrees.
        .filter(F.col("v").isNotNull())
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("stratum").orderBy(F.asc("v"), "_id")
            ),
        )
        .withColumn("cnt", F.count("*").over(Window.partitionBy("stratum")))
    )
    lo_rn = (F.floor(F.lit(p_lo) * (F.col("cnt") - 1)) + 1).cast("long")
    hi_rn = (F.floor(F.lit(p_hi) * (F.col("cnt") - 1)) + 1).cast("long")
    thr = (
        ranked.filter((F.col("rn") == lo_rn) | (F.col("rn") == hi_rn))
        .groupBy("stratum")
        .agg(
            F.min(F.when(F.col("rn") == lo_rn, F.col("v"))).alias("lo"),
            F.max(F.when(F.col("rn") == hi_rn, F.col("v"))).alias("hi"),
        )
    )
    vals = docs.select(
        F.col(stratum_col).alias("stratum"), F.col(value_col).alias("v")
    ).filter(F.col("v").isNotNull())
    clipped = vals.join(F.broadcast(thr), "stratum").withColumn(
        "cv", F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    )
    return (
        clipped.groupBy("stratum")
        .agg(
            F.count("*").alias("n_docs"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0)).alias("n_clip_lo"),
            F.sum(F.when(F.col("v") > F.col("hi"), 1).otherwise(0)).alias("n_clip_hi"),
            F.round(F.sum("cv") / F.count("*"), 6).alias("winsor_mean"),
        )
        .select("stratum", "n_docs", "lo", "hi", "n_clip_lo", "n_clip_hi", "winsor_mean")
    )


def domain_entropy(
    docs: DataFrame, group_col: str = "lang", stratum_col: str = "source"
) -> DataFrame:
    """Corpus-diversity profile: Shannon entropy of the ``stratum_col``
    distribution within each ``group_col`` value (nats), plus the dominant
    stratum's share. Low entropy = the group is dominated by one source —
    the statistic behind source-mixing decisions in corpus curation.

    Cross-engine exactness: each p·ln(p) term is rounded to 6 dp (absorbing
    last-ulp ln differences between engines) and summed as DECIMAL, the
    same round-then-decimal-sum pattern as ``text_unigram_surprisal``.

    Scale: first aggregate is (group, stratum) counts — map-side
    combinable, shuffles only key+count; everything after runs on
    O(#groups × #strata) rows.
    """
    from pyspark.sql.window import Window

    counts = docs.groupBy(
        F.col(group_col).alias("grp"), F.col(stratum_col).alias("stratum")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("grp")
    terms = counts.withColumn("n", F.sum("c").over(w)).select(
        "grp",
        "c",
        "n",
        F.round(
            (F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n")), 6
        )
        .cast("decimal(18,6)")
        .alias("term"),
    )
    return (
        terms.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_strata"),
            F.sum("c").cast("long").alias("n_docs"),
            # 0.0 - x (not -x): single-stratum groups sum to 0 and unary
            # negation would emit -0.0, whose bit pattern differs per engine
            F.round(F.lit(0.0) - F.sum("term").cast("double"), 6).alias("entropy_nats"),
            F.round(F.max("c") / F.max("n"), 6).alias("top_share"),
        )
        .withColumn(
            "entropy_norm",
            F.when(F.col("n_strata") > 1,
                   F.round(F.col("entropy_nats") / F.log(F.col("n_strata").cast("double")), 6)
            ).otherwise(F.lit(0.0)),
        )
        .orderBy("grp")
    )


def neyman_allocation(
    docs: DataFrame,
    budget: int = 10000,
    stratum_col: str = "source",
    metric_col: str = "n_chars",
) -> DataFrame:
    """Neyman-optimal stratified sampling allocation (Neyman 1934): given a
    total sample budget B, allocate to stratum h in proportion to
    ``N_h · S_h`` (stratum size × within-stratum std-dev of the survey
    metric) — the allocation that minimizes the variance of the stratified
    mean estimator. This is the principled upgrade to proportional
    sampling for corpus curation: a source whose quality metric varies
    wildly gets MORE of the audit/sample budget than an equally-sized
    homogeneous one.

    Determinism: N_h, Σx, Σx² are exact integer aggregates; S_h is ONE
    scalar IEEE expression over them (the stats_welch_ttest convention);
    each stratum's weight N_h·S_h is rounded to 6 dp and the total is the
    DECIMAL(18,6) sum of those rounded terms (order-independent); the
    final allocation floors ``B × share`` in exact DECIMAL arithmetic so
    no engine disagreement on .5 boundaries is possible. A single-row
    stratum (S undefined, n−1 = 0) degrades to NULL weight → 0 allocation
    via coalesce, on both engines.

    Scale: one map-side-combinable groupBy to O(#strata) rows; the total
    is a broadcast-sized second aggregate; nothing after the first shuffle
    touches the corpus."""
    m = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_h"),
        # nm = NON-NULL metric count: S_h's moments (s, q) skip NULL
        # metric values, so the variance must divide by the same row
        # count or NULL-heavy strata get an inflated S_h and steal
        # budget (round-8 ADVICE). n_h (the full stratum size) still
        # weights the allocation — Neyman's N_h is population size.
        F.count(F.col(metric_col)).alias("nm"),
        F.sum(F.col(metric_col).cast("long")).alias("s"),
        F.sum(F.col(metric_col).cast("long") * F.col(metric_col).cast("long")).alias(
            "q"
        ),
    )
    # clamp the variance numerator at 0 via explicit CASE (never
    # greatest(): it SKIPS NULLs): q − s²/n is an FP cancellation, and a
    # (near-)constant-metric stratum with n·x² past 2^53 can land a hair
    # below zero — DuckDB's sqrt ABORTS on negatives while Spark returns
    # NaN, so without the clamp the whole oracle query dies (round-7
    # review finding). A NULL numerator (all-NULL metric: s and q are
    # NULL, and nm − 1 = −1 never divides by zero) stays NULL.
    numer = (
        F.col("q").cast("double")
        - F.try_divide(
            F.col("s").cast("double") * F.col("s").cast("double"),
            F.col("nm").cast("double"),
        )
    )
    sd = F.sqrt(
        F.try_divide(
            F.when(numer < 0, F.lit(0.0)).otherwise(numer),
            F.col("nm") - 1,
        )
    )
    terms = m.select(
        "stratum",
        F.col("n_h").cast("long").alias("n_h"),
        F.round(sd, 6).alias("sd"),
        F.round(F.col("n_h") * sd, 6).cast("decimal(18,6)").alias("w"),
    )
    tot = terms.agg(
        F.sum(F.coalesce(F.col("w"), F.lit(0).cast("decimal(18,6)"))).alias("w_tot")
    )
    share = F.round(
        F.try_divide(F.col("w").cast("double"), F.col("w_tot").cast("double")), 6
    )
    return terms.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_h",
        "sd",
        share.alias("neyman_share"),
        F.floor(
            F.coalesce(share, F.lit(0.0)).cast("decimal(18,6)") * F.lit(budget)
        )
        .cast("long")
        .alias("n_alloc"),
    )
