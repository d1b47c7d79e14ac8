"""Training-data pipeline operators — the operations a large-scale corpus
pipeline needs on top of the relational/format surface: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
search (brute-force + LSH-bucketed ANN), text analysis (language-ID, quality
scoring, token counting, fingerprinting) and multimodal column plumbing.

Everything is built on Spark DataFrame primitives with deterministic,
cross-engine-reproducible arithmetic (md5-based 32-bit hashing) so each
operator is verifiable against a DuckDB oracle bit-exactly.
"""

from btrblocks_spark.pipeline.dedup import (
    dedup_exact,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_signatures,
    simhash_near_pairs,
    ngram_jaccard_pairs,
    embedding_cosine_pairs,
)
from btrblocks_spark.pipeline.retrieval import (
    bm25_topk,
    rrf_fuse,
    tfidf_terms,
)
from btrblocks_spark.pipeline.similarity import (
    cosine_topk,
    filtered_cosine_topk,
    ivf_cells,
    ivf_topk,
    kmeans_refine,
    lsh_bucketed_topk,
    normalize_embeddings,
)
from btrblocks_spark.pipeline.text import (
    build_vocab,
    chunk_windows,
    contamination_flags,
    corpus_topk_ngrams,
    encode_docs,
    fingerprints,
    hash32,
    language_id,
    quality_scores,
    repetition_profile,
    scrub_text,
    shingles,
    token_stats,
    tokens,
    unigram_surprisal,
)
from btrblocks_spark.pipeline.curation import (
    cap_per_stratum,
    pack_sequences,
    retained_docs,
    stratified_sample,
    train_val_test_split,
    training_batches,
    upsample_strata,
)

__all__ = [
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_near_pairs",
    "ngram_jaccard_pairs",
    "embedding_cosine_pairs",
    "cosine_topk",
    "filtered_cosine_topk",
    "bm25_topk",
    "tfidf_terms",
    "rrf_fuse",
    "chunk_windows",
    "ivf_cells",
    "ivf_topk",
    "kmeans_refine",
    "lsh_bucketed_topk",
    "normalize_embeddings",
    "hash32",
    "tokens",
    "shingles",
    "language_id",
    "quality_scores",
    "token_stats",
    "fingerprints",
    "build_vocab",
    "encode_docs",
    "corpus_topk_ngrams",
    "repetition_profile",
    "scrub_text",
    "contamination_flags",
    "unigram_surprisal",
    "cap_per_stratum",
    "pack_sequences",
    "retained_docs",
    "stratified_sample",
    "train_val_test_split",
    "training_batches",
    "upsample_strata",
]
