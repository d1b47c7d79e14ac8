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
from btrblocks_spark.pipeline.similarity import cosine_topk, lsh_bucketed_topk
from btrblocks_spark.pipeline.text import (
    hash32,
    tokens,
    shingles,
    language_id,
    quality_scores,
    token_stats,
    fingerprints,
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
    "lsh_bucketed_topk",
    "hash32",
    "tokens",
    "shingles",
    "language_id",
    "quality_scores",
    "token_stats",
    "fingerprints",
]
