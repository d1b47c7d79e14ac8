"""Query registry: every declared operator from SURVEY.md §2 gets a named
query (spark, sf_dir) -> DataFrame and (where SQL-expressible) a DuckDB
oracle SQL string with identical column names and deterministic values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # import for registration side effects
    from btrblocks_spark.queries import (  # noqa: F401
        events_queries,
        extras,
        format_queries,
        pipeline_queries,
        quality,
        relational,
        stats,
        tpch_more,
        tpch_queries,
    )


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(ORACLE)


# Queries whose BUILDER executes cluster work (iterative training loops
# with per-round collects, temp-dir writes + localCheckpoint round-trips,
# count()-driven plan decisions). Wrapping these in a temp view is still
# possible, but registration itself would run minutes of jobs — the
# opposite of the "views are lazy" contract — so the default registration
# skips them; pass include_eager=True (or name them explicitly) to opt in.
# This list is hand-maintained but MACHINE-ENFORCED: test_queries_oracle.py::
# test_register_query_views_default_is_metadata_only registers every
# non-listed query under a job group and fails if ANY Spark job ran — a new
# eager builder that forgets to add itself breaks CI, not production.
EAGER_BUILD = frozenset(
    {
        "agg_percentiles_disc",
        "ann_binary_topk",
        "ann_kmeans_refine",
        "ann_ndcg_audit",
        "ann_operating_curve",
        "ann_recall_audit",
        "basket_association_rules",
        "customer_ltv_cohorts",
        "customer_rfm_segments",
        "dedup_cluster_keep_best",
        "dedup_clusters",
        "dedup_graph_triangles",
        "dedup_jaccard_prefix",
        "dedup_kcore",
        "dedup_local_clustering",
        "dedup_lsh_recall",
        "dedup_lsh_tuned_recall",
        "dedup_pagerank",
        "dedup_tfidf_cosine",
        "dict_codespace_filter",
        "embedding_pca_topk",
        "embedding_second_moment",
        "events_attribution",
        "events_kaplan_meier",
        "events_kaplan_meier_by_type",
        "events_mad_anomaly",
        "format_chunk_stats",
        "format_column_group_roundtrip",
        "format_datasource_roundtrip",
        "format_delete_vectors",
        "format_dpp_join",
        "format_scheme_plan",
        "format_metadata_only_agg",
        "format_partition_pruned_scan",
        "frequency_domain_roundtrip",
        "retrieval_hard_negatives",
        "retrieval_mmr_rerank",
        "retrieval_mmr_rerank_k",
        "scan_csv_roundtrip",
        "scan_jsonl_roundtrip",
        "scan_predicate_bitmap",
        "sql_recursive_month_spine",
        "stats_column_entropy",
        "stats_heavy_hitters",
        "stats_jackknife_group",
        "stats_jackknife_hash",
        "stats_ks_drift",
        "stats_mutual_information",
        "stats_quantile_sketch",
        "stats_string_profile",
        "stats_theil_sen",
        "text_bpe_merges",
        "text_source_overlap",
        "text_vocab_coverage",
        "training_logreg_quality",
    }
)


def register_query_views(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    include_eager: bool = False,
) -> list[str]:
    """Expose registered operators as SQL temp views, so the engine surface
    is reachable from plain ``spark.sql``:

        register_query_views(spark, "/data/sf0.1")
        spark.sql("SELECT * FROM text_source_divergence ORDER BY source")

    Registered views are LAZY DataFrames — nothing executes until queried,
    and Catalyst fuses any outer SQL (filters, projections, joins over the
    view) into the operator's own plan, so view-wrapped operators compose
    without materialization. For that contract to be TRUE, queries whose
    builder itself executes work (``EAGER_BUILD``: iterative trainers,
    round-trip queries that write temp tables, count()-driven plans) are
    skipped by default — name them explicitly or pass ``include_eager=True``
    to register them too, accepting the build-time execution. Base tables
    are registered as well (same names the oracle layer uses). Returns the
    registered view names."""
    from btrblocks_spark.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    queries = all_queries()
    if names is not None:
        todo = names
    else:
        todo = sorted(q for q in queries if include_eager or q not in EAGER_BUILD)
    out = []
    for name in todo:
        queries[name](spark, sf_dir).createOrReplaceTempView(name)
        out.append(name)
    return out
