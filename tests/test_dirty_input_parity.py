"""Dirty-input operator↔oracle parity gate.

The oracle sweep proves both engines agree ON THE TESTDATA — it can never
catch a divergence on an input shape the testdata lacks (the round-3
zero-norm-embedding hole, and the round-4 review's NULL-text / NULL-source
/ NULL-event-type / single-hour-series findings). This gate builds a
fixture sf_dir that CONTAINS those degenerate rows and re-runs the exact
registered query + oracle pairs over it, bit-exact:

  documents: a NULL-text doc, an empty-text doc, a NULL-source doc
  events:    a NULL-event_type row, an event type active in exactly one
             hour (std=0), one with exactly two active hours (k=1 lag pair)

Any operator that crashes under ANSI (unguarded x/0), any oracle that
drops a row the operator keeps (NULL-propagating || vs concat_ws,
unnest-vanishing docs, NULLS FIRST/LAST rank shifts), fails here before
the real corpus ever exercises it.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from btrblocks_spark.oracle import compare
from btrblocks_spark.queries import all_oracles, all_queries

DOC_QUERIES = [
    "text_quality",
    "text_model_score",
    "text_token_stats",
    "text_repetition_profile",
    "text_fingerprint",
    "dedup_exact",
    "curation_stratified_sample",
    "curation_cap_per_source",
    "curation_retained_docs",
    "curation_weighted_sample",
    "curation_priority_sample",
    "curation_padding_waste",
    # NULL-text doc → n_tokens 0 / weight NULL; NULL-source doc → dropped
    # from candidates ('!=' NULL semantics) but pairs under a NULL label
    "text_dsir_weights",
    "curation_dsir_topk",
    "curation_dsir_resample",
    "dedup_cross_source_leakage",
    # NULL/empty-text docs vanish from the token stream (unnest of an
    # empty split) — the bigram/TF-IDF/shingle chains must agree on that
    "text_kneser_ney_bigram",
    "retrieval_hard_negatives",
    "dedup_local_clustering",
    "text_vocab_coverage",
    # NULL source → its own (single-row) stratum on both engines: S_h is
    # undefined there, so the degenerate nullif/try_divide guard and the
    # coalesce-to-0 weight must agree cross-engine
    "curation_neyman_allocation",
    # composes four dedup chains whose NULL/empty-text behaviors must
    # agree through the distinct-doc_b counts
    "dedup_method_impact",
]

TPCH_QUERIES = [
    "dedup_by_key",
    "window_lag_lead",
    "window_frame",
    "window_distribution",
    "agg_listagg",
    "orders_benford_digits",
    "merge_upsert_customers",
    "stats_moments",
    "stats_percentile_profile",
    "format_table_digest",
    "stats_theil_sen",
    "format_column_group_plan",
    # NULL o_totalprice: the cent sum skips the row while count(*) keeps
    # it — every leave-one-out estimate must shift identically on both
    # engines
    "stats_jackknife_group",
    # same NULL-price shift, but over 32 hash buckets (every bucket is
    # hit by the md5-keyed assignment, so the dirty row lands somewhere
    # deterministic on both engines)
    "stats_jackknife_hash",
]

EVENT_QUERIES = [
    "events_json_props",
    "events_salted_join",
    "events_anomaly_zscore",
    "events_autocorr_lag1",
    "events_funnel",
    "events_burstiness",
    "events_trend_test",
    "events_runs_test",
    "events_acf_profile",
    # NULL-ts / NULL-value rows: sessions, sequences, and hourly series
    # must drop timeless/valueless events identically on both engines
    # (attribution also sees NULL event_type: neither a touch nor a
    # conversion — the != / = NULL three-value logic must agree)
    "events_attribution",
    "events_sessionize",
    "events_bounce_rate",
    "events_session_window_native",
    "events_asof_join",
    "events_markov_transitions",
    "events_path_trigrams",
    "events_threshold_alerts",
    "events_cusum_changepoint",
    "events_ewma_smoothed",
    "events_peak_detection",
    "events_seasonal_decompose",
    # NULL ts rows must vanish from the gap stream / window halves before
    # any lead()/boundary arithmetic on both engines
    "events_kaplan_meier",
    # per-type curves additionally see the NULL-event_type row, which must
    # be excluded from every curve identically on both engines
    "events_kaplan_meier_by_type",
    "events_poisson_rate_test",
]

MEDIA_QUERIES = [  # NULL-text → empty-payload contract
    "multimodal_frame_sample",
    "multimodal_audio_windows",
    "multimodal_decode_features",  # rows-only: must not crash
]


@pytest.fixture(scope="module")
def dirty_sf_dir(spark, sf_dir, tmp_path_factory):
    fixture = str(tmp_path_factory.mktemp("dirty_sf"))
    rewritten = {
        "documents.parquet",
        "events.parquet",
        "orders.parquet",
        "customer.parquet",
        "lineitem.parquet",
    }
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet") and f not in rewritten:
            os.symlink(os.path.join(sf_dir, f), os.path.join(fixture, f))

    # --- TPC-H side dirt: NULL window keys, zero/negative prices, an
    # all-NULL-segment nation, a NULL update value for the MERGE batch ---
    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet")).select(
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
    )
    mo = max(orders["o_orderkey"].to_pylist())
    dirty_orders = pa.table(
        {
            "o_orderkey": pa.array([mo + 1, mo + 2, mo + 3, mo + 4], type=pa.int64()),
            # 7-divisible custkey with NULL price: the MERGE update batch's
            # sum() goes NULL → row-wins semantics exercised
            "o_custkey": pa.array([7, 7, 11, 13], type=pa.int64()),
            "o_orderstatus": pa.array(["O", "O", "O", "O"], type=pa.string()),
            # NULL price (digest sentinel + NULL-sum), 0.004 (Benford digit
            # 0), negative price (Benford digit '-')
            "o_totalprice": pa.array([None, 0.004, -12.5, 99.0], type=pa.float64()),
            # NULL order date: window/dedup NULLS LAST pinning
            "o_orderdate": pa.array(
                [None, datetime.datetime(2030, 1, 2), datetime.datetime(2030, 1, 3), None],
                type=pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * 4, type=pa.string()),
        }
    )
    pq.write_table(
        pa.concat_tables([orders, dirty_orders]),
        os.path.join(fixture, "orders.parquet"),
    )

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet")).select(
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    mc = max(cust["c_custkey"].to_pylist())
    dirty_cust = pa.table(
        {
            "c_custkey": pa.array([mc + 1, mc + 2], type=pa.int64()),
            "c_name": pa.array(["dirty#1", "dirty#2"], type=pa.string()),
            # nation 99 exists ONLY with NULL segments → all-NULL listagg
            # group; NULL acctbal → window_distribution NULLS LAST
            "c_nationkey": pa.array([99, 99], type=pa.int32()),
            "c_acctbal": pa.array([None, 10.0], type=pa.float64()),
            "c_mktsegment": pa.array([None, None], type=pa.string()),
        }
    )
    pq.write_table(
        pa.concat_tables([cust, dirty_cust]),
        os.path.join(fixture, "customer.parquet"),
    )

    li = pq.read_table(os.path.join(sf_dir, "lineitem.parquet")).select(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
         "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
         "l_shipdate"]
    )
    ml = max(li["l_orderkey"].to_pylist())
    dirty_li = pa.table(
        {
            "l_orderkey": pa.array([ml + 1, ml + 2], type=pa.int64()),
            "l_partkey": pa.array([1, 2], type=pa.int64()),
            "l_suppkey": pa.array([3, 3], type=pa.int64()),
            "l_linenumber": pa.array([1, 1], type=pa.int32()),
            "l_quantity": pa.array([5.0, 7.0], type=pa.float64()),
            "l_extendedprice": pa.array([100.0, None], type=pa.float64()),
            "l_discount": pa.array([0.01, 0.02], type=pa.float64()),
            "l_tax": pa.array([0.0, 0.0], type=pa.float64()),
            # 'X': a single-row returnflag group → zero variance → NULL corr
            "l_returnflag": pa.array(["X", "R"], type=pa.string()),
            "l_linestatus": pa.array(["O", "O"], type=pa.string()),
            # NULL shipdate → window_frame NULLS LAST pinning
            "l_shipdate": pa.array(
                [datetime.datetime(2030, 2, 1), None], type=pa.timestamp("us")
            ),
        }
    )
    pq.write_table(
        pa.concat_tables([li, dirty_li]),
        os.path.join(fixture, "lineitem.parquet"),
    )

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).select(
        ["doc_id", "text", "lang", "source", "n_chars"]
    )
    max_doc = max(docs["doc_id"].to_pylist())
    dirty_docs = pa.table(
        {
            "doc_id": pa.array(
                [max_doc + 1, max_doc + 2, max_doc + 3], type=pa.int64()
            ),
            "text": pa.array([None, "", "null source text body"], type=pa.string()),
            "lang": pa.array(["en", "en", "en"], type=pa.string()),
            "source": pa.array(["src1", "src2", None], type=pa.string()),
            "n_chars": pa.array([0, 0, 21], type=pa.int64()),
        }
    )
    pq.write_table(
        pa.concat_tables([docs, dirty_docs]),
        os.path.join(fixture, "documents.parquet"),
    )

    ev = pq.read_table(os.path.join(sf_dir, "events.parquet")).select(
        ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    max_ev = max(ev["event_id"].to_pylist())
    t0 = datetime.datetime(2030, 1, 1, 0, 10, 0)
    dirty_ev = pa.table(
        {
            "event_id": pa.array(
                [max_ev + i for i in range(1, 9)], type=pa.int64()
            ),
            "ts": pa.array(
                [
                    t0,  # NULL-type row's time
                    t0,  # rare_burst: two active hours -> k=1 lag pair
                    t0 + datetime.timedelta(minutes=5),
                    t0 + datetime.timedelta(hours=1),
                    t0,  # rare_once: ONE active hour -> hourly std = 0
                    t0,  # non-integer JSON props.k -> try_cast NULL
                    None,  # NULL ts: no session/sequence/hour position
                    t0,  # NULL value: contributes nothing to value series
                ],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array(
                [901, 902, 902, 902, 903, 904, 902, 902], type=pa.int64()
            ),
            "event_type": pa.array(
                [None, "rare_burst", "rare_burst", "rare_burst", "rare_once",
                 "rare_once", "click", "click"],
                type=pa.string(),
            ),
            "value": pa.array(
                [1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, None], type=pa.float64()
            ),
            "props": pa.array(
                ["{}"] * 5 + ['{"k": "not-a-number"}'] + ["{}"] * 2,
                type=pa.string(),
            ),
        }
    )
    pq.write_table(
        pa.concat_tables([ev, dirty_ev]), os.path.join(fixture, "events.parquet")
    )
    return fixture


def _run(spark, fixture, names):
    queries, oracles = all_queries(), all_oracles()
    failed = []
    for name in names:
        df = queries[name](spark, fixture)
        if name in oracles:
            ok, msg = compare(df, oracles[name], fixture)
        else:  # rows-only register: surviving the dirty rows IS the check
            ok, msg = df.count() >= 0, "rows-only"
        if not ok:
            failed.append(f"{name}: {msg}")
    assert not failed, "\n".join(failed)


def test_document_queries_survive_dirty_rows(spark, dirty_sf_dir):
    _run(spark, dirty_sf_dir, DOC_QUERIES)


def test_event_queries_survive_dirty_rows(spark, dirty_sf_dir):
    _run(spark, dirty_sf_dir, EVENT_QUERIES)


def test_tpch_queries_survive_dirty_rows(spark, dirty_sf_dir):
    _run(spark, dirty_sf_dir, TPCH_QUERIES)


def test_media_queries_survive_dirty_rows(spark, dirty_sf_dir):
    _run(spark, dirty_sf_dir, MEDIA_QUERIES)
