"""Query registry: every implemented operator exposed as a (Spark callable,
DuckDB oracle SQL) pair for the driver's correctness gate.

Each submodule defines ``QUERIES: dict[str, callable]`` and
``ORACLE: dict[str, str]``; this package aggregates them. Column names and
value types are aligned pair-wise (the driver hashes values after sorting
columns by name), so every computed column is aliased identically on both
sides, monetary aggregates are summed as DECIMAL then cast to DOUBLE, and
ratios are rounded identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_postgresql_clickhouse_spark.queries import (
    bpe,
    cdc,
    chunking,
    cluster,
    corpus,
    debezium_types,
    dedup,
    dsir,
    events,
    extras,
    formats,
    funnel,
    graph,
    manifest,
    multimodal,
    pca,
    quality,
    search,
    semantic,
    similarity,
    sketches,
    skew,
    spans,
    streaming_queries,
    text,
    text_ext,
    tokenizer,
    tpch,
    tpch_ext,
    tpch_more,
    training,
    winnow,
    zorder,
)

_MODULES = (
    cdc, streaming_queries, winnow, chunking, semantic, text_ext, extras,
    spans, manifest, sketches, zorder, bpe, tokenizer, graph, search, dsir,
    dedup, similarity, pca, cluster, multimodal, text, quality, training, corpus,
    skew, debezium_types, funnel, events, formats, tpch, tpch_ext, tpch_more,
)

# Registration order is load-bearing: the driver's correctness gate runs the
# FIRST 50 registered queries only. ROTATION POLICY (see COVERAGE.md):
# rule 1 — cdc always registers first (core reference semantics, cheap
# insurance every round); rule 2 — queries that have NEVER had a driver
# CORRECTNESS row register next, ahead of anything already proven; rule 2b —
# a query whose LATEST driver row is red stays inside the window until it
# goes green (added r5); rule 3 — the window refills with already-green
# families, oldest proof first.
#
# The policy is encoded EXPLICITLY here rather than via module order (a new
# query added mid-module would otherwise silently push a never-checked one
# past position 50 — tests/test_window_policy.py pins this). _WINDOW_FRONT
# lists the first-50 names in driver order; every remaining query follows in
# module order and is re-verified locally by scripts/parity_sweep.py.
_WINDOW_FRONT = [
    # rule 1: cdc insurance, 2 slots: the flagship current-state read plus
    # one rotating CDC row (r14 rotation: cdc_dlq_report — at r7 the oldest
    # cdc driver proof, so the insurance slot doubles as the cdc family's
    # staleness re-check; cdc_state_asof rotated out after its r13 green).
    "cdc_current_state", "cdc_dlq_report",
    # rule 2: the never-driver-checked queue is EMPTY (all 418 registered
    # queries have at least one driver proof; r14 is an optimization round
    # and registers no new queries).
    # rule 3 (staleness): the remaining 48 slots fill with already-green
    # rows whose latest driver proof is OLDEST — the full 11-row r3-latest
    # cohort (after this round no row's proof predates r4), then the first
    # 37 of the 41-row r4-latest cohort in registration order. The 4 r4
    # rows left behind (corpus_dsir_weights, ann_pq_topk,
    # multimodal_audio_frames, multimodal_phash_neardup) front the r15
    # window and stay within the MAX_PROOF_AGE=10 bound at r14.
    # tests/test_window_policy.py pins the rule and the bound.
    "skew_salted_revenue_by_status", "skew_distinct_parts_per_supplier",
    "debezium_decimal_decode", "hstore_props_map",
    "funnel_windowed", "retention_weekly",
    "sequence_match_clean_purchase", "grouped_topk_event_values",
    "events_error_blast_radius", "sketch_distinct_users",
    "events_purchase_attribution",
    "streaming_incremental_dedup", "streaming_minhash_neardup",
    "streaming_tumbling_equiv", "streaming_late_data_drop",
    "streaming_session_equiv", "streaming_ivf_ingest_equiv",
    "streaming_postings_ingest_equiv", "streaming_cdc_pipeline_equiv",
    "text_winnowing_fingerprints", "doc_chunking",
    "chunk_dedup_content_defined", "embedding_semantic_cluster",
    "text_langid_chargram", "text_pii_redact",
    "text_html_strip", "text_ccnet_buckets",
    "corpus_version_diff", "events_transition_matrix",
    "dedup_cluster_size_hist", "dedup_soft_weights",
    "dedup_exact_substring", "dedup_lines",
    "corpus_training_manifest", "corpus_temperature_mixture",
    "sketch_kmv_distinct", "events_user_ewma",
    "sketch_hll_distinct", "sketch_cms_heavy_hitters",
    "sketch_kmv_union", "layout_zorder_clustering",
    "bpe_train_merges", "bpe_token_count",
    "graph_pagerank_types", "graph_sssp_types",
    "graph_triangle_types", "text_bm25_search",
    "retrieval_hybrid_rrf",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    missing = [n for n in _WINDOW_FRONT if n not in out]
    if missing:
        raise ValueError(f"_WINDOW_FRONT names not registered: {missing}")
    ordered = {n: out[n] for n in _WINDOW_FRONT}
    ordered.update({n: f for n, f in out.items() if n not in ordered})
    return ordered


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    ordered = {n: out[n] for n in _WINDOW_FRONT if n in out}
    ordered.update({n: s for n, s in out.items() if n not in ordered})
    return ordered
