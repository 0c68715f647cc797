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
    funnel,
    graph,
    manifest,
    multimodal,
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
    tpch,
    tpch_ext,
    tpch_more,
    training,
    winnow,
    zorder,
)

_MODULES = (
    cdc, streaming_queries, winnow, chunking, semantic, text_ext, extras,
    spans, manifest, sketches, zorder, bpe, graph, search, dsir,
    dedup, similarity, cluster, multimodal, text, quality, training, corpus,
    skew, debezium_types, funnel, events, tpch, tpch_ext, tpch_more,
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
    # rule 1: cdc (8)
    "cdc_current_state", "cdc_soft_delete_state", "cdc_envelope_transform",
    "cdc_epoch_micros_roundtrip", "cdc_count_final", "cdc_idempotent_replay",
    "cdc_scd2_history", "cdc_reconciliation_report",
    # rule 2: never driver-checked — streaming e2e (8)
    "streaming_incremental_dedup", "streaming_minhash_neardup",
    "streaming_tumbling_equiv", "streaming_late_data_drop",
    "streaming_session_equiv", "streaming_ivf_ingest_equiv",
    "streaming_cdc_pipeline_equiv", "streaming_postings_ingest_equiv",
    # rule 2: round-3 additions (9) + round-4 (the rest)
    "text_winnowing_fingerprints", "doc_chunking", "chunk_dedup_content_defined",
    "embedding_semantic_cluster", "text_langid_chargram", "text_pii_redact",
    "text_html_strip", "corpus_version_diff", "events_transition_matrix",
    "dedup_cluster_size_hist", "dedup_exact_substring", "dedup_lines",
    "corpus_training_manifest", "corpus_temperature_mixture",
    "sketch_kmv_distinct", "events_anomaly_mad", "events_user_ewma",
    "sketch_hll_distinct", "sketch_cms_heavy_hitters", "sketch_kmv_union",
    "layout_zorder_clustering", "bpe_train_merges", "bpe_token_count",
    "graph_pagerank_types", "text_bm25_search", "ann_pq_topk",
    "multimodal_audio_frames", "multimodal_phash_neardup",
    "retrieval_hybrid_rrf", "corpus_dsir_weights",
    "text_ccnet_buckets", "graph_sssp_types", "graph_triangle_types",
    "dedup_soft_weights",
    # rule 3: refill to 50 with r3-green families (oldest proof first)
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
