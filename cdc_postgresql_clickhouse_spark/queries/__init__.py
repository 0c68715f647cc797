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
    # rule 1: cdc insurance, shrunk to 2 while the never-checked queue is
    # non-empty (VERDICT r8 #1): the flagship current-state read plus one
    # rotating CDC row (r9 rotation: cdc_count_final, the reference's own
    # verification query, README.md:321-329).
    "cdc_current_state", "cdc_count_final",
    # rule 2b: none — CORRECTNESS_r08 was 50/50 green, zero red anywhere.
    # rule 2: never driver-checked — 85 rows queued after the r8 full
    # registration; the window takes the first 48 in registration (module)
    # order. The remaining 37 follow behind the window and front in r10;
    # every registered row is re-verified locally by
    # scripts/parity_sweep.py each round regardless.
    "cdc_inversion_report", "cdc_state_growth", "cdc_key_churn",
    "cdc_write_amplification", "cdc_op_mix_weekly", "cdc_txn_atomicity_report",
    "streaming_state_store_dedup_equiv", "streaming_sliding_equiv", "streaming_ohlc_equiv",
    "streaming_km_equiv", "streaming_interval_left_join_equiv", "chunk_stability_report",
    "quality_langid_kappa", "corpus_bigram_kn_ppl", "text_burrows_delta",
    "text_word_pmi_topk", "sketch_cms_error_sweep", "sketch_kmv_error_sweep",
    "sketch_theta_difference", "sketch_intersection_method_report", "graph_edge_reciprocity",
    "graph_degree_assortativity", "graph_clustering_coefficient", "graph_distance_profile",
    "graph_personalized_pagerank", "graph_markov_stationary", "dedup_transitivity_report",
    "dedup_simhash_bit_balance", "embedding_quantize_recall", "embedding_hubness_profile",
    "ann_nprobe_recall_sweep", "embedding_norm_outliers", "dedup_roi_curve",
    "dedup_cross_source_matrix", "text_term_burstiness", "text_keyness_report",
    "text_mattr_diversity", "quality_filter_bias_audit", "packing_efficiency_report",
    "corpus_decontaminate_fuzzy", "corpus_upsample_plan", "sketch_bloom_error_sweep",
    "corpus_dup_rate_growth", "corpus_modality_coverage", "events_conversion_latency",
    "events_activity_streaks", "events_streak_hazard", "events_did_error_impact",
    # rule 3: no refill slots this round — 2 + 48 = 50.
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
