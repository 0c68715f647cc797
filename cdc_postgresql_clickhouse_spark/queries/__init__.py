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
    # rule 1: cdc insurance, capped at 2 while the never-checked queue is
    # non-empty (VERDICT r8 #1): the flagship current-state read plus one
    # rotating CDC row (r11 rotation: cdc_idempotent_replay, the S10
    # at-least-once core, green r8 — cdc_envelope_transform rotated out
    # after its r10 green).
    "cdc_current_state", "cdc_idempotent_replay",
    # rule 2: the full never-driver-checked queue — all 43 session-2
    # additions that registered after the r10 gate ran (VERDICT r10 #1).
    # 2 + 43 = 45 ≤ 50, so the queue drains completely this round and the
    # registry reaches 100% driver-checked for the first time. Order is
    # registration (module) order.
    "cdc_bucket_skew_report", "streaming_retention_cohort_equiv",
    "streaming_cusum_equiv", "text_bigram_entropy_rate",
    "sketch_hll_error_sweep", "layout_minmax_pruning_report",
    "bpe_compression_curve", "graph_type_audience_overlap",
    "retrieval_query_likelihood_eval", "retrieval_hard_negatives_mine",
    "retrieval_pr_curve", "corpus_dsir_mix_shift",
    "similarity_mmr_rerank", "embedding_knn_margin_profile",
    "embedding_intrinsic_dimension", "embedding_isotropy_report",
    "multimodal_aspect_ratio_buckets", "multimodal_phash_hamming_sweep",
    "text_ocr_garbage_score", "text_cross_source_crossentropy",
    "quality_ccnet_ppl_buckets", "quality_filter_cascade_report",
    "quality_lang_bias_auc", "quality_langid_fleiss_kappa",
    "quality_length_psi", "corpus_epoch_shuffle_audit",
    "events_retention_cohort_matrix", "events_peak_concurrent_sessions",
    "events_daily_anomaly_mad", "events_attribution_position_weighted",
    "events_retention_halflife", "suppliers_speed_ranking",
    "orders_revenue_drawdown", "orders_littles_law_audit",
    "orders_revenue_pvm_bridge", "reco_brand_cooccurrence_topk",
    "orders_duplicate_invoice_detection", "orders_ltv_cohort_matrix",
    "orders_fulfillment_lag_percentiles", "orders_supplier_hhi",
    "orders_skyline_pareto", "asof_tolerance_latest_order",
    "asof_nearest_order",
    # rule 2 (cont.): 5 of the 12 new r11 registrations — with 55 rows now
    # never-checked the window takes 48 and no green refill may occupy a
    # slot. The remaining 7 r11 additions (tokenizer_oov_curve,
    # events_cuped_adjustment, events_hill_tail_index,
    # events_stratified_uplift, graph_rich_club_coefficient,
    # layout_partition_size_advisor, streaming_srm_equiv) queue behind the
    # window and front in r12; all 12 are parity-verified locally at
    # sf0.01 (scripts/parity_sweep.py).
    "text_lexical_richness", "events_srm_check",
    "quality_score_calibration_ece", "sketch_bottomk_jaccard_sweep",
    "multimodal_bytes_dedup_report",
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
