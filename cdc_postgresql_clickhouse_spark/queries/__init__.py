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
    # rotating CDC row (r10 rotation: cdc_envelope_transform, the P1-P7
    # projection/switch core, green r8).
    "cdc_current_state", "cdc_envelope_transform",
    # rule 2b: the four r9 err rows (DuckDB-oracle OOM in the driver's
    # uncapped harness — Spark produced rows for all four). Their oracles
    # are now MATERIALIZED-fenced with the seed fan-out collapsed to one
    # grouped pass (tests/test_oracle_memory_lint.py pins the shape and a
    # 512MB no-spill ceiling); they re-front until a green row lands.
    "dedup_roi_curve", "dedup_cross_source_matrix",
    "corpus_decontaminate_fuzzy", "sketch_bloom_error_sweep",
    # rule 2: never driver-checked — 50 rows queued after r9; the window
    # takes the first 44 in registration (module) order. The remaining 6
    # (suppliers_speed_ranking, orders_revenue_drawdown,
    # orders_littles_law_audit, orders_revenue_pvm_bridge,
    # reco_brand_cooccurrence_topk, orders_duplicate_invoice_detection)
    # follow behind the window and front in r11 — the window-policy test
    # enforces that rotation once CORRECTNESS_r10 lands. Every registered
    # row is re-verified locally by scripts/parity_sweep.py regardless.
    "cdc_compaction_debt_report", "streaming_compaction_debt_equiv",
    "tokenizer_fertility_by_source", "dedup_method_agreement",
    "ann_radius_search_report", "embedding_kcenter_coreset",
    "quality_dedup_bias_audit", "quality_spearman_quality_logprob",
    "corpus_decontaminate_ngram_sweep", "corpus_token_budget_waterfill",
    "corpus_curriculum_schedule", "events_fano_timescales",
    "events_value_drift_tv", "events_synchrony_minutes",
    "events_self_transition_rate", "events_error_mtbf",
    "events_newcomer_load", "events_hour_of_week_profile",
    "events_seasonal_strength", "events_trend_break",
    "events_ohlc_bars", "events_attribution_last_touch",
    "events_km_conversion_survival", "events_bootstrap_mean_ci",
    "events_ab_power_mde", "events_attribution_first_touch",
    "events_user_concentration", "events_heavy_hitter_turnover",
    "pivot_unpivot_roundtrip", "validation_fk_orphans_report",
    "orders_revenue_wow", "parts_brand_share_shift",
    "customer_tier_migration", "orders_rapid_repeat_orders",
    "orders_return_rate_by_age", "parts_single_source_risk",
    "orders_sla_attainment", "orders_dow_uniformity",
    "lineitem_discount_quantity_corr", "customers_balance_profile",
    "parts_type_class_revenue", "trade_flow_matrix",
    "orders_open_aging", "orders_size_value_curve",
    # rule 3: no refill slots this round — 2 + 4 + 44 = 50.
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
