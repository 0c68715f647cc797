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
    # rotating CDC row (r12 rotation: cdc_pk_change_state — at r7 the
    # oldest cdc driver proof, so the insurance slot doubles as the cdc
    # family's staleness re-check; cdc_idempotent_replay rotated out after
    # its r11 green).
    "cdc_current_state", "cdc_pk_change_state",
    # rule 2: the never-driver-checked queue — the 9 round-11 additions
    # that registered after the r11 gate ran (VERDICT r11 #1), all 9
    # judge-verified green locally at sf0.01. Registration (module) order.
    "cdc_schema_compat_report", "streaming_srm_equiv",
    "layout_partition_size_advisor", "tokenizer_oov_curve",
    "graph_rich_club_coefficient", "multimodal_silence_segments",
    "events_cuped_adjustment", "events_hill_tail_index",
    "events_stratified_uplift",
    # rule 2 (cont.): the 8 round-12 additions, never-checked on arrival —
    # SemDeDup cluster-scoped semantic dedup + its tau sweep, URL
    # canonicalization dedup, the incremental-PQ ≡ batch equivalence row,
    # the PQ distortion ledger, the sequential-peeking A/B report, and
    # Krippendorff alpha over the three langid raters, and the SemDeDup
    # per-label removal-bias audit
    "semantic_dedup_semdedup", "semantic_dedup_tau_sweep",
    "dedup_url_canonical", "streaming_pq_ingest_equiv",
    "embedding_pq_distortion_report", "events_ab_sequential_peeks",
    "quality_langid_krippendorff_alpha", "semantic_dedup_label_bias",
    # rule 3 (staleness, formalized r12 per VERDICT r11 #2): with the
    # never-checked queue down to 9, the window has surplus for the first
    # time — the remaining slots fill with already-green rows whose latest
    # driver proof is OLDEST, oldest round first, registration order within
    # a round. The 31 slots below are the head of the 43-row r2-latest
    # cohort (the engine under them has been refactored for nine rounds;
    # their last driver green predates fences, shared bases and session
    # defaults). tests/test_window_policy.py::test_rule3_slots_fill_oldest_first
    # pins the rule.
    "events_tumbling_5min", "events_sliding_10min",
    "events_sessionize", "events_json_extract",
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_region_revenue", "topk_orders",
    "agg_distinct_counts", "window_running_total",
    "rollup_status_priority", "customers_without_orders",
    "set_intersect_building_buyers", "set_except_nonbuilding_buyers",
    "asof_latest_order", "asof_prev_purchase",
    "q4_order_priority", "rolling_30day_spend",
    "customer_spend_deciles", "collect_priority_fingerprint",
    "q6_forecast_revenue", "q10_returned_revenue",
    "q13_order_count_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q17_small_quantity_revenue",
    "q18_large_orders", "q19_disjunctive_predicates",
    "q22_idle_customers", "cube_returnflag_status",
    "pivot_priority_by_status",
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
