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
    # rotating CDC row (r13 rotation: cdc_state_asof — at r7 the oldest cdc
    # driver proof, so the insurance slot doubles as the cdc family's
    # staleness re-check; cdc_pk_change_state rotated out after its r12
    # green).
    "cdc_current_state", "cdc_state_asof",
    # rule 2: the never-driver-checked queue — the 4 round-13 additions:
    # SemDeDup over the corpus-trained Lloyd quantizer (unrolled-iteration
    # oracle), the incremental-SemDeDup ≡ batch equivalence row, the
    # cluster cohesion profile (memo consumer), and the quantizer-size
    # sensitivity sweep. All parity-verified locally at sf0.01 on
    # registration.
    "semantic_dedup_semdedup_kmeans", "streaming_semdedup_equiv",
    "semantic_dedup_cluster_profile", "semantic_dedup_k_sensitivity",
    # rule 3 (staleness): the remaining 46 slots fill with already-green
    # rows whose latest driver proof is OLDEST — first the full 12-row
    # r2-latest cohort (the tail of the r2 era; after this round no row's
    # proof predates r3), then the head of the 43-row r3-latest cohort,
    # registration order within a round. The 9 r3 rows left behind
    # (skew_salted_revenue_by_status .. events_purchase_attribution) front the
    # r14 window. tests/test_window_policy.py pins the rule and the
    # steady-state proof-age bound.
    "percentile_prices_by_status", "monthly_revenue_rollup",
    "full_outer_activity", "q2_min_cost_supplier",
    "q11_important_parts", "q12_priority_shipping",
    "q20_bolt_suppliers", "q7_nation_volume",
    "q8_market_share", "q9_product_profit",
    "q16_supplier_part_counts", "q21_waiting_supplier",
    "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_ngram_jaccard",
    "ann_bruteforce_topk", "ann_lsh_buckets",
    "ann_lsh_buckets_sized", "ann_ivf_topk",
    "embedding_cosine_neardup", "dedup_cluster_canonical",
    "corpus_stratified_sample", "multimodal_frame_sample",
    "multimodal_decode_stats", "multimodal_resize_stats",
    "text_token_count", "text_quality_score",
    "text_langid", "text_fingerprint",
    "text_stats_by_source", "multimodal_binary_meta",
    "text_repetition_ngram", "corpus_tfidf_top_terms",
    "text_unigram_logprob", "quality_gopher_rules",
    "text_regex_policy_scan", "corpus_decontaminate",
    "corpus_train_val_split", "corpus_shard_packing",
    "embedding_quantize_int8", "crossmodal_doc_neighbors",
    "corpus_mix_stats", "corpus_dup_rate_by_source",
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
