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
    # rule 1: cdc (9 — schema-evolution row added r5, rule 2 places it here
    # with its family)
    "cdc_current_state", "cdc_soft_delete_state", "cdc_envelope_transform",
    "cdc_epoch_micros_roundtrip", "cdc_count_final", "cdc_idempotent_replay",
    "cdc_scd2_history", "cdc_reconciliation_report",
    "cdc_schema_evolution_state",
    # rule 2b: latest driver row red (r4 hash-fail; integer-exact rewrite
    # this round must re-prove under the driver) (1)
    "events_anomaly_mad",
    # rule 2: never driver-checked — round-5 additions (22)
    "sketch_quantile_bottomk", "sketch_quantile_merge",
    "dedup_minhash_containment", "graph_kcore_types", "streaming_hll_equiv",
    "streaming_quantile_equiv", "graph_label_propagation",
    "ann_ivfpq_topk", "streaming_cms_equiv", "corpus_decontaminate_bloom",
    "text_repetition_topgram", "ann_recall_report", "dedup_lsh_tuning_report",
    "events_minute_gapfill", "sketch_quantile_error_report",
    "events_minute_locf", "quality_threshold_sweep",
    "grouping_sets_order_profile", "source_jsonl_roundtrip_agg",
    "source_csv_roundtrip_agg", "streaming_topk_equiv",
    "retrieval_known_item_eval",
    # rule 2: never driver-checked — round-6 additions
    "graph_degree_profile", "events_histogram_equi", "events_winsorized_stats",
    "source_orc_roundtrip_agg", "corpus_length_pareto", "text_readability",
    "text_bigram_logprob", "corpus_vocab_growth", "events_top_paths",
    "retrieval_label_knn_eval", "quality_langid_confusion",
    "corpus_split_leakage_report", "events_rolling_median",
    "tokenizer_unigram_segment", "tokenizer_unigram_token_count",
    "layout_hilbert_clustering", "embedding_pca_topcomponent",
    "streaming_scd2_equiv",
    # rule 3: refill with the oldest proofs — last checked r2 (19 of 43;
    # pivot/rollup/sliding/fingerprint/full-outer/tumbling variants deferred
    # to r6, their machinery is covered by the cube/sessionize/asof rows
    # kept here)
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
