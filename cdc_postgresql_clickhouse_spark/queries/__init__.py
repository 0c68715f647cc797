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

# Registration order is load-bearing: the driver's correctness gate runs the
# FIRST 50 registered queries only. ROTATION POLICY (see COVERAGE.md):
# queries that have never had a driver row ALWAYS register before queries
# that have — new additions go directly after cdc; once everything has a
# green row somewhere, never-reds rotate by recency (oldest proof first).
# Round-4 window: cdc (7, core reference semantics, always first) →
# streaming_queries (6: 4 never-checked from early r4 + 2 new e2e rows) →
# winnow/chunking/semantic/text_ext/extras (12, round-3 additions + the new
# text_html_strip) → spans/manifest/sketches/zorder/bpe (10, NEW round 4) →
# dedup/similarity (incl. new ann_pq_topk) / cluster / multimodal (incl. new
# audio frames) / text refill to exactly 50. Everything after is green in
# r2/r3 and re-verified locally by scripts/parity_sweep.py each round.
_MODULES = (
    cdc, streaming_queries, winnow, chunking, semantic, text_ext, extras,
    spans, manifest, sketches, zorder, bpe, graph, search,  # NEW round 4, before refill
    dedup, similarity, cluster, multimodal, text, quality, training, corpus,
    skew, debezium_types, funnel, events, tpch, tpch_ext, tpch_more,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
