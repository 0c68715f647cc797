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
    cdc,
    chunking,
    cluster,
    corpus,
    debezium_types,
    dedup,
    events,
    extras,
    funnel,
    multimodal,
    quality,
    semantic,
    similarity,
    skew,
    text,
    text_ext,
    tpch,
    tpch_ext,
    tpch_more,
    training,
    winnow,
)

# Registration order is load-bearing: the driver's correctness gate runs the
# FIRST 50 registered queries only. CDC stays first (7 rows, cheap insurance
# on the core reference semantics); the extension families that had no driver
# rows in rounds 1-2 (dedup/similarity/cluster/multimodal/text/quality/
# training/corpus/skew/debezium_types/funnel + late events queries) fill the
# rest of the window; TPC-H (39 queries, twice-proven green) registers last
# and is covered by scripts/parity_sweep.py locally.
_MODULES = (
    cdc, dedup, similarity, cluster, multimodal, text, quality, training,
    corpus, skew, debezium_types, funnel, events, winnow, chunking, semantic,
    text_ext, extras, tpch, tpch_ext, tpch_more,
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
