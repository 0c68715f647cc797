"""Hybrid RRF retrieval invariants: fusion arithmetic is exactly the
documented floor(1e6/(K+rank)) sum of the per-system contributions, ranks
stay in bounds, and both legs actually contribute candidates."""

from __future__ import annotations

from cdc_postgresql_clickhouse_spark.queries.search import (
    RRF_K,
    RRF_TOPK,
    retrieval_hybrid_rrf,
)


def _contrib(rank: int) -> int:
    return int(1000000.0 // (RRF_K + rank)) if rank > 0 else 0


def test_rrf_fusion_arithmetic_and_bounds(spark, sf_dir):
    rows = retrieval_hybrid_rrf(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.rank <= RRF_TOPK
        assert r.dense_rank >= 0 and r.sparse_rank >= 0
        assert r.dense_rank > 0 or r.sparse_rank > 0  # came from some system
        assert r.rrf_micro == _contrib(r.dense_rank) + _contrib(r.sparse_rank), r


def test_rrf_both_systems_contribute(spark, sf_dir):
    rows = retrieval_hybrid_rrf(spark, sf_dir).collect()
    assert any(r.dense_rank > 0 for r in rows)
    assert any(r.sparse_rank > 0 for r in rows)


def test_rrf_double_top_candidate_wins(spark, sf_dir):
    # a doc ranked 1 by BOTH systems beats any single-system candidate:
    # 2*c(1) > c(1) + c(2) strictly, so it must be fused rank 1
    by_q: dict = {}
    for r in retrieval_hybrid_rrf(spark, sf_dir).collect():
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        both_top = [r for r in rs if r.dense_rank == 1 and r.sparse_rank == 1]
        if both_top:
            assert both_top[0].rank == 1, (q, both_top)
