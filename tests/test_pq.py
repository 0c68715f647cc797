"""Product-quantization invariants: code range/shape, exact top-k contract,
recall floor vs the brute-force baseline, and Lloyd-codebook variant
runnability (operators/kmeans.py integration)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.similarity import (
    PQ_K,
    PQ_M,
    PQ_TOPK,
    _pq_codebook,
    ann_bruteforce_topk,
    ann_pq_topk,
)


def test_pq_codebook_shape(spark, sf_dir):
    cb = _pq_codebook(spark, sf_dir)
    assert len(cb) == PQ_M
    assert all(len(sub) == PQ_K for sub in cb)
    assert all(len(cw) == 64 // PQ_M for sub in cb for cw in sub)


def test_pq_topk_contract(spark, sf_dir):
    out = ann_pq_topk(spark, sf_dir).cache()
    per_q = out.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("maxr"), F.min("rank").alias("minr")
    )
    bad = per_q.filter(
        (F.col("n") != PQ_TOPK) | (F.col("maxr") != PQ_TOPK) | (F.col("minr") != 1)
    ).count()
    assert bad == 0
    # no self-matches, scores within [-1, 1]
    assert out.filter(F.col("q_id") == F.col("neighbor_id")).count() == 0
    assert out.filter(F.abs(F.col("approx_cos")) > 1.0).count() == 0


def test_pq_recall_floor_vs_bruteforce(spark, sf_dir):
    bf = {(r.q_id, r.neighbor_id) for r in ann_bruteforce_topk(spark, sf_dir).collect()}
    pq = {(r.q_id, r.neighbor_id) for r in ann_pq_topk(spark, sf_dir).collect()}
    recall = len(bf & pq) / len(bf)
    # 4 bits/subspace (128x compression) on a near-random synthetic corpus:
    # measured ~0.24 seed / ~0.20 lloyd; floor guards against a broken
    # encoder (random top-5 overlap would be ~5/n_corpus ~ 0.005)
    assert recall >= 0.08, recall


def test_pq_lloyd_codebook_variant_runs(spark, sf_dir):
    out = ann_pq_topk(spark, sf_dir, kmeans_iters=1)
    assert out.filter(F.col("rank") == 1).count() > 0
