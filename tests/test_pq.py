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


# --- IVF+PQ composition -----------------------------------------------------


def test_ivfpq_topk_contract(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        IVFPQ_TOPK,
        ann_ivfpq_topk,
    )

    out = ann_ivfpq_topk(spark, sf_dir).cache()
    per_q = out.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("maxr"), F.min("rank").alias("minr")
    )
    bad = per_q.filter(
        (F.col("n") != IVFPQ_TOPK) | (F.col("maxr") != IVFPQ_TOPK) | (F.col("minr") != 1)
    ).count()
    assert bad == 0
    assert out.filter(F.col("q_id") == F.col("neighbor_id")).count() == 0
    assert out.filter(F.abs(F.col("approx_cos")) > 1.0).count() == 0


def test_ivfpq_candidates_come_only_from_probed_lists(spark, sf_dir):
    """The IVF structure must survive the PQ overlay: every reported
    neighbor's assigned centroid is one of its query's n_probe probes."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        N_CENTROIDS,
        _emb_d,
        _norm,
        ann_ivfpq_topk,
        ivf_assign,
    )
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_d().alias("e"), _norm(_emb_d()).alias("nrm")
    )
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )
    assign = {r.vec_id: r.cid for r in ivf_assign(emb, cents).collect()}
    out = ann_ivfpq_topk(spark, sf_dir).collect()
    probed: dict[int, set[int]] = {}
    for r in out:
        probed.setdefault(r.q_id, set()).add(assign[r.neighbor_id])
    # n_probe = 2: every query's neighbors span at most 2 distinct lists
    assert all(len(cids) <= 2 for cids in probed.values())


def test_ivfpq_recall_floor_vs_bruteforce(spark, sf_dir):
    """Residual PQ inside probed lists: candidates are ~n_probe/n_centroids
    of the corpus, but true neighbors concentrate in the probed lists and
    the residual codebook quantizes tighter than raw-vector PQ — the floor
    guards against a broken encode/probe (random overlap ~ 0.005)."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import ann_ivfpq_topk

    bf = {(r.q_id, r.neighbor_id) for r in ann_bruteforce_topk(spark, sf_dir).collect()}
    ivfpq = {(r.q_id, r.neighbor_id) for r in ann_ivfpq_topk(spark, sf_dir).collect()}
    recall = len(bf & ivfpq) / len(bf)
    assert recall >= 0.08, recall


def test_ann_recall_report_contract(spark, sf_dir):
    """One row per method; n_pairs = topk x n_queries on both sides, recall
    in [0, 1e6] PPM, and the exhaustive-candidate method (pq scores every
    corpus vector) dominates the list-restricted composition (ivfpq prunes
    candidates AND quantizes)."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import ann_recall_report

    rows = {r.method: r for r in ann_recall_report(spark, sf_dir).collect()}
    assert set(rows) == {"ivf", "pq", "ivfpq"}
    for r in rows.values():
        assert r.n_pairs == 5 * r.n_queries
        assert 0 <= r.n_hits <= r.n_pairs
        assert 0 <= r.recall_ppm <= 1_000_000
    assert rows["pq"].recall_ppm >= rows["ivfpq"].recall_ppm
