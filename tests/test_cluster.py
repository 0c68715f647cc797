"""Connected-components clustering and stratified sampling: convergence on
multi-hop graphs, canonical-survivor semantics, and scan-only sampling plans
(oracle parity itself is covered by the test_oracle_parity sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.plans.inspect import formatted_plan
from cdc_postgresql_clickhouse_spark.queries.cluster import (
    QUERIES,
    connected_components,
    corpus_stratified_sample,
)


def test_cc_chain_converges_past_diameter_one(spark):
    # 0-1-2-3-4 chain plus disjoint 10-11: min label must propagate 4 hops
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        (r.doc_id, r.label) for r in connected_components(edges).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (10, 10), (11, 10)}


def test_cc_label_is_min_reachable_not_min_neighbor(spark):
    # 5-3, 3-9: node 9 never touches 3's best neighbor directly
    edges = spark.createDataFrame([(3, 5), (3, 9), (1, 5)], "doc_a long, doc_b long")
    got = dict((r.doc_id, r.label) for r in connected_components(edges).collect())
    assert got == {1: 1, 3: 1, 5: 1, 9: 1}


def test_cluster_canonical_invariants(spark, sf_dir):
    out = QUERIES["dedup_cluster_canonical"](spark, sf_dir)
    rows = out.collect()
    assert rows, "fixture guarantees near-dup pairs exist"
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.canonical_id, []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m.doc_id for m in members)
        assert cid == ids[0], "canonical must be the min doc_id of its cluster"
        assert all(m.cluster_size == len(members) for m in members)
        assert sum(m.is_canonical for m in members) == 1
        assert len(ids) >= 2, "every emitted cluster has at least one edge"


def test_stratified_sample_deterministic_and_scan_only(spark, sf_dir):
    a = corpus_stratified_sample(spark, sf_dir)
    b = corpus_stratified_sample(spark, sf_dir).repartition(7)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # map-side filter only: no aggregation/join exchange in the plan (AQE
    # header aside, the filter must sit directly on the scan)
    plan = formatted_plan(a)
    assert "Exchange" not in plan, plan


def test_stratified_sample_respects_rates(spark, sf_dir):
    # en is thresholded at 50% of the 16-bit space: the kept fraction must be
    # well under 100% and the sample key bound must hold exactly
    out = corpus_stratified_sample(spark, sf_dir)
    en = out.filter(F.col("lang") == "en")
    assert en.filter(F.col("sample_key") >= 32768).count() == 0
    full = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_en_all = full.filter(F.col("lang") == "en").count()
    n_en_kept = en.count()
    assert 0 < n_en_kept < n_en_all


def _labels(df):
    return {(r.doc_id, r.label) for r in df.collect()}


def _uf_labels(edges):
    # reference union-find, pure Python
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {(n, find(n)) for n in parent}


def test_twostar_matches_label_prop_on_topologies(spark):
    from cdc_postgresql_clickhouse_spark.queries.cluster import (
        connected_components_twostar,
    )

    cases = [
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)],          # chain + pair
        [(0, 1), (1, 2), (2, 0)],                             # cycle
        [(5, 1), (5, 2), (5, 3), (5, 4)],                     # star, center not min
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],     # K4
        [(7, 3), (3, 7), (7, 3)],                             # dup + reversed dups
        [(2, 9), (9, 4), (4, 11), (11, 6), (6, 13)],          # long zigzag chain
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = _labels(connected_components_twostar(df))
        assert got == _uf_labels(edges), edges


def test_twostar_matches_union_find_on_random_graphs(spark):
    import random

    from cdc_postgresql_clickhouse_spark.queries.cluster import (
        connected_components,
        connected_components_twostar,
    )

    for seed in range(4):
        rng = random.Random(seed)
        n = 24
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(18)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        want = _uf_labels(edges)
        assert _labels(connected_components_twostar(df)) == want, (seed, edges)
        assert _labels(connected_components(df)) == want, (seed, edges)


def test_cc_long_chain_autofallback_to_twostar(spark):
    """A diameter-30 path graph exceeds label propagation's default round
    budget (MAX_CC_ITERS=20); connected_components must switch to the
    two-star variant and return correct labels instead of raising."""
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = _labels(connected_components(df))
    assert got == _uf_labels(edges)


def test_clusters_shared_materialization(spark, sf_dir, monkeypatch):
    """dedup_cluster_canonical and dedup_cluster_size_hist read ONE shared
    connected-components run (cluster.clusters memo); resetting the cache
    restores cold-start behavior."""
    from cdc_postgresql_clickhouse_spark.queries import cluster as cl
    from cdc_postgresql_clickhouse_spark.queries.extras import dedup_cluster_size_hist

    calls = {"n": 0}
    real_cc = cl.connected_components

    def counting_cc(*args, **kwargs):
        calls["n"] += 1
        return real_cc(*args, **kwargs)

    monkeypatch.setattr(cl, "connected_components", counting_cc)
    cl.reset_clusters_cache()
    canon = cl.dedup_cluster_canonical(spark, sf_dir)
    n_canon = canon.count()
    hist = dedup_cluster_size_hist(spark, sf_dir)
    hist_rows = hist.collect()
    assert calls["n"] == 1, "second consumer must reuse the materialized components"
    # histogram is consistent with the canonical view it derives from
    assert sum(r.cluster_size * r.n_clusters for r in hist_rows) == n_canon
    cl.reset_clusters_cache()
    dedup_cluster_size_hist(spark, sf_dir).count()
    assert calls["n"] == 2, "reset must restore cold-start (fresh CC run)"
    cl.reset_clusters_cache()
