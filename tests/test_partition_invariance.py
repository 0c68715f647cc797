"""Partition-invariance: every operator's result must be a pure function of
the DATA, not of the parallelism — the distributed-correctness claim behind
all the integer-unit/truncate-once devices, exercised directly by running
each query under two different shuffle-partition settings (and once with the
input pre-repartitioned) and comparing exact row sets.

The set below covers the round-4 additions plus the core CDC state view;
older operators carry the same claim through their oracle rows (the DuckDB
twin is single-threaded, so a partition-order dependence would already have
failed the value-hash at some parallelism)."""

from __future__ import annotations

import pytest

from cdc_postgresql_clickhouse_spark.queries import all_queries

Q = all_queries()

CHECK = [
    "cdc_current_state",
    "cdc_reconciliation_report",
    "sketch_hll_distinct",
    "sketch_cms_heavy_hitters",
    "sketch_kmv_union",
    "corpus_dsir_weights",
    "text_ccnet_buckets",
    "retrieval_hybrid_rrf",
    "graph_sssp_types",
    "graph_triangle_types",
    "dedup_soft_weights",
    "multimodal_phash_neardup",
    # round-6 additions that lean hardest on order-independent integer
    # devices (trunc-div power iteration, integer-log2 Viterbi model,
    # rank-arithmetic fences, first-admitting-checkpoint mapping)
    "embedding_pca_topcomponent",
    "tokenizer_unigram_segment",
    "events_winsorized_stats",
    "corpus_vocab_growth",
    "layout_hilbert_clustering",
    # round-12 additions leaning on order-independent devices (window
    # argmax + distinct loser set, grid folds over a persisted pair base,
    # countDistinct canonicals, per-vector floors before integer sums,
    # cumulative moment folds, the re-derived bootstrap draws and the
    # exact-microsecond CUPED midpoint)
    "semantic_dedup_semdedup",
    "semantic_dedup_tau_sweep",
    "dedup_url_canonical",
    "embedding_pq_distortion_report",
    "events_ab_sequential_peeks",
    "quality_langid_krippendorff_alpha",
    "events_bootstrap_mean_ci",
    "events_cuped_adjustment",
    # round-13 additions: unrolled-Lloyd model collect + keyed pair search,
    # percentile-over-ints profile, per-K argmax grid with the partial-
    # distance prefilter
    "semantic_dedup_semdedup_kmeans",
    "semantic_dedup_cluster_profile",
    "semantic_dedup_k_sensitivity",
]


def _key(t):
    # None-safe total order: nullable report columns (e.g. the tier-migration
    # churn/acquisition margins) would make tuple comparison raise
    return tuple((v is None, v) for v in t)


def _rows(spark, name, sf_dir):
    df = Q[name](spark, sf_dir)
    return sorted((tuple(r) for r in df.collect()), key=_key)


@pytest.mark.parametrize("name", CHECK)
def test_result_is_parallelism_invariant(spark, sf_dir, name):
    from cdc_postgresql_clickhouse_spark.queries.cluster import reset_clusters_cache
    from cdc_postgresql_clickhouse_spark.queries.search import reset_kie_cache
    from cdc_postgresql_clickhouse_spark.queries.similarity import reset_semdedup_cache
    from cdc_postgresql_clickhouse_spark.queries.text_ext import reset_langid_cache

    def reset_all():
        # every shared memo must rebuild UNDER the new parallelism, or the
        # second run would just reread blocks materialized by the first
        reset_clusters_cache()
        reset_langid_cache()
        reset_kie_cache()
        reset_semdedup_cache()

    conf = spark.conf
    orig = conf.get("spark.sql.shuffle.partitions")
    try:
        conf.set("spark.sql.shuffle.partitions", "3")
        reset_all()
        a = _rows(spark, name, sf_dir)
        conf.set("spark.sql.shuffle.partitions", "17")
        reset_all()
        b = _rows(spark, name, sf_dir)
    finally:
        conf.set("spark.sql.shuffle.partitions", orig)
        reset_all()
    assert a == b, f"{name}: result depends on shuffle partitioning"


# Pending-layer operators with the strongest order-sensitivity exposure:
# the two new ordered folds, the double-exponential fold, the fuzzy
# equi-join, the SymSpell dedup of variants, and the drift/profile sums.
_PENDING_CHECK = [
    "events_holt_linear",
    "events_sessionize_capped",
    "customer_rfm_segments",
    "linkage_fuzzy_part_names",
    "profile_orders_columns",
    "embedding_centroid_drift",
    "sketch_cms_join_size",
    "graph_hits_types",
    # fourth-session additions that lean hardest on ordered devices:
    # pairwise-slope median, ranking-window medians/p90s, ntile tiering,
    # argmax change-point, TF-IDF cos² over float-ln weights, RANGE frames
    "orders_theilsen_trend",
    "orders_seasonal_index",
    "events_conversion_latency",
    "customer_tier_migration",
    "events_changepoint_argmax",
    "dedup_tfidf_cosine",
    "events_range_frame_peak",
    "skew_join_key_report",
    # part-3 additions: dense_rank islands, pooled-ntile drift buckets,
    # settled-tombstone arg-max, marginal-product kappa
    "events_activity_streaks",
    "events_value_drift_tv",
    "events_fano_timescales",
    "cdc_key_churn",
    "quality_langid_kappa",
    # round-7 additions leaning on ordered devices: OHLC arg-min/arg-max
    # order keys, the theta membership joins, the bipartite LSH verify,
    # and the Hampel gate's rank windows
    "events_ohlc_bars",
    "sketch_theta_difference",
    "corpus_decontaminate_fuzzy",
    "embedding_norm_outliers",
    "sketch_intersection_method_report",
    "dedup_cross_source_matrix",
    # later round-7 additions: PPR's iterated keyed aggs, the KM ordered
    # fold, the Little's-law clipped-overlap sums, KN's joined model tables
    "graph_personalized_pagerank",
    "events_km_conversion_survival",
    "orders_littles_law_audit",
    "corpus_bigram_kn_ppl",
]


def _pending_queries():
    # registration waves flip names from the pending layer into the driver
    # contract without moving code; the invariance pin follows the operator
    # wherever it is registered
    from cdc_postgresql_clickhouse_spark.queries import all_queries
    from tests.test_pending_parity import _pending

    out = dict(all_queries())
    out.update({k: v[0] for k, v in _pending().items()})
    return out


@pytest.mark.parametrize("name", _PENDING_CHECK)
def test_pending_result_is_parallelism_invariant(spark, sf_dir, name):
    fn = _pending_queries()[name]
    conf = spark.conf
    orig = conf.get("spark.sql.shuffle.partitions")
    try:
        conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted((tuple(r) for r in fn(spark, sf_dir).collect()), key=_key)
        conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted((tuple(r) for r in fn(spark, sf_dir).collect()), key=_key)
    finally:
        conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name}: result depends on shuffle partitioning"


# Shared-memo cross-parallelism contract (VERDICT r12 #8): a memo is a
# materialization of a pure function of the data, so blocks BUILT at
# parallelism A must read identically under parallelism B — the
# reset-mid-suite ordering the per-query sweep above never crosses
# (it always rebuilds the memo under the active setting).
_MEMO_CROSS = [
    ("clusters", "dedup_cluster_size_hist"),
    ("langid", "quality_langid_fleiss_kappa"),
    ("kie", "retrieval_ndcg_eval"),
    ("semdedup", "semantic_dedup_tau_sweep"),
]


@pytest.mark.parametrize("memo,consumer", _MEMO_CROSS)
def test_memo_built_at_other_parallelism_reads_identically(
    spark, sf_dir, memo, consumer
):
    import bench

    reset, warm = bench.SHARED_MEMOS[memo]
    conf = spark.conf
    orig = conf.get("spark.sql.shuffle.partitions")
    try:
        conf.set("spark.sql.shuffle.partitions", "3")
        reset()
        warm(spark, sf_dir)
        conf.set("spark.sql.shuffle.partitions", "17")
        a = _rows(spark, consumer, sf_dir)  # memo from A, consumer at B
        reset()
        warm(spark, sf_dir)
        b = _rows(spark, consumer, sf_dir)  # memo rebuilt at B
    finally:
        conf.set("spark.sql.shuffle.partitions", orig)
        reset()
    assert a == b, (
        f"{consumer}: result depends on the parallelism the '{memo}' memo "
        f"was materialized under"
    )
