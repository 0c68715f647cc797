"""Plan-shape ceilings for every registered query whose r8 bench line
exceeded 2 s at sf0.1 (VERDICT r8 #6): the host is too noisy for timing
regressions to surface reliably, so the cheapest durable insurance is
pinning the physical-plan shape — shuffle count, nested-loop count, and a
no-cartesian invariant. A plan regression (a broadcast silently becoming a
shuffle join, a new unkeyed join, an extra shuffle from a lost
partitioning) fails here even when the rows still match the oracle.

Ceilings are the measured values at the time of pinning (sf0.001 — the
formatted plan is pre-AQE, so the shape is scale-independent for these
fixtures). BroadcastNestedLoopJoin allowances are the audited bounded
cross-scores: centroid/codebook grids (ann_*), the one-row count/threshold
broadcasts (quality/retrieval/sketch rows) — each join's streamed side is
model-sized, never the corpus.
"""

from __future__ import annotations

import pytest

from cdc_postgresql_clickhouse_spark.plans.inspect import (
    formatted_plan,
    shuffle_count,
)

# (query, max_shuffles, max_bnlj) — measured r9; see module docstring.
_PINS = [
    ("corpus_decontaminate_fuzzy", 3, 0),
    ("events_bootstrap_mean_ci", 3, 0),
    ("ann_recall_report", 10, 5),
    ("quality_langid_confusion", 1, 0),
    ("dedup_jaccard_prefix_filter", 10, 0),
    ("cdc_schema_evolution_state", 1, 0),
    ("cdc_dlq_report", 2, 0),
    ("sketch_bloom_error_sweep", 21, 6),
    ("ann_ivfpq_topk", 3, 2),
    ("quality_langid_kappa", 7, 1),
    ("retrieval_known_item_eval", 7, 0),
    ("embedding_pca_topcomponent", 0, 0),
    ("graph_modularity_report", 9, 0),
    ("graph_hits_types", 2, 0),
    ("retrieval_hybrid_rrf", 7, 1),
    ("embedding_pca_residual", 1, 0),
    ("corpus_decontaminate_bloom", 5, 0),
    ("retrieval_ndcg_eval", 7, 0),
    # r7->r8 watch item (VERDICT r8 #4): byte-identical code, noise-stepped
    # timing — pin the shape so a REAL plan regression can't hide in the
    # noise (rounds are checkpoint-materialized: the final plan is scan-only)
    ("graph_label_propagation", 0, 0),
    # r9 additions whose bench line exceeds 2 s: the agreement row composes
    # three audited dedup pipelines over ONE shared tokenized base, with all
    # three pairwise-agreement arms computed in a single agg pass (r10,
    # VERDICT r9 #4 — was 26 shuffles when each arm re-ran the union of the
    # three pipelines); the recommender is the bounded cooc self-join +
    # slice scoring
    ("dedup_method_agreement", 12, 0),
    ("reco_brand_cooccurrence_topk", 9, 0),
    # two metric pipelines + two two-phase ranks over the persisted join
    ("quality_spearman_quality_logprob", 23, 0),
    # r10 additions near/above 2 s: the isotropy report's BNLJ is the
    # one-row covagg x x2 scalar join; the QL eval computes BOTH scorers'
    # partials from ONE matched pass (was 21 shuffles as two join trees),
    # its BNLJs are the one-row report-arm cross joins
    ("embedding_isotropy_report", 3, 1),
    ("retrieval_query_likelihood_eval", 15, 2),
    # remaining >2s r10 bench lines (measured standalone, cold cache — the
    # condition this test runs under); burrows-delta's BNLJs are the
    # bounded (source x top-30-word) grid builds. The APSP profile's
    # rounds are now localCheckpoint-materialized (were an uncut
    # double-per-round tree: 292 Exchanges, 2.79 s -> 1.35 s), so the
    # final plan is scan-only, the LPA contract
    ("graph_distance_profile", 1, 0),
    ("text_burrows_delta", 26, 8),
    ("quality_dedup_interaction", 4, 0),
    ("quality_ccnet_ppl_buckets", 13, 0),
    ("dedup_cross_source_matrix", 12, 1),
    # triplet miner: the audited BM25 plan + per-query <= k-row self-join
    ("retrieval_hard_negatives_mine", 8, 0),
    # DSIR pipeline + two-phase rank + two bounded mix rollups
    ("corpus_dsir_mix_shift", 12, 0),
    # four audited per-doc signal pipelines joined once on doc_id
    ("quality_filter_cascade_report", 18, 0),
    # lines that crossed 2 s only in the noisiest sealing window — pinned
    # anyway so a real plan regression can't hide there either; MMR's
    # selection rounds fold into per-row array expressions since r14 (one
    # distributed pass, no checkpoints), so the full plan is visible: 4
    # shuffles (pool window, two grouped-state aggs, state join) and the
    # one BNLJ is the broadcast query-slice × corpus non-equi cross-score
    # the old shape also ran (hidden below its checkpoint). The nprobe
    # sweep's BNLJs are the bounded centroid-grid cross-scores
    ("similarity_mmr_rerank", 5, 1),
    ("corpus_dup_rate_growth", 5, 0),
    ("embedding_semantic_cluster", 1, 0),
    ("ann_nprobe_recall_sweep", 14, 7),
    # round-10 session-2 additions above 2 s: the PR curve is the audited
    # known-item BM25 plan (same 7-shuffle shape as retrieval_known_item_eval)
    # plus a literal k-grid fold; Fleiss composes the two langid passes —
    # its BNLJ is the one-row s_tot x c2_tot scalar cross join
    ("retrieval_pr_curve", 7, 0),
    ("quality_langid_fleiss_kappa", 5, 1),
    # PSI crossed 2 s only in the noisiest window (0.97 s standalone);
    # pinned anyway. The CE matrix's BNLJ is the broadcast |sources|-row
    # train-side cross join
    ("quality_length_psi", 5, 1),
    ("text_cross_source_crossentropy", 4, 1),
    # round-11 additions above 2 s at sf0.1: the bottom-k Jaccard sweep's
    # shingle base is built once above a partition-pinned RDD scan (the
    # serial-pushed-filter trap cost 36.6 s before the pin) and the final
    # plan is the fan/member/window chain off that scan; its BNLJ is the
    # one-row n_src broadcast cross
    ("sketch_bottomk_jaccard_sweep", 7, 1),
    # round-12: tfidf-cosine crossed 2 s in the r12 seal (noise-scale move
    # on unchanged code — standalone re-measure read the same shape);
    # pinned per the all->2s-lines-pinned invariant. Its BNLJ is the
    # one-row norm broadcast.
    ("dedup_tfidf_cosine", 10, 1),
    # round-13: the Lloyd-quantizer SemDeDup materializes its K-row report
    # (checkpoint fence — the Lloyd rounds and the pair search run eagerly
    # inside the query, the LPA/MMR contract), so the final plan is
    # scan-only
    ("semantic_dedup_semdedup_kmeans", 0, 0),
    # the K-sensitivity sweep is likewise checkpoint-materialized (scored
    # pass, per-K argmaxes, prefiltered pair search all run eagerly)
    ("semantic_dedup_k_sensitivity", 0, 0),
]


@pytest.mark.parametrize("name,max_shuffles,max_bnlj", _PINS)
def test_slow_query_plan_shape(spark, sf_dir, name, max_shuffles, max_bnlj):
    from cdc_postgresql_clickhouse_spark.queries import all_queries

    spark.catalog.clearCache()
    df = all_queries()[name](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    bnlj = plan.count(") BroadcastNestedLoopJoin")
    assert bnlj <= max_bnlj, (
        f"{name}: {bnlj} BroadcastNestedLoopJoin nodes (pinned max "
        f"{max_bnlj})\n{plan[:2000]}"
    )
    shuffles = shuffle_count(df)
    assert shuffles <= max_shuffles, (
        f"{name}: {shuffles} shuffles (pinned max {max_shuffles})\n"
        f"{plan[:2000]}"
    )
