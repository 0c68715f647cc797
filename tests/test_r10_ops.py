"""Law tests for the round-10 operators (each also oracle-paired and swept
by test_oracle_parity): HLL precision sweep, cohort retention matrix,
aspect-ratio buckets, OCR-garbage scoring, isotropy report, and the
query-likelihood retrieval eval."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_hll_sweep_consistent_with_fixed_m(spark, sf_dir):
    """The sweep's p=6 rows must agree exactly with the registered fixed-m
    HLL query (same hash, same estimator, m=64), and registers can never
    exceed m."""
    from cdc_postgresql_clickhouse_spark.queries.sketches import (
        HLL_SWEEP_PS,
        QUERIES as SK_Q,
    )

    sweep = SK_Q["sketch_hll_error_sweep"](spark, sf_dir).collect()
    assert {r["p"] for r in sweep} == set(HLL_SWEEP_PS)
    for r in sweep:
        assert r["m"] == 1 << r["p"]
        assert 1 <= r["registers_used"] <= r["m"]
        assert r["hll_estimate"] > 0
        assert r["err_ppm"] >= 0
    fixed = {
        r["event_type"]: r["hll_estimate"]
        for r in SK_Q["sketch_hll_distinct"](spark, sf_dir).collect()
    }
    for r in sweep:
        if r["p"] == 6:
            assert r["hll_estimate"] == fixed[r["event_type"]], r


def test_cohort_matrix_accounting(spark, sf_dir):
    """Offset 0 is full retention by construction; cohort sizes partition
    the user base; retention never exceeds 1e6."""
    from cdc_postgresql_clickhouse_spark.queries.events import QUERIES as EV_Q

    rows = EV_Q["events_retention_cohort_matrix"](spark, sf_dir).collect()
    assert rows
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    zero = [r for r in rows if r["week_offset"] == 0]
    assert sum(r["n_cohort"] for r in zero) == n_users
    for r in zero:
        assert r["n_active"] == r["n_cohort"] and r["retention_ppm"] == 1_000_000
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0 < r["n_active"] <= r["n_cohort"]
        assert r["retention_ppm"] <= 1_000_000


def test_aspect_ratio_buckets_partition_and_waste(spark, sf_dir):
    """Every image lands in exactly one ladder rung; shares sum to ~1e6;
    waste is a proper ppm."""
    from cdc_postgresql_clickhouse_spark.queries.multimodal import (
        AR_LADDER,
        QUERIES as MM_Q,
    )

    rows = MM_Q["multimodal_aspect_ratio_buckets"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_images"] for r in rows) == n_docs
    ladder = {(w, h) for w, h in AR_LADDER}
    assert {(r["bucket_w"], r["bucket_h"]) for r in rows} <= ladder
    share = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(AR_LADDER) <= share <= 1_000_000
    for r in rows:
        assert 0 <= r["mean_waste_ppm"] < 1_000_000


def test_ocr_garbage_rollup_bounds(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.text import QUERIES as TX_Q

    rows = TX_Q["text_ocr_garbage_score"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert 0 <= r["flag_rate_ppm"] <= 1_000_000
        assert 0 <= r["mean_score_milli"] <= r["max_score_milli"]


def test_isotropy_invariants(spark, sf_dir):
    """PR in [1, d] (Cauchy-Schwarz both ways on the eigenvalue vector);
    the mean never carries more energy than the average vector."""
    from cdc_postgresql_clickhouse_spark.queries.pca import (
        PCA_DIM,
        QUERIES as PCA_Q,
    )

    r = PCA_Q["embedding_isotropy_report"](spark, sf_dir).collect()[0]
    assert r["d"] == PCA_DIM
    assert r["trace_scaled"] > 0 and r["frob2_scaled"] > 0
    assert 1.0 <= r["participation_ratio"] <= PCA_DIM
    assert 0 <= r["mu_norm2_scaled"] <= r["mean_norm2_scaled"]
    assert 0 <= r["anisotropy_ppm"] <= 1_000_000


def test_query_likelihood_eval_bounds(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.search import (
        BM25_TOPK,
        QUERIES as SR_Q,
    )

    r = SR_Q["retrieval_query_likelihood_eval"](spark, sf_dir).collect()[0]
    nq = r["n_queries"]
    assert nq > 0
    assert 0 <= r["ql_hits_at1"] <= r["ql_hits_at_topk"] <= nq
    assert r["ql_sum_reciprocal_rank_ppm"] <= nq * 1_000_000
    assert 0 <= r["overlap_total"] <= nq * BM25_TOPK
    assert 0 <= r["mean_topk_overlap_ppm"] <= 1_000_000
    assert r["both_at1"] <= r["ql_hits_at1"]


def test_mmr_rerank_laws(spark, sf_dir):
    """Rank 1 is the pure-relevance argmax (= brute-force rank 1 under the
    same tie-break); MMR scores are non-increasing in rank (the selected
    set only grows, so every candidate's penalty only grows); picks are
    distinct per query and exactly min(K, pool)."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        MMR_K,
        QUERIES as SIM_Q,
        ann_bruteforce_topk,
    )

    rows = SIM_Q["similarity_mmr_rerank"](spark, sf_dir).collect()
    byq = {}
    for r in rows:
        byq.setdefault(r["q_id"], []).append(r)
    bf1 = {
        r["q_id"]: r["neighbor_id"]
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
        if r["rank"] == 1
    }
    assert set(byq) == set(bf1)
    for q, picks in byq.items():
        picks.sort(key=lambda r: r["mmr_rank"])
        assert len(picks) == min(MMR_K, len(picks))
        assert len({p["neighbor_id"] for p in picks}) == len(picks)
        assert picks[0]["neighbor_id"] == bf1[q]
        assert picks[0]["mmr_micro"] == 7 * picks[0]["rel_micro"]
        scores = [p["mmr_micro"] for p in picks]
        assert scores == sorted(scores, reverse=True), (q, scores)


def test_ql_eval_inlined_bm25_matches_bm25_rank(spark, sf_dir):
    """The QL eval inlines BM25 partials into its shared matched pass (one
    corpus join for two scorers); this pins the inlined scorer against the
    canonical bm25_rank row-for-row so the formulas cannot drift."""
    from cdc_postgresql_clickhouse_spark.queries.search import (
        _ql_eval_tops,
        bm25_rank,
    )

    q, postings, n_docs, _ql_top, bm_top = _ql_eval_tops(spark, sf_dir)
    canonical = bm25_rank(postings, n_docs, q=q)
    mine = {(r["query"], r["doc_id"]): (r["rank"], r["score_micro"]) for r in bm_top.collect()}
    theirs = {
        (r["query"], r["doc_id"]): (r["rank"], r["score_micro"])
        for r in canonical.collect()
    }
    assert mine == theirs


def test_ccnet_buckets_partition_and_order(spark, sf_dir):
    """Terciles partition each language's docs with sizes within 1 of each
    other, and the perplexity cutoffs are ordered head <= middle <= tail."""
    from cdc_postgresql_clickhouse_spark.queries.quality import QUERIES as QL_Q

    rows = QL_Q["quality_ccnet_ppl_buckets"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    per_lang = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, b in by_lang.items():
        assert set(b) <= {"head", "middle", "tail"}
        assert sum(r["n_docs"] for r in b.values()) == per_lang[lang]
        sizes = [r["n_docs"] for r in b.values()]
        assert max(sizes) - min(sizes) <= 1
        if "head" in b and "middle" in b:
            assert b["head"]["nlp_hi"] <= b["middle"]["nlp_lo"]
        if "middle" in b and "tail" in b:
            assert b["middle"]["nlp_hi"] <= b["tail"]["nlp_lo"]


def test_epoch_shuffle_audit_uniformity(spark, sf_dir):
    """Every (epoch, source) cell exists, per-epoch doc counts add up, and
    the md5 shuffle is actually uniform: chi2 over 9 df stays far below
    the catastrophic-clumping regime at every epoch."""
    from cdc_postgresql_clickhouse_spark.queries.corpus import (
        SHUFFLE_EPOCHS,
        QUERIES as CO_Q,
    )

    rows = CO_Q["corpus_epoch_shuffle_audit"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == SHUFFLE_EPOCHS * n_sources
    for e in range(SHUFFLE_EPOCHS):
        assert sum(r["n_docs"] for r in rows if r["epoch"] == e) == n_docs
    for r in rows:
        assert 0 <= r["chi2_milli"] < 50_000, r
        assert 0 <= r["max_dev_milli"] <= 10_000, r


def test_hard_negatives_margin_consistency(spark, sf_dir):
    """Triplets exist only for queries whose positive ranked in top-k; per
    found query there are exactly (found-slice-size - 1) negatives;
    margin sign agrees with rank order (higher-ranked negative <=> smaller
    or negative margin under the shared tie-break)."""
    from cdc_postgresql_clickhouse_spark.queries.search import (
        BM25_TOPK,
        QUERIES as SR_Q,
    )

    trips = SR_Q["retrieval_hard_negatives_mine"](spark, sf_dir).collect()
    eva = SR_Q["retrieval_known_item_eval"](spark, sf_dir).collect()[0]
    found_queries = {t["q_doc_id"] for t in trips}
    assert len(found_queries) <= eva["hits_at_topk"]
    byq = {}
    for t in trips:
        byq.setdefault(t["q_doc_id"], []).append(t)
    for qd, ts in byq.items():
        assert len(ts) <= BM25_TOPK - 1
        for t in ts:
            if t["neg_rank"] < t["pos_rank"]:
                assert t["margin_micro"] <= 0, t
            else:
                assert t["margin_micro"] >= 0, t


def test_streaming_cohort_equiv_matches_batch(spark, sf_dir):
    """The streamed activity state folds to the exact batch matrix."""
    from cdc_postgresql_clickhouse_spark.queries.events import QUERIES as EV_Q
    from cdc_postgresql_clickhouse_spark.queries.streaming_queries import (
        QUERIES as ST_Q,
    )

    key = lambda r: (r["cohort_week"], r["week_offset"])  # noqa: E731
    batch = {key(r): r for r in EV_Q["events_retention_cohort_matrix"](spark, sf_dir).collect()}
    stream = {key(r): r for r in ST_Q["streaming_retention_cohort_equiv"](spark, sf_dir).collect()}
    assert set(batch) == set(stream)
    for k in batch:
        assert batch[k]["n_active"] == stream[k]["n_active"]
        assert batch[k]["retention_ppm"] == stream[k]["retention_ppm"]


def test_ltv_cohort_accounting(spark, sf_dir):
    """Cohort sizes partition the customer base; revenue adds up to the
    orders total exactly (integer cents); cumulative is the running sum."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import QUERIES as TM_Q

    rows = TM_Q["orders_ltv_cohort_matrix"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    total_cents = o.select(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
    ).first()[0]
    zero = [r for r in rows if r["offset_q"] == 0]
    assert sum(r["n_customers"] for r in zero) == n_cust
    assert sum(r["revenue_cents"] for r in rows) == total_cents
    byc = {}
    for r in rows:
        byc.setdefault(r["cohort_q"], []).append(r)
    for c, rs in byc.items():
        rs.sort(key=lambda r: r["offset_q"])
        run = 0
        for r in rs:
            run += r["revenue_cents"]
            assert r["cum_revenue_cents"] == run, (c, r)


def test_fulfillment_lag_percentiles_order(spark, sf_dir):
    """p50 <= p90 <= p99, every percentile is an attained lag value, and
    per-priority order counts add up to the orders that shipped."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import QUERIES as TM_Q

    rows = TM_Q["orders_fulfillment_lag_percentiles"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    n_shipped = li.select("l_orderkey").distinct().count()
    assert sum(r["n_orders"] for r in rows) == n_shipped
    # the synthetic fixture draws ship and order dates independently, so
    # lags can be negative — only the ordering law holds universally
    for r in rows:
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"], r


def test_bucket_skew_invariants(spark, sf_dir):
    """Per N: keys conserved, skew >= 1000 milli (max >= mean), HHI between
    the uniform floor 1e6/N and 1e6, empties < N."""
    from cdc_postgresql_clickhouse_spark.queries.cdc import (
        BUCKET_SKEW_NS,
        QUERIES as CDC_Q,
    )

    rows = {r["n_buckets"]: r for r in CDC_Q["cdc_bucket_skew_report"](spark, sf_dir).collect()}
    assert set(rows) == set(BUCKET_SKEW_NS)
    n_keys = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    for n, r in rows.items():
        assert r["n_keys"] == n_keys
        assert r["skew_milli"] >= 1000
        assert 1_000_000 // n <= r["occ_hhi_ppm"] <= 1_000_000
        assert 0 <= r["empty_buckets"] < n


def test_supplier_hhi_bounds(spark, sf_dir):
    """HHI lies in [1e6/n_suppliers, 1e6]; revenue adds up to the lineitem
    total exactly."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import QUERIES as TM_Q

    rows = TM_Q["orders_supplier_hhi"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    total = li.select(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        )
    ).first()[0]
    assert sum(r["rev_micros"] for r in rows) == total
    for r in rows:
        assert 1_000_000 // r["n_suppliers"] <= r["hhi_ppm"] <= 1_000_000, r


def test_audience_overlap_bounds(spark, sf_dir):
    """Co-engagement never exceeds either audience; overlap >= jaccard;
    both are proper ppm."""
    from cdc_postgresql_clickhouse_spark.queries.graph import QUERIES as GR_Q

    rows = GR_Q["graph_type_audience_overlap"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["co_users"] <= min(r["aud_a"], r["aud_b"])
        assert 0 < r["jaccard_ppm"] <= r["overlap_ppm"] <= 1_000_000


def test_dsir_mix_shift_conservation(spark, sf_dir):
    """Selected counts sum to ceil(n/4); shifts are share differences; a
    cell can never select more docs than its pool."""
    from cdc_postgresql_clickhouse_spark.queries.dsir import (
        DSIR_SEL_QUARTER,
        QUERIES as DS_Q,
    )

    rows = DS_Q["corpus_dsir_mix_shift"](spark, sf_dir).collect()
    n = sum(r["n_pool"] for r in rows)
    k = (n + DSIR_SEL_QUARTER - 1) // DSIR_SEL_QUARTER
    assert sum(r["n_selected"] for r in rows) == k
    for r in rows:
        assert 0 <= r["n_selected"] <= r["n_pool"]
        assert r["shift_ppm"] == r["sel_share_ppm"] - r["pool_share_ppm"]


def test_peak_concurrency_laws(spark, sf_dir):
    """Peak is at least 1 on any day with a start, never exceeds that
    day's cumulative open sessions (starts so far can bound it), and
    session starts add up to the sessionize row count."""
    from cdc_postgresql_clickhouse_spark.queries.events import (
        QUERIES as EV_Q,
        events_sessionize,
    )

    rows = EV_Q["events_peak_concurrent_sessions"](spark, sf_dir).collect()
    n_sessions = events_sessionize(spark, sf_dir).count()
    assert sum(r["n_sessions_started"] for r in rows) == n_sessions
    total_so_far = 0
    for r in sorted(rows, key=lambda r: r["day"]):
        total_so_far += r["n_sessions_started"]
        assert 1 <= r["peak_concurrency"] <= total_so_far, r


def test_filter_cascade_funnel_laws(spark, sf_dir):
    """n_out(k) = n_in(k+1) (it IS a funnel); kills bounded by entrants;
    unique kills bounded by the stage's total kills over the whole pool;
    stage order matches CASCADE_STAGES."""
    from cdc_postgresql_clickhouse_spark.queries.quality import (
        CASCADE_STAGES,
        QUERIES as QL_Q,
    )

    rows = sorted(
        QL_Q["quality_filter_cascade_report"](spark, sf_dir).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage_name"] for r in rows] == list(CASCADE_STAGES)
    for i, r in enumerate(rows):
        assert r["n_out"] == r["n_in"] - r["n_killed"]
        assert 0 <= r["n_killed"] <= r["n_in"]
        assert 0 <= r["kill_rate_ppm"] <= 1_000_000
        if i + 1 < len(rows):
            assert rows[i + 1]["n_in"] == r["n_out"]
