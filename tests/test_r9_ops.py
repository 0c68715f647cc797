"""Law tests for the round-9 operators (each also oracle-paired and swept
by test_oracle_parity): radius search, compaction debt, tokenizer
fertility, item-based CF recommendations."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_radius_search_monotone_and_consistent_with_topk(spark, sf_dir):
    """Pair volume, coverage, and max fan-out are all nonincreasing in the
    radius threshold (radius sets are nested); the tightest radius's pairs
    are a subset of brute-force scores by construction, so every tau=0.2
    pair count is bounded by the query slice x (corpus-1)."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        RADIUS_TAUS_PPM,
        QUERIES as SIM_Q,
    )

    rows = {
        r["tau_ppm"]: r
        for r in SIM_Q["ann_radius_search_report"](spark, sf_dir).collect()
    }
    assert set(rows) == set(RADIUS_TAUS_PPM)
    taus = sorted(rows)
    for col in ("n_pairs", "n_queries_covered", "max_per_query"):
        vals = [rows[t][col] for t in taus]
        assert vals == sorted(vals, reverse=True), (col, vals)
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    n_q = (n_vecs + 99) // 100
    for t in taus:
        assert rows[t]["n_pairs"] <= n_q * (n_vecs - 1)
        assert rows[t]["n_queries_covered"] <= n_q
        assert rows[t]["max_per_query"] <= n_vecs - 1


def test_compaction_debt_conservation(spark, sf_dir):
    """Bucket-level accounting sums to the global log: n_log_rows adds up
    to |events|, n_keys to |users|, superseded = rows - keys per bucket,
    and reclaimable = superseded + tombstoned keys' live rows."""
    from cdc_postgresql_clickhouse_spark.queries.cdc import (
        QUERIES as CDC_Q,
        N_DEBT_BUCKETS,
    )

    rows = CDC_Q["cdc_compaction_debt_report"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n_log_rows"] for r in rows) == ev.count()
    assert sum(r["n_keys"] for r in rows) == ev.select("user_id").distinct().count()
    for r in rows:
        assert 0 <= r["bucket"] < N_DEBT_BUCKETS
        assert r["n_superseded"] == r["n_log_rows"] - r["n_keys"]
        assert r["n_reclaimable"] == r["n_superseded"] + r["n_tombstoned_keys"]
        assert 0 <= r["debt_ppm"] <= 1_000_000


def test_fertility_by_source_consistent_with_doc_counts(spark, sf_dir):
    """The per-source rollup must re-aggregate the per-doc bpe_token_count
    totals exactly (same merges, same application), and fertility is >= 1
    token per word (a word never disappears) and <= its char length + EOW."""
    from cdc_postgresql_clickhouse_spark.queries.bpe import QUERIES as BPE_Q

    per_source = BPE_Q["tokenizer_fertility_by_source"](spark, sf_dir).collect()
    per_doc = BPE_Q["bpe_token_count"](spark, sf_dir).agg(
        F.sum("bpe_tokens").alias("bpe"), F.sum("char_tokens").alias("ch")
    ).first()
    assert sum(r["n_bpe_tokens"] for r in per_source) == per_doc["bpe"]
    assert sum(r["n_char_tokens"] for r in per_source) == per_doc["ch"]
    for r in per_source:
        assert r["fertility_milli"] >= 1000  # >= one symbol per word
        assert r["n_bpe_tokens"] <= r["n_char_tokens"]
        assert r["compression_milli"] >= 1000


def test_reco_excludes_owned_brands_and_ranks_by_cooccurrence(spark, sf_dir):
    """No recommended brand may already be owned by the customer; ranks are
    1..3 without gaps per customer; scores nonincreasing in rank."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        QUERIES as TM_Q,
    )

    recs = TM_Q["reco_brand_cooccurrence_topk"](spark, sf_dir).collect()
    assert recs, "slice produced no recommendations"
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    owned = {
        (r.c, r.b)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .select(F.col("o_custkey").alias("c"), F.col("p_brand").alias("b"))
        .distinct()
        .collect()
    }
    by_cust: dict[int, list] = {}
    for r in recs:
        assert (r.c_custkey, r.rec_brand) not in owned, r
        by_cust.setdefault(r.c_custkey, []).append(r)
    for c, rs in by_cust.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_decontam_sweep_monotone_in_ngram_size(spark, sf_dir):
    """A shared n-gram implies shared (n-1)-grams (substrings are contained
    in both docs), so the flagged-doc set at larger n is a subset of the
    smaller-n set: flagged and planted counts are nonincreasing in n. The
    n=8 arm must agree with the registered corpus_decontaminate row."""
    from cdc_postgresql_clickhouse_spark.queries.training import (
        DECONTAM_SWEEP_NS,
        QUERIES as TR_Q,
    )

    rows = {
        r["ngram_n"]: r
        for r in TR_Q["corpus_decontaminate_ngram_sweep"](spark, sf_dir).collect()
    }
    assert set(rows) == set(DECONTAM_SWEEP_NS)
    ns = sorted(rows)
    for col in ("n_flagged_docs", "n_flagged_planted"):
        vals = [rows[n][col] for n in ns]
        assert vals == sorted(vals, reverse=True), (col, vals)
    base = TR_Q["corpus_decontaminate"](spark, sf_dir)
    assert rows[8]["n_flagged_docs"] == base.count()


def test_method_agreement_counts_are_set_algebra(spark, sf_dir):
    """n_both <= min(n_a, n_b); n_either = n_a + n_b - n_both; agreement in
    [0, 1e6]; the exact n-gram baseline must agree with MinHash on at least
    the planted near-dup mass (both verify at Jaccard >= 0.5)."""
    from cdc_postgresql_clickhouse_spark.queries.dedup import (
        QUERIES as DD_Q,
    )

    rows = DD_Q["dedup_method_agreement"](spark, sf_dir).collect()
    assert {(r.method_a, r.method_b) for r in rows} == {
        ("minhash", "ngram"), ("minhash", "simhash"), ("ngram", "simhash")
    }
    for r in rows:
        assert r.n_both <= min(r.n_a, r.n_b)
        assert r.n_either == r.n_a + r.n_b - r.n_both
        if r.n_either:
            assert 0 <= r.agreement_ppm <= 1_000_000


def test_duplicate_invoices_no_bucket_boundary_misses(spark, sf_dir):
    """The bucketize-then-refine candidates must equal a brute-force pair
    scan per customer (collected at test SF): no pair within tolerance may
    be lost at a bucket boundary, and no plan may go cartesian."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        DUP_INV_DAYS,
        DUP_INV_PRICE_TOL,
        QUERIES as TM_Q,
    )
    from cdc_postgresql_clickhouse_spark.plans.inspect import formatted_plan

    df = TM_Q["orders_duplicate_invoice_detection"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r.o_custkey, r.order_a, r.order_b) for r in df.collect()}
    import math
    from collections import defaultdict

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", F.to_date("o_orderdate").alias("d")
    ).collect()
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r.o_custkey].append(r)
    want = set()
    for c, rs in by_cust.items():
        for i in range(len(rs)):
            for j in range(len(rs)):
                a, b = rs[i], rs[j]
                if a.o_orderkey >= b.o_orderkey:
                    continue
                if abs(math.floor(a.o_totalprice) - math.floor(b.o_totalprice)) > DUP_INV_PRICE_TOL:
                    continue
                if abs((a.d - b.d).days) > DUP_INV_DAYS:
                    continue
                want.add((c, a.o_orderkey, b.o_orderkey))
    assert got == want


def test_streaming_debt_replay_is_idempotent(spark, sf_dir):
    """At-least-once posture: re-appending the same micro-batch partial
    (same batch_id — a foreachBatch replay) must not change the merged
    report; a DIFFERENT batch id with the same rows must (it is new data)."""
    import os
    import shutil
    import tempfile

    from cdc_postgresql_clickhouse_spark.streaming.sketch import (
        ingest_batch_debt,
        read_compaction_debt,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        F.col("event_id").alias("eid"),
        "event_type",
    ).limit(500)
    tmp = tempfile.mkdtemp(prefix="debt_replay_")
    state = os.path.join(tmp, "state")
    try:
        ingest_batch_debt(ev, state, batch_id=0)
        once = sorted(map(tuple, read_compaction_debt(spark, state).collect()))
        ingest_batch_debt(ev, state, batch_id=0)  # replay: verbatim duplicate
        twice = sorted(map(tuple, read_compaction_debt(spark, state).collect()))
        assert once == twice, "replayed batch changed the merged debt state"
        ingest_batch_debt(ev, state, batch_id=1)  # genuinely new batch id
        thrice = sorted(map(tuple, read_compaction_debt(spark, state).collect()))
        assert thrice != once, "new batch id was silently dropped"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(f"{state}.lock", ignore_errors=True)


def test_kcenter_radius_curve_is_nonincreasing_and_centers_distinct(spark, sf_dir):
    """Farthest-point greedy: the coverage radius closed by each new center
    is nonincreasing (the min-distance field only shrinks as centers are
    added); centers are distinct; the seed is the lowest vec_id."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        KCENTER_K,
        QUERIES as SIM_Q,
    )

    rows = sorted(
        SIM_Q["embedding_kcenter_coreset"](spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == list(range(1, KCENTER_K + 1))
    assert len({r["center_id"] for r in rows}) == KCENTER_K
    assert rows[0]["center_id"] == load_table(
        spark, sf_dir, "embeddings"
    ).agg(F.min("vec_id")).first()[0]
    radii = [r["radius_micro"] for r in rows[1:]]
    assert radii == sorted(radii, reverse=True)


def test_bias_audit_accounting(spark, sf_dir):
    """Source totals must sum to |documents| + |derived copies|; removed <=
    clustered <= n_docs per source; every removed doc is a non-canonical
    cluster member by construction (cross-checked against the cluster
    table)."""
    from cdc_postgresql_clickhouse_spark.queries.cluster import (
        QUERIES as CL_Q,
        dedup_cluster_canonical,
    )

    rows = CL_Q["quality_dedup_bias_audit"](spark, sf_dir).collect()
    n_docs_total = load_table(spark, sf_dir, "documents").count()
    n_derived = load_table(spark, sf_dir, "documents").filter("doc_id < 50").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total + n_derived
    for r in rows:
        assert 0 <= r["n_removed"] <= r["n_clustered"] <= r["n_docs"]
        assert 0 <= r["removal_ppm"] <= 1_000_000
    total_removed = sum(r["n_removed"] for r in rows)
    assert total_removed == dedup_cluster_canonical(spark, sf_dir).filter(
        "NOT is_canonical"
    ).count()


def test_spearman_bounds_and_python_twin(spark, sf_dir):
    """rho in [-1e6, 1e6]; a Python recomputation on the collected metric
    pairs (same tie-break) must agree exactly for every source."""
    from cdc_postgresql_clickhouse_spark.queries.quality import (
        QUERIES as QL_Q,
    )
    from cdc_postgresql_clickhouse_spark.queries.text import (
        text_quality_score,
        text_unigram_logprob,
    )
    import math

    rows = {r.source: r for r in QL_Q["quality_spearman_quality_logprob"](spark, sf_dir).collect()}
    docs = {r.doc_id: r.source for r in load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()}
    q = {r.doc_id: r.quality for r in text_quality_score(spark, sf_dir).select("doc_id", "quality").collect()}
    lp = {r.doc_id: r.avg_neg_logprob for r in text_unigram_logprob(spark, sf_dir).select("doc_id", "avg_neg_logprob").collect()}
    from collections import defaultdict

    by_src = defaultdict(list)
    for d, s in docs.items():
        if d in q and d in lp:
            by_src[s].append(d)
    for s, ds in by_src.items():
        if len(ds) < 2:
            assert s not in rows
            continue
        rq = {d: i + 1 for i, d in enumerate(sorted(ds, key=lambda d: (q[d], d)))}
        rl = {d: i + 1 for i, d in enumerate(sorted(ds, key=lambda d: (lp[d], d)))}
        n = len(ds)
        sum_d2 = sum((rq[d] - rl[d]) ** 2 for d in ds)
        rho = math.floor((1.0 - 6.0 * sum_d2 / (n * (n * n - 1.0))) * 1e6)
        r = rows[s]
        assert (r.n_docs, r.sum_d2, r.rho_ppm) == (n, sum_d2, rho), s
        assert -1_000_000 <= r.rho_ppm <= 1_000_000


def test_waterfill_spends_budget_and_honors_caps(spark, sf_dir):
    """The whole point vs the rate-capped mixture row: the budget is
    actually SPENT (sum allocated within floor-granularity slack of the
    budget), no source exceeds its capacity, capped sources get exactly
    their capacity, and uncapped allocations are weight-proportional at
    one shared threshold."""
    from cdc_postgresql_clickhouse_spark.queries.training import (
        WATERFILL_BUDGET_PCT,
        QUERIES as TR_Q,
    )

    rows = TR_Q["corpus_token_budget_waterfill"](spark, sf_dir).collect()
    assert rows
    total_capacity = sum(r.capacity for r in rows)
    budget = total_capacity * WATERFILL_BUDGET_PCT // 100
    alloc = sum(r.allocated for r in rows)
    assert alloc <= budget
    # floor losses: < 1 token per uncapped source plus the t-granularity
    # (w_milli/1000 tokens per source)
    slack = sum(r.w_milli // 1000 + 1 for r in rows)
    assert alloc >= budget - slack, (alloc, budget, slack)
    uncapped_ts = set()
    for r in rows:
        assert 0 <= r.allocated <= r.capacity
        if r.capped:
            assert r.allocated == r.capacity
        else:
            # shared threshold: reconstruct t from the allocation
            uncapped_ts.add(r.allocated * 1000 // r.w_milli)
    if uncapped_ts:
        # all uncapped sources sit at one water level (within floor slack)
        assert max(uncapped_ts) - min(uncapped_ts) <= 1, uncapped_ts


def test_waterfill_capped_prefix_python_twin(spark):
    """Skewed capacities force the capped path the uniform fixture never
    enters: a tiny source saturates, its clipped mass redistributes to the
    others at one shared water level. Cross-checked against a Python
    continuous waterfill (integer-floored at the same points)."""
    from cdc_postgresql_clickhouse_spark.queries.training import (
        waterfill_allocate,
    )
    import math

    caps = {"tiny": 100, "mid": 50_000, "big": 200_000, "huge": 800_000}
    per = spark.createDataFrame(list(caps.items()), "source string, capacity long")
    rows = {r.source: r for r in waterfill_allocate(per, budget_pct=60).collect()}
    assert rows["tiny"].capped and rows["tiny"].allocated == 100
    budget = sum(caps.values()) * 60 // 100
    alloc = sum(r.allocated for r in rows.values())
    assert alloc <= budget
    slack = sum(r.w_milli // 1000 + 1 for r in rows.values())
    assert alloc >= budget - slack
    # python twin: iterate the standard waterfill (cap the smallest
    # capacity/weight ratio while its fair share exceeds capacity)
    w = {s: math.floor(math.sqrt(c) * 1000) for s, c in caps.items()}
    order = sorted(caps, key=lambda s: (caps[s] * 1_000_000 // w[s], s))
    capped, rem_b, rem_w = set(), budget, sum(w.values())
    for s in order:
        t = rem_b * 1000 // rem_w
        if caps[s] <= w[s] * t // 1000:
            capped.add(s)
            rem_b -= caps[s]
            rem_w -= w[s]
        else:
            break
    t = rem_b * 1000 // rem_w
    assert "tiny" in capped
    for s in caps:
        if s in capped:
            assert rows[s].capped and rows[s].allocated == caps[s], s
        else:
            assert not rows[s].capped, s
            assert rows[s].allocated == w[s] * t // 1000, s
