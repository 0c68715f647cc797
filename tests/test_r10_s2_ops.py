"""Law tests for the round-10 session-2 operators (each also oracle-paired
and swept by test_oracle_parity): skyline front, dup-AUC, PR@k curve,
daily MAD anomaly profile, k-NN margin profile, tolerance as-of join,
Fleiss' kappa."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_skyline_points_are_undominated_and_antichain(spark, sf_dir):
    """Definition check against the raw table: no returned point is
    dominated by ANY order of the same priority, and the front is an
    antichain — sorted by day ascending, cents strictly decrease."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import QUERIES as TQ

    rows = TQ["orders_skyline_pareto"](spark, sf_dir).collect()
    orders = [
        (r["o_orderpriority"], r["day"], r["cents"])
        for r in load_table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            F.expr("CAST(FLOOR(unix_timestamp(o_orderdate)) AS BIGINT) div 86400")
            .alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    ]
    by_prio: dict[str, list[tuple[int, int]]] = {}
    for p, d, c in orders:
        by_prio.setdefault(p, []).append((d, c))
    from collections import Counter

    point_counts = Counter(((p, d, c) for p, d, c in orders))
    for r in rows:
        p, d, c = r["o_orderpriority"], r["day"], r["cents"]
        for d2, c2 in by_prio[p]:
            dominated = c2 >= c and d2 >= d and (c2 > c or d2 > d)
            assert not dominated, (p, d, c, d2, c2)
        assert r["n_at_point"] == point_counts[(p, d, c)]
    fronts: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        fronts.setdefault(r["o_orderpriority"], []).append((r["day"], r["cents"]))
    for pts in fronts.values():
        pts.sort()
        cents = [c for _, c in pts]
        assert cents == sorted(cents, reverse=True)
        assert len(set(cents)) == len(cents)  # strict antichain


def test_lang_bias_auc_bounds_and_class_totals(spark, sf_dir):
    """AUC is a probability in ppm; class sizes re-add to the per-source
    doc counts, and the positive class re-counts the en docs exactly."""
    from cdc_postgresql_clickhouse_spark.queries.quality import QUERIES as QQ

    rows = QQ["quality_lang_bias_auc"](spark, sf_dir).collect()
    assert rows, "at least one source must have both classes"
    per_source = {
        r["source"]: (r["n"], r["n_en"])
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("lang") == "en").cast("long")).alias("n_en"),
        )
        .collect()
    }
    for r in rows:
        assert 0 <= r["auc_ppm"] <= 1_000_000
        assert r["n_pos"] > 0 and r["n_neg"] > 0
        n, n_en = per_source[r["source"]]
        assert r["n_pos"] == n_en
        assert r["n_pos"] + r["n_neg"] == n


def test_pr_curve_monotone_and_consistent(spark, sf_dir):
    """hits and recall are nondecreasing in k, precision nonincreasing;
    the ppm columns recompute exactly from hits and n_queries."""
    from cdc_postgresql_clickhouse_spark.queries.search import PR_KS, QUERIES as SQ

    rows = {r["k"]: r for r in SQ["retrieval_pr_curve"](spark, sf_dir).collect()}
    ks = sorted(rows)
    assert set(ks) <= set(PR_KS)
    nq = rows[ks[0]]["n_queries"]
    prev_hits, prev_prec = -1, 10**18
    for k in ks:
        r = rows[k]
        assert r["n_queries"] == nq
        assert 0 <= r["hits"] <= nq
        assert r["hits"] >= prev_hits
        assert r["precision_ppm"] == r["hits"] * 1_000_000 // (k * nq)
        assert r["recall_ppm"] == r["hits"] * 1_000_000 // nq
        assert r["precision_ppm"] <= prev_prec
        prev_hits, prev_prec = r["hits"], r["precision_ppm"]


def test_daily_mad_profile_bounds(spark, sf_dir):
    """Every type sees the same gap-filled grid length; median <= max;
    anomaly count bounded by the day count."""
    from cdc_postgresql_clickhouse_spark.queries.events import QUERIES as EQ

    rows = EQ["events_daily_anomaly_mad"](spark, sf_dir).collect()
    assert rows
    n_days = {r["n_days"] for r in rows}
    assert len(n_days) == 1  # shared complete grid
    for r in rows:
        assert 0 <= r["median_daily"] <= r["max_daily"]
        assert r["mad"] >= 0
        assert 0 <= r["n_anomalies"] <= r["n_days"]


def test_knn_margin_profile_bounds(spark, sf_dir):
    """Margins are nonnegative by rank construction; the ambiguous count
    and the median respect the per-label query counts."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import QUERIES as SIMQ

    rows = SIMQ["embedding_knn_margin_profile"](spark, sf_dir).collect()
    assert rows
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_queries"] for r in rows) == (n_vecs + 99) // 100
    for r in rows:
        assert 0 <= r["median_margin_micro"] <= r["max_margin_micro"]
        assert 0 <= r["n_ambiguous"] <= r["n_queries"]


def test_asof_tolerance_subset_of_unbounded_asof(spark, sf_dir):
    """One row per event; matched lags sit inside the tolerance; and
    wherever the UNBOUNDED as-of's match is recent enough, the tolerance
    join picks the identical order (the two operators agree on their
    common domain)."""
    from cdc_postgresql_clickhouse_spark.queries.tpch import QUERIES as T0
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        ASOF_TOL_DAYS,
        QUERIES as TQ,
    )

    tol = TQ["asof_tolerance_latest_order"](spark, sf_dir)
    n_events = load_table(spark, sf_dir, "events").count()
    rows = tol.collect()
    assert len(rows) == n_events
    for r in rows:
        if r["asof_orderkey"] is not None:
            assert 0 <= r["lag_days"] <= ASOF_TOL_DAYS
        else:
            assert r["lag_days"] is None
    tol_by_event = {r["event_id"]: r["asof_orderkey"] for r in rows}
    unbounded = T0["asof_latest_order"](spark, sf_dir)
    ev_day = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 86400").alias("ed"),
    )
    ob = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("asof_orderkey"),
        F.expr("CAST(FLOOR(unix_timestamp(o_orderdate)) AS BIGINT) div 86400")
        .alias("od"),
    )
    ub = (
        unbounded.join(ev_day, "event_id")
        .join(ob, "asof_orderkey")
        .select("event_id", "asof_orderkey", (F.col("ed") - F.col("od")).alias("lag"))
        .collect()
    )
    for r in ub:
        if r["lag"] <= ASOF_TOL_DAYS:
            assert tol_by_event[r["event_id"]] == r["asof_orderkey"]


def test_fleiss_kappa_recomputes_from_contingency(spark, sf_dir):
    """kappa_ppm must equal the closed form over the shipped S and sum c^2
    columns; S is bounded by the 3..9 per-item square-sum range."""
    from cdc_postgresql_clickhouse_spark.queries.quality import QUERIES as QQ

    [r] = QQ["quality_langid_fleiss_kappa"](spark, sf_dir).collect()
    n, s, c2 = r["n_items"], r["s_sum"], r["c2_sum"]
    assert n == load_table(spark, sf_dir, "documents").count()
    assert 3 * n <= s <= 9 * n
    import math

    expect = math.floor(
        (3 * n * (s - 3 * n) - 2 * c2) / (2 * (9 * n * n - c2)) * 1_000_000
    )
    assert r["kappa_ppm"] == expect
    assert r["kappa_ppm"] <= 1_000_000


def test_position_attribution_conserves_credit(spark, sf_dir):
    """Every purchase distributes exactly 1e6 ppm: total credit across
    channels (incl. 'unattributed') = n_purchases x 1e6 — the remainders
    land on the last touch by construction, never dropped."""
    from cdc_postgresql_clickhouse_spark.queries.events import QUERIES as EQ

    rows = EQ["events_attribution_position_weighted"](spark, sf_dir).collect()
    n_purch = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase").count()
    )
    assert sum(r["credit_ppm"] for r in rows) == n_purch * 1_000_000
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000
    for r in rows:
        assert r["credit_ppm"] >= 0


def test_length_psi_nonnegative_and_bounded(spark, sf_dir):
    """Each PSI term (p-q)ln(p/q) is nonnegative, so the floored sum is
    too; every source reports 1..PSI_BUCKETS occupied buckets."""
    from cdc_postgresql_clickhouse_spark.queries.quality import (
        PSI_BUCKETS,
        QUERIES as QQ,
    )

    rows = QQ["quality_length_psi"](spark, sf_dir).collect()
    n_sources = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(rows) == n_sources
    for r in rows:
        assert r["psi_micro"] >= 0
        assert 1 <= r["n_buckets_hit"] <= PSI_BUCKETS


def test_bpe_compression_curve_monotone_and_bounded(spark, sf_dir):
    """Round 0 is the 1e6 baseline; totals strictly decrease while merges
    exist, each round by at most that round's adjacent-pair count (replace
    is leftmost non-overlapping, so overlapping occurrences merge fewer
    times than the count); word-type count is invariant."""
    from cdc_postgresql_clickhouse_spark.queries.bpe import QUERIES as BQ

    rows = {r["round"]: r for r in BQ["bpe_compression_curve"](spark, sf_dir).collect()}
    merges = {
        r["round"]: r["pair_count"]
        for r in BQ["bpe_train_merges"](spark, sf_dir).collect()
    }
    ks = sorted(rows)
    assert ks[0] == 0 and rows[0]["compression_ppm"] == 1_000_000
    ntypes = {rows[k]["n_word_types"] for k in ks}
    assert len(ntypes) == 1
    for k in ks[1:]:
        drop = rows[k - 1]["total_tokens"] - rows[k]["total_tokens"]
        assert 0 < drop <= merges[k]
        assert rows[k]["compression_ppm"] <= rows[k - 1]["compression_ppm"]


def test_cross_source_crossentropy_matrix_complete(spark, sf_dir):
    """Full |sources|^2 matrix; each eval row's token total is the eval
    source's own count regardless of the train side; entropies positive."""
    from cdc_postgresql_clickhouse_spark.queries.text import QUERIES as TXQ

    rows = TXQ["text_cross_source_crossentropy"](spark, sf_dir).collect()
    sources = {r["train_source"] for r in rows}
    assert sources == {r["eval_source"] for r in rows}
    assert len(rows) == len(sources) ** 2
    per_eval = {}
    for r in rows:
        assert r["ce_microbits"] > 0
        per_eval.setdefault(r["eval_source"], set()).add(r["n_eval_tokens"])
    assert all(len(v) == 1 for v in per_eval.values())


def test_retention_halflife_pair_accounting(spark, sf_dir):
    """n_pairs is exactly C(n_points, 2); a reported half-life is positive
    and only present when the median slope is negative."""
    from cdc_postgresql_clickhouse_spark.queries.events import (
        RET_MIN_POINTS,
        QUERIES as EQ,
    )

    rows = EQ["events_retention_halflife"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r["n_points"]
        assert n >= RET_MIN_POINTS
        assert r["n_pairs"] == n * (n - 1) // 2
        if r["slope_milli_micro"] < 0:
            assert r["halflife_milli_weeks"] is not None
            assert r["halflife_milli_weeks"] > 0
        else:
            assert r["halflife_milli_weeks"] is None


def test_asof_nearest_prefers_smallest_distance_and_past_ties(spark, sf_dir):
    """One row per event; |signed lag| <= tolerance; and against a
    driver-side recompute on a sample of users, the chosen order has the
    minimal absolute distance with past-preferred tie-breaking."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        ASOF_TOL_DAYS,
        QUERIES as TQ,
    )

    rows = TQ["asof_nearest_order"](spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert len(rows) == n_events
    orders = {}
    for r in (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey",
            F.expr("CAST(FLOOR(unix_timestamp(o_orderdate)) AS BIGINT) div 86400")
            .alias("od"),
        )
        .collect()
    ):
        orders.setdefault(r["o_custkey"], []).append((r["o_orderkey"], r["od"]))
    ev_day = {
        r["event_id"]: (r["user_id"], r["ed"])
        for r in load_table(spark, sf_dir, "events")
        .select(
            "event_id", "user_id",
            F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 86400").alias("ed"),
        )
        .collect()
    }
    for r in rows[:500]:
        uid, ed = ev_day[r["event_id"]]
        cands = [
            (abs(ed - od), 0 if ed - od >= 0 else 1, -ok)
            for ok, od in orders.get(uid, [])
            if abs(ed - od) <= ASOF_TOL_DAYS
        ]
        if not cands:
            assert r["nearest_orderkey"] is None
        else:
            best = min(cands)
            assert r["nearest_orderkey"] == -best[2]
            assert abs(r["signed_lag_days"]) == best[0]


def test_phash_sweep_monotone_and_consistent_with_pairs(spark, sf_dir):
    """Pair and coverage counts are nondecreasing in the radius, and the
    max-radius row re-counts the audited near-dup pair set exactly."""
    from cdc_postgresql_clickhouse_spark.queries.multimodal import (
        PHASH_HAMMING_MAX,
        QUERIES as MQ,
    )

    rows = {r["radius"]: r for r in MQ["multimodal_phash_hamming_sweep"](spark, sf_dir).collect()}
    pairs = MQ["multimodal_phash_neardup"](spark, sf_dir).collect()
    if not pairs:
        assert not rows
        return
    radii = sorted(rows)
    prev_p, prev_d = 0, 0
    for r in radii:
        assert rows[r]["n_pairs"] >= prev_p
        assert rows[r]["n_src_docs"] >= prev_d
        prev_p, prev_d = rows[r]["n_pairs"], rows[r]["n_src_docs"]
    # the sweep stops at the pigeonhole-guaranteed radius (PHASH_BANDS-1),
    # so its top row re-counts the audited pairs AT that radius
    rmax = max(radii)
    inside = [p for p in pairs if p["hamming"] <= rmax]
    assert rows[rmax]["n_pairs"] == len(inside)
    assert rows[rmax]["n_src_docs"] == len({p["doc_a"] for p in inside})


def test_bigram_entropy_rate_information_laws(spark, sf_dir):
    """Conditioning cannot increase entropy: 0 <= H2 - H1 <= H1 (up to the
    +/-2 micro-unit floor slack); type counts and totals are consistent
    with the raw bigram population."""
    from cdc_postgresql_clickhouse_spark.queries.text_ext import QUERIES as TXQ

    rows = TXQ["text_bigram_entropy_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["types_unigram"] <= r["types_bigram"] <= r["n_bigrams"]
        assert r["h_unigram_microbits"] >= 0
        # H(W1,W2) >= H(W1): conditional rate nonnegative modulo floor slack
        assert r["cond_rate_microbits"] >= -2
        # H(W2|W1) <= H(W2) <= log2(types): crude sanity ceiling
        assert r["cond_rate_microbits"] <= r["h_bigram_microbits"]


def test_minmax_pruning_sorted_dominates_arrival(spark, sf_dir):
    """Both layouts report every quarter; chunk counts stay in
    [1, PRUNE_CHUNKS]; and the date-sorted layout never scans more
    chunks than the arrival layout for the same quarter (sorting can
    only tighten date zone maps)."""
    from cdc_postgresql_clickhouse_spark.queries.zorder import (
        PRUNE_CHUNKS,
        QUERIES as ZQ,
    )

    rows = ZQ["layout_minmax_pruning_report"](spark, sf_dir).collect()
    per = {}
    for r in rows:
        assert 1 <= r["n_chunks_scanned"] <= PRUNE_CHUNKS
        assert 0 <= r["prune_ppm"] < 1_000_000
        per.setdefault(r["quarter_idx"], {})[r["layout"]] = r["n_chunks_scanned"]
    assert per
    for q, by_layout in per.items():
        assert set(by_layout) == {"arrival", "date_sorted"}
        assert by_layout["date_sorted"] <= by_layout["arrival"], q


def test_intrinsic_dimension_single_row_and_positive(spark, sf_dir):
    """One corpus-level row; the query count matches the 1-in-100 sample;
    a positive log-ratio sum yields a positive dimension estimate."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import QUERIES as SIMQ

    [r] = SIMQ["embedding_intrinsic_dimension"](spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert r["n_queries"] == (n_vecs + 99) // 100
    assert 0 <= r["n_degenerate"] <= r["n_queries"]
    if r["sum_ln_mu_micro"] and r["sum_ln_mu_micro"] > 0:
        assert r["id_milli"] > 0
    else:
        assert r["id_milli"] is None
