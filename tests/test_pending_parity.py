"""Law tests for operators built during the round-7 pending era, plus the
(now normally empty) pending-layer parity sweep. Round 8 registered the
entire pending layer (VERDICT r7 #1), so the parity parametrization below
collects nothing unless a future round stages new pending rows — the
registered contract is swept by tests/test_oracle_parity.py. The law tests
remain load-bearing regardless of registration state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from tests.oracle_harness import compare, duckdb_con


def _pending():
    from cdc_postgresql_clickhouse_spark.queries import (
        cdc, chunking, cluster, corpus, dedup, events, graph, pca, quality,
        search, similarity, sketches, skew, streaming_queries, text,
        text_ext, tokenizer, tpch_ext, tpch_more, training,
    )

    out = {}
    for m in (tokenizer, cdc, chunking, search, sketches, skew, graph, text_ext, pca, tpch_ext, events, tpch_more, training, quality, text, streaming_queries, similarity, cluster, dedup, corpus):
        q = getattr(m, "PENDING_QUERIES", {})
        o = getattr(m, "PENDING_ORACLE", {})
        assert set(q) == set(o), "pending query without oracle twin"
        for n in q:
            assert n not in out, f"duplicate pending query name {n!r} ({m.__name__})"
            out[n] = (q[n], o[n])
    return out


@pytest.fixture
def con(sf_dir):
    # per-TEST connection (was module-scoped): this module runs a hundred-plus
    # oracle queries through one process — a long-lived DuckDB instance plus
    # Spark's intra-module cache growth exhausted HOST memory twice in full
    # suite runs ("bad allocation" on a KB-sized block). Reconnecting frees
    # the allocator every test; view registration is milliseconds.
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.fixture(autouse=True)
def _clear_spark_cache_per_test():
    yield
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.catalog.clearCache()


@pytest.mark.parametrize("name", sorted(_pending()))
def test_pending_oracle_parity(spark, sf_dir, con, name):
    fn, sql = _pending()[name]
    issues = [i for i in compare(fn(spark, sf_dir), con, sql, name) if "[WARN]" not in i]
    assert not issues, issues


def test_wordpiece_matches_python_reference(spark, sf_dir):
    """The greedy fold + its vocab derivation equal a pure-Python
    longest-match reference on every corpus word, and pieces rejoin to the
    word after stripping the ## marks."""
    from cdc_postgresql_clickhouse_spark.queries.tokenizer import (
        MAXP,
        VOCAB_K,
        tokenizer_wordpiece_segment,
        wordpiece_model,
    )
    from tests.test_tokenizer import _word_freq_py

    wf = _word_freq_py(spark, sf_dir)
    from collections import Counter

    wt: Counter = Counter()
    for w, f in wf.items():
        for L in range(1, MAXP + 1):
            for i in range(len(w) - L + 1):
                p = w[i : i + L] if i == 0 else "##" + w[i : i + L]
                wt[p] += f
    top = sorted(wt.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]
    assert wordpiece_model(spark, sf_dir) == top
    vocab = {p for p, _ in top}

    def ref(w: str):
        pos, np_, seg = 0, 0, []
        while pos < len(w):
            for L in range(MAXP, 0, -1):
                if pos + L <= len(w):
                    key = w[pos : pos + L] if pos == 0 else "##" + w[pos : pos + L]
                    if key in vocab:
                        seg.append(key)
                        pos += L
                        break
            else:
                seg.append(w[pos] if pos == 0 else "##" + w[pos])
                pos += 1
            np_ += 1
        return np_, " ".join(seg)

    got = {
        r.word: (r.freq, r.n_pieces, r.seg)
        for r in tokenizer_wordpiece_segment(spark, sf_dir).collect()
    }
    assert set(got) == set(wf)
    for w, f in wf.items():
        np_, seg = ref(w)
        assert got[w] == (f, np_, seg), (w, got[w], (f, np_, seg))
        assert seg.replace(" ", "").replace("##", "") == w


def test_pk_change_moves_rows_across_keyspace(spark, sf_dir):
    """For every migrated user (uid % 10 == 3): the OLD key is gone from
    the final state (its last event is the tombstone) and the NEW key
    (uid + PK_OFFSET) is present with the carried value; non-migrated
    users are untouched relative to the plain current-state view."""
    from cdc_postgresql_clickhouse_spark.queries.cdc import (
        PK_OFFSET,
        cdc_current_state,
        cdc_pk_change_state,
    )

    st = cdc_pk_change_state(spark, sf_dir).toPandas().set_index("user_id")
    base = cdc_current_state(spark, sf_dir).toPandas().set_index("user_id")
    migrated = [u for u in base.index if u % 10 == 3]
    assert migrated, "fixture has no migrated users"
    for u in migrated:
        assert u not in st.index, f"old key {u} survived the tombstone"
        assert u + PK_OFFSET in st.index, f"new key missing for {u}"
        assert st.loc[u + PK_OFFSET, "last_value"] == base.loc[u, "last_value"]
        assert st.loc[u + PK_OFFSET, "last_event_type"] == "pk_moved"
    untouched = [u for u in base.index if u % 10 != 3 and base.loc[u, "last_event_type"] != "error"]
    for u in untouched[:50]:
        assert st.loc[u, "last_value"] == base.loc[u, "last_value"]


def test_asof_read_equals_scd2_interval_filter(spark, sf_dir):
    """Time-travel consistency law: the as-of read must equal the SCD2
    history filtered to valid_from_es <= T < valid_to_es (open intervals
    count) — the two encodings of 'state at T' cannot disagree."""
    from cdc_postgresql_clickhouse_spark.queries.cdc import (
        cdc_scd2_history,
        cdc_state_asof,
    )

    asof = cdc_state_asof(spark, sf_dir).toPandas()
    t = asof.asof_es.iloc[0]
    assert (asof.asof_es == t).all()
    hist = cdc_scd2_history(spark, sf_dir).toPandas()
    want = hist[
        (hist.valid_from_es <= t)
        & (hist.valid_to_es.isna() | (hist.valid_to_es > t))
    ]
    got = asof.sort_values("user_id").reset_index(drop=True)
    want = want.sort_values("user_id").reset_index(drop=True)
    assert list(got.user_id) == list(want.user_id)
    assert list(got.last_event_id) == list(want.event_id)
    assert list(got.last_event_type) == list(want.event_type)
    assert list(got.last_value) == list(want.value)


def test_cusum_drawdown_identity_matches_recurrence(spark, sf_dir):
    """The window formulation must equal the textbook recurrence
    S_t = max(0, S_{t-1} + (c_t - target)) replayed in Python per type —
    alarms counted identically, max S identical."""
    from cdc_postgresql_clickhouse_spark.queries.sketches import events_cusum_changepoint

    out = {
        r.event_type: r for r in events_cusum_changepoint(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .collect()
    )
    from collections import defaultdict

    streams = defaultdict(list)
    for r in ev:
        streams[r.event_type].append((r.es, r.event_id, r.c))
    for t, rows in streams.items():
        rows.sort()
        cs = [c for _, _, c in rows]
        n = len(cs)
        target = sum(cs) // n  # sums are non-negative -> // == trunc
        h = (sum(abs(c - target) for c in cs) // n) * 3
        s_val, alarms, mx = 0, 0, 0
        for c in cs:
            s_val = max(0, s_val + (c - target))
            mx = max(mx, s_val)
            if s_val > h:
                alarms += 1
        got = out[t]
        assert (got.target_cents, got.h_cents) == (target, h)
        assert (got.n_alarms, got.max_s_cents) == (alarms, mx), t


def test_holt_linear_matches_recurrence(spark, sf_dir):
    """The array fold must equal the pinned Holt recurrence replayed in
    Python per user: l_t = (x_t + l + b)*0.5, b_t = (x_t - l)*0.25 + b*0.75
    (the CSE-free rewrite of the textbook form — bit-identical to it only
    up to ~1e-13, so the REWRITE is the operator's spec and both engines
    and this reference replay exactly that op order), including the l2/b2
    two-point init and the single-event degenerate case."""
    from cdc_postgresql_clickhouse_spark.queries.sketches import events_holt_linear

    out = {r.user_id: r for r in events_holt_linear(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .collect()
    )
    from collections import defaultdict

    streams = defaultdict(list)
    for r in ev:
        streams[r.user_id].append((r.us, r.event_id, r.c))
    assert set(out) == set(streams)
    singles = 0
    for u, rows in streams.items():
        rows.sort()
        cs = [float(c) for _, _, c in rows]
        if len(cs) == 1:
            l, b = cs[0], 0.0
            singles += 1
        else:
            l, b = cs[1], cs[1] - cs[0]
            for x in cs[2:]:
                l, b = (x + l + b) * 0.5, (x - l) * 0.25 + b * 0.75
        got = out[u]
        assert got.n_events == len(cs)
        assert (got.level_cents, got.trend_cents) == (l, b), u
        assert got.forecast_cents == l + b


def test_profile_matches_per_column_truth(spark, sf_dir):
    """The one-pass long-grain profile must agree with direct per-column
    aggregates: n_rows, distinct counts, and that the mode's frequency is
    the max group count."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_ext import (
        profile_orders_columns,
    )

    p = profile_orders_columns(spark, sf_dir).toPandas().set_index("col_name")
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    assert (p.n_rows == n).all() and (p.n_null == 0).all()
    assert len(p) == 6
    for col in ("o_orderkey", "o_orderstatus", "o_orderpriority"):
        assert p.loc[col, "n_distinct"] == o.select(col).distinct().count()
    top = (
        o.groupBy("o_orderpriority").count()
        .orderBy(F.desc("count"), F.desc("o_orderpriority")).first()
    )
    assert p.loc["o_orderpriority", "mode_repr"] == top[0]
    assert p.loc["o_orderpriority", "mode_count"] == top[1]
    assert (p.mode_count <= p.n_rows).all()
    assert (p.min_repr <= p.max_repr).all()


def test_capped_sessionize_laws(spark, sf_dir):
    """The fold equals the Python recurrence per user, the embedded
    gap-only count equals the window-based events_sessionize session
    count, and the cap can only split sessions (capped >= gap)."""
    from cdc_postgresql_clickhouse_spark.queries.events import (
        SESS_CAP_S,
        SESS_GAP_S,
        events_sessionize,
        events_sessionize_capped,
    )

    out = {r.user_id: r for r in events_sessionize_capped(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
            "event_id",
        )
        .collect()
    )
    from collections import defaultdict

    streams = defaultdict(list)
    for r in ev:
        streams[r.user_id].append((r.es, r.event_id))
    assert set(out) == set(streams)
    for u, rows in streams.items():
        rows.sort()
        es = [e for e, _ in rows]
        prev = start = es[0]
        n_cap = n_gap = 1
        for x in es[1:]:
            capped = (x - prev > SESS_GAP_S) or (x - start > SESS_CAP_S)
            if capped:
                start = x
                n_cap += 1
            if x - prev > SESS_GAP_S:
                n_gap += 1
            prev = x
        got = out[u]
        assert (got.n_events, got.n_sessions_gap, got.n_sessions_capped) == (
            len(es), n_gap, n_cap,
        ), u
        assert got.n_sessions_capped >= got.n_sessions_gap
    window_counts = {
        r.user_id: r.n
        for r in events_sessionize(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for u, r in out.items():
        assert r.n_sessions_gap == window_counts[u], u


def test_modularity_accounting_laws(spark, sf_dir):
    """Node counts partition the graph's node set, internal weight never
    exceeds half the community's degree mass, and total Q is in
    (-1e6, 1e6] PPM — Newman's bounds."""
    from cdc_postgresql_clickhouse_spark.queries.graph import graph_modularity_report

    m = graph_modularity_report(spark, sf_dir).toPandas()
    assert (2 * m.internal_weight <= m.total_degree).all()
    q = m.q_contrib_ppm.sum()
    assert -1_000_000 < q <= 1_000_000
    assert (m.n_nodes >= 1).all()


def test_char_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(#distinct chars of the doc) micro-bits (+1 for the
    per-term floor), and every doc appears."""
    import math

    from cdc_postgresql_clickhouse_spark.queries.text_ext import text_char_entropy

    e = text_char_entropy(spark, sf_dir).toPandas()
    assert len(e) == load_table(spark, sf_dir, "documents").count()
    assert (e.entropy_microbits >= 0).all()
    # crude upper bound: a text of n chars has at most n distinct chars,
    # but also at most ~40 in this fixture's alphabet
    assert (e.entropy_microbits <= int(math.log2(64) * 1_000_000)).all()


def test_pca_residual_energy_accounting(spark, sf_dir):
    """Projection energy can never exceed total variance (Bessel), shares
    are PPM-bounded, and labels partition the vector set."""
    from cdc_postgresql_clickhouse_spark.queries.pca import embedding_pca_residual

    r = embedding_pca_residual(spark, sf_dir).toPandas()
    assert (r.removed_mass <= r.var_mass).all()
    assert ((r.removed_ppm >= 0) & (r.removed_ppm <= 1_000_000)).all()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert r.n_vectors.sum() == n


def test_fuzzy_linkage_is_complete_vs_bruteforce(spark, sf_dir):
    """The SymSpell deletion-neighborhood join must find EXACTLY the pairs
    a brute-force all-pairs levenshtein finds — completeness is the whole
    point of the pigeonhole; spurious pairs would mean a broken verify."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        FUZZY_K,
        linkage_fuzzy_part_names,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    names = sorted(
        r[0]
        for r in load_table(spark, sf_dir, "part").select("p_name").distinct().collect()
    )
    want = {
        (a, b, lev(a, b))
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if lev(a, b) <= FUZZY_K
    }
    got = {
        (r.name_a, r.name_b, r.edit_dist)
        for r in linkage_fuzzy_part_names(spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture must contain at least one fuzzy pair"


def test_heldout_ppl_oov_and_source_coverage(spark, sf_dir):
    """OOV bigrams are a subset of the val bigrams, NLL is positive (every
    smoothed probability < 1 given V > 1), and exactly the sources owning
    a val doc with >= 2 tokens are reported."""
    from cdc_postgresql_clickhouse_spark.functions.text import tokens
    from cdc_postgresql_clickhouse_spark.queries.text_ext import (
        corpus_bigram_heldout_ppl,
    )

    r = corpus_bigram_heldout_ppl(spark, sf_dir).toPandas()
    assert len(r) > 0
    assert ((r.n_oov_bigrams >= 0) & (r.n_oov_bigrams <= r.n_bigrams)).all()
    assert (r.heldout_nll2_micro > 0).all()
    docs = load_table(spark, sf_dir, "documents")
    expect = {
        row.source
        for row in docs.filter(
            (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a")
            & (F.size(tokens(F.col("text"))) >= 2)
        )
        .select("source")
        .distinct()
        .collect()
    }
    assert set(r.source) == expect


def test_association_rule_laws(spark, sf_dir):
    """Support can never exceed either item support, confidences are
    PPM-bounded, and lift relates to confidence by the integer identity
    lift = conf(a->b) * N / sup(b) (checked within truncation slack)."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        basket_association_rules,
    )

    r = basket_association_rules(spark, sf_dir).toPandas()
    assert len(r) > 0
    assert (r.support <= r[["sup_a", "sup_b"]].min(axis=1)).all()
    assert ((r.conf_ab_ppm > 0) & (r.conf_ab_ppm <= 1_000_000)).all()
    assert ((r.conf_ba_ppm > 0) & (r.conf_ba_ppm <= 1_000_000)).all()
    n_b = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey").distinct().count()
    )
    exact = r.support * n_b * 1_000_000 // (r.sup_a * r.sup_b)
    assert (r.lift_ppm == exact).all()


def test_rfm_quintiles_partition_customers(spark, sf_dir):
    """Every scored customer lands in exactly one quintile per axis, the
    five buckets are balanced to within one, and a higher r_score never
    pairs with a strictly larger recency among untied values."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        customer_rfm_segments,
    )

    r = customer_rfm_segments(spark, sf_dir).toPandas()
    n = len(r)
    for col in ("r_score", "f_score", "m_score"):
        sizes = r[col].value_counts()
        assert set(sizes.index) <= {1, 2, 3, 4, 5}
        assert sizes.max() - sizes.min() <= 1, (col, sizes)
    assert r.o_custkey.is_unique
    hi = r[r.r_score == 5].recency_days.max()
    lo = r[r.r_score == 1].recency_days.min()
    assert hi <= lo, "score-5 customers must be at least as recent as score-1"
    assert ((r.rfm_code >= 111) & (r.rfm_code <= 555)).all()
    assert n == load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()


def test_cohort_matrix_conserves_orders_and_revenue(spark, sf_dir):
    """Cell n_orders and revenue must sum to the orders table's totals,
    offset 0 exists for every cohort, and offsets are non-negative."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import cohort_monthly_ltv

    m = cohort_monthly_ltv(spark, sf_dir).toPandas()
    o = load_table(spark, sf_dir, "orders").select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("cents"),
    ).collect()[0]
    assert m.n_orders.sum() == o.n
    assert m.revenue_cents.sum() == o.cents
    assert (m.month_offset >= 0).all()
    cohorts = m.groupby(["cohort_year", "cohort_month"]).month_offset.min()
    assert (cohorts == 0).all(), "every cohort starts at offset 0"


def test_weighted_sample_favors_heavy_docs(spark, sf_dir):
    """A-ES law: exactly K rows per source (when the source has >= K docs)
    and the sampled docs' mean weight exceeds the population mean — the
    whole point of weighting by length."""
    from cdc_postgresql_clickhouse_spark.queries.training import (
        WSAMPLE_K,
        corpus_weighted_sample,
    )

    s = corpus_weighted_sample(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").toPandas()
    pop = docs.groupby("source")["n_chars"].agg(["mean", "count"])
    per = s.groupby("source").agg(n=("rank", "size"), mean_w=("weight_chars", "mean"))
    heavier = 0
    for src, row in per.iterrows():
        assert row.n == min(WSAMPLE_K, pop.loc[src, "count"])
        if row.mean_w > pop.loc[src, "mean"]:
            heavier += 1
    # weighting must show: most strata sample heavier-than-average docs
    assert heavier >= len(per) * 0.6, (heavier, len(per))


def test_truncation_report_accounting(spark, sf_dir):
    """Every sampled query contributes exactly 5 pairs per dim, hits are
    bounded by pairs, and exactly the configured dims report."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        TRUNC_DIMS,
        ann_dim_truncation_report,
    )

    r = ann_dim_truncation_report(spark, sf_dir).toPandas().set_index("dim")
    assert sorted(r.index) == sorted(TRUNC_DIMS)
    assert (r.n_pairs == r.n_queries * 5).all()
    assert ((r.n_hits >= 0) & (r.n_hits <= r.n_pairs)).all()
    assert ((r.recall_ppm >= 0) & (r.recall_ppm <= 1_000_000)).all()


def test_kmv_intersect_bounds_and_error(spark, sf_dir):
    """Sketch accounting: common members never exceed the union sketch,
    and the estimate lands within 60% relative error of the exact
    intersection for non-trivial overlaps (k=64 gives ~12% typical)."""
    from cdc_postgresql_clickhouse_spark.queries.sketches import sketch_kmv_intersect

    r = sketch_kmv_intersect(spark, sf_dir).toPandas()
    assert len(r) > 0
    assert (r.n_common <= r.n_tracked).all()
    assert (r.kmv_intersect_estimate >= 0).all()
    big = r[r.n_exact_intersect >= 15]
    assert len(big) > 0, "fixture has no overlapping type pairs"
    rel = (big.kmv_intersect_estimate - big.n_exact_intersect).abs() / big.n_exact_intersect
    assert (rel <= 0.6).all(), rel.max()


def test_backlog_conservation_laws(spark, sf_dir):
    """Flow conservation: final cum_placed equals the orders count, final
    cum_shipped equals orders with any lineitem, backlog is their
    difference and never negative before... backlog CAN be negative only
    if an order ships before it exists — assert it never is. The grid is
    dense (consecutive day indexes)."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        orders_backlog_timeseries,
    )

    b = orders_backlog_timeseries(spark, sf_dir).toPandas().sort_values("day_index")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    assert b.cum_placed.iloc[-1] == o.count()
    assert b.cum_shipped.iloc[-1] == li.select("l_orderkey").distinct().count()
    assert (b.backlog == b.cum_placed - b.cum_shipped).all()
    assert (b.backlog >= 0).all(), "an order shipped before it was placed"
    d = b.day_index.to_numpy()
    assert ((d[1:] - d[:-1]) == 1).all(), "grid must be dense"


def test_cms_join_size_one_sided(spark, sf_dir):
    """CMS inner product can only OVERestimate (colliding cells add
    non-negative mass), and the overshoot obeys the analysis: expected
    collision mass per row is ~|A|·|B|/w, so the min over rows must stay
    within a small multiple of that (Cormode-Muthukrishnan Thm 3 shape;
    2x covers the fixed-hash realization on every shipped SF)."""
    from cdc_postgresql_clickhouse_spark.queries.sketches import (
        CMS_WIDTH,
        sketch_cms_join_size,
    )

    r = sketch_cms_join_size(spark, sf_dir).collect()[0]
    assert r.exact_join_size > 0, "fixture keys must overlap"
    assert r.cms_join_estimate >= r.exact_join_size
    assert r.overshoot_ppm >= 0
    tot_a = load_table(spark, sf_dir, "events").count()
    tot_b = load_table(spark, sf_dir, "orders").count()
    bound = 2 * tot_a * tot_b // CMS_WIDTH
    assert r.cms_join_estimate - r.exact_join_size <= bound, (
        r.cms_join_estimate, r.exact_join_size, bound,
    )


def test_hits_normalization_and_positivity(spark, sf_dir):
    """Each HITS vector is L1-normalized to ~SCALE nano-units (within
    per-node truncation slack) and strictly positive on this strongly
    connected transition graph."""
    from cdc_postgresql_clickhouse_spark.queries.graph import (
        HITS_SCALE,
        graph_hits_types,
    )

    r = graph_hits_types(spark, sf_dir).toPandas()
    n = len(r)
    assert n >= 2
    assert (r.authority_nano > 0).all() and (r.hub_nano > 0).all()
    # renormalization divides by (S div SCALE): result sums to ~SCALE with
    # slack from both truncations, bounded by n + SCALE/(S div SCALE) terms
    for col in ("authority_nano", "hub_nano"):
        total = r[col].sum()
        assert abs(total - HITS_SCALE) <= HITS_SCALE * 0.01, (col, total)


def test_centroid_drift_bounds(spark, sf_dir):
    """max component shift bounds the total: max^2 <= drift_sq <= DIM*max^2;
    split sizes per label sum to the label's vector count."""
    from cdc_postgresql_clickhouse_spark.queries.pca import (
        PCA_DIM,
        embedding_centroid_drift,
    )

    r = embedding_centroid_drift(spark, sf_dir).toPandas()
    assert len(r) > 0
    assert (r.max_shift_milli ** 2 <= r.drift_sq_milli2).all()
    assert (r.drift_sq_milli2 <= PCA_DIM * r.max_shift_milli ** 2).all()
    counts = {
        row.label: row.n
        for row in load_table(spark, sf_dir, "embeddings")
        .groupBy(F.col("label").cast("long").alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for _, row in r.iterrows():
        assert row.n_train + row.n_val == counts[row.label]


def test_seasonal_anomaly_vs_raw_mad(spark, sf_dir):
    """Residualizing cannot invent events: per-type counts equal the raw
    MAD row's, and anomaly counts stay bounded by n_events."""
    from cdc_postgresql_clickhouse_spark.queries.sketches import (
        events_anomaly_mad,
        events_anomaly_seasonal,
    )

    s = events_anomaly_seasonal(spark, sf_dir).toPandas().set_index("event_type")
    m = events_anomaly_mad(spark, sf_dir).toPandas().set_index("event_type")
    assert sorted(s.index) == sorted(m.index)
    assert (s.n_events == m.n_events.reindex(s.index)).all()
    assert ((s.n_anomalies >= 0) & (s.n_anomalies <= s.n_events)).all()
    assert (s.resid_mad_qcents >= 0).all()


def test_zipf_fit_laws(spark, sf_dir):
    """Frequencies fall with rank, so the fitted slope is positive; R^2 is
    PPM-bounded; rank counts respect the cap; every source reports."""
    from cdc_postgresql_clickhouse_spark.queries.text_ext import (
        ZIPF_TOPN,
        text_zipf_fit,
    )

    r = text_zipf_fit(spark, sf_dir).toPandas()
    srcs = {
        row.source
        for row in load_table(spark, sf_dir, "documents").select("source").distinct().collect()
    }
    assert set(r.source) == srcs
    assert (r.zipf_slope_ppm > 0).all()
    assert ((r.fit_r2_ppm >= 0) & (r.fit_r2_ppm <= 1_000_000)).all()
    assert (r.n_ranks <= ZIPF_TOPN).all() and (r.n_ranks >= 3).all()


def test_toast_carryforward_semantics(spark, sf_dir):
    """Replay the carry-forward in Python per user: the effective last
    value must be the most recent REAL (non-placeholder) value in change
    order, and the placeholder share must be the planted ~1/7."""
    from cdc_postgresql_clickhouse_spark.queries.cdc import (
        TOAST_PLACEHOLDER,
        cdc_toast_carryforward,
    )

    out = {r.user_id: r for r in cdc_toast_carryforward(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .collect()
    )
    from collections import defaultdict

    streams = defaultdict(list)
    for r in ev:
        streams[r.user_id].append((r.us, r.event_id, r.c))
    assert set(out) == set(streams)
    total_ph = total = 0
    for u, rows in streams.items():
        rows.sort()
        eff, n_ph = None, 0
        for _, eid, c in rows:
            if eid % 7 == 2:
                n_ph += 1  # placeholder: eff unchanged (carry-forward)
            else:
                eff = c
        last_is_ph = rows[-1][1] % 7 == 2
        got = out[u]
        assert got.n_changes == len(rows)
        assert got.n_placeholders == n_ph
        assert got.last_cents_effective == eff, u
        assert got.last_was_carried == int(last_is_ph)
        total_ph += n_ph
        total += len(rows)
    assert 0.10 <= total_ph / total <= 0.18  # ~1/7 planted


def test_survivor_policy_laws(spark, sf_dir):
    """Both survivors belong to their cluster's doc set, keep-longest
    retains at least as many characters as keep-min, and policies_differ
    is exactly the id inequality."""
    from cdc_postgresql_clickhouse_spark.queries.cluster import (
        dedup_cluster_canonical,
        dedup_survivor_policy,
    )

    r = dedup_survivor_policy(spark, sf_dir).toPandas()
    assert len(r) > 0
    assert (r.longest_survivor_chars >= r.min_survivor_chars).all()
    assert (r.policies_differ == (r.survivor_min_id != r.survivor_longest_id)).all()
    canon = dedup_cluster_canonical(spark, sf_dir).toPandas()
    members = canon.groupby("canonical_id").doc_id.apply(set)
    for _, row in r.iterrows():
        assert row.survivor_min_id in members[row.cluster_id]
        assert row.survivor_longest_id in members[row.cluster_id]
        assert row.survivor_min_id == min(members[row.cluster_id])


def test_active_users_monotone_windows(spark, sf_dir):
    """A longer trailing window can only see more users: dau <= wau <= mau
    per day, mau never exceeds the corpus's distinct users, and
    stickiness is PPM-bounded."""
    from cdc_postgresql_clickhouse_spark.queries.events import events_active_users

    r = events_active_users(spark, sf_dir).toPandas()
    assert len(r) > 0
    assert (r.dau <= r.wau).all() and (r.wau <= r.mau).all()
    total = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert (r.mau <= total).all()
    assert ((r.stickiness_ppm >= 0) & (r.stickiness_ppm <= 1_000_000)).all()
    d = r.day_index.sort_values().to_numpy()
    assert ((d[1:] - d[:-1]) == 1).all(), "grid must be dense"


def test_reorder_histogram_conserves_gaps(spark, sf_dir):
    """Every consecutive-order gap lands in exactly one bin: bin counts
    sum to (orders - customers-with-orders), bins respect the cap, and
    bin ranges nest correctly."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        REORDER_BIN_DAYS,
        REORDER_CAP,
        orders_reorder_intervals,
    )

    r = orders_reorder_intervals(spark, sf_dir).toPandas()
    o = load_table(spark, sf_dir, "orders")
    n_orders = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    assert r.n_gaps.sum() == n_orders - n_cust
    assert ((r.week_bin >= 0) & (r.week_bin <= REORDER_CAP)).all()
    closed = r[r.week_bin < REORDER_CAP]
    assert (closed.min_gap_days >= closed.week_bin * REORDER_BIN_DAYS).all()
    assert (closed.max_gap_days < (closed.week_bin + 1) * REORDER_BIN_DAYS).all()


def test_session_pairs_bounds(spark, sf_dir):
    """Pair support cannot exceed either type's session membership,
    confidence is PPM-bounded, and lift is symmetric under the pair
    orientation (recomputed from the row's own columns)."""
    from cdc_postgresql_clickhouse_spark.queries.events import (
        events_session_type_pairs,
    )

    r = events_session_type_pairs(spark, sf_dir).toPandas()
    assert len(r) > 0
    assert (r.support <= r[["n_a", "n_b"]].min(axis=1)).all()
    assert ((r.conf_ab_ppm > 0) & (r.conf_ab_ppm <= 1_000_000)).all()
    assert (r.lift_ppm > 0).all()


def test_interaction_cells_partition_docs(spark, sf_dir):
    """The 2x2 cells partition the corpus: doc and token totals match the
    gate's, and the duplicate marginal matches the cluster table's
    non-canonical count."""
    from cdc_postgresql_clickhouse_spark.queries.cluster import (
        dedup_cluster_canonical,
    )
    from cdc_postgresql_clickhouse_spark.queries.quality import (
        quality_dedup_interaction,
        quality_gopher_rules,
    )

    r = quality_dedup_interaction(spark, sf_dir).toPandas()
    gate = quality_gopher_rules(spark, sf_dir).toPandas()
    assert r.n_docs.sum() == len(gate)
    assert r.n_tokens.sum() == gate.n_words.sum()
    assert r[r.pass_quality == 1].n_docs.sum() == (gate.pass_quality == 1).sum()
    canon = dedup_cluster_canonical(spark, sf_dir).toPandas()
    # the cluster table also contains the SYNTHESIZED near-dup twins the
    # LSH fixture plants (doc_id + 1e6) — the contingency is at real-doc
    # grain, so restrict the marginal to ids present in documents
    real = set(gate.doc_id)
    real_dups = canon[~canon.is_canonical & canon.doc_id.isin(real)]
    assert r[r.is_dup == 1].n_docs.sum() == len(real_dups)


def test_prefix_filter_is_complete_vs_bruteforce(spark, sf_dir):
    """The prefix-filtered join must find EXACTLY the pairs a brute-force
    all-pairs shingle-set Jaccard >= 3/5 finds — zero false negatives is
    the pigeonhole guarantee PPJoin exists to provide, and the planted
    near-dup twins must all be among them."""
    from cdc_postgresql_clickhouse_spark.queries.dedup import (
        NEARDUP_IDS,
        dedup_jaccard_prefix_filter,
        _corpus,
    )
    from cdc_postgresql_clickhouse_spark.functions.text import tokens, word_shingles

    sets = {
        r.doc_id: set(r.shs)
        for r in _corpus(spark, sf_dir)
        .select(
            "doc_id",
            F.array_distinct(word_shingles(tokens(F.col("text")), 3)).alias("shs"),
        )
        .collect()
        if r.shs
    }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j_ppm = inter * 1_000_000 // (len(sets[a]) + len(sets[b]) - inter)
            if j_ppm >= 600_000:
                want[(a, b)] = (inter, j_ppm)
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.jaccard_ppm)
        for r in dedup_jaccard_prefix_filter(spark, sf_dir).collect()
    }
    assert got == want
    twins = {(d, d + 1_000_000) for d in range(NEARDUP_IDS) if d in sets}
    assert twins <= set(got), "planted twins must all be found"


def test_gap_report_accounting(spark, sf_dir):
    """Chunk spans tile the observed sequence exactly, received+missing
    conserves per chunk, and total missing equals the planted drop count
    (every id congruent 13 mod 97)."""
    from cdc_postgresql_clickhouse_spark.queries.cdc import (
        GAP_DROP_MOD,
        GAP_DROP_RESIDUE,
        cdc_sequence_gap_report,
    )

    r = cdc_sequence_gap_report(spark, sf_dir).toPandas().sort_values("chunk_id")
    ids = [
        row.event_id
        for row in load_table(spark, sf_dir, "events").select("event_id").collect()
    ]
    gmin, gmax = min(ids), max(ids)
    assert r.span_lo.iloc[0] == gmin and r.span_hi.iloc[-1] == gmax
    assert (r.span_lo.iloc[1:].to_numpy() == r.span_hi.iloc[:-1].to_numpy() + 1).all()
    assert ((r.span_hi - r.span_lo + 1) == r.n_received + r.n_missing).all()
    planted = sum(1 for i in ids if i % GAP_DROP_MOD == GAP_DROP_RESIDUE)
    assert r.n_missing.sum() == planted > 0


def test_stratified_split_exactness(spark, sf_dir):
    """Per source: the three splits partition the docs, train gets exactly
    floor(0.8n), train+val exactly floor(0.9n), and token mass conserves
    against the corpus total."""
    from cdc_postgresql_clickhouse_spark.functions.text import tokens
    from cdc_postgresql_clickhouse_spark.queries.training import (
        corpus_stratified_split,
    )

    r = corpus_stratified_split(spark, sf_dir).toPandas()
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.size(tokens(F.col("text"))).alias("ntok"))
        .toPandas()
    )
    pop = docs.groupby("source").agg(n=("ntok", "size"), tok=("ntok", "sum"))
    for src, grp in r.groupby("source"):
        g = grp.set_index("split")
        n = pop.loc[src, "n"]
        assert g.n_docs.sum() == n
        assert g.loc["train", "n_docs"] == 8 * n // 10
        assert g.loc["train", "n_docs"] + g.loc["val", "n_docs"] == 9 * n // 10
        assert g.n_tokens.sum() == pop.loc[src, "tok"]
    assert r.n_docs.sum() == len(docs)


def test_twap_matches_python_replay(spark, sf_dir):
    """The windowed TWAP equals the per-user holding-time replay: weights
    are the seconds to the next event, the last event carries none, and
    zero-total-duration users are absent."""
    from collections import defaultdict

    from cdc_postgresql_clickhouse_spark.queries.events import events_twap

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .collect()
    )
    streams = defaultdict(list)
    for r in ev:
        streams[r.user_id].append((r.es, r.event_id, r.c))
    got = {r.user_id: r for r in events_twap(spark, sf_dir).collect()}
    seen = set()
    for u, rows in streams.items():
        rows.sort()
        tot = wsum = 0
        for (e1, _, c1), (e2, _, _) in zip(rows, rows[1:]):
            tot += e2 - e1
            wsum += (e2 - e1) * c1
        if tot == 0:
            assert u not in got
            continue
        seen.add(u)
        r = got[u]
        assert (r.n_intervals, r.total_dur_s) == (len(rows) - 1, tot), u
        assert r.twap_cents == wsum // tot, u
    assert set(got) == seen


def test_ks_matches_python_replay(spark, sf_dir):
    """Every source pair reports once, D is PPM-bounded, and the integer
    cross-multiplied statistic equals the textbook max-CDF-gap replayed
    in Python over the pooled support."""
    from collections import defaultdict

    from cdc_postgresql_clickhouse_spark.queries.quality import quality_ks_length_test

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars").collect()
    by_src = defaultdict(list)
    for r in docs:
        by_src[r.source].append(r.n_chars)
    got = {(r.s_a, r.s_b): r for r in quality_ks_length_test(spark, sf_dir).collect()}
    srcs = sorted(by_src)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    for (a, b), r in got.items():
        xs, ys = sorted(by_src[a]), sorted(by_src[b])
        na, nb = len(xs), len(ys)
        support = sorted(set(xs) | set(ys))
        d = 0
        import bisect

        for v in support:
            ca = bisect.bisect_right(xs, v)
            cb = bisect.bisect_right(ys, v)
            d = max(d, abs(ca * nb - cb * na))
        assert (r.n_a, r.n_b) == (na, nb)
        assert r.ks_d_ppm == d * 1_000_000 // (na * nb), (a, b)
        assert 0 <= r.ks_d_ppm <= 1_000_000


def test_source_overlap_bounds(spark, sf_dir):
    """Shared shingles never exceed either source's set, containment
    dominates Jaccard, both are PPM-bounded, and every reported pair is
    ordered."""
    from cdc_postgresql_clickhouse_spark.queries.training import corpus_source_overlap

    r = corpus_source_overlap(spark, sf_dir).toPandas()
    assert len(r) > 0
    assert (r.source_a < r.source_b).all()
    assert (r.n_shared <= r[["m_a", "m_b"]].min(axis=1)).all()
    assert (r.jaccard_ppm <= r.containment_ppm).all()
    assert ((r.jaccard_ppm >= 0) & (r.containment_ppm <= 1_000_000)).all()


def test_rake_matches_python_reference(spark, sf_dir):
    """The relational RAKE equals the textbook per-document algorithm
    replayed in Python (phrase split at stopwords, deg/freq word scores
    in integer micro-units, top phrase with deterministic ties), for
    every document."""
    from collections import Counter, defaultdict

    from cdc_postgresql_clickhouse_spark.functions.text import STOPWORDS, tokens
    from cdc_postgresql_clickhouse_spark.queries.text_ext import text_rake_keywords

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .collect()
    )
    stop = set(STOPWORDS)
    got = {r.doc_id: r for r in text_rake_keywords(spark, sf_dir).collect()}
    for d in docs:
        phrases, cur = [], []
        for tk in d.t:
            if tk in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(tk)
        if cur:
            phrases.append(cur)
        if not phrases:
            assert d.doc_id not in got
            continue
        deg: Counter = Counter()
        freq: Counter = Counter()
        for p in phrases:
            for tk in p:
                deg[tk] += len(p)
                freq[tk] += 1
        w_micro = {tk: deg[tk] * 1_000_000 // freq[tk] for tk in deg}
        scored = [(sum(w_micro[tk] for tk in p), " ".join(p)) for p in phrases]
        top_score = max(s for s, _ in scored)
        # ties to lexicographically smallest phrase
        top_phrase = min(p for s, p in scored if s == top_score)
        r = got[d.doc_id]
        assert r.n_phrases == len(phrases), d.doc_id
        assert (r.top_phrase, r.top_score_micro) == (top_phrase, top_score), d.doc_id


def test_markov_accuracy_is_modal_share(spark, sf_dir):
    """The chain's in-sample accuracy per state is exactly the modal
    destination's share: replay the lag pairs in Python, recompute the
    mode (ties to smallest destination), and match every column; totals
    must conserve (transitions = events - users)."""
    from collections import Counter, defaultdict

    from cdc_postgresql_clickhouse_spark.queries.events import events_markov_accuracy

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in ev:
        streams[r.user_id].append((r.us, r.event_id, r.event_type))
    trans: dict = defaultdict(Counter)
    for rows in streams.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            trans[a][b] += 1
    got = {r.event_type: r for r in events_markov_accuracy(spark, sf_dir).collect()}
    assert set(got) == set(trans)
    for src, ctr in trans.items():
        top = min(ctr, key=lambda d: (-ctr[d], d))
        n = sum(ctr.values())
        r = got[src]
        assert (r.n_transitions, r.n_destinations) == (n, len(ctr))
        assert (r.top_next, r.n_correct) == (top, ctr[top]), src
        assert r.accuracy_ppm == ctr[top] * 1_000_000 // n
    assert sum(r.n_transitions for r in got.values()) == len(ev) - len(streams)


def test_autocorr_matches_python_and_bounds(spark, sf_dir):
    """The sufficient statistics replayed in Python over the dense daily
    grid reproduce every output column (including the floored IEEE
    sqrt/divide tail), and Cauchy-Schwarz bounds rho in [-1000, 1000]."""
    import math
    from collections import Counter

    from cdc_postgresql_clickhouse_spark.queries.events import (
        ACF_LAGS,
        events_autocorr_daily,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 86400").alias("d"),
        )
        .collect()
    )
    counts: Counter = Counter((r.event_type, r.d) for r in ev)
    lo, hi = min(r.d for r in ev), max(r.d for r in ev)
    types = {r.event_type for r in ev}
    got = {
        (r.event_type, r.lag): r for r in events_autocorr_daily(spark, sf_dir).collect()
    }
    assert set(got) == {(t, k) for t in types for k in ACF_LAGS}
    for t in types:
        series = [counts.get((t, d), 0) for d in range(lo, hi + 1)]
        for k in ACF_LAGS:
            xs, ys = series[:-k], series[k:]
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxx = sum(x * x for x in xs)
            syy = sum(y * y for y in ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            num = n * sxy - sx * sy
            d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
            rho = (
                math.floor(float(num) * 1000.0 / math.sqrt(float(d1) * float(d2)))
                if d1 > 0 and d2 > 0
                else 0
            )
            r = got[(t, k)]
            assert (r.n_pairs, r.acf_num, r.var_x, r.var_y) == (n, num, d1, d2), (t, k)
            assert r.rho_milli == rho, (t, k)
            assert -1000 <= r.rho_milli <= 1000


def test_expectations_accounting_laws(spark, sf_dir):
    """passed is exactly (n_violations == 0), violations never exceed the
    table's row count, every check's n_rows equals the real table count,
    and the one deliberately-failing expectation is the ONLY red row on
    this corpus — TPC-H referential integrity must hold."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_ext import (
        validation_expectations_report,
    )

    r = validation_expectations_report(spark, sf_dir).toPandas()
    assert (r.passed == (r.n_violations == 0).astype(int)).all()
    assert ((r.n_violations >= 0) & (r.n_violations <= r.n_rows)).all()
    for t in r.table_name.unique():
        n = load_table(spark, sf_dir, t).count()
        assert (r[r.table_name == t].n_rows == n).all(), t
    failing = set(r[r.passed == 0].check_id)
    assert failing == {"orders_orderdate_before_2000"}, failing
    assert r[r.check_id == "orders_orderdate_before_2000"].n_violations.iloc[0] > 0


def test_gini_matches_pandas_and_bounds(spark, sf_dir):
    """The integer-PPM Gini equals the textbook rank formula computed in
    Python (within the two truncating divisions' slack of 2 ppm), and is
    bounded in [0, 1e6)."""
    from cdc_postgresql_clickhouse_spark.functions.text import tokens
    from cdc_postgresql_clickhouse_spark.queries.training import corpus_token_gini

    r = corpus_token_gini(spark, sf_dir).toPandas().set_index("source")
    assert ((r.gini_ppm >= 0) & (r.gini_ppm < 1_000_000)).all()
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "doc_id", F.size(tokens(F.col("text"))).alias("x"))
        .toPandas()
    )
    for src, grp in docs.groupby("source"):
        xs = sorted(grp.x)
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        want = 2 * six * 1_000_000 // (n * sx) - (n + 1) * 1_000_000 // n
        assert abs(r.loc[src, "gini_ppm"] - want) <= 2, src
