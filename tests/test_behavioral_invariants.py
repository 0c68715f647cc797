"""Structural invariants of the behavioral-analytics operators — laws the
oracle hash-match can't express (it checks values; these check the algebra
of the result as a whole)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.cdc import cdc_scd2_history
from cdc_postgresql_clickhouse_spark.queries.funnel import (
    funnel_windowed,
    retention_weekly,
    sequence_match_clean_purchase,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_scd2_intervals_partition_each_key_timeline(spark, sf_dir):
    """Per key: exactly one open (current) interval; every closed interval's
    valid_to equals the next interval's valid_from (no gaps, no overlaps);
    row count equals the raw change count (nothing dropped or invented)."""
    out = cdc_scd2_history(spark, sf_dir).toPandas()
    ev_n = load_table(spark, sf_dir, "events").count()
    assert len(out) == ev_n
    assert (out.groupby("user_id")["is_current"].sum() == 1).all()
    for _, g in out.groupby("user_id"):
        g = g.sort_values(["valid_from_es", "event_id"]).reset_index(drop=True)
        nxt = g["valid_from_es"].shift(-1)
        closed = g["valid_to_es"].notna()
        # chain law: each closed interval hands off exactly where the next begins
        assert (g.loc[closed, "valid_to_es"] == nxt[closed]).all()
        assert pd.isna(g["valid_to_es"].iloc[-1])


def test_funnel_level_consistent_with_sequence_match(spark, sf_dir):
    """Algebraic cross-check between two independent operators: any user at
    funnel level >= 1 has a first_view timestamp in the sequence-match
    output, and a level-0 user has none."""
    lv = funnel_windowed(spark, sf_dir).toPandas().set_index("user_id")["funnel_level"]
    sm = sequence_match_clean_purchase(spark, sf_dir).toPandas().set_index("user_id")
    joined = sm.join(lv)
    has_view = joined["first_view_es"].notna()
    assert ((joined["funnel_level"] >= 1) == has_view).all()


def test_retention_week_zero_counts_whole_cohort(spark, sf_dir):
    """retention law: offset-0 count per cohort equals the cohort's size
    (every user is active in their own first week), and total cohort sizes
    sum to the distinct-user count."""
    r = retention_weekly(spark, sf_dir).toPandas()
    week0 = r[r.week_offset == 0].set_index("cohort_week")["n_users"]
    users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0.sum() == users
    # no offset cell can exceed its cohort's week-0 size
    for _, row in r.iterrows():
        assert row["n_users"] <= week0[row["cohort_week"]]


def test_funnel_level_monotone_under_event_removal(spark, sf_dir):
    """Removing all 'purchase' events can only lower (never raise) a user's
    funnel level, and caps it at 2 — the monotonicity law of windowed
    funnels under event-stream thinning."""
    full = funnel_windowed(spark, sf_dir).toPandas().set_index("user_id")["funnel_level"]

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") != "purchase")
    view = "events_no_purchase_src"
    ev.createOrReplaceTempView(view)

    # rebuild the funnel over the thinned stream by monkey-patching the load
    import cdc_postgresql_clickhouse_spark.queries.funnel as fq

    orig = fq.load_table
    fq.load_table = lambda s, d, t: s.table(view) if t == "events" else orig(s, d, t)
    try:
        thinned = funnel_windowed(spark, sf_dir).toPandas().set_index("user_id")["funnel_level"]
    finally:
        fq.load_table = orig

    j = pd.concat({"full": full, "thinned": thinned}, axis=1)
    assert (j["thinned"] <= j["full"]).all()
    assert (j["thinned"] <= 2).all()


def test_gapfill_grid_is_dense_and_mass_preserving(spark, sf_dir):
    """Per type the grid is contiguous ((hi-lo)/60 + 1 rows) and the filled
    series preserves total event mass — zeros added, nothing dropped."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.events import events_minute_gapfill
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    out = events_minute_gapfill(spark, sf_dir).cache()
    per_type = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        ((F.max("minute_start") - F.min("minute_start")) / 60 + 1).cast("long").alias("span"),
        F.sum("n_events").alias("n_events"),
    ).collect()
    totals = {
        r.event_type: r.cnt
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in per_type:
        assert r.n_rows == r.span, (r.event_type, r.n_rows, r.span)
        assert r.n_events == totals[r.event_type]


def test_locf_carries_last_observation_and_never_regresses_to_null(spark, sf_dir):
    """Forward fill: every grid row has a value (row 1 is an observation by
    grid construction), observed minutes show their own latest-event value,
    and a silent minute equals the previous minute's filled value."""
    from pyspark.sql import Window, functions as F

    from cdc_postgresql_clickhouse_spark.queries.events import events_minute_locf

    out = events_minute_locf(spark, sf_dir).cache()
    assert out.filter(F.col("filled_value").isNull()).count() == 0
    w = Window.partitionBy("event_type").orderBy("minute_start")
    with_prev = out.withColumn("prev", F.lag("filled_value").over(w))
    silent_changed = with_prev.filter(
        (F.col("n_events") == 0) & (F.col("prev").isNotNull())
        & (F.col("filled_value") != F.col("prev"))
    ).count()
    assert silent_changed == 0


def test_threshold_sweep_is_monotone_and_anchored(spark, sf_dir):
    """Raising the cutoff can only shed docs/tokens; every grid row appears
    even if nothing passes (left-join zero path), and shares are PPM-exact."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.quality import (
        SWEEP_MIN_WORDS,
        quality_threshold_sweep,
    )

    rows = {r.min_words: r for r in quality_threshold_sweep(spark, sf_dir).collect()}
    assert set(rows) == set(SWEEP_MIN_WORDS)
    ordered = [rows[t] for t in sorted(rows)]
    for a, b in zip(ordered, ordered[1:]):
        assert a.n_docs_kept >= b.n_docs_kept
        assert a.tokens_kept >= b.tokens_kept
        assert a.tokens_share_ppm >= b.tokens_share_ppm
    for r in ordered:
        assert 0 <= r.tokens_share_ppm <= 1_000_000
        assert r.n_docs_total == ordered[0].n_docs_total


def test_histogram_partitions_mass_and_bounds(spark, sf_dir):
    """Histogram laws: per type, bucket counts sum to the event count, mass
    sums to the total cents, every bucket index is in [0, NB), and every
    bucket's value range nests inside [lo_edge, hi_edge]."""
    from cdc_postgresql_clickhouse_spark.queries.events import (
        HIST_BUCKETS,
        events_histogram_equi,
    )

    h = events_histogram_equi(spark, sf_dir).toPandas()
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("mass"))
        .toPandas()
        .set_index("event_type")
    )
    assert ((h.bucket >= 0) & (h.bucket < HIST_BUCKETS)).all()
    g = h.groupby("event_type")[["n_events", "mass_cents"]].sum()
    ev = ev.reindex(g.index)
    assert (g["n_events"] == ev["n"]).all()
    assert (g["mass_cents"] == ev["mass"]).all()
    assert (h.bucket_hi_cents >= h.bucket_lo_cents).all()


def test_winsorized_mean_between_fences_and_bounded_by_raw(spark, sf_dir):
    """Winsorize laws: p10 <= p90, the winsorized mean lies inside the
    fences, and the winsorized sum never exceeds the raw sum when the raw
    max exceeds the upper fence (clamping can only pull inward)."""
    from cdc_postgresql_clickhouse_spark.queries.events import events_winsorized_stats

    w = events_winsorized_stats(spark, sf_dir).toPandas()
    assert (w.p10_cents <= w.p90_cents).all()
    mean_c = w.winsorized_mean_microcents / 1_000_000
    assert ((mean_c >= w.p10_cents - 1) & (mean_c <= w.p90_cents + 1)).all()


def test_degree_profile_mass_conservation(spark, sf_dir):
    """Graph law: total out-mass == total in-mass == number of transitions,
    and a node's degree is bounded by the node count."""
    from cdc_postgresql_clickhouse_spark.queries.graph import graph_degree_profile

    d = graph_degree_profile(spark, sf_dir).toPandas()
    assert d.out_mass.sum() == d.in_mass.sum()
    n = len(d)
    assert (d.out_deg <= n).all() and (d.in_deg <= n).all()


def test_length_pareto_partitions_corpus_and_concentrates_mass(spark, sf_dir):
    """Pareto laws: all 10 deciles present; doc counts sum to the corpus
    size; char mass sums to total; cumulative share ends at exactly 1e6 ppm
    and is monotone; the top decile's mean length >= the bottom decile's
    (descending-length ranking actually ranked)."""
    from cdc_postgresql_clickhouse_spark.queries.corpus import corpus_length_pareto

    p = corpus_length_pareto(spark, sf_dir).toPandas().sort_values("decile")
    docs = load_table(spark, sf_dir, "documents")
    n, total = docs.count(), docs.agg(F.sum("n_chars")).first()[0]
    assert list(p.decile) == list(range(10))
    assert p.n_docs.sum() == n
    assert p.chars.sum() == total
    assert p.cum_share_ppm.iloc[-1] == 1_000_000
    assert p.cum_share_ppm.is_monotonic_increasing
    mean0 = p.chars.iloc[0] / p.n_docs.iloc[0]
    mean9 = p.chars.iloc[-1] / p.n_docs.iloc[-1]
    assert mean0 >= mean9


def test_readability_bounds_and_coverage(spark, sf_dir):
    """Every document is scored, the score never exceeds the formula's
    206.835 ceiling (in micro-units), and a doc with more syllables per
    word than another — same words/sentence — scores lower."""
    from cdc_postgresql_clickhouse_spark.queries.quality import text_readability

    r = text_readability(spark, sf_dir).toPandas()
    assert len(r) == load_table(spark, sf_dir, "documents").count()
    assert (r.flesch_micro <= 206_835_000).all()
    assert (r.words >= 1).all() and (r.sentences >= 1).all() and (r.syllables >= 1).all()


def test_vocab_growth_monotone_and_anchored_at_corpus_totals(spark, sf_dir):
    """Heaps-curve laws: all three series are monotone non-decreasing and the
    final checkpoint equals the exact corpus totals (docs, tokens, distinct
    words) — the prefix construction loses nothing."""
    from cdc_postgresql_clickhouse_spark.functions.text import tokens as _toks
    from cdc_postgresql_clickhouse_spark.queries.corpus import corpus_vocab_growth

    g = corpus_vocab_growth(spark, sf_dir).toPandas().sort_values("checkpoint")
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    tot = docs.select(F.size(_toks(F.col("text"))).alias("k")).agg(F.sum("k")).first()[0]
    vocab = docs.select(F.explode(_toks(F.col("text"))).alias("t")).agg(
        F.count_distinct("t")
    ).first()[0]
    for c in ("n_docs", "n_tokens", "vocab_size"):
        assert g[c].is_monotonic_increasing
    last = g.iloc[-1]
    assert (last.n_docs, last.n_tokens, last.vocab_size) == (n, tot, vocab)


def test_bigram_logprob_covers_multitoken_docs_exactly(spark, sf_dir):
    """Every doc with >= 2 tokens appears with n_bigrams == n_tok - 1 and a
    non-negative score (add-1 smoothing keeps P < 1 whenever V > 1)."""
    from cdc_postgresql_clickhouse_spark.functions.text import tokens as _toks
    from cdc_postgresql_clickhouse_spark.queries.text_ext import text_bigram_logprob

    b = text_bigram_logprob(spark, sf_dir).toPandas().set_index("doc_id")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(_toks(F.col("text"))).alias("n_tok"))
        .toPandas()
        .set_index("doc_id")
    )
    multi = docs[docs.n_tok >= 2]
    assert set(b.index) == set(multi.index)
    assert (b.loc[multi.index, "n_bigrams"] == multi.n_tok - 1).all()
    assert (b.nll2_micro_per_bigram >= 0).all()


def test_top_paths_ranked_and_bounded_by_transition_count(spark, sf_dir):
    """Top-k laws: exactly K rows, ranks 1..K, counts non-increasing in rank,
    and the counted paths never exceed the total number of 3-windows."""
    from cdc_postgresql_clickhouse_spark.queries.events import TOP_PATHS_K, events_top_paths

    p = events_top_paths(spark, sf_dir).toPandas().sort_values("rank")
    assert list(p["rank"]) == list(range(1, TOP_PATHS_K + 1))
    assert p.n_paths.is_monotonic_decreasing
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").count().toPandas()
    total_windows = (users["count"] - 2).clip(lower=0).sum()
    assert p.n_paths.sum() <= total_windows


def test_langid_confusion_cells_partition_corpus(spark, sf_dir):
    """Confusion cells sum to the corpus size; per-cell correctness counters
    equal n_docs exactly when the guess matches the true lang and 0 when it
    doesn't (they are functions of the cell coordinates)."""
    from cdc_postgresql_clickhouse_spark.queries.text_ext import quality_langid_confusion

    c = quality_langid_confusion(spark, sf_dir).toPandas()
    assert c.n_docs.sum() == load_table(spark, sf_dir, "documents").count()
    assert (
        c.n_marker_correct == c.n_docs.where(c.marker_guess == c.lang, 0)
    ).all()
    assert (
        c.n_trigram_correct == c.n_docs.where(c.trigram_guess == c.lang, 0)
    ).all()


def test_knn_label_eval_pair_accounting(spark, sf_dir):
    """Every query contributes exactly 5 neighbor pairs; precision is PPM-
    bounded; query counts sum to the standard query-slice size."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import retrieval_label_knn_eval

    r = retrieval_label_knn_eval(spark, sf_dir).toPandas()
    assert (r.n_pairs == 5 * r.n_queries).all()
    assert ((r.precision_ppm >= 0) & (r.precision_ppm <= 1_000_000)).all()
    n_q = (
        load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 100 == 0).count()
    )
    assert r.n_queries.sum() == n_q


def test_split_leakage_covers_val_docs_with_bounded_ppm(spark, sf_dir):
    """Row set == val docs that have at least one 8-gram; leak counts are
    bounded by gram counts; ppm in [0, 1e6]."""
    from cdc_postgresql_clickhouse_spark.functions.text import tokens as _toks
    from cdc_postgresql_clickhouse_spark.queries.training import (
        DECONTAM_NGRAM,
        corpus_split_leakage_report,
    )

    r = corpus_split_leakage_report(spark, sf_dir).toPandas()
    assert (r.n_leaked <= r.n_grams).all()
    assert ((r.leak_ppm >= 0) & (r.leak_ppm <= 1_000_000)).all()
    val = (
        load_table(spark, sf_dir, "documents")
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a")
        .filter(F.size(_toks(F.col("text"))) >= DECONTAM_NGRAM)
    )
    assert set(r.doc_id) == {row.doc_id for row in val.select("doc_id").collect()}


def test_rolling_median_frame_laws(spark, sf_dir):
    """Frames are trailing and bounded: 1 <= frame_n <= W, exactly one
    frame_n == 1 row per type (the stream head), and a singleton frame's
    median is exactly twice its own value (half-cent doubling)."""
    from cdc_postgresql_clickhouse_spark.queries.events import ROLL_W, events_rolling_median

    r = events_rolling_median(spark, sf_dir).toPandas()
    assert ((r.frame_n >= 1) & (r.frame_n <= ROLL_W)).all()
    heads = r[r.frame_n == 1]
    assert (heads.groupby("event_type").size() == 1).all()
    assert (heads.rolling_median_halfcents == 2 * heads.c).all()
