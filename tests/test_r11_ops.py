"""Law tests for the round-11 operators (each also oracle-paired and swept
by test_oracle_parity): lexical richness, OOV curve, bottom-k Jaccard
sweep, SRM / CUPED / stratified uplift / Hill tail, rich-club profile,
calibration ECE, byte-dedup savings, partition advisor."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_lexical_richness_invariants(spark, sf_dir):
    """hapax + dis <= vocab <= tokens; ratios bounded; Yule's K matches a
    direct recomputation from the raw (source, token) counts."""
    from cdc_postgresql_clickhouse_spark.queries.text_ext import QUERIES as TQ
    from cdc_postgresql_clickhouse_spark.functions.text import tokens

    rows = {r["source"]: r for r in TQ["text_lexical_richness"](spark, sf_dir).collect()}
    assert rows
    raw = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("source", "t")
        .count()
        .collect()
    )
    from collections import defaultdict

    cnts = defaultdict(list)
    for r in raw:
        cnts[r["source"]].append(r["count"])
    for src, r in rows.items():
        cs = cnts[src]
        m1, v = sum(cs), len(cs)
        assert r["n_tokens"] == m1 and r["vocab_size"] == v
        assert r["n_hapax"] == sum(1 for c in cs if c == 1)
        assert r["n_hapax"] + r["n_dis"] <= v <= m1
        assert 0 <= r["ttr_ppm"] <= 1_000_000
        m2 = sum(c * c for c in cs)
        assert r["yule_k_micro"] == (m2 - m1) * 10_000_000_000 // (m1 * m1)


def test_oov_curve_monotone_in_k(spark, sf_dir):
    """Widening the vocab can only reduce OOV mass; shares bounded."""
    from cdc_postgresql_clickhouse_spark.queries.tokenizer import QUERIES as TQ

    rows = TQ["tokenizer_oov_curve"](spark, sf_dir).collect()
    assert rows
    by_src: dict[str, dict[int, int]] = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["k"]] = r["oov_tokens"]
        assert 0 <= r["oov_ppm"] <= 1_000_000
        assert 0 <= r["oov_tokens"] <= r["n_tokens"]
    for src, per_k in by_src.items():
        ks = sorted(per_k)
        assert all(per_k[a] >= per_k[b] for a, b in zip(ks, ks[1:])), src


def test_bottomk_jaccard_exact_at_full_k(spark, sf_dir):
    """The estimator is EXACT once k covers the whole union (bottom-k of
    everything is everything), and every estimate/exact value is a valid
    ppm share."""
    from cdc_postgresql_clickhouse_spark.queries.sketches import (
        QUERIES as SQ,
    )

    rows = SQ["sketch_bottomk_jaccard_sweep"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["jaccard_exact_ppm"] <= 1_000_000
        assert 0 <= r["jaccard_est_ppm"] <= 1_000_000
        if r["k"] >= r["n_union"]:
            assert r["abs_err_ppm"] == 0


def test_srm_counts_conserve_users(spark, sf_dir):
    """Weekly arm counts partition the distinct-user population; chi2 is
    non-negative and the flag matches its own threshold."""
    from cdc_postgresql_clickhouse_spark.queries.events import QUERIES as EQ

    rows = EQ["events_srm_check"](spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_arm_a"] + r["n_arm_b"] for r in rows) == n_users
    for r in rows:
        assert r["chi2_micro"] >= 0
        assert r["srm_flag"] == int(r["chi2_micro"] > 3_841_459)


def test_cuped_reduces_to_identity_when_theta_applied(spark, sf_dir):
    """Shape + bound laws: two arms, rho^2 in [0, 1e6], and the adjusted
    means preserve the POOLED mean (CUPED is mean-preserving over the
    population: sum_arm n*(adj - raw) = -theta * sum_arm n*(xbar_arm -
    xbar) = 0, within integer-floor slack)."""
    from cdc_postgresql_clickhouse_spark.queries.events import QUERIES as EQ

    rows = EQ["events_cuped_adjustment"](spark, sf_dir).collect()
    assert {r["arm"] for r in rows} == {0, 1}
    for r in rows:
        assert 0 <= r["var_reduction_ppm"] <= 1_000_000
    n_tot = sum(r["n_users"] for r in rows)
    drift = sum(
        r["n_users"] * (r["adj_mean_post_micro"] - r["mean_post_micro"]) for r in rows
    )
    # floor slack: each mean floors once -> at most 1 micro per user
    assert abs(drift) <= 2 * n_tot


def test_stratified_uplift_weighting(spark, sf_dir):
    """Strata partition users; the pooled uplift is the population-weighted
    mean of the per-stratum lifts (exact integer recomputation)."""
    from cdc_postgresql_clickhouse_spark.queries.events import QUERIES as EQ

    rows = EQ["events_stratified_uplift"](spark, sf_dir).collect()
    assert rows and all(0 <= r["stratum"] <= 4 for r in rows)
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_a"] + r["n_b"] for r in rows) == n_users
    valid = [r for r in rows if r["lift_micro"] is not None]
    w = sum(r["n_a"] + r["n_b"] for r in valid)
    # truncate toward zero like Spark `div` / DuckDB `//` — Python's `//`
    # floors, which differs by 1 when the weighted lift sum is negative
    # (ADVICE r11)
    s = sum((r["n_a"] + r["n_b"]) * r["lift_micro"] for r in valid)
    w = max(1, w)
    want = s // w if s >= 0 else -((-s) // w)
    assert rows[0]["uplift_micro"] == want


def test_hill_tail_index_positive_and_bounded(spark, sf_dir):
    """k_used respects the cap and the data; ln sums are non-negative
    (top-k values dominate the reference order statistic); alpha > 0."""
    from cdc_postgresql_clickhouse_spark.queries.events import QUERIES as EQ

    rows = EQ["events_hill_tail_index"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["k_used"] <= 200
        assert r["sum_ln_micro"] >= 0
        if r["hill_alpha_milli"] is not None:
            assert r["hill_alpha_milli"] > 0


def test_rich_club_profile_is_cumulative_and_complete(spark, sf_dir):
    """internal_edges/weight are non-decreasing in club size; the full club
    contains every undirected edge; densities are valid ppm."""
    from cdc_postgresql_clickhouse_spark.queries.graph import QUERIES as GQ

    rows = sorted(
        GQ["graph_rich_club_coefficient"](spark, sf_dir).collect(),
        key=lambda r: r["club_size"],
    )
    assert rows
    prev_e, prev_w = 0, 0
    for r in rows:
        assert r["internal_edges"] >= prev_e and r["internal_weight"] >= prev_w
        prev_e, prev_w = r["internal_edges"], r["internal_weight"]
        assert 0 <= r["density_ppm"] <= 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    n_edges = (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .select(F.least("src", "dst"), F.greatest("src", "dst"))
        .distinct()
        .count()
    )
    assert rows[-1]["internal_edges"] == n_edges


def test_calibration_ece_is_weighted_gap_mean(spark, sf_dir):
    """gap recomputes from its own row; the ECE column equals the exact
    count-weighted integer mean of the gaps."""
    from cdc_postgresql_clickhouse_spark.queries.quality import QUERIES as QQ

    rows = QQ["quality_score_calibration_ece"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["gap_micro"] == abs(r["acc_ppm"] - r["conf_micro"])
    want = sum(r["n_docs"] * r["gap_micro"] for r in rows) // sum(
        r["n_docs"] for r in rows
    )
    assert all(r["ece_micro"] == want for r in rows)


def test_bytes_dedup_savings_accounting(spark, sf_dir):
    """Objects >= distinct payloads; reclaimable + one-copy-each mass =
    total mass; savings share valid."""
    from cdc_postgresql_clickhouse_spark.queries.multimodal import QUERIES as MQ

    rows = MQ["multimodal_bytes_dedup_report"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_objects"] >= r["n_distinct"]
        assert 0 <= r["reclaimable_bytes"] < r["total_bytes"]
        assert 0 <= r["savings_ppm"] < 1_000_000


def test_partition_advisor_covers_and_is_monotone(spark, sf_dir):
    """n_files is the exact ceiling (files cover the bytes, one fewer
    would not) and shrinks as the target grows."""
    from cdc_postgresql_clickhouse_spark.queries.zorder import QUERIES as ZQ

    rows = sorted(
        ZQ["layout_partition_size_advisor"](spark, sf_dir).collect(),
        key=lambda r: r["target_mb"],
    )
    assert rows
    prev = None
    for r in rows:
        cap = r["target_mb"] * 1048576
        assert r["n_files"] * cap >= r["total_bytes"]
        if r["n_files"] > 1:
            assert (r["n_files"] - 1) * cap < r["total_bytes"]
        if prev is not None:
            assert r["n_files"] <= prev
        prev = r["n_files"]
