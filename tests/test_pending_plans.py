"""Physical-plan pins for the round-7 PENDING layer — same contract as
tests/test_plans.py: a correct-but-badly-planned operator fails even when
its rows match the oracle. Only batch rows whose build is lazy (or
scalar-only) are pinned here; streaming equivalence rows execute real
pipelines at build time and are covered by their law suites instead."""

from __future__ import annotations

from cdc_postgresql_clickhouse_spark.plans.inspect import (
    broadcast_join_count,
    formatted_plan,
    read_schemas,
    shuffle_count,
)


def test_association_rules_broadcast_ranked_set(spark, sf_dir):
    """The 20-row ranked pair set must be the broadcast side against the
    item-support table — twice (part_a leg, part_b leg)."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        basket_association_rules,
    )

    df = basket_association_rules(spark, sf_dir)
    assert broadcast_join_count(df) >= 2, formatted_plan(df)[:2000]


def test_fuzzy_linkage_is_equi_join_not_cartesian(spark, sf_dir):
    """The SymSpell point: candidates come from an EQUI-join on deletion
    variants — the plan must contain no nested-loop/cartesian pairing."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        linkage_fuzzy_part_names,
    )

    plan = formatted_plan(linkage_fuzzy_part_names(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_profiler_is_one_scan(spark, sf_dir):
    """Six columns profiled in ONE pass: exactly one parquet scan."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_ext import (
        profile_orders_columns,
    )

    rs = read_schemas(profile_orders_columns(spark, sf_dir))
    assert len(rs) == 1, rs


def test_backlog_prunes_both_scans(spark, sf_dir):
    """Orders reads only (orderkey, orderdate); lineitem only
    (orderkey, shipdate) — the daily inputs are keyed pre-aggregations."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        orders_backlog_timeseries,
    )

    rs = read_schemas(orders_backlog_timeseries(spark, sf_dir))
    joined = " | ".join(rs)
    assert "o_totalprice" not in joined and "o_orderpriority" not in joined, rs
    assert "l_extendedprice" not in joined and "l_quantity" not in joined, rs


def test_asof_read_is_single_shuffle(spark, sf_dir):
    """Same shape contract as cdc_current_state: the time filter is
    map-side, then ONE hash shuffle for the keyed arg-max."""
    from cdc_postgresql_clickhouse_spark.queries.cdc import cdc_state_asof

    df = cdc_state_asof(spark, sf_dir)
    assert shuffle_count(df) == 1, formatted_plan(df)[:2000]


def test_capped_sessionize_is_single_shuffle(spark, sf_dir):
    """The ordered fold costs exactly the sessionize shuffle: one hash
    partition by user, the fold itself map-side over the sorted array."""
    from cdc_postgresql_clickhouse_spark.queries.events import (
        events_sessionize_capped,
    )

    df = events_sessionize_capped(spark, sf_dir)
    assert shuffle_count(df) == 1, formatted_plan(df)[:2000]


def test_truncation_report_broadcasts_query_sides(spark, sf_dir):
    """Each brute-force leg is the documented broadcast-query × corpus
    scan (a BroadcastNestedLoopJoin — the non-equi q_id != vec_id pairing
    with the sampled 1%-side broadcast, same shape as the registered
    ann_bruteforce_topk), and the truth overlap join is a broadcast HASH
    join. No sort-merge join anywhere: nothing corpus-sized shuffles."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        ann_dim_truncation_report,
    )

    plan = formatted_plan(ann_dim_truncation_report(spark, sf_dir))
    assert plan.count("BroadcastNestedLoopJoin") >= 3, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= 1, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_pareto_and_benford_scan_once(spark, sf_dir):
    """Both grand totals ride windows over the bounded distinct/digit grid —
    the fact table must appear exactly once in each plan."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        orders_benford_digits,
        orders_pareto_abc,
    )

    import re

    for fn in (orders_pareto_abc, orders_benford_digits):
        plan = formatted_plan(fn(spark, sf_dir))
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]


def test_share_pivots_are_single_pass(spark, sf_dir):
    """The half-vs-half reports pivot with conditional aggregation: no
    full-outer self-join, so no SortMergeJoin may appear."""
    from cdc_postgresql_clickhouse_spark.queries.tpch_more import (
        customer_tier_migration,
        parts_brand_share_shift,
    )

    import re

    for fn, max_scans in ((customer_tier_migration, 2), (parts_brand_share_shift, 4)):
        plan = formatted_plan(fn(spark, sf_dir))
        assert "SortMergeJoin" not in plan, plan[:2000]
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= max_scans, plan[:2000]


def test_tfidf_cosine_candidates_are_equi_join(spark, sf_dir):
    """Rare-shingle blocking must pair candidates through an EQUI-join; the
    only nested-loop allowed is the one-row corpus-count broadcast."""
    from cdc_postgresql_clickhouse_spark.queries.dedup import dedup_tfidf_cosine

    import re

    # session-state-proof: a prior run of this query leaves its weight table
    # persisted, and the cached subtree re-renders the scalar corpus-count
    # join a second time — clear so the pin sees the canonical cold plan
    spark.catalog.clearCache()
    plan = formatted_plan(dedup_tfidf_cosine(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_fuzzy_decontam_broadcasts_bench_side(spark, sf_dir):
    """Bipartite LSH: the benchmark bands AND the benchmark shingle sets are
    the broadcast sides; candidates never come from a corpus self-join and
    nothing plans cartesian."""
    from cdc_postgresql_clickhouse_spark.queries.training import (
        QUERIES as TR_P,
    )

    df = TR_P["corpus_decontaminate_fuzzy"](spark, sf_dir)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 2, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_packing_report_is_one_scan_one_shuffle(spark, sf_dir):
    """Per-doc token counts fan out to |context_lens| rows map-side; the
    only shuffle is the 3-key aggregation."""
    from cdc_postgresql_clickhouse_spark.queries.training import (
        QUERIES as TR_P,
    )

    df = TR_P["packing_efficiency_report"](spark, sf_dir)
    assert len(read_schemas(df)) == 1
    assert shuffle_count(df) <= 1, formatted_plan(df)[:2000]


def test_ohlc_is_one_scan_one_shuffle(spark, sf_dir):
    """The AggregatingMergeTree claim in plan form: minute bars are ONE
    parquet scan into ONE keyed aggregation — the min_by/max_by algebra
    partial-aggregates map-side, so nothing else shuffles."""
    from cdc_postgresql_clickhouse_spark.queries.events import (
        QUERIES as EV_P,
    )

    df = EV_P["events_ohlc_bars"](spark, sf_dir)
    assert len(read_schemas(df)) == 1
    assert shuffle_count(df) == 1, formatted_plan(df)[:2000]


def test_kn_model_reuses_one_corpus_scan(spark, sf_dir):
    """The persisted bigram table is load-bearing: model/context/
    continuation/val tables all derive from ONE tokenize+explode pass —
    a second parquet scan would re-run the tokenizer tree per table."""
    from cdc_postgresql_clickhouse_spark.queries.text_ext import (
        QUERIES as TE_P,
    )

    df = TE_P["corpus_bigram_kn_ppl"](spark, sf_dir)
    assert len(read_schemas(df)) <= 1, read_schemas(df)


def test_pagerank_rounds_do_not_rescan_the_corpus(spark, sf_dir):
    """Both pagerank fixpoints must materialize their round inputs: an
    unpersisted nodes table re-derives the events scan + lag window in
    EVERY unrolled round (was 14 parquet scans for 5 iterations — a
    scale-killer at 100 TB where the edge build dominates)."""
    from cdc_postgresql_clickhouse_spark.queries.graph import (
        QUERIES as GR_P,
        QUERIES as GR_Q,
    )

    for fn in (GR_Q["graph_pagerank_types"], GR_P["graph_personalized_pagerank"]):
        assert len(read_schemas(fn(spark, sf_dir))) <= 2


def test_skew_report_runs_on_count_of_counts(spark, sf_dir):
    """The skew diagnostic's only key-grain pass is one count per key; the
    cumulative windows run on the COUNT-OF-COUNTS table (domain bounded by
    the heaviest key's multiplicity). Pin: exactly 3 scans (one per join
    key), no cartesian, and every aggregation partial (no extra exchanges
    beyond the per-key and count-of-counts groupings)."""
    import re as _re

    from cdc_postgresql_clickhouse_spark.queries.skew import QUERIES as SK_Q

    df = SK_Q["skew_join_key_report"](spark, sf_dir)
    plan = formatted_plan(df)
    assert len(read_schemas(df)) == 3, read_schemas(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # per key col: per-key groupBy + count-of-counts groupBy + the bounded
    # single-reducer window = 3 exchanges; 3 key cols -> <= 9 (+1 slack for
    # the final union's AQE coalescing variance)
    assert len(_re.findall(r"\(\d+\) Exchange\b", plan)) <= 10, plan[:1500]
