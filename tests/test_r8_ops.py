"""Law tests for the round-8 operator additions, beyond their oracle rows:
internal accounting identities and cross-operator consistency."""

from __future__ import annotations

from cdc_postgresql_clickhouse_spark.queries.cdc import QUERIES as CDC_Q
from cdc_postgresql_clickhouse_spark.queries.corpus import QUERIES as CO_Q

from cdc_postgresql_clickhouse_spark.queries.similarity import (
    QUERIES as SIM_Q,
    NPROBE_SWEEP,
)
from cdc_postgresql_clickhouse_spark.queries.streaming_queries import (
    QUERIES as ST_Q,
)
from cdc_postgresql_clickhouse_spark.queries.text_ext import (
    PMI_MIN_PAIR_DOCS,
    PMI_TOPK,
    QUERIES as TE_Q,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_txn_atomicity_accounting(spark, sf_dir):
    r = CDC_Q["cdc_txn_atomicity_report"](spark, sf_dir).first()
    n_events = load_table(spark, sf_dir, "events").count()
    assert r["n_events"] == n_events
    assert 1 <= r["n_txns"] <= n_events
    assert r["max_events_per_txn"] >= 1
    assert 0 <= r["n_torn_at_cut"] <= r["n_txns"]
    assert r["torn_ppm"] == r["n_torn_at_cut"] * 1_000_000 // r["n_txns"]


def test_modality_coverage_partitions_both_sides(spark, sf_dir):
    r = CO_Q["corpus_modality_coverage"](spark, sf_dir).first()
    assert r["n_matched"] + r["n_docs_only"] == r["n_docs"]
    assert r["n_matched"] + r["n_vecs_only"] == r["n_vecs"]
    assert r["n_docs"] == load_table(spark, sf_dir, "documents").count()
    assert r["n_vecs"] == load_table(spark, sf_dir, "embeddings").count()


def test_pmi_pairs_obey_support_bounds(spark, sf_dir):
    rows = TE_Q["text_word_pmi_topk"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= PMI_TOPK
    for r in rows:
        assert r["w_a"] < r["w_b"]
        assert r["n_pair_docs"] >= PMI_MIN_PAIR_DOCS
        # co-occurrence support cannot exceed either word's df
        assert r["n_pair_docs"] <= min(r["df_a"], r["df_b"])


def test_left_join_equiv_reconciles_with_batch_inner(spark, sf_dir):
    """The outer join's pair count must equal the batch inner interval-join
    pair count at the same (60-minute, click→purchase) parameters, and
    matched+unmatched must partition the purchases."""
    from pyspark.sql import functions as F

    left = ST_Q["streaming_interval_left_join_equiv"](spark, sf_dir).first()
    assert (
        left["n_matched_purchases"] + left["n_unmatched_purchases"]
        == left["n_purchases"]
    )
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    n_inner_pairs = p.join(
        c,
        (F.col("pu") == F.col("cu"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 60 MINUTES")),
    ).count()
    assert left["n_pairs"] == n_inner_pairs
    assert left["n_purchases"] == p.count()


def test_nprobe_recall_is_monotone_and_consistent(spark, sf_dir):
    rows = {
        r["n_probe"]: r
        for r in SIM_Q["ann_nprobe_recall_sweep"](spark, sf_dir).collect()
    }
    assert set(rows) == set(NPROBE_SWEEP)
    recalls = [rows[p]["recall_ppm"] for p in sorted(rows)]
    # probing more lists can only add candidates, and true top-5 members
    # present in a candidate set always make the candidate top-5, so hits
    # are superset-monotone; recall divides by the FIXED truth-set size
    # (n_truth, constant across arms), making the curve provably
    # nondecreasing on any fixture (ADVICE r8: hits/n_pairs was not).
    assert recalls == sorted(recalls)
    hits = [rows[p]["n_hits"] for p in sorted(rows)]
    assert hits == sorted(hits)
    assert len({rows[p]["n_truth"] for p in rows}) == 1
    # the n_probe=2 arm IS the registered IVF operating point: its hit
    # accounting must match ann_recall_report's ivf row exactly
    rep = {
        r["method"]: r
        for r in SIM_Q["ann_recall_report"](spark, sf_dir).collect()
    }
    assert rows[2]["n_hits"] == rep["ivf"]["n_hits"]
    assert rows[2]["n_pairs"] == rep["ivf"]["n_pairs"]
