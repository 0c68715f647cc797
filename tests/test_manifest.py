"""Pipeline-composition invariants for corpus_training_manifest: packing
bound, dense shard ids, stage monotonicity vs the standalone split report."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.manifest import corpus_training_manifest
from cdc_postgresql_clickhouse_spark.queries.training import SHARD_TOKEN_BUDGET


def test_manifest_packing_bound_and_dense_shards(spark, sf_dir):
    out = corpus_training_manifest(spark, sf_dir).cache()
    rows = out.collect()
    assert rows, "pipeline must not filter the corpus to nothing"
    # a shard can exceed the budget only by the one doc that crossed it:
    # cumsum-before < budget boundary => shard_tokens < budget + max doc size
    max_doc = 100_000  # corpus docs are tiny; generous structural cap
    assert all(r.shard_tokens < SHARD_TOKEN_BUDGET + max_doc for r in rows)
    # shard ids are dense from 0 within each split
    by_split = {}
    for r in rows:
        by_split.setdefault(r.split, []).append(r.shard_id)
    for split, ids in by_split.items():
        assert sorted(ids) == list(range(len(ids))), (split, sorted(ids))
    # both splits present and val is the minority (predicate is ~10%)
    n_docs = {s: sum(r.n_docs for r in rows if r.split == s) for s in by_split}
    assert set(n_docs) == {"train", "val"}
    assert 0 < n_docs["val"] < n_docs["train"]


def test_manifest_excludes_benchmark_docs(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.training import BENCH_MOD

    out = corpus_training_manifest(spark, sf_dir)
    # benchmark doc_ids (id % BENCH_MOD == 0) can never be a shard boundary
    bad = out.filter(
        (F.col("first_doc") % BENCH_MOD == 0) | (F.col("last_doc") % BENCH_MOD == 0)
    ).count()
    assert bad == 0


def test_temperature_mixture_flattens_distribution(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.manifest import (
        MIX_BUDGET_FRAC,
        corpus_temperature_mixture,
    )
    from cdc_postgresql_clickhouse_spark.functions.text import tokens
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    sizes = {r.source: r.s for r in docs.groupBy("source").agg(F.sum("n_tok").alias("s")).collect()}
    out = {r.source: r for r in corpus_temperature_mixture(spark, sf_dir).collect()}
    assert set(out) <= set(sizes) and out
    # tau < 1 upsamples small sources: keep-rate is non-increasing in size
    by_size = sorted(sizes, key=sizes.get)
    rates = [out[s].rate_t6 for s in by_size if s in out]
    assert all(a >= b - 1e-9 for a, b in zip(rates, rates[1:]))
    # total kept tokens lands near the budget (hash threshold is a ~1/256
    # granular approximation of the target rate)
    kept = sum(r.tokens_kept for r in out.values())
    total = sum(sizes.values())
    assert 0.3 * total < kept < 0.7 * total, (kept, total, MIX_BUDGET_FRAC)
