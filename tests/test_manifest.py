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
