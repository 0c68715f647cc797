"""The two-phase distributed prefix sum must equal the one-window cumsum
bit-for-bit — for several physical partition counts, including 1 (offsets
all zero) and more partitions than rows-per-group (every partition's offset
load-bearing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.operators.prefix import (
    exclusive_cumsum_distributed,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tok")
    )


def _window_truth(d):
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return {
        (r.source, r.doc_id): r.cum
        for r in d.withColumn(
            "cum", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
        ).collect()
    }


@pytest.mark.parametrize("n_parts", [1, 5, 64])
def test_distributed_cumsum_equals_window(spark, sf_dir, n_parts):
    d = _docs(spark, sf_dir)
    want = _window_truth(d)
    got = {
        (r.source, r.doc_id): r.cum_before
        for r in exclusive_cumsum_distributed(
            d, ["source"], ["doc_id"], "n_tok", num_partitions=n_parts
        ).collect()
    }
    assert got == want


def test_distributed_cumsum_feeds_shard_packing(spark, sf_dir):
    """End-to-end: shard ids derived from the distributed prefix equal the
    window-based registered operator's — the documented scale swap is a
    drop-in."""
    from cdc_postgresql_clickhouse_spark.queries.training import (
        SHARD_TOKEN_BUDGET,
        corpus_shard_packing,
    )

    d = _docs(spark, sf_dir)
    pre = exclusive_cumsum_distributed(
        d, ["source"], ["doc_id"], "n_tok", num_partitions=9
    )
    sharded = pre.select(
        "source",
        F.floor(F.col("cum_before") / F.lit(float(SHARD_TOKEN_BUDGET))).alias(
            "shard_id"
        ),
        "n_tok",
        "doc_id",
    )
    got = {
        (r.source, r.shard_id): (r.n_docs, r.shard_tokens, r.first_doc, r.last_doc)
        for r in sharded.groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .collect()
    }
    want = {
        (r.source, r.shard_id): (r.n_docs, r.shard_tokens, r.first_doc, r.last_doc)
        for r in corpus_shard_packing(spark, sf_dir).collect()
    }
    assert got == want
