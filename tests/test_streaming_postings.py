"""Incremental inverted-index maintenance: a 2-batch streamed build must
produce exactly the batch posting set, survive replay (at-least-once), and
lay the table out in stable term shards."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.search import build_postings
from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.streaming.postings import (
    TERM_SHARDS,
    ingest_batch_postings,
    read_postings,
    run_incremental_postings,
)


def test_streamed_postings_equal_batch_build(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    run_incremental_postings(spark, src, idx, str(tmp_path / "ckpt"), max_files_per_trigger=1)

    streamed = {tuple(r) for r in read_postings(spark, idx).collect()}
    batch = {tuple(r) for r in build_postings(docs).collect()}
    assert streamed == batch


def test_replay_is_idempotent_after_distinct(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    idx = str(tmp_path / "idx")
    ingest_batch_postings(docs, idx)
    once = {tuple(r) for r in read_postings(spark, idx).collect()}
    ingest_batch_postings(docs, idx)  # replay appends duplicate rows
    twice = {tuple(r) for r in read_postings(spark, idx).collect()}
    assert once == twice


def test_term_sharded_layout_on_disk(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    idx = str(tmp_path / "idx")
    ingest_batch_postings(docs, idx)
    shards = {os.path.basename(p) for p in glob.glob(os.path.join(idx, "shard=*"))}
    assert shards  # partitioned by term shard
    assert all(0 <= int(s.split("=")[1]) < TERM_SHARDS for s in shards)
