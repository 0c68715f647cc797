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


def test_compact_preserves_content_and_drops_duplicates(spark, sf_dir, tmp_path):
    from cdc_postgresql_clickhouse_spark.streaming.postings import compact_postings

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(40)
    idx = str(tmp_path / "idx")
    ingest_batch_postings(docs, idx)
    ingest_batch_postings(docs, idx)  # replay: physical duplicates on disk
    before = {tuple(r) for r in read_postings(spark, idx).collect()}
    raw_before = spark.read.parquet(idx).count()
    n_files_before = len(glob.glob(os.path.join(idx, "shard=*", "*.parquet")))

    compact_postings(spark, idx, files_per_shard=1)

    after = {tuple(r) for r in read_postings(spark, idx).collect()}
    raw_after = spark.read.parquet(idx).count()
    n_files_after = len(glob.glob(os.path.join(idx, "shard=*", "*.parquet")))
    assert after == before                      # logical content identical
    assert raw_after == len(after) < raw_before  # replay dups physically gone
    assert n_files_after < n_files_before        # segments merged
    # one file per live shard
    shards = glob.glob(os.path.join(idx, "shard=*"))
    for s in shards:
        assert len(glob.glob(os.path.join(s, "*.parquet"))) == 1, s


def test_compact_refuses_during_active_mutation(spark, sf_dir, tmp_path):
    from cdc_postgresql_clickhouse_spark.operators.state import StateLockError, _state_lock
    from cdc_postgresql_clickhouse_spark.streaming.postings import compact_postings

    import pytest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(5)
    idx = str(tmp_path / "idx")
    ingest_batch_postings(docs, idx)
    with _state_lock(idx):  # another mutator holds the fence
        with pytest.raises(StateLockError):
            compact_postings(spark, idx)
    # after release, compaction proceeds
    compact_postings(spark, idx)
    assert read_postings(spark, idx).count() > 0


def test_compact_assignments_preserves_probe_results(spark, sf_dir, tmp_path):
    """The IVF twin: compacting the cid-partitioned assignment table must
    not change probe results, and must bound files per cid."""
    import pyspark.sql.functions as F

    from cdc_postgresql_clickhouse_spark.queries.similarity import _emb_d, _norm, ivf_probe
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table as _lt
    from cdc_postgresql_clickhouse_spark.streaming.ann import (
        centroid_table,
        compact_assignments,
        ingest_batch_ivf,
    )

    emb = _lt(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = str(tmp_path / "assign")
    ingest_batch_ivf(spark, emb, idx)
    ingest_batch_ivf(spark, emb, idx)  # replay appends duplicates

    full = _lt(spark, sf_dir, "embeddings").select("vec_id", _emb_d().alias("e")).withColumn(
        "nrm", _norm(F.col("e"))
    )
    cents = centroid_table(spark, idx)

    def probe():
        assign = spark.read.parquet(idx).select("vec_id", "cid").distinct()
        return sorted(tuple(r) for r in ivf_probe(full, cents, assign).collect())

    before = probe()
    compact_assignments(spark, idx)
    after = probe()
    assert before == after and len(after) > 0
    raw = spark.read.parquet(idx)
    assert raw.count() == raw.distinct().count()  # physical dups gone
    for d in glob.glob(os.path.join(idx, "cid=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d


def test_ingest_refuses_during_active_compaction(spark, sf_dir, tmp_path):
    """ADVICE r4 (medium): the compact-vs-ingest race is only closed if the
    INGEST side also takes the fence — a batch appended between compaction's
    snapshot read and the directory swap would be silently lost. Pin that
    both real ingest paths raise while another mutator holds the lock."""
    import pytest

    from cdc_postgresql_clickhouse_spark.operators.state import StateLockError, _state_lock
    from cdc_postgresql_clickhouse_spark.streaming.ann import ingest_batch_ivf

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(5)
    idx = str(tmp_path / "idx")
    ingest_batch_postings(docs, idx)
    with _state_lock(idx):
        with pytest.raises(StateLockError):
            ingest_batch_postings(docs, idx)

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(64)
    ap = str(tmp_path / "assign")
    with _state_lock(ap):
        with pytest.raises(StateLockError):
            ingest_batch_ivf(spark, emb, ap)
