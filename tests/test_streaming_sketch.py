"""Streaming HLL: the append-only register log max-merges to exactly the
batch-built sketch, and replay is a no-op (MAX is idempotent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.sketches import hll_registers
from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.streaming.sketch import (
    ingest_batch_hll,
    read_hll_registers,
    run_incremental_hll,
)


def _regset(df):
    return {(r.event_type, r.reg, r.mj) for r in df.collect()}


def test_streamed_registers_equal_batch_build(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    src = str(tmp_path / "src")
    ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(src)
    ev.filter(F.col("user_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    state = str(tmp_path / "state")
    run_incremental_hll(spark, src, state, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert _regset(read_hll_registers(spark, state)) == _regset(hll_registers(ev))


def test_replay_is_idempotent_under_max_merge(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").limit(200)
    state = str(tmp_path / "state")
    ingest_batch_hll(ev, state)
    once = _regset(read_hll_registers(spark, state))
    ingest_batch_hll(ev, state)  # at-least-once replay
    assert _regset(read_hll_registers(spark, state)) == once


def test_ingest_refuses_during_active_compaction(spark, sf_dir, tmp_path):
    import pytest

    from cdc_postgresql_clickhouse_spark.operators.state import StateLockError, _state_lock

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").limit(50)
    state = str(tmp_path / "state")
    with _state_lock(state):
        with pytest.raises(StateLockError):
            ingest_batch_hll(ev, state)


def test_streamed_bottomk_equals_batch_state_and_survives_replay(spark, sf_dir, tmp_path):
    from cdc_postgresql_clickhouse_spark.queries.sketches import QSK_K, _bottomk_state
    from cdc_postgresql_clickhouse_spark.streaming.sketch import (
        ingest_batch_bottomk,
        read_bottomk_state,
        run_incremental_bottomk,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "user_id", "value"
    )
    src = str(tmp_path / "src")
    ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(src)
    ev.filter(F.col("user_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    state = str(tmp_path / "state")
    run_incremental_bottomk(spark, src, state, str(tmp_path / "ckpt"), max_files_per_trigger=1)

    streamed = {tuple(r) for r in read_bottomk_state(spark, state).collect()}
    batch = {tuple(r) for r in _bottomk_state(ev, QSK_K).collect()}
    assert streamed == batch
    # at-least-once replay: re-append one batch; read-time distinct+rerank
    # must leave the merged state unchanged
    ingest_batch_bottomk(ev.filter(F.col("user_id") % 2 == 0), state)
    assert {tuple(r) for r in read_bottomk_state(spark, state).collect()} == batch


def test_streamed_cms_counters_equal_batch_and_replay_dedups(spark, sf_dir, tmp_path):
    """CMS linearity: per-batch cell partials SUM-merge to exactly the
    one-shot counter table; a replayed batch (same batch_id) is dropped by
    the read-time per-batch dedup, so the sums don't double-count."""
    from cdc_postgresql_clickhouse_spark.queries.sketches import cms_counters, cms_vocab
    from cdc_postgresql_clickhouse_spark.streaming.sketch import (
        ingest_batch_cms,
        read_cms_state,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    ingest_batch_cms(docs.filter(F.col("doc_id") % 2 == 0), state, 0)
    ingest_batch_cms(docs.filter(F.col("doc_id") % 2 == 1), state, 1)
    vocab, counters = read_cms_state(spark, state)

    batch_vocab = cms_vocab(docs)
    want_vocab = {(r.term, r.cnt) for r in batch_vocab.collect()}
    want_counters = {(r.r, r.c, r.cell) for r in cms_counters(batch_vocab).collect()}
    assert {(r.term, r.cnt) for r in vocab.collect()} == want_vocab
    assert {(r.r, r.c, r.cell) for r in counters.collect()} == want_counters

    # at-least-once replay of batch 0: identical rows under the same id
    ingest_batch_cms(docs.filter(F.col("doc_id") % 2 == 0), state, 0)
    vocab2, counters2 = read_cms_state(spark, state)
    assert {(r.term, r.cnt) for r in vocab2.collect()} == want_vocab
    assert {(r.r, r.c, r.cell) for r in counters2.collect()} == want_counters


def test_streamed_topk_counts_equal_batch_and_replay_dedups(spark, sf_dir, tmp_path):
    """Grouped top-k linearity: per-batch value-count partials sum-merge to
    the one-shot count table; a replayed batch id is dropped before the
    sum."""
    from cdc_postgresql_clickhouse_spark.queries.funnel import grouped_value_counts
    from cdc_postgresql_clickhouse_spark.streaming.sketch import (
        ingest_batch_topk_counts,
        read_topk_counts,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "props")
    state = str(tmp_path / "state")
    ingest_batch_topk_counts(ev.filter(F.col("user_id") % 2 == 0), state, 0)
    ingest_batch_topk_counts(ev.filter(F.col("user_id") % 2 == 1), state, 1)
    want = {(r.event_type, r.k, r.n) for r in grouped_value_counts(ev).collect()}
    assert {(r.event_type, r.k, r.n) for r in read_topk_counts(spark, state).collect()} == want
    ingest_batch_topk_counts(ev.filter(F.col("user_id") % 2 == 0), state, 0)  # replay
    assert {(r.event_type, r.k, r.n) for r in read_topk_counts(spark, state).collect()} == want
