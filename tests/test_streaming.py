"""End-to-end Structured Streaming pipeline test (survey §3.1 Spark redesign):
file-source envelopes → transform → foreachBatch upsert → state table."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.state import current_state
from cdc_postgresql_clickhouse_spark.sources.envelope import golden_workload_envelopes
from cdc_postgresql_clickhouse_spark.streaming.pipeline import run_cdc_pipeline


def test_streaming_pipeline_golden(spark, tmp_path):
    env_dir = str(tmp_path / "envelopes")
    os.makedirs(env_dir)
    events = golden_workload_envelopes()
    # two files → at least two input splits; availableNow drains them
    for fi, chunk in enumerate([events[:15], events[15:]]):
        with open(os.path.join(env_dir, f"batch{fi}.json"), "w") as f:
            for e in chunk:
                f.write(json.dumps(e) + "\n")

    state_path = str(tmp_path / "state")
    run_cdc_pipeline(spark, env_dir, state_path, str(tmp_path / "ckpt"))

    state = spark.read.parquet(state_path)
    final = state.filter(F.col("is_deleted") == 0)
    assert final.count() == 6
    assert {r["booking_id"] for r in final.select("booking_id").collect()} == {
        "b1", "b2", "b7", "b8", "b9", "b10"
    }
    # tombstones retained in the log-structured state (pre-FINAL semantics)
    assert state.count() == 13

    # re-running with a fresh checkpoint replays everything: must be a no-op
    run_cdc_pipeline(spark, env_dir, state_path, str(tmp_path / "ckpt2"))
    assert current_state(spark.read.parquet(state_path), keep_internal=False).count() == 6


def test_bucketed_upsert_rewrites_only_dirty_buckets(spark, tmp_path):
    """The 100 TB contract: a micro-batch rewrites ONLY the key-hash buckets
    containing its keys; every other bucket's files stay byte-identical."""
    import glob

    from cdc_postgresql_clickhouse_spark.operators.state import (
        read_state,
        upsert_changes_bucketed,
        write_state,
    )

    schema = "booking_id string, version long, ts_ms long, is_deleted int, status string"
    path = str(tmp_path / "state")
    base = spark.createDataFrame(
        [(f"b{i}", 1, 0, 0, "Open") for i in range(50)], schema
    )
    write_state(base, path, key_buckets=8)

    def snap():
        out = {}
        for f in glob.glob(os.path.join(path, "__bucket=*", "part-*")):
            with open(f, "rb") as fh:
                out[f] = fh.read()
        return out

    before = snap()
    assert len(before) >= 4  # keys spread over several buckets
    upd = spark.createDataFrame([("b7", 2, 1, 0, "Closed")], schema)
    touched = upsert_changes_bucketed(spark, upd, path, key_buckets=8)
    assert len(touched) == 1
    after = snap()
    untouched = [f for f in before if f"__bucket={touched[0]}/" not in f]
    assert untouched, "expected untouched buckets"
    for f in untouched:
        assert f in after and after[f] == before[f], f"bucket file rewritten: {f}"
    final = read_state(spark, path)
    assert final.count() == 50
    assert final.filter(F.col("booking_id") == "b7").collect()[0]["status"] == "Closed"


def test_pipeline_single_source_scan(spark, tmp_path):
    """DLQ split happens inside the main micro-batch: no second readStream,
    no separate DLQ checkpoint."""
    env_dir = str(tmp_path / "envelopes")
    os.makedirs(env_dir)
    with open(os.path.join(env_dir, "batch.json"), "w") as f:
        for e in golden_workload_envelopes():
            f.write(json.dumps(e) + "\n")
        f.write('{"broken json\n')
    state_path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    dlq = str(tmp_path / "dlq")
    run_cdc_pipeline(spark, env_dir, state_path, ckpt, dlq_path=dlq)
    assert not os.path.exists(f"{ckpt}-dlq")  # old design: second stream + ckpt
    assert spark.read.json(dlq).count() == 1
    assert current_state(spark.read.parquet(state_path)).count() == 6


def test_multi_batch_pipeline_incremental_buckets(spark, tmp_path):
    """Through the REAL streaming path (one file per trigger): batch 2 only
    rewrites the buckets its keys hash to; the final state still matches the
    one-shot golden result."""
    import glob

    env_dir = str(tmp_path / "envelopes")
    os.makedirs(env_dir)
    events = golden_workload_envelopes()
    with open(os.path.join(env_dir, "batch0.json"), "w") as f:
        for e in events[:-1]:
            f.write(json.dumps(e) + "\n")
    state_path = str(tmp_path / "state")
    run_cdc_pipeline(spark, env_dir, state_path, str(tmp_path / "ckpt"),
                     max_files_per_trigger=1)

    def snap():
        return {
            f: open(f, "rb").read()
            for f in glob.glob(os.path.join(state_path, "__bucket=*", "part-*"))
        }

    before = snap()
    # second file: ONE event (the last delete) — same checkpoint continues
    with open(os.path.join(env_dir, "batch1.json"), "w") as f:
        f.write(json.dumps(events[-1]) + "\n")
    run_cdc_pipeline(spark, env_dir, state_path, str(tmp_path / "ckpt"),
                     max_files_per_trigger=1)
    after = snap()
    changed = [f for f in before if f not in after or after[f] != before[f]]
    # the single-key batch must touch at most one bucket's files
    touched_dirs = {os.path.dirname(f) for f in changed}
    assert len(touched_dirs) <= 1, touched_dirs
    assert current_state(spark.read.parquet(state_path)).count() == 6
