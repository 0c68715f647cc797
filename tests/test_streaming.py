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
