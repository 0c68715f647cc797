"""Structured Streaming CDC pipeline — the whole reference dataflow, one engine.

Reference flow (``README.md:65``): PostgreSQL → Debezium (Kafka Connect) →
Kafka → ClickHouse sink → ``bookings_changes`` → materialized view →
``bookings``. Five process boundaries collapse into one incremental Catalyst
plan (survey §3.1):

  readStream(envelopes) → changes_to_state_updates → foreachBatch(apply_changes)

- Source: file stream of JSON envelopes here; swap ``format("kafka")`` +
  ``decode_json_envelopes`` for a live Debezium topic — the transform is the
  same DataFrame function either way (S1/S11).
- Trigger: 500 ms micro-batches mirror ``poll.interval.ms=500``
  (``debezium_configuration.json:11``, S4); tests use ``availableNow``.
- Sink: ``foreachBatch`` upsert into the state table (S9). Checkpointing
  makes the file/Kafka source exactly-once into the sink; the version
  arg-max additionally makes any replay a no-op (S10) — strictly stronger
  than the reference's at-least-once.
- Stateless incremental view maintenance (ST1): the transform has no
  aggregation, so Spark keeps **no** streaming state; per-key state lives in
  the state table itself (ST3), the 100 TB posture.

Read-after-write caveat: the parquet state path is rewritten per batch
(temp + swap), so a *lazy* DataFrame previously read from it becomes invalid
once a new batch lands — re-read the path after updates. On Delta the swap
is replaced by ACID ``MERGE INTO`` and snapshot isolation removes the caveat;
this mirrors ClickHouse where un-FINAL reads race background merges.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.cdc_transform import changes_to_state_updates
from cdc_postgresql_clickhouse_spark.operators.state import (
    apply_changes,
    read_state,
    write_state,
)
from cdc_postgresql_clickhouse_spark.sources.envelope import ENVELOPE_SCHEMA


def run_cdc_pipeline(
    spark: SparkSession,
    envelope_dir: str,
    state_path: str,
    checkpoint_dir: str,
    trigger_processing_time: str | None = None,
    available_now: bool = True,
    dlq_path: str | None = None,
) -> None:
    """Run the end-to-end CDC pipeline over a directory of envelope JSON files.

    ``available_now=True`` drains everything and stops (test/backfill mode);
    otherwise a continuous 500 ms-triggered query is started and the caller
    owns its lifecycle.

    ``dlq_path``: when set, records that parse to no op code (malformed or
    non-envelope JSON) are appended there with the whole-record JSON
    preserved for replay-after-fix, instead of being silently dropped — a
    poisoned message must never stall or silently thin the stream.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    # copy — StructType.add would mutate the shared ENVELOPE_SCHEMA in place
    schema_with_corrupt = StructType(
        [*ENVELOPE_SCHEMA.fields, StructField("_corrupt_record", StringType())]
    )
    raw = spark.readStream.schema(schema_with_corrupt).json(envelope_dir)
    stream = raw.filter(F.col("op").isNotNull()).drop("_corrupt_record")
    if dlq_path:
        dead = raw.filter(F.col("op").isNull()).select(
            F.coalesce(F.col("_corrupt_record"), F.to_json(F.struct("*"))).alias("raw_value"),
            F.lit("unparseable envelope or missing op").alias("dlq_reason"),
        )
        (
            dead.writeStream.format("json")
            .option("path", dlq_path)
            .option("checkpointLocation", f"{checkpoint_dir}-dlq")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    updates_stream = changes_to_state_updates(stream)

    def upsert_batch(batch_df, batch_id: int) -> None:
        # Write-to-temp + swap: never overwrite the path being read, and no
        # driver-side collect — the merge stays fully distributed. On Delta
        # this whole function is `MERGE INTO state USING batch_df ON key
        # WHEN MATCHED AND s.version > t.version ...` (ACID, no swap needed).
        import os
        import shutil

        state = read_state(spark, state_path)
        merged = apply_changes(state, batch_df)
        tmp = f"{state_path}.tmp-{batch_id}"
        write_state(merged, tmp)
        shutil.rmtree(state_path, ignore_errors=True)
        os.rename(tmp, state_path)

    writer = updates_stream.writeStream.foreachBatch(upsert_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.trigger(processingTime=trigger_processing_time or "500 milliseconds").start()
