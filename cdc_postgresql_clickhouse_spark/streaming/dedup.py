"""Streaming incremental deduplication — dedup as data ARRIVES, not as a
batch afterthought: the CDC × dedup composition (survey north star). New
documents are fingerprinted per micro-batch and checked against the
fingerprint state accumulated from every earlier batch; the min-id copy is
canonical, and duplicates are appended to a duplicate log as they arrive.

State design (the 100 TB posture, same machinery as the CDC state table —
``operators/state.py``): the fingerprint table lives in STORAGE, bucketed by
``pmod(xxhash64(content_hash), N)`` partition directories, never in a
streaming state store — fingerprint cardinality is bounded by disk, not
executor memory. Each micro-batch:

1. fingerprints the batch map-side (md5 of the content — the exact-dedup
   key, ``queries/dedup.py:74``),
2. collects the DISTINCT touched bucket ids (bounded by ``key_buckets``,
   never by data),
3. reads ONLY those bucket partitions of the state (partition-pruned scan),
4. full-outer merges batch fingerprints with prior state — min doc_id wins
   the canonical contest regardless of arrival order (the ReplacingMergeTree
   version contest with doc_id as the version; a dethroned prior canonical
   is logged as a duplicate at that moment),
5. appends newly detected duplicates to the dup log,
6. dynamically overwrites exactly the touched buckets.

Per-batch work is O(touched buckets + batch), not O(corpus). Replay safety:
canonical assignments are stable under batch replay (the existing keep wins
again); the dup log is at-least-once like the DLQ — readers ``distinct()``
it. The same ingest shape accepts any per-doc fingerprint (MinHash band
signatures for NEAR-dup streaming would emit (band, hash) rows per doc and
flag bucket collisions as candidates); the exact form is registered and
oracle-checked via ``queries/streaming_queries.py``.

Reference tie-in: extends S9/S10 (``clickhouse_sink_configuration.json:13``,
at-least-once keyed upsert) to the dedup domain; no analogue in the
reference's own surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.state import (
    BUCKET_COL,
    _bucket_expr,
    _state_lock,
    read_state,
    write_state,
)

DEFAULT_FP_BUCKETS = 16


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    dup_log_path: str,
    key_buckets: int = DEFAULT_FP_BUCKETS,
) -> None:
    """Merge one batch of (doc_id, text) into the fingerprint state and
    append newly detected duplicates to the dup log.

    Min-wins canonical (ARRIVAL-ORDER INDEPENDENT): the canonical for a hash
    is always the smallest doc_id seen so far. If a later batch delivers a
    smaller id, the state entry is dethroned — the old canonical is emitted
    to the dup log at that moment. The final (state, dup-log) pair after any
    replay order therefore equals the batch ``dedup_exact`` result on the
    union of all batches — the incremental-vs-batch equivalence the
    registered oracle checks."""
    fp = batch.select(F.md5("text").alias("content_hash"), F.col("doc_id").cast("long"))
    fpb = fp.withColumn(BUCKET_COL, _bucket_expr(("content_hash",), key_buckets))
    touched = sorted(r[0] for r in fpb.select(BUCKET_COL).distinct().collect())
    if not touched:
        return
    with _state_lock(state_path):
        state = read_state(spark, state_path, buckets=touched)
        if state is not None:
            # localCheckpoint: the overwrite below must not read its own input
            state = state.select(
                "content_hash",
                F.col("keep_doc").alias("state_keep"),
                F.col("n_docs").alias("state_n"),
            ).localCheckpoint(eager=True)
        batch_agg = fp.groupBy("content_hash").agg(
            F.min("doc_id").alias("batch_keep"),
            F.count(F.lit(1)).alias("batch_n"),
        )
        if state is None:
            merged = batch_agg.select(
                "content_hash",
                F.col("batch_keep").alias("keep_doc"),
                F.col("batch_n").cast("long").alias("n_docs"),
                F.lit(None).cast("long").alias("dethroned"),
            )
        else:
            # full outer: state rows whose hash is absent from the batch
            # still live in the overwritten buckets and must be carried over
            merged = batch_agg.join(state, "content_hash", "full_outer").select(
                "content_hash",
                F.least(
                    F.coalesce("state_keep", "batch_keep"),
                    F.coalesce("batch_keep", "state_keep"),
                ).alias("keep_doc"),
                (
                    F.coalesce("state_n", F.lit(0))
                    + F.coalesce("batch_n", F.lit(0))
                ).cast("long").alias("n_docs"),
                # a smaller id arrived: the old canonical becomes a duplicate
                F.when(
                    F.col("state_keep") > F.col("batch_keep"), F.col("state_keep")
                ).alias("dethroned"),
            )
        merged = merged.localCheckpoint(eager=True)
        keeps = merged.select("content_hash", "keep_doc")
        batch_dups = (
            fp.join(keeps, "content_hash")
            .filter(F.col("doc_id") != F.col("keep_doc"))
            .select("doc_id", "content_hash", "keep_doc")
        )
        dethroned_dups = merged.filter(F.col("dethroned").isNotNull()).select(
            F.col("dethroned").alias("doc_id"), "content_hash", "keep_doc"
        )
        batch_dups.unionByName(dethroned_dups).write.mode("append").parquet(dup_log_path)
        write_state(
            merged.drop("dethroned"),
            state_path,
            key_buckets=key_buckets,
            key_cols=("content_hash",),
            dynamic_overwrite=True,
        )


def run_incremental_dedup(
    spark: SparkSession,
    docs_dir: str,
    state_path: str,
    dup_log_path: str,
    checkpoint_dir: str,
    key_buckets: int = DEFAULT_FP_BUCKETS,
    max_files_per_trigger: int | None = None,
    schema=None,
) -> None:
    """Structured-Streaming driver: parquet directory of (doc_id, text) →
    per-micro-batch ``ingest_batch``. ``availableNow`` drains the backlog
    batch-by-batch (``maxFilesPerTrigger`` bounds batch size); swap the
    source for Kafka exactly as in ``streaming/pipeline.py``."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    src_schema = schema or StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    reader = spark.readStream.schema(src_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, state_path, dup_log_path, key_buckets)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
