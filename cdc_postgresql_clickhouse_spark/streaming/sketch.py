"""Streaming HLL maintenance: the distinct-count sketch grown incrementally
as events ARRIVE — the sketch x streaming composition (VERDICT r4 #9):
telemetry pipelines keep per-key cardinality sketches continuously, not by
rescanning history per query.

Design (storage-not-state-store, the posture of ``streaming/dedup.py`` /
``streaming/postings.py``):

- a micro-batch's HLL state is a pure function of the batch
  (``queries.sketches.hll_registers``: per (event_type, register) the max
  rho), and HLL states merge by per-cell MAX — so the ingest APPENDS each
  batch's register table and readers max-merge at read time
  (``read_hll_registers``). No read-modify-write, batches never contend
  beyond the compact fence, and an at-least-once replay just re-appends
  rows whose max-merge is a no-op: MAX is idempotent, THE property that
  makes this sketch streamable.
- state size: |keys| x 64 registers per batch appended; the read-time merge
  and periodic compaction (``compact_partitioned_index`` with part column
  ``event_type``) keep it sketch-sized. At 100 TB of events the state that
  ever exists is (batches x keys x 64) integers — corpus-independent.
- the estimator is shared verbatim with the batch query
  (``queries.sketches.hll_report``), so the incrementally-built sketch is
  scored by exactly the code the batch oracle verifies.

Reference tie-in: S8 append-sink pattern (``clickhouse_schemas.sql:36-37``)
extended to sketch state; ClickHouse's ``uniqState``/``uniqMerge``
AggregatingMergeTree idiom is the same merge-by-cell design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.sketches import hll_registers


def ingest_batch_hll(batch: DataFrame, state_path: str) -> None:
    """Append one micro-batch's register table. Holds the table's
    ``_state_lock`` (repo convention for streamed-index mutators) so a
    concurrent compaction cannot swap the directory mid-append."""
    from cdc_postgresql_clickhouse_spark.operators.state import _state_lock

    regs = hll_registers(batch)
    with _state_lock(state_path):
        regs.write.mode("append").parquet(state_path)


def read_hll_registers(spark: SparkSession, state_path: str) -> DataFrame:
    """The merged sketch state: per-cell MAX over every appended batch —
    idempotent under at-least-once replay."""
    return (
        spark.read.parquet(state_path)
        .groupBy("event_type", "reg")
        .agg(F.max("mj").alias("mj"))
    )


def _drain(spark, src_dir, handle, checkpoint_dir, max_files_per_trigger):
    """Shared availableNow micro-batch drain for the sketch ingests."""
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def guarded(batch: DataFrame, _batch_id: int) -> None:
        if not batch.isEmpty():
            handle(batch)

    q = (
        stream.writeStream.foreachBatch(guarded)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_incremental_hll(
    spark: SparkSession,
    src_dir: str,
    state_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain ``src_dir`` (parquet files of events rows) through the
    incremental HLL ingest with an availableNow trigger."""
    _drain(
        spark, src_dir, lambda b: ingest_batch_hll(b, state_path),
        checkpoint_dir, max_files_per_trigger,
    )


# --- streaming bottom-k quantile state ---------------------------------------
#
# The mergeable quantile sketch (``queries.sketches.sketch_quantile_bottomk``)
# streamed: each micro-batch appends ITS OWN bottom-k state (per key, the k
# events with smallest md5(event_id), carrying integer cents), and readers
# re-rank the union keeping k — exact because bottom-k(∪ of per-batch
# bottom-k's) = bottom-k(∪), the same theorem the batch merge row pins.
# At-least-once replay appends duplicate (h, c) rows; the read-time
# ``distinct()`` drops them (h is unique per event), the postings-table
# contract. State: k rows per key per batch appended, sketch-sized forever.


def ingest_batch_bottomk(batch: DataFrame, state_path: str, k: int = None) -> None:
    """Append one micro-batch's bottom-k quantile state (event_type, h, c)."""
    from cdc_postgresql_clickhouse_spark.operators.state import _state_lock
    from cdc_postgresql_clickhouse_spark.queries.sketches import QSK_K, _bottomk_state

    st = _bottomk_state(batch, k if k is not None else QSK_K)
    with _state_lock(state_path):
        st.write.mode("append").parquet(state_path)


def read_bottomk_state(spark: SparkSession, state_path: str, k: int = None) -> DataFrame:
    """The merged sketch state: distinct (replay dedup), then re-rank by
    hash keeping k per key — exactly the batch state of the full stream."""
    from pyspark.sql import Window

    from cdc_postgresql_clickhouse_spark.queries.sketches import QSK_K

    kk = k if k is not None else QSK_K
    raw = spark.read.parquet(state_path).select("event_type", "h", "c").distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    return raw.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= kk).drop("rn")


def run_incremental_bottomk(
    spark: SparkSession,
    src_dir: str,
    state_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain ``src_dir`` (parquet files of events rows) through the
    incremental bottom-k quantile ingest with an availableNow trigger."""
    _drain(
        spark, src_dir, lambda b: ingest_batch_bottomk(b, state_path),
        checkpoint_dir, max_files_per_trigger,
    )
