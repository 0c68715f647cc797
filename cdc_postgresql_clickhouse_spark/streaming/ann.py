"""Streaming ANN index maintenance: IVF inverted lists grown incrementally
as vectors ARRIVE — the similarity-search twin of the streaming dedup
pipeline (embeddings are computed per ingest batch in a real corpus
pipeline; rebuilding the index from scratch per batch is the anti-pattern).

Design (same storage-not-state-store posture as ``streaming/dedup.py``):

- the coarse quantizer is a fixed MODEL table (centroids), extracted from
  the first micro-batch (the deterministic first-``n`` seed — identical to
  ``ann_ivf_topk``'s quantizer, so the incrementally-built index can be
  probed with the exact same code and oracle) and persisted beside the
  index; Lloyd-refreshing it is an offline job that rewrites the model and
  triggers a reassign — out of scope here, the ingest path is identical.
- each micro-batch assigns its vectors map-side against the broadcast
  centroid table (``queries.similarity.ivf_assign`` — argmax cosine, cid
  tie-break) and APPENDS (vec_id → cid) into the inverted-list table,
  partitioned by cid. Pure append: no merge contest, no read-modify-write,
  so batches never contend and replay just re-appends (readers of the
  assignment table ``distinct()`` it — the same at-least-once contract as
  the CDC change log / dup log).
- probing reads only the probed cids' partitions (partition-pruned scan) —
  ``queries.similarity.ivf_probe`` works unchanged on the streamed table.

Per-batch cost: O(batch × n_centroids) map-side + one append. At 100 TB the
inverted lists are exactly the cid-bucketed table the batch query would
build once; here it accretes per batch instead.

Reference tie-in: extends the S8 append-sink pattern
(``clickhouse_schemas.sql:36-37``, append-only change log) to the ANN
index domain; no analogue in the reference surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.similarity import (
    _emb_d,
    _norm,
    ivf_assign,
)

N_CENTROIDS = 16


def _model_path(assign_path: str) -> str:
    return assign_path.rstrip("/") + "_centroids"


def centroid_table(spark: SparkSession, assign_path: str) -> DataFrame:
    """The persisted quantizer model (cid, ce, cn)."""
    return spark.read.parquet(_model_path(assign_path))


def ingest_batch_ivf(
    spark: SparkSession,
    batch: DataFrame,
    assign_path: str,
    n_centroids: int = N_CENTROIDS,
) -> None:
    """Assign one micro-batch of (vec_id, embedding) rows against the
    persisted quantizer and append to the cid-partitioned inverted lists.
    On the first batch the quantizer is extracted (vec_id < n_centroids
    must be present — the seed contract) and persisted. Model creation and
    the append both run under the table's ``_state_lock`` (same convention
    as ``streaming/dedup.py``) so a concurrent ``compact_assignments``
    cannot swap the directory between this batch's write and its
    visibility."""
    from cdc_postgresql_clickhouse_spark.operators.state import _state_lock

    emb = batch.select("vec_id", _emb_d().alias("e")).withColumn("nrm", _norm(F.col("e")))
    with _state_lock(assign_path):
        mp = _model_path(assign_path)
        if not os.path.exists(mp):
            seed = emb.filter(F.col("vec_id") < n_centroids).select(
                F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
            )
            if seed.count() < n_centroids:
                raise ValueError(
                    f"first batch must contain the {n_centroids} seed vectors (vec_id < {n_centroids})"
                )
            seed.coalesce(1).write.parquet(mp)
        cents = spark.read.parquet(mp)
        assign = ivf_assign(emb, cents)
        assign.write.mode("append").partitionBy("cid").parquet(assign_path)


def run_incremental_ivf(
    spark: SparkSession,
    src_dir: str,
    assign_path: str,
    checkpoint_dir: str,
    n_centroids: int = N_CENTROIDS,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain ``src_dir`` (parquet files of vec_id, embedding) through the
    incremental IVF ingest with an availableNow trigger."""
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def handle(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        ingest_batch_ivf(batch.sparkSession, batch, assign_path, n_centroids)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_assignments(spark: SparkSession, assign_path: str, files_per_cid: int = 1) -> None:
    """Segment merge for the streamed IVF inverted lists — per-batch appends
    leave one file per (cid, batch); probing lists and opens all of them.
    Same protocol as the posting-table compaction
    (``streaming/postings.py::compact_partitioned_index``): distinct rows
    (dropping at-least-once replay duplicates), bounded files per cid,
    staged rename swap under the single-writer fence shared with
    ``ingest_batch_ivf`` (writer-safe; readers must tolerate a transient
    missing table during the swap — see ``compact_postings``)."""
    from cdc_postgresql_clickhouse_spark.streaming.postings import (
        compact_partitioned_index,
    )

    cols = [f.name for f in spark.read.parquet(assign_path).schema.fields]
    compact_partitioned_index(spark, assign_path, cols, "cid", files_per_cid)
