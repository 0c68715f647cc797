"""Streaming incremental dedup (VERDICT r3 item 7): replaying a corpus in
micro-batches must yield the SAME duplicate set and canonical assignments as
batch exact dedup over the union — including when a smaller doc_id arrives
AFTER a larger copy (dethronement)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.streaming.dedup import (
    ingest_batch,
    run_incremental_dedup,
)


def _batch_dup_set(spark, corpus):
    keep = corpus.select(F.md5("text").alias("h"), "doc_id").groupBy("h").agg(
        F.min("doc_id").alias("keep_doc")
    )
    return {
        (r.doc_id, r.keep_doc)
        for r in corpus.select(F.md5("text").alias("h"), "doc_id")
        .join(keep, "h")
        .filter(F.col("doc_id") != F.col("keep_doc"))
        .collect()
    }


def test_two_batch_replay_equals_batch_dedup_exact(spark, sf_dir, tmp_path):
    """Documents then exact copies (+offset ids) in a later batch: the dup
    log equals the batch dedup_exact duplicate set over the union."""
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 9 == 4).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    copies.coalesce(1).write.mode("append").parquet(src)
    run_incremental_dedup(
        spark,
        src,
        str(tmp_path / "state"),
        str(tmp_path / "dups"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    got = {
        (r.doc_id, r.keep_doc)
        for r in spark.read.parquet(str(tmp_path / "dups")).distinct().collect()
    }
    want = _batch_dup_set(spark, docs.unionByName(copies))
    assert got == want and len(want) > 0
    # state holds every distinct hash exactly once, canonical = min id
    state = spark.read.parquet(str(tmp_path / "state"))
    assert state.groupBy("content_hash").count().filter("count > 1").isEmpty()


def test_dethronement_when_smaller_id_arrives_late(spark, tmp_path):
    """Copy arrives BEFORE its original: the early copy is canonical until
    the original (smaller id) lands, at which point the old canonical must
    be logged as a duplicate — final result is arrival-order independent."""
    state, dups = str(tmp_path / "state"), str(tmp_path / "dups")
    b1 = spark.createDataFrame([(100, "alpha beta"), (7, "unrelated")], "doc_id long, text string")
    b2 = spark.createDataFrame([(3, "alpha beta"), (200, "alpha beta")], "doc_id long, text string")
    ingest_batch(spark, b1, state, dups)
    ingest_batch(spark, b2, state, dups)
    got = {
        (r.doc_id, r.keep_doc)
        for r in spark.read.parquet(dups).distinct().collect()
    }
    union = b1.unionByName(b2)
    assert got == _batch_dup_set(spark, union) == {(100, 3), (200, 3)}
    st = {r.keep_doc for r in spark.read.parquet(state).collect()}
    assert st == {3, 7}


def test_replay_is_stable(spark, tmp_path):
    """Re-ingesting an already-processed batch never changes canonicals and
    adds no NEW (doc, keep) pairs to the dup log (at-least-once appends may
    duplicate rows; distinct() collapses them)."""
    state, dups = str(tmp_path / "state"), str(tmp_path / "dups")
    b = spark.createDataFrame(
        [(1, "x y z"), (9, "x y z"), (4, "q r")], "doc_id long, text string"
    )
    ingest_batch(spark, b, state, dups)
    first = {
        (r.doc_id, r.keep_doc) for r in spark.read.parquet(dups).distinct().collect()
    }
    ingest_batch(spark, b, state, dups)  # at-least-once replay
    second = {
        (r.doc_id, r.keep_doc) for r in spark.read.parquet(dups).distinct().collect()
    }
    assert first == second == {(9, 1)}
    st = spark.read.parquet(state)
    assert {(r.keep_doc, r.content_hash) for r in st.collect()} == {
        (r.keep_doc, r.content_hash) for r in st.collect()
    }
    assert st.count() == 2


def test_streaming_minhash_equals_batch_lsh(spark, sf_dir, tmp_path):
    """Replaying the dedup corpus in 2 micro-batches (originals, then their
    near-duplicates) through the incremental banded-LSH index must discover
    exactly the batch dedup_minhash_lsh pair set, jaccard values included."""
    from cdc_postgresql_clickhouse_spark.queries.dedup import (
        DERIVED_OFFSET,
        _corpus,
        dedup_minhash_lsh,
    )
    from cdc_postgresql_clickhouse_spark.streaming.dedup import run_incremental_minhash

    corpus = _corpus(spark, sf_dir)
    src = str(tmp_path / "src")
    corpus.filter(F.col("doc_id") < DERIVED_OFFSET).coalesce(1).write.parquet(src)
    corpus.filter(F.col("doc_id") >= DERIVED_OFFSET).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_incremental_minhash(
        spark,
        src,
        str(tmp_path / "bands"),
        str(tmp_path / "docs"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(str(tmp_path / "pairs")).distinct().collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_incremental_ivf_equals_batch_index(spark, sf_dir, tmp_path):
    """Replaying the embeddings in 2 micro-batches through the incremental
    IVF ingest yields an assignment table identical to the batch build, and
    probing it reproduces batch ann_ivf_topk row-for-row."""
    import os

    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        _emb_d,
        _norm,
        ann_ivf_topk,
        ivf_probe,
    )
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table
    from cdc_postgresql_clickhouse_spark.streaming.ann import (
        centroid_table,
        run_incremental_ivf,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    src = str(tmp_path / "src")
    assign_path = str(tmp_path / "assign")
    emb.filter((F.col("vec_id") < 16) | (F.col("vec_id") % 2 == 0)).coalesce(1).write.parquet(src)
    emb.filter((F.col("vec_id") >= 16) & (F.col("vec_id") % 2 == 1)).coalesce(1).write.mode("append").parquet(src)
    run_incremental_ivf(spark, src, assign_path, str(tmp_path / "ckpt"))
    assign = spark.read.parquet(assign_path).select("vec_id", "cid").distinct()
    assert assign.count() == emb.count()
    full = emb.select("vec_id", _emb_d().alias("e")).withColumn("nrm", _norm(F.col("e")))
    streamed = ivf_probe(full, centroid_table(spark, assign_path), assign)
    batch = ann_ivf_topk(spark, sf_dir)
    srows = sorted(map(tuple, streamed.collect()))
    brows = sorted(map(tuple, batch.collect()))
    assert srows == brows


def test_restart_from_checkpoint_processes_only_new_files(spark, sf_dir, tmp_path):
    """Production restart semantics: a SECOND run against the same
    checkpoint after new files land must (a) not reprocess the drained
    files — the dup log gains no rows for old data — and (b) compose state
    across runs so the final dup set equals a one-shot build over the
    union. This is the crash/redeploy path of dedup-as-data-arrives."""
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    copies = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
    )
    src = str(tmp_path / "src")
    state, dups, ckpt = (str(tmp_path / n) for n in ("state", "dups", "ckpt"))

    docs.coalesce(1).write.parquet(src)
    run_incremental_dedup(spark, src, state, dups, ckpt, max_files_per_trigger=1)
    import os

    first = (
        {tuple(r) for r in spark.read.parquet(dups).distinct().collect()}
        if os.path.exists(dups)
        else set()
    )
    assert first == set()  # originals only: nothing duplicated yet

    # process crash/redeploy: new data arrives, stream restarts on the
    # SAME checkpoint
    copies.coalesce(1).write.mode("append").parquet(src)
    run_incremental_dedup(spark, src, state, dups, ckpt, max_files_per_trigger=1)
    got = {
        (r.doc_id, r.keep_doc)
        for r in spark.read.parquet(dups).distinct().collect()
    }
    want = _batch_dup_set(spark, docs.unionByName(copies))
    assert got == want and len(want) > 0
    # every logged duplicate is from the post-restart batch: nothing old
    # was reprocessed into the log
    assert all(d >= 5_000_000 for d, _ in got)
