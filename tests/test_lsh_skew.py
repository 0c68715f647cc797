"""The one 100 TB risk the dedup/ANN family didn't pin (VERDICT r6 item 6):
a pathological LSH bucket. A near-constant corpus slice collides into the
SAME (band, band_hash) bucket in EVERY band, so one shuffle partition of
the candidate self-join carries that whole slice — at scale, a straggler
task doing the bucket's O(k²) pairing alone.

The engine's answer is AQE skew-join handling (on by default in
session.py): the oversized partition is split into sub-parts, each joined
against a duplicate of the matching side, so the hot bucket's fan-out is
spread across tasks instead of landing on one. This test plants exactly
that corpus shape — 30% of docs sharing one band-hash per band, in the
operator's real posexplode'd bands layout (queries/dedup.py
dedup_minhash_lsh) — lowers the AQE skew thresholds to make the planted
skew visible at test size (the default 256 MB threshold targets real
clusters), and pins both:

- the executed plan applied the skew split (``skew=true`` on the
  SortMergeJoin, i.e. the hot partition became multiple tasks), and
- the candidate count is EXACT despite the split+duplicate rewrite.
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_DOCS = 10_000
N_HOT = 3_000
N_BANDS = 4

_SKEW_CONFS = {
    # partition is skewed when > max(factor × median, threshold); the
    # planted hot partition is ~1.5× the median and well over 16 KiB
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    # the bands table is tiny at test size; force the SMJ the operator
    # plans at real scale, where neither side broadcasts
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _bands(spark):
    """The operator's bands layout: one (doc_id, band, band_hash) row per
    band per doc. Hot docs share a constant hash in EVERY band (a
    near-constant corpus slice); the rest get md5-distributed hashes."""
    return (
        spark.range(N_DOCS)
        .select(
            "id",
            F.explode(F.array(*[F.lit(i) for i in range(N_BANDS)])).alias("band"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "band",
            F.when(
                F.col("id") < N_HOT,
                F.concat(F.lit("HOT"), F.col("band").cast("string")),
            )
            .otherwise(
                F.md5(
                    F.concat(
                        F.col("id").cast("string"),
                        F.lit("|"),
                        F.col("band").cast("string"),
                    )
                )
            )
            .alias("bh"),
        )
    )


def test_planted_hot_lsh_bucket_splits_under_aqe_and_stays_exact(spark):
    saved = {}
    for k, v in _SKEW_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        bands = _bands(spark)
        a, b = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh")),
            )
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
        )
        counted = cand.groupBy().count()
        # exact despite the split-and-duplicate rewrite: every hot pair
        # appears once per band, nothing else collides
        n_pairs = counted.collect()[0][0]
        assert n_pairs == N_BANDS * N_HOT * (N_HOT - 1) // 2

        plan = counted._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "AQE did not split the planted hot LSH bucket — the candidate "
            "join would straggle on one task at scale:\n" + plan[:4000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
