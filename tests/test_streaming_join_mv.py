"""Join-MV laws beyond the oracle equivalence row: a change on ONE side
retracts and re-adds the pair with the OTHER side's unchanged row, a
tombstone on either side kills the pair, stale deliveries produce no
delta, the batch-id fence makes replay a no-op, and a scrambled split of
real events converges to the batch join."""

from __future__ import annotations

import shutil
import tempfile

from cdc_postgresql_clickhouse_spark.streaming.join_mv import (
    ingest_batch_join_mv,
    read_join_mv,
)

_SCHEMA = "user_id long, us long, eid long, event_type string, cents long"


def _mv(spark, path) -> dict:
    return {
        (r.a_type, r.b_type): (r.n_pairs, r.sum_a_cents)
        for r in read_join_mv(spark, path).collect()
    }


def test_planted_join_retraction_semantics(spark):
    tmp = tempfile.mkdtemp(prefix="jmv_law_")
    try:
        # user 1: A=view(100), B=click  -> pair (view, click)
        # user 2: A only -> no pair until B arrives
        b0 = spark.createDataFrame(
            [(1, 10, 2, "view", 100), (1, 10, 3, "click", 0),
             (2, 10, 4, "view", 200)],
            _SCHEMA,
        )
        ingest_batch_join_mv(spark, b0, tmp, batch_id=0)
        assert _mv(spark, tmp) == {("view", "click"): (1, 100)}

        # user 2's B side arrives -> pair appears with the OLD A row's cents
        b1 = spark.createDataFrame([(2, 20, 5, "search", 0)], _SCHEMA)
        ingest_batch_join_mv(spark, b1, tmp, batch_id=1)
        assert _mv(spark, tmp) == {
            ("view", "click"): (1, 100), ("view", "search"): (1, 200),
        }

        # user 1's A side migrates view -> purchase: the pair must move
        # groups, keeping the unchanged B side (cross-side coupling)
        b2 = spark.createDataFrame([(1, 30, 6, "purchase", 300)], _SCHEMA)
        ingest_batch_join_mv(spark, b2, tmp, batch_id=2)
        assert _mv(spark, tmp) == {
            ("purchase", "click"): (1, 300), ("view", "search"): (1, 200),
        }

        # replay of batch 2: fenced to a no-op
        ingest_batch_join_mv(spark, b2, tmp, batch_id=2)
        assert _mv(spark, tmp) == {
            ("purchase", "click"): (1, 300), ("view", "search"): (1, 200),
        }

        # stale delivery for user 1's A side (even eid, older version):
        # loses the arg-max, no delta
        b3 = spark.createDataFrame([(1, 15, 8, "view", 999)], _SCHEMA)
        ingest_batch_join_mv(spark, b3, tmp, batch_id=3)
        assert _mv(spark, tmp) == {
            ("purchase", "click"): (1, 300), ("view", "search"): (1, 200),
        }

        # tombstone user 2's B side: the pair dies although A is live
        b4 = spark.createDataFrame([(2, 40, 9, "error", 0)], _SCHEMA)
        ingest_batch_join_mv(spark, b4, tmp, batch_id=4)
        assert _mv(spark, tmp) == {("purchase", "click"): (1, 300)}

        # un-delete user 2's B side: the pair comes back
        b5 = spark.createDataFrame([(2, 50, 11, "click", 0)], _SCHEMA)
        ingest_batch_join_mv(spark, b5, tmp, batch_id=5)
        assert _mv(spark, tmp) == {
            ("purchase", "click"): (1, 300), ("view", "click"): (1, 200),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(f"{tmp}.lock", ignore_errors=True)


def test_scrambled_split_converges_to_batch_join(spark, sf_dir):
    """Three eid-mod-3 splits of real events in scrambled arrival order:
    the MV must equal the batch join of the two sides' soft-deleted
    current states."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    tmp = tempfile.mkdtemp(prefix="jmv_ooo_")
    try:
        for i, part in enumerate((2, 0, 1)):  # scrambled arrival order
            ingest_batch_join_mv(
                spark, ev.filter(F.col("eid") % 3 == part), tmp, batch_id=i
            )
        got = _mv(spark, tmp)

        def side(parity):
            from pyspark.sql import Window

            w = Window.partitionBy("user_id").orderBy(F.desc("us"), F.desc("eid"))
            return (
                ev.filter(F.col("eid") % 2 == parity)
                .withColumn("rn", F.row_number().over(w))
                .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
            )

        a = side(0).select("user_id", F.col("event_type").alias("a_type"), "cents")
        b = side(1).select("user_id", F.col("event_type").alias("b_type"))
        want = {
            (r.a_type, r.b_type): (r.n, r.s)
            for r in a.join(b, "user_id")
            .groupBy("a_type", "b_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
            .collect()
        }
        assert got == want and want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(f"{tmp}.lock", ignore_errors=True)
