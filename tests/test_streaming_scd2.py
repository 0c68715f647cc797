"""Streaming SCD2 laws beyond the oracle equivalence row: at-least-once
replay idempotence, mid-timeline splicing of late arrivals, and the chain
law on the maintained table."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.cdc import cdc_scd2_history
from cdc_postgresql_clickhouse_spark.streaming.scd2 import (
    ingest_batch_scd2,
    read_scd2,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def _raw(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
    )


def _canon(df) -> pd.DataFrame:
    out = df.toPandas().sort_values(["user_id", "valid_from_es", "event_id"])
    return out.reset_index(drop=True)[
        ["user_id", "event_id", "event_type", "value", "valid_from_es", "valid_to_es", "is_current"]
    ]


def test_scd2_ingest_splices_late_batch_and_matches_batch_form(spark, sf_dir):
    """Batch 1 = later half of each user's events (by event_id parity it is
    a mix), batch 2 = the rest: after both ingests the state equals the
    one-shot batch SCD2 exactly, proving late changes splice into the
    middle of existing chains rather than appending."""
    raw = _raw(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="scd2_t_")
    try:
        state = os.path.join(tmp, "state")
        ingest_batch_scd2(spark, raw.filter(F.col("event_id") % 2 == 0), state)
        ingest_batch_scd2(spark, raw.filter(F.col("event_id") % 2 == 1), state)
        got = _canon(read_scd2(spark, state))
        want = _canon(cdc_scd2_history(spark, sf_dir))
        pd.testing.assert_frame_equal(got, want)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_scd2_replay_is_idempotent(spark, sf_dir):
    """Re-ingesting an already-applied batch leaves the state identical —
    the at-least-once contract (replayed rows are byte-identical and
    collapse in the distinct)."""
    raw = _raw(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="scd2_r_")
    try:
        state = os.path.join(tmp, "state")
        b1 = raw.filter(F.col("event_id") % 2 == 0)
        b2 = raw.filter(F.col("event_id") % 2 == 1)
        ingest_batch_scd2(spark, b1, state)
        ingest_batch_scd2(spark, b2, state)
        before = _canon(read_scd2(spark, state))
        ingest_batch_scd2(spark, b2, state)  # replay
        after = _canon(read_scd2(spark, state))
        pd.testing.assert_frame_equal(before, after)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_scd2_state_obeys_chain_law(spark, sf_dir):
    """On the maintained table: per user exactly one open interval and
    every closed interval hands off exactly where the next begins."""
    raw = _raw(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="scd2_c_")
    try:
        state = os.path.join(tmp, "state")
        ingest_batch_scd2(spark, raw.filter(F.col("event_id") % 3 != 1), state)
        ingest_batch_scd2(spark, raw.filter(F.col("event_id") % 3 == 1), state)
        out = read_scd2(spark, state).toPandas()
        assert (out.groupby("user_id")["is_current"].sum() == 1).all()
        for _, g in out.groupby("user_id"):
            g = g.sort_values(["valid_from_es", "event_id"]).reset_index(drop=True)
            nxt = g["valid_from_es"].shift(-1)
            closed = g["valid_to_es"].notna()
            assert (g.loc[closed, "valid_to_es"] == nxt[closed]).all()
            assert pd.isna(g["valid_to_es"].iloc[-1])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
