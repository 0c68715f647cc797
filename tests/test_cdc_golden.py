"""Golden end-to-end replay of the reference DML walkthrough (survey §5):
the final state must equal the hand-computed 6-row result (FIXTURES.md §A.4),
and replaying any prefix/suffix/duplicate must be a no-op (at-least-once,
reference clickhouse_sink_configuration.json:13).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.cdc_transform import changes_to_state_updates
from cdc_postgresql_clickhouse_spark.operators.state import (
    apply_changes,
    consistency_check,
    current_state,
    snapshot_load,
)
from cdc_postgresql_clickhouse_spark.sources.envelope import (
    ENVELOPE_SCHEMA,
    flatten_envelope,
    golden_workload_df,
    golden_workload_envelopes,
)

EXPECTED = {
    "b1": ("Open", False),
    "b2": ("Created", False),
    "b7": ("Completed", False),
    "b8": ("Cancelled", True),
    "b9": ("Cancelled", True),
    "b10": ("Completed", False),
}


def _final_state(spark, envelopes_df):
    updates = changes_to_state_updates(envelopes_df)
    return current_state(updates)


def test_golden_final_state(spark):
    env = golden_workload_df(spark)
    state = _final_state(spark, env)
    rows = {r["booking_id"]: (r["status"], r["is_canceled"]) for r in state.collect()}
    assert rows == EXPECTED
    assert state.count() == 6  # README.md:321-329 count check


def test_idempotent_replay_full(spark):
    env = golden_workload_df(spark)
    doubled = env.unionByName(env)  # at-least-once: every event delivered twice
    state_once = _final_state(spark, env)
    state_twice = _final_state(spark, doubled)
    assert consistency_check(state_once, state_twice)


def test_incremental_batches_match_one_shot(spark):
    """Applying the stream in micro-batches through apply_changes must equal
    the one-shot read-time dedup — merge-time vs query-time FINAL equivalence."""
    events = golden_workload_envelopes()
    state = None
    for i in range(0, len(events), 7):
        batch = spark.createDataFrame(events[i : i + 7], schema=ENVELOPE_SCHEMA)
        state = apply_changes(state, changes_to_state_updates(batch))
    final_inc = state.filter(F.col("is_deleted") == 0).drop("is_deleted", "ts_ms")
    final_one = _final_state(spark, golden_workload_df(spark))
    assert consistency_check(final_inc, final_one)


def test_late_event_loses_version_contest(spark):
    """ST2: an old-version event arriving after a newer one must not win."""
    events = golden_workload_envelopes()
    # replay an early b5 update (low lsn) at the very end of the stream
    late = [e for e in events if e["after"] and e["after"]["booking_id"] == "b5"][0]
    env = spark.createDataFrame(events + [late], schema=ENVELOPE_SCHEMA)
    assert consistency_check(_final_state(spark, env), _final_state(spark, golden_workload_df(spark)))


def test_snapshot_load_then_stream(spark):
    """S7 + S3: backfill with version=1, then stream on top; streamed updates
    (lsn >= 1) must supersede snapshot rows."""
    events = golden_workload_envelopes()
    snap_rows = [dict(e["after"], **{}) for e in events[:10]]
    snap = spark.createDataFrame(snap_rows)
    snap = snap.withColumn("created_at", F.timestamp_micros("created_at")).withColumn(
        "modified_at", F.timestamp_micros("modified_at")
    ).withColumn("is_deleted", F.lit(0).cast("int")).drop("id")
    state0 = snapshot_load(snap.select("booking_id", "status", "is_deleted", "is_canceled", "created_at", "modified_at"))
    rest = spark.createDataFrame(events[10:], schema=ENVELOPE_SCHEMA)
    merged = apply_changes(state0, changes_to_state_updates(rest))
    final = merged.filter(F.col("is_deleted") == 0)
    rows = {r["booking_id"]: (r["status"], r["is_canceled"]) for r in final.collect()}
    assert rows == EXPECTED


def test_flatten_envelope_dotted_columns(spark):
    """T1: the Flatten$Value SMT equivalent produces the 18-column
    bookings_changes layout (clickhouse_schemas.sql:17-34)."""
    flat = flatten_envelope(golden_workload_df(spark))
    assert len(flat.columns) == 18
    assert "before.id" in flat.columns and "source.lsn" in flat.columns
    assert flat.count() == len(golden_workload_envelopes())


def test_tie_break_delete_wins(spark):
    """Equal (version, ts_ms): the delete must deterministically win."""
    row = {"id": 1, "booking_id": "x", "status": "Open", "is_deleted": False,
           "is_canceled": False, "created_at": 0, "modified_at": 0}
    ev = [
        {"before": None, "after": row, "op": "c", "ts_ms": 5, "source": {"sequence": "", "lsn": 7}},
        {"before": row, "after": None, "op": "d", "ts_ms": 5, "source": {"sequence": "", "lsn": 7}},
    ]
    env = spark.createDataFrame(ev, schema=ENVELOPE_SCHEMA)
    assert _final_state(spark, env).count() == 0


def test_reconciliation_report_matches_data_derived_expectation(spark, sf_dir):
    """n_src_only must equal the number of keys whose arg-max change falls in
    the simulated delivery gap (data-derived, so the test holds at any sf),
    and consistency is exactly the zero-divergence predicate."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.cdc import (
        RECON_DROP_MOD,
        RECON_DROP_RESIDUE,
        _latest,
        cdc_reconciliation_report,
    )
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    r = cdc_reconciliation_report(spark, sf_dir).first()
    ev = load_table(spark, sf_dir, "events")
    dropped_latest = (
        _latest(ev)
        .filter(F.col("event_id") % RECON_DROP_MOD == RECON_DROP_RESIDUE)
        .count()
    )
    assert r.n_src_only == dropped_latest
    assert r.consistent == (r.n_src_only == 0 and r.n_dst_only == 0)
    # self-comparison is consistent (the operator's no-divergence branch)
    assert _latest(ev).exceptAll(_latest(ev)).isEmpty()


def test_reconciliation_detects_divergence_on_planted_gap(spark, tmp_path):
    """Synthetic guarantee: a key whose LATEST change has
    event_id % RECON_DROP_MOD == RECON_DROP_RESIDUE must surface as one
    src-only row and one dst-only (resurrected older image) row."""
    import datetime

    from cdc_postgresql_clickhouse_spark.queries.cdc import (
        RECON_DROP_MOD,
        RECON_DROP_RESIDUE,
        cdc_reconciliation_report,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: update chain ending in a DROPPED change (id == residue)
        (1, t0, 1, "created", 1.0, "{}"),
        (RECON_DROP_RESIDUE, t0 + datetime.timedelta(minutes=1), 1, "updated", 2.0, "{}"),
        # user 2: untouched chain
        (2, t0, 2, "created", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    r = cdc_reconciliation_report(spark, str(tmp_path)).first()
    assert not r.consistent
    assert r.n_src_only == 1 and r.n_dst_only == 1
    assert r.src_rows == 2 and r.dst_rows == 2
