"""Delta MERGE INTO production form of the state sink (S9; reference
semantics schemas/clickhouse_schemas.sql:11-13). delta-spark is absent in
this sandbox, so the executable MERGE test is skipped here and the
merge-condition SQL (the part that encodes the semantics) is verified
against the same lexicographic order apply_changes uses."""

from __future__ import annotations

import pytest

from cdc_postgresql_clickhouse_spark.operators.state import (
    DEFAULT_VERSION_ORDER,
    _merge_key_condition,
    _merge_newer_condition,
    delta_available,
    upsert_changes_delta,
)


def test_merge_condition_sql():
    assert _merge_key_condition(("booking_id",)) == "t.booking_id = s.booking_id"
    assert _merge_key_condition(("a", "b")) == "t.a = s.a AND t.b = s.b"
    cond = _merge_newer_condition(("version",))
    assert cond == "((s.version IS NOT NULL AND (t.version IS NULL OR s.version > t.version)))"
    two = _merge_newer_condition(("version",), ("x",))
    assert "s.version <=> t.version" in two and "s.x > t.x" in two


def test_merge_newer_matches_total_order(spark):
    """The merge condition ranks exactly like the batch path's total order
    (version cols desc nulls-last, then rest cols): evaluate it over every
    ordered pair of tuples including NULLs (sort as -inf) and full version
    ties (broken by the rest column, here `x`)."""
    tuples = [
        (1, 0, 0, 10),
        (1, 0, 1, 10),
        (1, 5, 0, 10),
        (2, 0, 0, 10),
        (2, 0, 1, 10),
        (None, 0, 0, 10),  # NULL version: loses to any non-null version
        (2, None, 1, 10),  # NULL mid-column
        (2, 0, 1, 20),     # full version tie vs id=4: rest column decides
    ]
    rows = [(i, *t) for i, t in enumerate(tuples)]
    df = spark.createDataFrame(
        rows, "id int, version long, ts_ms long, is_deleted int, x long"
    )
    s = df.alias("s")
    t = df.alias("t")
    cond = _merge_newer_condition(DEFAULT_VERSION_ORDER, ("x",))
    got = (
        s.crossJoin(t)
        .selectExpr("s.id AS sid", "t.id AS tid", f"{cond} AS newer")
        .collect()
    )

    def key(tp):
        return tuple(float("-inf") if v is None else v for v in tp)

    for r in got:
        assert r.newer == (key(tuples[r.sid]) > key(tuples[r.tid])), (r.sid, r.tid)


def test_missing_delta_raises_clean_importerror(spark):
    if delta_available():
        pytest.skip("delta-spark installed; covered by test_delta_merge_roundtrip")
    with pytest.raises(ImportError, match="delta-spark"):
        upsert_changes_delta(spark, spark.range(1), "/tmp/never-written")


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_merge_roundtrip(spark, tmp_path):
    """Where Delta exists: MERGE-maintained state equals the batch arg-max
    path on the golden workload (replay included: idempotence under
    at-least-once, S10)."""
    from cdc_postgresql_clickhouse_spark.operators.cdc_transform import changes_to_state_updates
    from cdc_postgresql_clickhouse_spark.operators.state import apply_changes, current_state
    from cdc_postgresql_clickhouse_spark.sources.envelope import golden_workload_df

    changes = changes_to_state_updates(golden_workload_df(spark))
    path = str(tmp_path / "delta_state")
    upsert_changes_delta(spark, changes, path)
    upsert_changes_delta(spark, changes, path)  # replay must be a no-op
    merged = spark.read.format("delta").load(path)
    expect = apply_changes(None, changes)
    assert current_state(merged).exceptAll(current_state(expect)).isEmpty()
    assert current_state(expect).exceptAll(current_state(merged)).isEmpty()
