"""The result-type lint (oracle_harness.type_lint) must catch the two bug
classes that each cost a driver round before value comparison could see them:

- r6: DuckDB widens SUM(BIGINT) to HUGEINT → Arrow decimal128(38,0) while
  Spark emits int64 (events_histogram_equi / events_winsorized_stats);
- r4: a float-interpolating oracle (AVG, continuous percentile) against a
  Spark bigint column (events_anomaly_mad's original form).

Both produce IDENTICAL values at small SF — pandas coerces them equal — but
the driver hashes at the Arrow layer where the types differ. These tests
plant exactly those divergences and assert the lint hard-fails them, and
that the repo-convention casts (::BIGINT / ::DOUBLE) silence it."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_con, type_lint


@pytest.fixture
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


def _spark_sum(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("s")
    )


def test_lint_catches_hugeint_sum(spark, sf_dir, con):
    """The exact r6 red: uncast SUM over BIGINT is HUGEINT in DuckDB."""
    df = _spark_sum(spark, sf_dir)
    bad = """
    SELECT event_type, SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS s
    FROM events GROUP BY event_type
    """
    issues = type_lint(df, con, bad, "planted_hugeint")
    assert issues and "decimal" in issues[0] and "int" in issues[0], issues
    # ... and the full compare() treats it as a HARD failure, not a [WARN]
    hard = [i for i in compare(df, con, bad, "planted_hugeint") if "[WARN]" not in i]
    assert hard, "compare() must hard-fail a decimal-vs-int oracle"

    good = bad.replace("AS s", ":: BIGINT AS s").replace(":: ", "::")
    assert not type_lint(df, con, good, "cast_bigint")
    assert not [i for i in compare(df, con, good, "cast_bigint") if "[WARN]" not in i]


def test_lint_catches_float_vs_int(spark, sf_dir, con):
    """The r4 class: a float-typed oracle column against a Spark bigint."""
    df = _spark_sum(spark, sf_dir)
    bad = """
    SELECT event_type,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS s
    FROM events GROUP BY event_type
    """
    issues = type_lint(df, con, bad, "planted_float")
    assert issues and "float" in issues[0], issues


def test_lint_binds_without_executing(spark, sf_dir, con):
    """LIMIT-0 wrapping must bind CTE-shaped oracles (the common shape)."""
    df = _spark_sum(spark, sf_dir)
    cte = """
    WITH ev AS (
      SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
      FROM events
    )
    SELECT event_type, SUM(c)::BIGINT AS s FROM ev GROUP BY event_type
    """
    assert not type_lint(df, con, cte, "cte_shape")
