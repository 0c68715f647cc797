"""Every registered query must match its DuckDB oracle at sf0.001 — the local
twin of the driver's CORRECTNESS gate (BASELINE.md driver-defined targets)."""

from __future__ import annotations

import pytest

from cdc_postgresql_clickhouse_spark.queries import all_oracles, all_queries
from tests.oracle_harness import compare, duckdb_con

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may omit the oracle; keep the list explicit
    allowed_missing: set[str] = set()
    assert missing == allowed_missing


def test_no_orphan_oracles():
    assert set(ORACLES) <= set(QUERIES)


@pytest.fixture
def con(sf_dir):
    # per-TEST connection (was module-scoped): this module runs a hundred-plus
    # oracle queries through one process — a long-lived DuckDB instance plus
    # Spark's intra-module cache growth exhausted HOST memory twice in full
    # suite runs ("bad allocation" on a KB-sized block). Reconnecting frees
    # the allocator every test; view registration is milliseconds.
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.fixture(autouse=True)
def _clear_spark_cache_per_test():
    yield
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.catalog.clearCache()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name, spark, sf_dir, con):
    if name not in ORACLES:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check, as the driver does
        return
    issues = compare(QUERIES[name](spark, sf_dir), con, ORACLES[name], name)
    hard = [i for i in issues if "[WARN]" not in i]
    assert not hard, "\n".join(issues)


def test_harness_detects_value_divergence(spark, sf_dir):
    """Meta-guard: the compare harness must be ABLE to fail — a silently
    degenerate harness (e.g. comparing empty frames, or hashing column
    names only) would turn every parity row green. Run a real query against
    a deliberately perturbed oracle and require a reported mismatch."""
    import __spark_entry__ as entry
    from tests.oracle_harness import compare, duckdb_con

    con = duckdb_con(sf_dir)
    df = entry.queries()["cdc_count_final"](spark, sf_dir)
    good = entry.oracle_sql()["cdc_count_final"]
    assert compare(df, con, good, "self") == []
    # off-by-one oracle: the value hash must flag it
    bad = f"SELECT n_live + 1 AS n_live FROM ({good})"
    assert compare(df, con, bad, "perturbed") != []
    # column-rename oracle: the schema check must flag it
    renamed = f"SELECT n_live AS n_alive FROM ({good})"
    assert compare(df, con, renamed, "renamed") != []
