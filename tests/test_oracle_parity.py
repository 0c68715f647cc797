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


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name, spark, sf_dir, con):
    if name not in ORACLES:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check, as the driver does
        return
    issues = compare(QUERIES[name](spark, sf_dir), con, ORACLES[name], name)
    hard = [i for i in issues if "[WARN]" not in i]
    assert not hard, "\n".join(issues)
