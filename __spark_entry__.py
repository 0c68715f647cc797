"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC current-state query on sf0.001.
``queries()``   — every implemented operator (SURVEY.md §2 + extension layer).
``oracle_sql()``— DuckDB twins, column-aligned for the value-hash compare.

Implementation lives in ``cdc_postgresql_clickhouse_spark``; this module is
just the registry surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_postgresql_clickhouse_spark.queries import all_oracles, all_queries  # noqa: E402
from cdc_postgresql_clickhouse_spark.session import apply_session_defaults  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the CDC current-state (FINAL-equivalent) view — the
    reference's single most load-bearing operator (SURVEY.md §2.10 R1) —
    over the events fixture at sf0.001."""
    apply_session_defaults(spark)
    return all_queries()["cdc_current_state"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    regs = all_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_session_defaults(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in regs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (column-name aligned)."""
    return all_oracles()
