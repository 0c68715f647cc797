from __future__ import annotations

import os

import pytest

from cdc_postgresql_clickhouse_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="cdc-spark-tests",
        master=f"local[{os.environ.get('SPARK_TEST_CPUS', '4')}]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(autouse=True, scope="module")
def _clear_spark_cache_per_module():
    """Release persisted barriers between test modules. The full suite runs
    hundreds of queries through ONE local JVM; persist() barriers (shingle /
    weight / edge tables) otherwise accumulate for the whole session until
    the HOST runs dry and the DuckDB oracle dies with a bad-allocation OOM
    mid-suite (observed at the test_oracle_parity module boundary). Same fix
    as parity_sweep's per-query clearCache, at module grain so intra-module
    cache reuse (e.g. the shared clusters memo) still pays off."""
    yield
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.catalog.clearCache()
