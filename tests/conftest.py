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
