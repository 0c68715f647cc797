"""SparkSession factory with the engine's scale-oriented defaults.

Defaults chosen for a large cluster and validated on local[N]:

- UTC session timezone: the reference stores UTC everywhere
  (``schemas/postgresql_schemas.sql:7-8``, ``clickhouse_schemas.sql:7-8``).
- AQE on (coalesce + skew join): replaces hand-tuned shuffle partition counts;
  at 100 TB, skewed CDC keys / join keys are re-planned at runtime.
- Arrow enabled: any Pandas-UDF extension operator gets vectorized transfer.
- shuffle.partitions sized to cores locally; on a real cluster AQE coalesces
  from a deliberately-high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: keep splits big enough to amortize footer reads but small
    # enough that a 100 TB table still yields ~1e6 tasks, not 1e8.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast threshold: dimension tables (region/nation/supplier/part at
    # our SFs; any <~64MB dim at scale) should broadcast, not shuffle.
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
}


def get_spark(
    app_name: str = "cdc-postgresql-clickhouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master=None`` defers to the environment (driver harness / spark-submit);
    tests pass ``local[N]`` explicitly.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    # executor Python workers must resolve this package even when the driver
    # process was launched from elsewhere (Pandas-UDF closures are otherwise
    # self-contained, but keep the path for user-defined extensions)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    builder = builder.config(
        "spark.executorEnv.PYTHONPATH", f"{repo_root}:{existing}" if existing else repo_root
    )
    confs = dict(DEFAULT_CONFS)
    cores = os.cpu_count() or 8
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions or max(cores, 8))
    if master and master.startswith("local"):
        # local mode = driver does all the work; the 1g default heap makes
        # persisted relations evict and shuffles GC-thrash. On a real cluster
        # executor memory comes from the submit config instead.
        confs.setdefault("spark.driver.memory", "24g")
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark


def apply_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created session.

    The verification driver owns its own SparkSession; queries must still run
    under UTC/AQE semantics, so set every conf that is mutable post-start.
    """
    for k, v in DEFAULT_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session - keep going
    return spark
