"""Table registry over the parquet fixture directories.

The analogue of the reference's source-side scan configuration
(``connectors/debezium_configuration.json:22`` table include-list;
``README.md:156-168`` federated initial load): a single place that maps
logical table names to physical storage so every operator goes through one
scan path and Catalyst sees a plain parquet relation it can push filters and
column pruning into.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at every target scale; fact
# tables shuffle. Used by operators to hint joins explicitly where AQE's
# size estimate could be unavailable (e.g. after complex subplans).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain parquet scan: vectorized reader,
    predicate pushdown and column pruning apply downstream.

    ``events.ts`` has shipped in three physical layouts across fixture
    generations: TIMESTAMP(MICROS) with isAdjustedToUTC=true (read natively
    as TIMESTAMP), the same without the UTC flag (read as TIMESTAMP_NTZ),
    and TIMESTAMP(NANOS), which Spark's parquet reader rejects. Normalize
    all three to session-timezone TIMESTAMP: the session is pinned to UTC
    (reference P8, ``postgresql_schemas.sql:7-8``), so the NTZ→TZ cast is
    value-identical, and for nanos read raw longs (legacy conf) and rebuild
    a microsecond timestamp (lossless — fixtures carry no sub-µs component,
    and DuckDB's epoch_us truncates identically)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register the fixture tables as temp views for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
