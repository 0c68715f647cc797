"""JDBC endpoint surface: the reference's physical source (PostgreSQL) and
sink (ClickHouse), re-expressed as Spark JDBC configuration builders.

Reference parity:
- PostgreSQL source: ``connectors/debezium_configuration.json:4-9,18``
  (hostname/port/dbname/user/password, ``database.sslmode=require``,
  ``table.include.list``). Debezium's streaming capture is replaced by the
  envelope pipeline in ``streaming/``; THIS module covers the other leg —
  the S7 initial snapshot (``snapshot.mode``, cross-DB load) as a
  *partitioned* JDBC read.
- ClickHouse sink: ``connectors/clickhouse_sink_configuration.json:2-12``
  (hostname/http port/database/ssl, ``exactlyOnce=false``). The connector
  appends at-least-once into a ReplacingMergeTree; duplicates collapse at
  merge time (``clickhouse_schemas.sql:11``). The same contract holds here:
  append-only writes carrying the version column, LWW dedup at read time
  (``operators/state.py::current_state``) — so retried batches are no-ops,
  and ``exactlyOnce`` is genuinely unnecessary.

Everything is a pure option-dict builder plus a thin reader/writer wrapper,
so the logic is unit-testable without a live database (none exists in this
sandbox) and auditable for scale:

Scale posture (1000 executors, 100 TB snapshot):
- Reads MUST be partitioned: a bare ``spark.read.jdbc`` is one connection on
  one executor. ``partition_column``/``num_partitions`` split the table into
  range predicates executed concurrently; ``mod_predicates`` covers keys
  with skewed ranges (hash-mod partitions are uniform even when the id
  space is sparse). ``fetchsize`` keeps the driver-side cursor streaming.
- Pushdown: pass a subquery as ``table`` (``(SELECT ...) AS t``) to prune
  columns/rows server-side; Spark also pushes simple filters into the WHERE
  clause of each partition query.
- Writes: parallelism = DataFrame partitions (one connection each);
  ``batchsize`` controls rows per INSERT. Repartition to a connection count
  the server tolerates before writing — 1000 concurrent INSERT streams will
  DoS a single ClickHouse node; ~number-of-shards × a small factor is right.

Passwords are accepted as opaque strings and never logged or embedded in
URLs (they travel in connection properties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

POSTGRES_DRIVER = "org.postgresql.Driver"
CLICKHOUSE_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def postgres_url(host: str, port: int, dbname: str, sslmode: str = "require") -> str:
    """``jdbc:postgresql://host:port/db?sslmode=require`` — sslmode mirrors
    ``database.sslmode`` (debezium_configuration.json:23)."""
    return f"jdbc:postgresql://{host}:{port}/{dbname}?sslmode={sslmode}"


def clickhouse_url(host: str, port: int, database: str, ssl: bool = True) -> str:
    """``jdbc:clickhouse://host:port/db`` over the HTTP interface — port and
    ``ssl`` mirror clickhouse_sink_configuration.json:5,11."""
    return f"jdbc:clickhouse://{host}:{port}/{database}?ssl={'true' if ssl else 'false'}"


def postgres_snapshot_options(
    *,
    host: str,
    port: int,
    dbname: str,
    user: str,
    password: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    sslmode: str = "require",
) -> dict[str, str]:
    """JDBC options for the S7 initial snapshot read of a PostgreSQL table.

    With ``partition_column`` (+ bounds) the read fans out into
    ``num_partitions`` concurrent range scans; without it the read is a
    single connection — acceptable only for dimension-sized tables."""
    opts = {
        "url": postgres_url(host, port, dbname, sslmode),
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": POSTGRES_DRIVER,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def postgres_snapshot_reader(spark: SparkSession, **kwargs) -> DataFrameReader:
    """Configured (not yet executed) reader: ``.load()`` runs the snapshot."""
    return spark.read.format("jdbc").options(**postgres_snapshot_options(**kwargs))


def mod_predicates(key: str, n: int) -> list[str]:
    """Hash-mod partition predicates for ``spark.read.jdbc(predicates=)``:
    exactly covers every row once (``abs(key) % n = i`` for i in 0..n-1),
    uniform even when the id range is sparse or skewed — the alternative to
    range partitioning when min/max bounds would concentrate rows."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    return [f"abs({key}) % {n} = {i}" for i in range(n)]


def clickhouse_sink_options(
    *,
    host: str,
    port: int,
    database: str,
    table: str,
    user: str,
    password: str,
    batch_size: int = 100_000,
    ssl: bool = True,
) -> dict[str, str]:
    """JDBC options for the append sink into a ReplacingMergeTree table."""
    return {
        "url": clickhouse_url(host, port, database, ssl),
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": CLICKHOUSE_DRIVER,
        "batchsize": str(batch_size),
        "isolationLevel": "NONE",  # ClickHouse has no transactions; avoids a failing SET
    }


def write_clickhouse_append(
    df: DataFrame, *, write_connections: int | None = None, **kwargs
) -> None:
    """At-least-once append (``exactlyOnce=false`` semantics, sink config
    line 14): rows carry the version column; ReplacingMergeTree (or our
    ``current_state`` view) collapses duplicates, so retried batches are
    harmless. ``write_connections`` caps concurrent INSERT streams — at
    cluster scale the DataFrame's native partition count (thousands) must
    NOT map 1:1 onto server connections."""
    out = df.coalesce(write_connections) if write_connections else df
    out.write.format("jdbc").options(**clickhouse_sink_options(**kwargs)).mode(
        "append"
    ).save()
