"""cdc_postgresql_clickhouse_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference CDC pipeline ``pparmin/CDC-PostgreSQL-ClickHouse``
(PostgreSQL → Debezium → Kafka → ClickHouse ReplacingMergeTree), re-expressed as:

- a canonical Debezium-style CDC envelope (``cdc_postgresql_clickhouse_spark.sources.envelope``)
- a pure DataFrame→DataFrame change transform (``operators.cdc_transform``;
  reference ``schemas/clickhouse_schemas.sql:39-58``)
- a ReplacingMergeTree/FINAL analogue: version arg-max current-state view and
  an idempotent batch upsert (``operators.state``; reference
  ``schemas/clickhouse_schemas.sql:1-13``, ``README.md:59-62,309-318``)
- Structured Streaming incremental view maintenance (``streaming.pipeline``;
  reference materialized view ``clickhouse_schemas.sql:39``)
- an analytical query layer plus large-scale training-data-pipeline operators
  (dedup, similarity search, text analysis) in ``queries``/``operators``.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown, pruning,
join strategy, and AQE handles skew/partition sizing at scale.
"""

from cdc_postgresql_clickhouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
