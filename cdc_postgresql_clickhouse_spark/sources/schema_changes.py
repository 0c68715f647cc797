"""T4 — Debezium schema-change events: decode, history table, and live
schema re-derivation for the data stream.

The reference connector emits DDL events to a schema-change topic
(``include.schema.changes`` behavior implied by
``connectors/debezium_configuration.json:27,31-46``; the sink side never
consumes them — SURVEY §2.9 T4 marked this the one unimplemented surface).
Debezium's wire shape per event:

``{source, ts_ms, databaseName, schemaName, ddl, tableChanges: [{type,
id, table: {columns: [{name, typeName, position, optional}],
primaryKeyColumnNames}}]}``

Spark design — three layers, all plain DataFrame ops:

1. ``decode_schema_change_events``: JSON → typed rows (one per DDL).
2. ``schema_history``: the *database-history-topic analogue* — an
   append-only table of (ts_ms, table_id, change_type, columns, pk). At
   100 TB this is trivially small (DDL cadence, not row cadence).
3. ``latest_table_schema`` + ``envelope_schema_for``: arg-max the history
   per table and rebuild the envelope StructType with the CURRENT column
   set, so the data-stream decode picks up added columns; the state merge
   then widens via ``apply_changes``'s allowMissingColumns union
   (operators/state.py) — old rows read NULL for new columns, exactly
   ClickHouse's ``ADD COLUMN`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

COLUMN_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("typeName", StringType()),
        StructField("position", LongType()),
        StructField("optional", BooleanType()),
    ]
)

TABLE_CHANGE_SCHEMA = StructType(
    [
        StructField("type", StringType()),  # CREATE | ALTER | DROP
        StructField("id", StringType()),  # '"public"."bookings"'
        StructField(
            "table",
            StructType(
                [
                    StructField("columns", ArrayType(COLUMN_SCHEMA)),
                    StructField("primaryKeyColumnNames", ArrayType(StringType())),
                ]
            ),
        ),
    ]
)

SCHEMA_CHANGE_SCHEMA = StructType(
    [
        StructField("ts_ms", LongType()),
        StructField("databaseName", StringType()),
        StructField("schemaName", StringType()),
        StructField("ddl", StringType()),
        StructField("tableChanges", ArrayType(TABLE_CHANGE_SCHEMA)),
        # Debezium stamps the source position on schema-change events too;
        # the LSN is the MONOTONIC order of DDLs — ts_ms is millisecond-
        # grained and two ALTERs in one millisecond tie on it
        StructField(
            "source",
            StructType(
                [StructField("sequence", StringType()), StructField("lsn", LongType())]
            ),
        ),
    ]
)

#: PostgreSQL type name → Spark type, per the engine's envelope conventions
#: (timestamps travel as epoch micros — sources/envelope.py ROW_SCHEMA).
_PG_TO_SPARK = {
    "text": StringType(),
    "varchar": StringType(),
    "bpchar": StringType(),
    "uuid": StringType(),
    "int2": LongType(),
    "int4": LongType(),
    "int8": LongType(),
    "serial": LongType(),
    "bigserial": LongType(),
    "bool": BooleanType(),
    "timestamp": LongType(),  # epoch micros
    "timestamptz": LongType(),
}


def decode_schema_change_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka-wire schema-change records (binary value) → typed DDL events."""
    return (
        raw.filter(F.col(value_col).isNotNull())
        .select(F.from_json(F.col(value_col).cast("string"), SCHEMA_CHANGE_SCHEMA).alias("e"))
        .filter(F.col("e").isNotNull() & F.col("e.ddl").isNotNull())
        .select("e.*")
    )


def schema_history(events: DataFrame) -> DataFrame:
    """Flatten DDL events into the append-only schema-history table: one row
    per (event, affected table). This is the engine's analogue of Debezium's
    database-history topic — replaying it rebuilds every table's schema at
    any point in time."""
    return events.select(
        "ts_ms",
        "databaseName",
        "schemaName",
        "ddl",
        F.col("source.lsn").alias("lsn"),
        F.explode("tableChanges").alias("tc"),
    ).select(
        "ts_ms",
        "databaseName",
        "schemaName",
        "ddl",
        "lsn",
        F.col("tc.type").alias("change_type"),
        F.col("tc.id").alias("table_id"),
        F.col("tc.table.columns").alias("columns"),
        F.col("tc.table.primaryKeyColumnNames").alias("pk_columns"),
    )


def _recency_order(history: DataFrame):
    """Newest-first ordering for schema history rows: ts_ms, then the
    source LSN — the MONOTONIC tie-break for DDLs landing in the same
    millisecond. Column count is only a last-resort heuristic for legacy
    events without an LSN; it mis-orders a same-ts column DROP (the newer
    schema is the SHORTER one), which is exactly why the LSN wins."""
    return history.orderBy(
        F.desc("ts_ms"), F.desc_nulls_last("lsn"), F.desc(F.size("columns"))
    )


def latest_table_schema(history: DataFrame, table_id: str) -> list[Row]:
    """Current column list for a table: the max-(ts_ms, lsn) history row.
    Driver-side collect is fine: history is DDL-cadence data, bounded by
    schema churn."""
    row = (
        _recency_order(history.filter(F.col("table_id") == table_id))
        .select("columns")
        .first()
    )
    if row is None:
        raise KeyError(f"no schema history for table {table_id!r}")
    return sorted(row["columns"], key=lambda c: c["position"])


def envelope_schema_for(columns: list[Row]) -> StructType:
    """Rebuild the CDC envelope StructType for the current column set, so
    ``decode_json_envelopes`` picks up columns added after pipeline start.
    Unknown PostgreSQL types decode as strings (lossless JSON passthrough)."""
    row_schema = StructType(
        [
            StructField(c["name"], _PG_TO_SPARK.get(c["typeName"], StringType()))
            for c in columns
        ]
    )
    source_schema = StructType(
        [StructField("sequence", StringType()), StructField("lsn", LongType())]
    )
    return StructType(
        [
            StructField("before", row_schema),
            StructField("after", row_schema),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
            StructField("source", source_schema),
        ]
    )


class SchemaCompatibilityError(ValueError):
    """A DDL transition violates the required registry compatibility mode."""


def check_schema_transition(
    history: DataFrame, table_id: str, require: str = "BACKWARD"
) -> "CompatReport":
    """Enforce a registry compatibility mode over the table's LAST schema
    transition in the history — the in-engine stand-in for the schema
    registry's compatibility gate (the reference's stack rejects the
    producer's registration instead; here the pipeline operator calls
    this before re-deriving the envelope schema). Returns the transition
    report, or raises ``SchemaCompatibilityError`` naming the offending
    fields. A table with a single recorded schema passes trivially."""
    from cdc_postgresql_clickhouse_spark.sources.schema_compat import (
        CompatReport,
        compatibility,
    )

    rows = (
        _recency_order(history.filter(F.col("table_id") == table_id))
        .select("columns")
        .take(2)
    )
    if not rows:
        raise KeyError(f"no schema history for table {table_id!r}")
    if len(rows) == 1:
        return CompatReport()
    new_cols = sorted(rows[0]["columns"], key=lambda c: c["position"])
    prev_cols = sorted(rows[1]["columns"], key=lambda c: c["position"])

    def _row_schema(cols):
        return StructType(
            [
                StructField(c["name"], _PG_TO_SPARK.get(c["typeName"], StringType()))
                for c in cols
            ]
        )

    report = compatibility(_row_schema(prev_cols), _row_schema(new_cols))
    if require.upper() not in report.modes() + [""]:
        raise SchemaCompatibilityError(
            f"table {table_id!r} transition violates {require}: "
            f"added_required={report.added_required} "
            f"dropped_required={report.dropped_required} "
            f"breaking={report.breaking_type_changes}"
        )
    return report
