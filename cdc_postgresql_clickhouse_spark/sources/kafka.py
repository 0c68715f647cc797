"""Live-Kafka source seam (S1/S5): the one function pair that swaps the
parquet wire-shape substitute for a real broker.

The reference's source side is Debezium producing schemaless-JSON envelopes
onto topic ``bookings_changes`` (``connectors/debezium_configuration.json:2``,
JSON converters ``:12-14``, 500 ms poll ``:11``); its sink side consumes that
topic (``connectors/clickhouse_sink_configuration.json:5,12``). In the Spark
engine both hops collapse into one ``readStream.format("kafka")``.

Everything downstream of the source consumes the SAME wire shape —
``key binary, value binary, topic string, partition int, offset long`` —
whether it came from a broker or from the parquet substitute the sandbox
tests use (``tests/test_kafka_wire.py``). ``cdc_envelopes_from_wire`` is the
single decode seam both paths share, so moving to a live broker is a
config-only change:

    wire = kafka_wire_stream(spark, "broker:9092", "bookings_changes")
    envelopes = cdc_envelopes_from_wire(wire)          # identical from here on
    ... run_cdc_pipeline / route_topic / state merge ...
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_postgresql_clickhouse_spark.sources.envelope import decode_json_envelopes

# The subset of the Kafka source's output columns the pipeline contracts on.
# (A live source also emits timestamp/timestampType; they pass through
# unused.) Types: key/value binary, topic string, partition int, offset long.
KAFKA_WIRE_COLUMNS = ("key", "value", "topic", "partition", "offset")


def kafka_wire_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """``readStream.format("kafka")`` configured per the reference's
    connector pair: subscribe to the routed topic(s) (S2/S5 analogue of
    ``debezium_configuration.json:22`` + ``clickhouse_sink_configuration
    .json:5``), binary key/value (the JsonConverter bytes, decoded by
    ``cdc_envelopes_from_wire``), from the earliest retained offset so a
    fresh pipeline replays history idempotently (safe under at-least-once —
    S10). Pair with ``trigger(processingTime="500 milliseconds")`` at the
    writeStream for the reference's poll cadence (S4,
    ``debezium_configuration.json:11``).

    Requires the ``spark-sql-kafka`` package on the session's classpath (not
    bundled with PySpark); ``.load()`` raises ``Failed to find data source:
    kafka`` where it is absent — the sandbox tests therefore substitute a
    parquet stream with the identical column layout and drive everything
    downstream of this function for real.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def cdc_envelopes_from_wire(wire: DataFrame) -> DataFrame:
    """THE decode seam: any wire-shaped DataFrame → typed envelope structs.

    Contract (checked): the input carries at least ``key``/``value`` binary
    columns; null-value tombstones are dropped (T3,
    ``debezium_configuration.json:8``); the output schema is exactly
    ``ENVELOPE_SCHEMA``. Works identically on a streaming DataFrame from
    ``kafka_wire_stream`` and on the batch/parquet substitute.
    """
    missing = {"key", "value"} - set(wire.columns)
    if missing:
        raise ValueError(
            f"not a Kafka wire DataFrame: missing column(s) {sorted(missing)}; "
            f"expected at least {KAFKA_WIRE_COLUMNS}"
        )
    return decode_json_envelopes(wire, value_col="value")
