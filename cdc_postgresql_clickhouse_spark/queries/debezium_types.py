"""Driver-gated queries for the Debezium wire-type decoders (SURVEY.md §7
deferred edge): precise-mode BASE64 decimals and hstore-as-JSON maps.

The decimal oracle derives the expected values *independently* (straight
decimal arithmetic on the source column) while the Spark side goes through a
full encode → base64 → decode round trip, so a hash match proves the decoder,
not just self-consistency. Sums are emitted as exact integer cents (BIGINT on
both sides) to keep the value hash float-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.debezium import (
    decode_debezium_decimal,
    encode_debezium_unscaled,
    hstore_json_to_map,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def debezium_decimal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip l_extendedprice through the Debezium precise-decimal wire
    format (sign-flipped for returned lines so negatives — two's-complement
    high bit — are exercised), then aggregate the decoded values. One
    projection + one shuffle; the decode chain is all codegen'd builtins."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    signed = F.when(F.col("l_returnflag") == "R", -cents).otherwise(cents)
    decoded = decode_debezium_decimal(encode_debezium_unscaled(signed), scale=2)
    return (
        li.select("l_returnflag", decoded.alias("d"))
        .groupBy("l_returnflag")
        .agg(
            F.sum((F.col("d") * 100).cast("long")).alias("sum_signed_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def hstore_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hstore-mode JSON → map<string,string>: key lookup + map_keys survey,
    aggregated per event_type (map parse and lookups stay JVM-side)."""
    ev = load_table(spark, sf_dir, "events")
    m = hstore_json_to_map("props")
    # NULL guard: size() under legacy sizeOfNull returns -1 (not NULL) for a
    # NULL map, while the oracle's len(json_keys(...)) is NULL and drops out
    # of SUM — make a NULL/malformed props row contribute NULL on both engines
    n_keys = F.when(m.isNotNull(), F.size(F.map_keys(m)))
    return (
        ev.select(
            "event_type",
            F.element_at(m, F.lit("k")).cast("long").alias("k"),
            n_keys.alias("n_keys"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum("n_keys").alias("sum_keys"),
        )
    )


QUERIES = {
    "debezium_decimal_decode": debezium_decimal_decode,
    "hstore_props_map": hstore_props_map,
}

ORACLE = {
    # Independent derivation: no base64 on the oracle side — plain integer
    # cents with the same sign flip.
    "debezium_decimal_decode": """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END
                * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_signed_cents,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    "hstore_props_map": """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(len(json_keys(props))) AS BIGINT) AS sum_keys
FROM events
GROUP BY event_type
""",
}
