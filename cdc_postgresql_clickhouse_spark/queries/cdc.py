"""CDC operator queries over the ``events`` fixture, with DuckDB oracles.

The reference's CDC semantics (survey §2) exercised on driver data by
treating ``events`` as a change stream: key = ``user_id``, monotone version =
(``ts``, ``event_id``) — the LSN analogue — and ``event_type='error'`` as the
tombstone op. Each query maps to reference operators:

- cdc_current_state      → R1/ST5: version arg-max "FINAL" view
  (ReplacingMergeTree(version), clickhouse_schemas.sql:11-13)
- cdc_soft_delete_state  → ST4: tombstone filtering (clickhouse_schemas.sql:52)
- cdc_envelope_transform → P3-P5: before/after switch via lag-derived
  envelopes (clickhouse_schemas.sql:50-56)
- cdc_epoch_micros_roundtrip → P6: fromUnixTimestamp64Micro equivalence
  (clickhouse_schemas.sql:54-55)
- cdc_count_final        → A1: count() FINAL verification (README.md:321-329)
- cdc_idempotent_replay  → S10: at-least-once duplicate delivery is a no-op
  (clickhouse_sink_configuration.json:13)

Scale notes: every query is one hash-shuffle on the key (window or groupBy);
no Python, no collects; Catalyst prunes unused event columns into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def _latest(ev: DataFrame) -> DataFrame:
    """Per-key latest row as a hash aggregation (SURVEY §2.4 A2): max_by on
    the (ts, event_id) version struct. Unlike the row_number window (full-row
    shuffle + per-partition sort), this combines map-side, so shuffle volume
    is one row per (key × map partition) — the shape that survives 1000
    executors × 100 TB. (ts, event_id) is unique per key, so the arg-max is
    deterministic and matches the ORDER BY ts DESC, event_id DESC oracle."""
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_id", "event_type", "value"), F.struct("ts", "event_id")
            ).alias("__r")
        )
        .select("user_id", "__r.*")
    )


def cdc_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _latest(ev).select(
        F.col("user_id"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


_LATEST_SQL = """
SELECT user_id, event_id, event_type, value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""


def cdc_soft_delete_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        _latest(ev)
        .filter(F.col("event_type") != "error")
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


def cdc_envelope_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    before_value = F.lag("value").over(w)
    op = (
        F.when(before_value.isNull(), F.lit("c"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    df = ev.select(
        "user_id",
        F.col("event_id").alias("version"),
        op.alias("op"),
        before_value.alias("__before"),
        F.col("value").alias("__after"),
    )
    return df.select(
        "user_id",
        "version",
        "op",
        F.when(F.col("op") == "d", F.col("__before")).otherwise(F.col("__after")).alias("img_value"),
        F.when(F.col("op") == "d", F.lit(1)).otherwise(F.lit(0)).alias("is_deleted"),
    )


def cdc_epoch_micros_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    micros = F.unix_micros("ts")
    return ev.select(
        "event_id",
        micros.alias("ts_us"),
        F.date_format(F.timestamp_micros(micros), "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


def cdc_count_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    live = _latest(ev).filter(F.col("event_type") != "error")
    return live.agg(F.count(F.lit(1)).alias("n_live"))


def cdc_idempotent_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    doubled = ev.unionByName(ev).distinct()  # at-least-once delivery + exact dedup
    return _latest(doubled).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension view of the change stream: every
    change becomes a versioned row with a [valid_from, valid_to) epoch
    interval; the open interval (valid_to NULL) is the current row — the
    history table a warehouse derives from the reference's change log
    (clickhouse_schemas.sql:50-56 keeps every version for exactly this).

    Plan: one shuffle on user_id; the lead() window and nothing else.
    At scale the sort is per-key within hash partitions — no global sort."""
    ev = load_table(spark, sf_dir, "events")
    es = F.floor(F.unix_timestamp("ts")).cast("long")
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    d = ev.select("user_id", "event_id", "event_type", "value", es.alias("es"))
    out = d.withColumn("valid_to_es", F.lead("es").over(w))
    return out.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.col("es").alias("valid_from_es"),
        "valid_to_es",
        F.when(F.col("valid_to_es").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


QUERIES = {
    "cdc_current_state": cdc_current_state,
    "cdc_soft_delete_state": cdc_soft_delete_state,
    "cdc_envelope_transform": cdc_envelope_transform,
    "cdc_epoch_micros_roundtrip": cdc_epoch_micros_roundtrip,
    "cdc_count_final": cdc_count_final,
    "cdc_idempotent_replay": cdc_idempotent_replay,
    "cdc_scd2_history": cdc_scd2_history,
}

ORACLE = {
    "cdc_current_state": f"""
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, value AS last_value
FROM ({_LATEST_SQL})
""",
    "cdc_soft_delete_state": f"""
SELECT user_id, event_type AS last_event_type, value AS last_value
FROM ({_LATEST_SQL}) WHERE event_type <> 'error'
""",
    "cdc_envelope_transform": """
WITH env AS (
  SELECT user_id, event_id AS version,
         CASE WHEN lag(value) OVER w IS NULL THEN 'c'
              WHEN event_type = 'error' THEN 'd'
              ELSE 'u' END AS op,
         lag(value) OVER w AS before_value,
         value AS after_value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
SELECT user_id, version, op,
       CASE WHEN op = 'd' THEN before_value ELSE after_value END AS img_value,
       CASE WHEN op = 'd' THEN 1 ELSE 0 END AS is_deleted
FROM env
""",
    "cdc_epoch_micros_roundtrip": """
SELECT event_id, epoch_us(ts) AS ts_us,
       strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:%M:%S') AS ts_str
FROM events
""",
    "cdc_count_final": f"""
SELECT count(*) AS n_live FROM ({_LATEST_SQL}) WHERE event_type <> 'error'
""",
    "cdc_idempotent_replay": """
WITH doubled AS (SELECT * FROM events UNION ALL SELECT * FROM events),
deduped AS (SELECT DISTINCT * FROM doubled)
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM deduped) WHERE rn = 1
""",
    "cdc_scd2_history": """
WITH d AS (
  SELECT user_id, event_id, event_type, value,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
  FROM events
)
SELECT user_id, event_id, event_type, value,
       es AS valid_from_es,
       lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS valid_to_es,
       CASE WHEN lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM d
""",
}


# --- reconciliation report ---------------------------------------------------
#
# The reference's verification finale (README.md:309-329: "identical
# entries + identical counts" between Postgres and ClickHouse) as a
# FIRST-CLASS operator instead of a manual SQL session: two-sided
# ``EXCEPT ALL`` between the source-of-truth state and a replica state,
# reduced to a one-row report. The replica is derived with a DETERMINISTIC
# simulated delivery gap (changes with event_id % RECON_DROP_MOD ==
# RECON_DROP_RESIDUE never arrive), so the diff machinery is exercised on
# real divergence — both engines must agree on exactly which keys diverge,
# not just that none do. ``operators/state.py::consistency_check`` is the
# boolean form of the same comparison used by the streaming tests.
#
# Scale shape: each EXCEPT ALL is one hash shuffle on the full row (the
# same budget as the reference's GROUP-BY-all-columns reconciliation
# query); the report is four scalar aggregates cross-joined — no row data
# reaches the driver.

RECON_DROP_MOD = 97
RECON_DROP_RESIDUE = 13


def cdc_reconciliation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    src = _latest(ev)
    dst = _latest(
        ev.filter(
            ~(F.col("event_id") % RECON_DROP_MOD == RECON_DROP_RESIDUE)
        )
    )
    src_rows = src.agg(F.count(F.lit(1)).cast("long").alias("src_rows"))
    dst_rows = dst.agg(F.count(F.lit(1)).cast("long").alias("dst_rows"))
    n_src_only = src.exceptAll(dst).agg(
        F.count(F.lit(1)).cast("long").alias("n_src_only")
    )
    n_dst_only = dst.exceptAll(src).agg(
        F.count(F.lit(1)).cast("long").alias("n_dst_only")
    )
    return (
        src_rows.crossJoin(dst_rows)
        .crossJoin(n_src_only)
        .crossJoin(n_dst_only)
        .select(
            "src_rows",
            "dst_rows",
            "n_src_only",
            "n_dst_only",
            ((F.col("n_src_only") == 0) & (F.col("n_dst_only") == 0)).alias("consistent"),
        )
    )


_RECON_DST_SQL = f"""
SELECT user_id, event_id, event_type, value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE NOT (event_id % {RECON_DROP_MOD} = {RECON_DROP_RESIDUE}))
WHERE rn = 1
"""

QUERIES["cdc_reconciliation_report"] = cdc_reconciliation_report
ORACLE["cdc_reconciliation_report"] = f"""
WITH src AS (SELECT user_id, event_id, event_type, value FROM ({_LATEST_SQL})),
dst AS ({_RECON_DST_SQL}),
so AS (SELECT COUNT(*) AS c FROM (SELECT * FROM src EXCEPT ALL SELECT * FROM dst)),
do_ AS (SELECT COUNT(*) AS c FROM (SELECT * FROM dst EXCEPT ALL SELECT * FROM src))
SELECT (SELECT COUNT(*) FROM src) AS src_rows,
       (SELECT COUNT(*) FROM dst) AS dst_rows,
       so.c AS n_src_only,
       do_.c AS n_dst_only,
       (so.c = 0 AND do_.c = 0) AS consistent
FROM so CROSS JOIN do_
"""
