"""Analytical operator queries (joins/aggregations/windows/sorts/set-ops)
with DuckDB oracles — the general query surface the CDC primitives build on
(survey §2.3-2.7: the reference itself needs only the keyed-merge equi-join,
but the engine exposes the full surface).

Determinism-across-engines rules used throughout this package:

- monetary aggregates: per-row DOUBLE arithmetic (bit-identical in both
  engines) → CAST to DECIMAL (exact, unambiguous rounding of short-decimal
  data) → SUM (exact) → CAST back to DOUBLE for a stable output type.
- averages/ratios: exact-decimal sums cast to double, divided, ROUND(x, 6).
- top-k: rank on the *exact decimal* value with a full deterministic
  tie-break before LIMIT.

Scale notes per query are in each docstring; the common posture: dimension
tables broadcast (explicit ``F.broadcast`` below threshold), fact-fact joins
hash-shuffle on the join key with AQE handling skew, aggregations are
partial (map-side) by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_postgresql_clickhouse_spark.sources.registry import load_table

DEC = "decimal(18,2)"


def _dsum(col, cast=DEC):
    return F.sum(col.cast(cast)).cast("double")


def _trunc6(col):
    """Deterministic 6-decimal truncation: FLOOR on identical doubles is
    bit-identical across engines, unlike ROUND (Spark HALF_UP via BigDecimal
    vs DuckDB multiply-round — they disagree on exact boundary digits)."""
    return F.floor(col * F.lit(1000000.0)).cast("double") / F.lit(1000000.0)


def _cents(col):
    """Exact integer cents from a 2-decimal-valued double column."""
    return F.round(col * 100).cast("long")


def _rev_micros():
    """l_extendedprice*(1-l_discount) in exact 1e-4-dollar integer units:
    cents × (100 - discount%). Pure int64 — identical in every engine and
    safely rankable. (At extreme row counts switch the SUM to DECIMAL(38).)"""
    return _cents(F.col("l_extendedprice")) * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate. Filter pushed to parquet scan;
    partial aggregation map-side, one shuffle on the 6-group key."""
    li = load_table(spark, sf_dir, "lineitem")
    # exact integer units: cents, discount% and tax% are 2-decimal data
    disc_u = _rev_micros()  # 1e-4 dollars
    charge_u = disc_u * (F.lit(100) + F.round(F.col("l_tax") * 100).cast("long"))  # 1e-6 dollars
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            (F.sum(disc_u).cast("double") / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum(charge_u).cast("double") / F.lit(1000000.0)).alias("sum_charge"),
            _trunc6(_dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            _trunc6(_dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            _trunc6(_dsum(F.col("l_discount"), "decimal(18,4)") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k. Customer
    filter prunes before the join; revenue ranked on exact decimal."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    # cust (post-filter, 1/5 of a dim table) broadcasts; orders⨝lineitem is the
    # fact-fact join and shuffles on orderkey — AQE may still demote it to
    # broadcast at small SF, which is exactly the desired adaptivity.
    joined = li.join(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(F.sum(_rev_micros()).alias("__rev"))
    return (
        agg.orderBy(F.desc("__rev"), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            (F.col("__rev").cast("double") / F.lit(10000.0)).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. region/nation/supplier broadcast;
    the lineitem-orders fact join shuffles on orderkey; local-supplier
    predicate (c_nationkey = s_nationkey) applied post-join."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    df = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return df.groupBy("n_name").agg(
        (F.sum(_rev_micros()).cast("double") / F.lit(10000.0)).alias("revenue")
    )


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark's TakeOrderedAndProject — per-partition heaps,
    no full sort, no single-node shuffle of the whole table."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(15)
        .select("o_orderkey", "o_totalprice")
    )


def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend: one shuffle on o_custkey, in-partition sort."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), _dsum(F.col("o_totalprice")).alias("total_price"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — broadcast the distinct keys of the probe side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def set_intersect_building_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    buyers = orders.select(F.col("o_custkey").alias("c_custkey"))
    return building.intersect(buyers)


def set_except_nonbuilding_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    buyers = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return buyers.exceptAll(building)


def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest order of the same
    customer key at or before the event time. Implemented as range-join +
    per-event arg-max; at scale the same semantics come from bucketing both
    sides by key and a merge within buckets."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    j = ev.join(
        F.broadcast(orders),
        (F.col("user_id") == F.col("o_custkey")) & (F.col("o_orderdate") <= F.col("ts")),
    )
    w = Window.partitionBy("event_id").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("o_orderkey").alias("asof_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("asof_orderdate"),
        )
    )


def asof_prev_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self as-of via IGNORE NULLS last_value — the scalable no-join form:
    one shuffle on the key, linear scan within partition."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.last(
        F.when(F.col("event_type") == "purchase", F.col("event_id")), ignorenulls=True
    ).over(w)
    return ev.select("event_id", "user_id", prev.alias("prev_purchase_event_id"))


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "topk_orders": topk_orders,
    "agg_distinct_counts": agg_distinct_counts,
    "window_running_total": window_running_total,
    "rollup_status_priority": rollup_status_priority,
    "customers_without_orders": customers_without_orders,
    "set_intersect_building_buyers": set_intersect_building_buyers,
    "set_except_nonbuilding_buyers": set_except_nonbuilding_buyers,
    "asof_latest_order": asof_latest_order,
    "asof_prev_purchase": asof_prev_purchase,
}

ORACLE = {
    "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1000000.0) AS DOUBLE) / 1000000.0 AS avg_qty,
  CAST(FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1000000.0) AS DOUBLE) / 1000000.0 AS avg_price,
  CAST(FLOOR(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 1000000.0) AS DOUBLE) / 1000000.0 AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "q3_shipping_priority": """
WITH agg AS (
  SELECT l_orderkey, o_orderdate,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1999-01-01'
    AND l_shipdate > TIMESTAMP '1999-01-01'
  GROUP BY l_orderkey, o_orderdate
)
SELECT l_orderkey AS o_orderkey, CAST(rev AS DOUBLE) / 10000.0 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM agg
ORDER BY rev DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    "q5_region_revenue": """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    "topk_orders": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
""",
    "agg_distinct_counts": """
SELECT COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem
""",
    "window_running_total": """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
""",
    "rollup_status_priority": """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
    "customers_without_orders": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    "set_intersect_building_buyers": """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders
""",
    "set_except_nonbuilding_buyers": """
SELECT DISTINCT o_custkey AS c_custkey FROM orders
EXCEPT ALL
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
""",
    "asof_latest_order": """
SELECT event_id, user_id, o_orderkey AS asof_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS asof_orderdate
FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
) WHERE rn = 1
""",
    "asof_prev_purchase": """
SELECT event_id, user_id,
  last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_event_id
FROM events
""",
}
