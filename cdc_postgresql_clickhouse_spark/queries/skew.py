"""Skew-handling operators under the correctness gate: each query runs the
SALTED formulation in Spark while its DuckDB oracle is the PLAIN formulation
— passing the driver's hash-compare proves the skew machinery is
semantically invisible (same rows, only the shuffle layout changes).

See operators/layout.py for the operators themselves and
tests/test_layout.py for the row-identity proofs against plain Spark joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.layout import (
    salted_join,
    skew_safe_count_distinct,
)
from cdc_postgresql_clickhouse_spark.queries.tpch import _cents
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

N_SALTS = 8


def skew_salted_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⨝ orders through the salted join (hot orderkeys spread over
    N_SALTS reducers), then revenue by order status. Oracle: the plain join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), _cents(F.col("l_quantity")).alias("qc")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    j = salted_join(li, orders, "o_orderkey", n_salts=N_SALTS)
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.sum("qc").cast("double") / F.lit(100.0)).alias("sum_qty"),
    )


def skew_distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted COUNT(DISTINCT) per supplier — exact because the
    hash-mod pre-split partitions the value space disjointly. Oracle: the
    plain single-phase distinct count."""
    li = load_table(spark, sf_dir, "lineitem")
    return skew_safe_count_distinct(li, "l_suppkey", "l_partkey", n_salts=N_SALTS)


QUERIES = {
    "skew_salted_revenue_by_status": skew_salted_revenue_by_status,
    "skew_distinct_parts_per_supplier": skew_distinct_parts_per_supplier,
}

ORACLE = {
    "skew_salted_revenue_by_status": """
SELECT o_orderstatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
    "skew_distinct_parts_per_supplier": """
SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_distinct
FROM lineitem GROUP BY l_suppkey
""",
}
