"""Z-order clustering quality as an oracle-paired query: Morton-key bucket
stats over lineitem's (part, supplier) pair prove the interleave math and
surface the property the layout buys — every z-bucket is a tight 2-D box.

``operators/layout.py::write_zordered`` is the write path (range-partition +
sort by the key; pytest pins that the layout prunes BOTH dimensions where an
x-sort prunes one). This query computes the same key relationally so the
driver hash-verifies the bit interleave against a DuckDB twin, and reports
per-bucket spans: with an 8-bit key bucketed by its top 6 bits, each bucket
covers a 2^5 × 2^5 box, so both spans are bounded by 31 — an invariant the
test asserts and the 100 TB story rests on (bounded boxes = bounded min/max
ranges per file = data skipping works on either predicate).

Public knowledge: Morton 1966; Delta Lake OPTIMIZE ZORDER BY is the
productionized form. No analogue in the reference (single-column ORDER BY,
``clickhouse_schemas.sql:12-13``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.layout import zorder_key
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

Z_BITS = 8
BUCKET_SHIFT = 10  # keep top 6 of 16 interleaved bits -> 64 buckets


def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"), (F.col("l_suppkey") % 256).alias("y")
    )
    z = zorder_key(F.col("x"), F.col("y"), Z_BITS)
    d = li.select("x", "y", F.shiftright(z, BUCKET_SHIFT).alias("zbucket"))
    return d.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.max("x") - F.min("x")).alias("x_span"),
        (F.max("y") - F.min("y")).alias("y_span"),
    )


def _sql_zkey(a: str, b: str, bits: int) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"((({a} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({b} >> {j}) & 1) << {2 * j + 1})")
    return "(" + " + ".join(terms) + ")"


_SQL_ZORDER = f"""
WITH d AS (
  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem
),
keyed AS (
  SELECT x, y, ({_sql_zkey("x", "y", Z_BITS)} >> {BUCKET_SHIFT}) AS zbucket FROM d
)
SELECT zbucket, COUNT(*) AS n_rows,
       (MAX(x) - MIN(x)) AS x_span,
       (MAX(y) - MIN(y)) AS y_span
FROM keyed GROUP BY zbucket
"""

QUERIES = {"layout_zorder_clustering": layout_zorder_clustering}
ORACLE = {"layout_zorder_clustering": _SQL_ZORDER}


# --- Hilbert-curve clustering (the locality-better layout) ------------------
#
# Same proof shape as the Z-order row, on the Hilbert key: with an 8-bit
# curve bucketed by the top 6 of 16 key bits, every bucket is an aligned
# 4^5-key subtree = one 32x32 quadrant (possibly rotated), so BOTH spans
# are bounded by 31 — and unlike Morton order, consecutive buckets are
# spatially adjacent (no seam jumps), which is why Delta liquid clustering
# and column stores prefer Hilbert at file-count scale. The key unrolls the
# classic xy2d bit loop (reflect + swap per bit) as integer stages; the
# oracle mirrors the chain CTE-for-CTE.

H_BITS = 8
H_BUCKET_SHIFT = 10  # keep top 6 of 16 key bits -> 64 buckets


def layout_hilbert_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_postgresql_clickhouse_spark.operators.layout import hilbert_stages

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"), (F.col("l_suppkey") % 256).alias("y")
    )
    keyed = hilbert_stages(li, "x", "y", H_BITS, out="hkey")
    d = keyed.select(
        "x", "y", F.shiftright(F.col("hkey"), H_BUCKET_SHIFT).alias("hbucket")
    )
    return d.groupBy("hbucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.max("x") - F.min("x")).alias("x_span"),
        (F.max("y") - F.min("y")).alias("y_span"),
    )


def _sql_hilbert_chain(bits: int) -> str:
    n = 1 << bits
    ctes = ["h0 AS (SELECT x, y, x AS hx, y AS hy, CAST(0 AS BIGINT) AS hd FROM d)"]
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        k = bits - 1 - i
        rx = f"((hx >> {k}) & 1)"
        ry = f"((hy >> {k}) & 1)"
        ctes.append(f"""h{i + 1} AS (
  SELECT x, y,
         CASE WHEN {ry} = 0
              THEN (CASE WHEN {rx} = 1 THEN {n - 1} - hy ELSE hy END)
              ELSE hx END AS hx,
         CASE WHEN {ry} = 0
              THEN (CASE WHEN {rx} = 1 THEN {n - 1} - hx ELSE hx END)
              ELSE hy END AS hy,
         hd + {s * s} * (CASE WHEN {rx} = 0 THEN {ry} ELSE 3 - {ry} END) AS hd
  FROM h{i}
)""")
    return ",\n".join(ctes)


_SQL_HILBERT = f"""
WITH d AS (
  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem
),
{_sql_hilbert_chain(H_BITS)}
SELECT (hd >> {H_BUCKET_SHIFT}) AS hbucket, COUNT(*) AS n_rows,
       (MAX(x) - MIN(x)) AS x_span,
       (MAX(y) - MIN(y)) AS y_span
FROM h{H_BITS} GROUP BY 1
"""

QUERIES["layout_hilbert_clustering"] = layout_hilbert_clustering
ORACLE["layout_hilbert_clustering"] = _SQL_HILBERT
