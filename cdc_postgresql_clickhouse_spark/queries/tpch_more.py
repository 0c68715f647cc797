"""Remaining TPC-H query shapes, adapted to the reduced fixture schema (no
partsupp/commitdate/shipmode): Q2 (argmin-per-group join), Q7 (two-sided
nation-pair volume), Q8 (market share via agg + window), Q9 (profit with a
retail-price cost proxy), Q16 (distinct-count with an anti-joined supplier
blacklist), Q21 (the multi-pass fact self-correlation).

Determinism rules follow queries/tpch.py: money in exact integer cents /
cent·percent "micros" units, ratios floor-truncated at 6 decimals, explicit
integer tie-breaks on every argmin/ranking.

Scale posture: every dimension side (nation, region, supplier, filtered
part/customer) broadcasts; lineitem is shuffled at most once per query on its
join key; Q21 deliberately uses the two-pass aggregate formulation instead of
the canonical EXISTS/NOT-EXISTS double self-join — at 100 TB, two extra
shuffles of the full fact table lose to one groupBy on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_postgresql_clickhouse_spark.queries.tpch import _cents, _rev_micros, _trunc6
from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.queries._pending import flip_pending


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group argmin join — for each small ECONOMY part,
    the supplier it was bought from cheapest (min summed spend, suppkey
    tie-break). The correlated MIN subquery becomes a ranking window over the
    grouped fact; only qualifying parts reach the window (broadcast prune)."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 5) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey", "p_brand")
    )
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_brand", "l_suppkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("spend_c"))
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("spend_c"), F.col("l_suppkey"))
    best = per_supp.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return best.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")).select(
        "p_partkey",
        "p_brand",
        "s_suppkey",
        "s_name",
        (F.col("spend_c").cast("double") / F.lit(100.0)).alias("min_spend"),
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between a nation pair, both directions, by
    ship year. Supplier and customer sides are pre-filtered to the two
    nations and broadcast, so the pair predicate prunes lineitem *before* the
    orders shuffle instead of after the full join."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg((F.sum(_rev_micros()).cast("double") / F.lit(10000.0)).alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: each supplier nation's share of ASIA-customer PROMO
    revenue per order year. Share = nation revenue / year total, both exact
    integer micros; the per-year total is a window over the (year, nation)
    aggregate — rows after the groupBy number |years|×|nations|, so the
    window's extra shuffle moves a trivially small set."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    asia_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    j = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    per = j.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year"), "supp_nation"
    ).agg(F.sum(_rev_micros()).alias("rev_u"))
    total = Window.partitionBy("o_year")
    return per.select(
        "o_year",
        "supp_nation",
        _trunc6(F.col("rev_u").cast("double") / F.sum("rev_u").over(total).cast("double")).alias(
            "mkt_share"
        ),
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on widget parts by supplier nation and order
    year. The missing ps_supplycost is proxied by p_retailprice; both revenue
    (cents·pct) and cost (retail_cents·qty_cents) land in the same exact
    1e-4-dollar unit, so profit stays pure int64 until the final cast."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", _cents(F.col("p_retailprice")).alias("retail_c"))
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit_u = _rev_micros() - F.col("retail_c") * _cents(F.col("l_quantity"))
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("supp_nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((F.sum(profit_u).cast("double") / F.lit(10000.0)).alias("profit"))
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each qualifying
    (brand, type, size) combination, excluding a supplier blacklist (every
    10th suppkey stands in for the complaints filter). Blacklist is a
    broadcast anti-join before the distinct-count shuffle."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size") <= 8)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole at-fault supplier per multi-supplier order —
    returned-flag lines stand in for late receipts. The canonical
    EXISTS + NOT-EXISTS double self-join is re-expressed as ONE groupBy over
    lineitem (distinct suppliers, distinct returning suppliers per order)
    joined to the distinct returning pairs: the fact table is shuffled once
    on l_orderkey instead of three times."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    r_pairs = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    at_fault = r_pairs.join(
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1)), "l_orderkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        at_fault.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group-agg + HAVING against a global scalar subquery —
    parts whose NATION_1-supplied spend exceeds 0.1% of the total. The scalar
    total is an aggregate of the SAME per-part aggregate (computed once and
    reused), attached as a broadcast cross join; the threshold compare stays
    pure int64 (value_c * 1000 > total_c) — no float fraction ambiguity."""
    supp_n1 = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    per_part = (
        li.join(F.broadcast(supp_n1), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("value_c"))
    )
    from pyspark import StorageLevel

    per_part = per_part.persist(StorageLevel.MEMORY_AND_DISK)  # reused by the scalar total
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_c") * 1000 > F.col("total_c"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_c").cast("double") / F.lit(100.0)).alias("part_value"),
        )
    )


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + two-bucket conditional counts —
    late lines (shipped > 60 days after order date) per line status, split by
    order priority (URGENT/HIGH vs the rest). l_linestatus stands in for the
    missing l_shipmode. One shuffle (the orderkey join); the aggregate is
    all conditional int sums, map-side partial."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q20_bolt_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested semi-join — NATION_1 suppliers that shipped
    more than 50 units of some bolt part during 1997. The correlated
    quantity subquery becomes a per-(supplier, part) aggregate over the
    pre-filtered fact; suppliers attach via LEFT SEMI join (no row
    multiplication), then the nation filter broadcasts. lineitem is shuffled
    once, on the pair key."""
    bolts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qual_supp = (
        li.join(F.broadcast(bolts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("qty_c"))
        .filter(F.col("qty_c") > 50 * 100)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation1 = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        supp.join(qual_supp, supp.s_suppkey == qual_supp.l_suppkey, "left_semi")
        .join(F.broadcast(nation1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q12_priority_shipping": q12_priority_shipping,
    "q20_bolt_suppliers": q20_bolt_suppliers,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q21_waiting_supplier": q21_waiting_supplier,
}

_REV_U = "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"

ORACLE = {
    "q11_important_parts": """
WITH per AS (
  SELECT l_partkey, SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS value_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, CAST(value_c AS DOUBLE) / 100.0 AS part_value
FROM per
WHERE value_c * 1000 > (SELECT SUM(value_c) FROM per)
""",
    "q12_priority_shipping": """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1
""",
    "q20_bolt_suppliers": """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%bolt%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 5000
  )
""",
    "q2_min_cost_supplier": """
WITH per_supp AS (
  SELECT p_partkey, p_brand, l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS spend_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 5 AND p_type = 'ECONOMY'
  GROUP BY 1, 2, 3
), best AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey ORDER BY spend_c, l_suppkey) AS rn
  FROM per_supp
)
SELECT p_partkey, p_brand, s_suppkey, s_name,
       CAST(spend_c AS DOUBLE) / 100.0 AS min_spend
FROM best JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1
""",
    "q7_nation_volume": f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_REV_U}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
""",
    "q8_market_share": f"""
WITH per AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         n2.n_name AS supp_nation, SUM({_REV_U}) AS rev_u
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  GROUP BY 1, 2
)
SELECT o_year, supp_nation,
       CAST(FLOOR(CAST(rev_u AS DOUBLE) / CAST(SUM(rev_u) OVER (PARTITION BY o_year) AS DOUBLE)
            * 1000000.0) AS DOUBLE) / 1000000.0 AS mkt_share
FROM per
""",
    "q9_product_profit": """
SELECT n_name AS supp_nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
              - CAST(ROUND(p_retailprice * 100) AS BIGINT) * CAST(ROUND(l_quantity * 100) AS BIGINT))
            AS DOUBLE) / 10000.0 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    "q16_supplier_part_counts": """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size <= 8
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0)
GROUP BY 1, 2, 3
""",
    "q21_waiting_supplier": """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supp
  FROM lineitem GROUP BY 1
), r_pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT s_name, COUNT(*) AS numwait
FROM r_pairs
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_r_supp = 1
GROUP BY s_name
""",
}


# --- market-basket pair mining — PENDING round 7 ----------------------------
#
# Frequent part PAIRS by co-occurrence in the same order (the support
# count of association mining, Agrawal et al. 1993) — the top co-purchase
# analysis every behavioral warehouse runs. Scale shape: the self-join is
# keyed on l_orderkey and the pair fan-out is quadratic only in the
# PER-ORDER line count (bounded small by the data model), never in the
# table; the a<b orientation produces each pair once, and top-k plans as
# TakeOrderedAndProject via the deterministic (support desc, pair) order.

BASKET_TOPK = 20


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.alias("a")
    b = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("p2")
    ).alias("b")
    pairs = a.join(b, "l_orderkey").filter(F.col("l_partkey") < F.col("p2"))
    sup = pairs.groupBy(
        F.col("l_partkey").alias("part_a"), F.col("p2").alias("part_b")
    ).agg(F.count(F.lit(1)).cast("long").alias("support"))
    ranked = sup.orderBy(
        F.desc("support"), "part_a", "part_b"
    ).limit(BASKET_TOPK)
    w = Window.orderBy(F.desc("support"), "part_a", "part_b")
    return ranked.select(
        "part_a", "part_b", "support",
        F.row_number().over(w).cast("long").alias("rank"),
    )


_SQL_BASKET = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sup AS (
  SELECT part_a, part_b, COUNT(*)::BIGINT AS support
  FROM pairs GROUP BY part_a, part_b
)
SELECT part_a, part_b, support,
       CAST(row_number() OVER (ORDER BY support DESC, part_a, part_b) AS BIGINT) AS rank
FROM sup
ORDER BY support DESC, part_a, part_b
LIMIT {BASKET_TOPK}
"""

# --- association rules over the top pairs — PENDING round 7 -----------------
#
# Confidence and lift (Agrawal et al. 1993) for the top-support part
# pairs: conf(a→b) = sup(ab)/sup(a), lift = N·sup(ab)/(sup(a)·sup(b)),
# both as integer PPM (truncating div) so the row is exact. Scale shape:
# the 20-row ranked pair set is broadcast against the item-support table
# (one keyed agg over the distinct basket-item pairs), so the joins move
# 20 rows, never the item table; the basket count rides as a broadcast
# 1-row cross join.

def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    n_b = li.agg(F.countDistinct("l_orderkey").cast("long").alias("n_baskets"))
    item = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("sup_item")
    )
    ranked = basket_part_pairs(spark, sf_dir)
    j = (
        item.join(F.broadcast(ranked), item.l_partkey == ranked.part_a)
        .select("part_a", "part_b", "support", "rank",
                F.col("sup_item").alias("sup_a"))
    )
    j = (
        item.join(F.broadcast(j), item.l_partkey == j.part_b)
        .select("part_a", "part_b", "support", "rank", "sup_a",
                F.col("sup_item").alias("sup_b"))
    )
    return (
        j.crossJoin(F.broadcast(n_b))
        .select(
            "part_a", "part_b", "support", "sup_a", "sup_b",
            F.expr("support * 1000000 div sup_a").cast("long").alias("conf_ab_ppm"),
            F.expr("support * 1000000 div sup_b").cast("long").alias("conf_ba_ppm"),
            F.expr("support * n_baskets * 1000000 div (sup_a * sup_b)")
            .cast("long").alias("lift_ppm"),
            "rank",
        )
    )


_SQL_RULES = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li),
item AS (SELECT l_partkey, COUNT(*)::BIGINT AS sup_item FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sup AS (
  SELECT part_a, part_b, COUNT(*)::BIGINT AS support
  FROM pairs GROUP BY part_a, part_b
),
ranked AS (
  SELECT part_a, part_b, support,
         CAST(row_number() OVER (ORDER BY support DESC, part_a, part_b) AS BIGINT) AS rank
  FROM sup
  ORDER BY support DESC, part_a, part_b
  LIMIT {BASKET_TOPK}
)
SELECT r.part_a, r.part_b, r.support,
       ia.sup_item AS sup_a, ib.sup_item AS sup_b,
       r.support * 1000000 // ia.sup_item AS conf_ab_ppm,
       r.support * 1000000 // ib.sup_item AS conf_ba_ppm,
       r.support * nb.n_baskets * 1000000 // (ia.sup_item * ib.sup_item) AS lift_ppm,
       r.rank
FROM ranked r
JOIN item ia ON r.part_a = ia.l_partkey
JOIN item ib ON r.part_b = ib.l_partkey
CROSS JOIN nb
"""


# --- RFM customer segmentation — PENDING round 7 ----------------------------
#
# Recency/Frequency/Monetary quintile scoring (Hughes 1994), the
# warehouse-classic customer segmentation. All three metrics are exact
# integers (days from the corpus max date, order count, total cents);
# quintiles are ntile(5) over a TOTAL order (metric + custkey tie-break)
# so both engines bucket identically. Scale shape: one keyed agg over
# orders, a broadcast 1-row max-date, three window passes over the
# customer-grain table (cheap — customer cardinality, not order
# cardinality).

def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_postgresql_clickhouse_spark.operators.ranking import (
        ntile_exact_grouped,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    mx = o.agg(F.max("d").alias("max_d"))
    per = o.groupBy("o_custkey").agg(
        F.max("d").alias("last_d"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum("cents").cast("long").alias("monetary_cents"),
    )
    per = per.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        F.datediff("max_d", "last_d").cast("long").alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    # VERDICT r7 fix: three global ntile(5) windows over customer grain were
    # three single-partition sorts. Melt the three (dimension, sort-value)
    # pairs and tile them in ONE grouped two-phase pass (desc recency ≡ asc
    # negated recency; custkey tie-break everywhere), then pivot back —
    # identical bucketing to the window ntile, one range shuffle total,
    # nothing data-proportional on a single task.
    melted = per.select(
        "o_custkey", "recency_days", "frequency", "monetary_cents",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("dim"),
                    (-F.col("recency_days")).cast("long").alias("sv"),
                ),
                F.struct(F.lit("f").alias("dim"), F.col("frequency").alias("sv")),
                F.struct(
                    F.lit("m").alias("dim"), F.col("monetary_cents").alias("sv")
                ),
            )
        ).alias("e"),
    ).select(
        "o_custkey", "recency_days", "frequency", "monetary_cents",
        F.col("e.dim").alias("dim"), F.col("e.sv").alias("sv"),
    )
    tiled = ntile_exact_grouped(
        melted, 5, "dim", [F.asc("sv"), F.asc("o_custkey")], out="score"
    )
    scored = (
        tiled.groupBy("o_custkey", "recency_days", "frequency", "monetary_cents")
        .pivot("dim", ["r", "f", "m"])
        .agg(F.first("score"))
        .withColumnRenamed("r", "r_score")
        .withColumnRenamed("f", "f_score")
        .withColumnRenamed("m", "m_score")
    )
    return scored.select(
        "o_custkey", "recency_days", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("long").alias("rfm_code"),
    )


_SQL_RFM = """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
mx AS (SELECT MAX(d) AS max_d FROM o),
per AS (
  SELECT o_custkey,
         date_diff('day', MAX(d), (SELECT max_d FROM mx))::BIGINT AS recency_days,
         COUNT(*)::BIGINT AS frequency,
         SUM(cents)::BIGINT AS monetary_cents
  FROM o GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary_cents,
         CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS BIGINT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS BIGINT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary_cents ASC, o_custkey) AS BIGINT) AS m_score
  FROM per
)
SELECT *, r_score * 100 + f_score * 10 + m_score AS rfm_code FROM scored
"""


# --- monthly cohort LTV matrix — PENDING round 7 ----------------------------
#
# First-order cohort analysis: customers grouped by the month of their
# first order; each (cohort, month-offset) cell reports active customers
# and revenue. Month index is pure integer arithmetic (year*12 + month-1)
# so the offset needs no interval math in either engine. Scale shape: one
# keyed min-agg to the customer grain, a keyed (not broadcast — customer
# cardinality is corpus-proportional) join back to orders, one keyed agg
# to the cell grain.

def cohort_monthly_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long").alias("mi"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("mi").alias("cohort_mi"))
    j = o.join(first, "o_custkey")
    cells = j.groupBy(
        F.col("cohort_mi").cast("long").alias("cohort_mi"),
        (F.col("mi") - F.col("cohort_mi")).cast("long").alias("month_offset"),
    ).agg(
        F.countDistinct("o_custkey").cast("long").alias("n_active"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    return cells.select(
        F.expr("cohort_mi div 12").cast("long").alias("cohort_year"),
        (F.col("cohort_mi") % 12 + 1).cast("long").alias("cohort_month"),
        "month_offset", "n_active", "n_orders", "revenue_cents",
    )


_SQL_COHORT = """
WITH o AS (
  SELECT o_custkey,
         (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT AS mi,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
first AS (SELECT o_custkey, MIN(mi) AS cohort_mi FROM o GROUP BY o_custkey),
cells AS (
  SELECT cohort_mi, o.mi - cohort_mi AS month_offset,
         COUNT(DISTINCT o.o_custkey)::BIGINT AS n_active,
         COUNT(*)::BIGINT AS n_orders,
         SUM(cents)::BIGINT AS revenue_cents
  FROM o JOIN first USING (o_custkey)
  GROUP BY 1, 2
)
SELECT cohort_mi // 12 AS cohort_year,
       cohort_mi % 12 + 1 AS cohort_month,
       month_offset, n_active, n_orders, revenue_cents
FROM cells
"""

# --- fuzzy record linkage (SymSpell deletion-neighborhood join) — PENDING r7
#
# Near-duplicate NAME pairs within edit distance <= 2 — the record-linkage
# / entity-resolution primitive (dirty catalogs, vendor name matching).
# The naive plan is the O(n²) all-pairs levenshtein cross join; the scale
# plan is the SymSpell identity (Garbe 2012): ed(s,t) <= k implies s and
# t share a common variant reachable by <= k character DELETIONS from
# each — so candidates come from an EQUI-join on exploded deletion
# variants (O(L²) variants per distinct name, L bounded), and the exact
# levenshtein filter verifies the superset afterwards. Work runs at
# DISTINCT-name grain (the right grain: a 100 TB catalog dedups its name
# dictionary, not its rows), and the variant expression is one SQL string
# shared verbatim by both engines.

FUZZY_K = 2

_VARIANTS_SQL = (
    "array_distinct(concat("
    " array({c}),"
    " transform(sequence(1, length({c})), i ->"
    "   concat(substring({c}, 1, i-1), substring({c}, i+1, length({c})))),"
    " flatten(transform(sequence(1, length({c})), i ->"
    "   transform(sequence(i+1, length({c})), j ->"
    "     concat(substring({c}, 1, i-1), substring({c}, i+1, j-i-1),"
    "            substring({c}, j+1, length({c}))))))"
    "))"
)


def linkage_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )
    v = names.select(
        "name", "n_parts",
        F.explode(F.expr(_VARIANTS_SQL.format(c="name"))).alias("var"),
    )
    a = v.select(F.col("name").alias("name_a"), F.col("n_parts").alias("n_parts_a"), "var")
    b = v.select(F.col("name").alias("name_b"), F.col("n_parts").alias("n_parts_b"), "var")
    cand = (
        a.join(b, "var")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b", "n_parts_a", "n_parts_b")
        .distinct()
    )
    return cand.select(
        "*", F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist")
    ).filter(F.col("edit_dist") <= FUZZY_K)


def _fuzzy_sql() -> str:
    # DuckDB's lambda/array kernel: list_* names, range() is end-exclusive
    var = (
        "list_distinct(list_concat(list_concat("
        " [name],"
        " list_transform(range(1, length(name) + 1), i ->"
        "   concat(substring(name, 1, i-1), substring(name, i+1, length(name))))),"
        " flatten(list_transform(range(1, length(name) + 1), i ->"
        "   list_transform(range(i+1, length(name) + 1), j ->"
        "     concat(substring(name, 1, i-1), substring(name, i+1, j-i-1),"
        "            substring(name, j+1, length(name))))))"
        "))"
    )
    return f"""
WITH names AS (
  SELECT p_name AS name, COUNT(*)::BIGINT AS n_parts FROM part GROUP BY 1
),
v AS (
  SELECT name, n_parts, unnest({var}) AS var FROM names
),
cand AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b,
         a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
  FROM v a JOIN v b ON a.var = b.var AND a.name < b.name
)
SELECT name_a, name_b, n_parts_a, n_parts_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
FROM cand
WHERE levenshtein(name_a, name_b) <= {FUZZY_K}
"""


# --- order backlog (cumulative flow) — PENDING round 7 ----------------------
#
# The cumulative-flow diagram of an order system: per day on the DENSE
# day grid, cumulative orders placed, cumulative orders fully shipped
# (an order ships when its LAST lineitem ships), and the open backlog —
# the operations chart behind every "how far behind are we" question.
# Day indexes are pure integers (epoch // 86400) so the grid, the
# cumsums, and the join need no engine date arithmetic; the grid is
# bounded by the calendar span, not the table size, and both daily
# inputs are keyed pre-aggregations (orders; lineitem max-shipdate per
# order) before anything touches the grid.

def orders_backlog_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    day = lambda c: F.floor(F.floor(F.unix_timestamp(c)) / 86400).cast("long")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", day("o_orderdate").alias("d")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", day("l_shipdate").alias("sd")
    )
    shipped = li.groupBy("l_orderkey").agg(F.max("sd").alias("d"))
    placed_daily = o.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n_placed"))
    shipped_daily = shipped.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_shipped")
    )
    lo_hi = o.agg(F.min("d").alias("lo")).crossJoin(
        shipped.agg(F.max("d").alias("hi"))
    )
    grid = lo_hi.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    daily = (
        grid.join(placed_daily, "d", "left")
        .join(shipped_daily, "d", "left")
        .select(
            "d",
            F.coalesce("n_placed", F.lit(0).cast("long")).alias("n_placed"),
            F.coalesce("n_shipped", F.lit(0).cast("long")).alias("n_shipped"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("d").alias("day_index"),
        "n_placed",
        "n_shipped",
        F.sum("n_placed").over(w).cast("long").alias("cum_placed"),
        F.sum("n_shipped").over(w).cast("long").alias("cum_shipped"),
        (F.sum("n_placed").over(w) - F.sum("n_shipped").over(w))
        .cast("long").alias("backlog"),
    )


_SQL_BACKLOG = """
WITH o AS (
  SELECT o_orderkey, CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS d
  FROM orders
),
li AS (
  SELECT l_orderkey, CAST(FLOOR(epoch(l_shipdate)) AS BIGINT) // 86400 AS sd
  FROM lineitem
),
shipped AS (SELECT l_orderkey, MAX(sd) AS d FROM li GROUP BY 1),
pd AS (SELECT d, COUNT(*)::BIGINT AS n_placed FROM o GROUP BY 1),
sd AS (SELECT d, COUNT(*)::BIGINT AS n_shipped FROM shipped GROUP BY 1),
lim AS (SELECT (SELECT MIN(d) FROM o) AS lo, (SELECT MAX(d) FROM shipped) AS hi),
grid AS (SELECT unnest(range(lo, hi + 1)) AS d FROM lim),
daily AS (
  SELECT g.d, COALESCE(pd.n_placed, 0) AS n_placed,
         COALESCE(sd.n_shipped, 0) AS n_shipped
  FROM grid g LEFT JOIN pd ON pd.d = g.d LEFT JOIN sd ON sd.d = g.d
)
SELECT d AS day_index, n_placed, n_shipped,
       CAST(SUM(n_placed) OVER w AS BIGINT) AS cum_placed,
       CAST(SUM(n_shipped) OVER w AS BIGINT) AS cum_shipped,
       CAST(SUM(n_placed) OVER w - SUM(n_shipped) OVER w AS BIGINT) AS backlog
FROM daily
WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


PENDING_QUERIES = {
    "basket_part_pairs": basket_part_pairs,
    "basket_association_rules": basket_association_rules,
    "customer_rfm_segments": customer_rfm_segments,
    "cohort_monthly_ltv": cohort_monthly_ltv,
    "linkage_fuzzy_part_names": linkage_fuzzy_part_names,
    "orders_backlog_timeseries": orders_backlog_timeseries,
}
PENDING_ORACLE = {
    "basket_part_pairs": _SQL_BASKET,
    "basket_association_rules": _SQL_RULES,
    "customer_rfm_segments": _SQL_RFM,
    "cohort_monthly_ltv": _SQL_COHORT,
    "linkage_fuzzy_part_names": _fuzzy_sql(),
    "orders_backlog_timeseries": _SQL_BACKLOG,
}


# --- inter-order interval histogram — PENDING round 7 -----------------------
#
# Reorder-cadence analysis: the distribution of day gaps between a
# customer's consecutive orders, bucketed into week-wide bins — the
# retail staple behind replenishment and churn-risk models. One lag
# window per customer (integer day indexes), then a corpus-level
# fixed-width histogram: bucket = gap // 7 capped at REORDER_CAP (the
# open tail bin), all integers. One key shuffle + one tiny agg.

REORDER_BIN_DAYS = 7
REORDER_CAP = 12  # bins; gaps >= 12 weeks fall into the open tail


def orders_reorder_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(FLOOR(unix_timestamp(o_orderdate)) AS BIGINT) div 86400")
        .alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = o.select(
        (F.col("d") - F.lag("d").over(w)).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    bin_ = F.least(
        F.expr(f"gap_days div {REORDER_BIN_DAYS}"), F.lit(REORDER_CAP)
    ).cast("long")
    return gaps.groupBy(bin_.alias("week_bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
    )


_SQL_REORDER = f"""
WITH o AS (
  SELECT o_custkey,
         CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS d,
         o_orderkey
  FROM orders
),
gaps AS (
  SELECT d - lag(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap_days
  FROM o
)
SELECT LEAST(gap_days // {REORDER_BIN_DAYS}, {REORDER_CAP})::BIGINT AS week_bin,
       COUNT(*)::BIGINT AS n_gaps,
       MIN(gap_days)::BIGINT AS min_gap_days,
       MAX(gap_days)::BIGINT AS max_gap_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1
"""

PENDING_QUERIES["orders_reorder_intervals"] = orders_reorder_intervals
PENDING_ORACLE["orders_reorder_intervals"] = _SQL_REORDER


# --- Pareto / ABC inventory classification — PENDING round 7 -----------------
#
# The classic ABC analysis over parts: rank parts by revenue, class A = the
# parts covering the first 80 % of revenue mass, B = the next 15 % (to 95 %),
# C = the tail. Thresholds are integer cross-multiplications (cum*5 <= tot*4,
# cum*20 <= tot*19) on exact 1e-4-dollar units — no ratio is ever
# materialized. SCALE-SAFE RANKING: the cumulative runs over the
# DISTINCT-REVENUE table (corpus_length_pareto's device) — parts with equal
# revenue are interchangeable, so the class is assigned at the distinct-value
# grain (ties share one class, decided by the group's inclusive cumulative;
# stated here because the oracle mirrors it exactly). The global windows
# (cumulative AND the grand total) order the bounded distinct-value domain
# only, never the part table — the part table is scanned exactly once.
# share_ppm divides through DECIMAL(38)/HUGEINT: class mass × 1e6 exceeds
# int64 at sf >= 0.1.

def orders_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_rev_micros()).cast("long").alias("rev")
    )
    by_rev = per_part.groupBy("rev").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts_v")
    )
    w = Window.orderBy(F.desc("rev")).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy(F.desc("rev")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = by_rev.withColumn(
        "cum", F.sum(F.col("rev") * F.col("n_parts_v")).over(w)
    ).withColumn("tot", F.sum(F.col("rev") * F.col("n_parts_v")).over(wall))
    classed = cum.select(
        "rev", "n_parts_v",
        F.when(F.col("cum") * 5 <= F.col("tot") * 4, F.lit("A"))
        .when(F.col("cum") * 20 <= F.col("tot") * 19, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        "tot",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.sum("n_parts_v").cast("long").alias("n_parts"),
            F.sum(F.col("rev") * F.col("n_parts_v")).cast("long").alias("class_rev_micros"),
            F.max("tot").alias("_tot"),
        )
        .select(
            "abc_class", "n_parts", "class_rev_micros",
            F.expr(
                "CAST((CAST(class_rev_micros AS DECIMAL(38,0)) * 1000000)"
                " DIV CAST(_tot AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


_SQL_PARETO_ABC = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))::BIGINT AS rev
  FROM lineitem GROUP BY l_partkey
),
by_rev AS (
  SELECT rev, COUNT(*)::BIGINT AS n_parts_v FROM per_part GROUP BY rev
),
cum AS (
  SELECT rev, n_parts_v,
         SUM(rev * n_parts_v) OVER (ORDER BY rev DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         SUM(rev * n_parts_v) OVER ()::BIGINT AS tot
  FROM by_rev
),
classed AS (
  SELECT rev, n_parts_v, tot,
         CASE WHEN cum * 5 <= tot * 4 THEN 'A'
              WHEN cum * 20 <= tot * 19 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM cum
)
SELECT abc_class,
       SUM(n_parts_v)::BIGINT AS n_parts,
       SUM(rev * n_parts_v)::BIGINT AS class_rev_micros,
       (SUM(rev * n_parts_v)::HUGEINT * 1000000 // MAX(tot))::BIGINT AS share_ppm
FROM classed
GROUP BY abc_class
"""

PENDING_QUERIES["orders_pareto_abc"] = orders_pareto_abc
PENDING_ORACLE["orders_pareto_abc"] = _SQL_PARETO_ABC


# --- Benford first-digit audit — PENDING round 7 ------------------------------
#
# Fraud/entry-error screen on order totals: the leading significant digit of
# a naturally-grown monetary amount follows Benford's law
# P(d) = log10(1 + 1/d). Expected masses are FROZEN integer literals
# floor(1e6·log10(1+1/d)) — both engines compare against the same nine
# constants, so no floating log is ever evaluated in-plan. The first digit is
# taken from the cents representation (scaling by 100 never changes the
# leading significant digit of a positive amount). Observed ppm uses the
# DECIMAL(38)/HUGEINT floor-division device. Scale shape: map-side digit
# extraction + ONE 9-group aggregate with map-side partials; the grand total
# is a window over those 9 rows, so orders is scanned exactly once.

_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        ).cast("int").alias("digit")
    )
    per = o.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    wall = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    exp_map = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
    )
    return (
        per.withColumn("tot", F.sum("n_orders").over(wall))
        .select(
            "digit",
            "n_orders",
            F.expr(
                "CAST((CAST(n_orders AS DECIMAL(38,0)) * 1000000)"
                " DIV CAST(tot AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("obs_ppm"),
            exp_map[F.col("digit")].cast("long").alias("exp_ppm"),
        )
        .withColumn("abs_dev_ppm", F.abs(F.col("obs_ppm") - F.col("exp_ppm")))
    )


def _sql_benford() -> str:
    cases = " ".join(
        f"WHEN {d} THEN {p}" for d, p in sorted(_BENFORD_PPM.items())
    )
    return f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders
),
per AS (
  SELECT digit, COUNT(*)::BIGINT AS n_orders,
         SUM(COUNT(*)) OVER ()::BIGINT AS tot
  FROM d GROUP BY digit
)
SELECT digit, n_orders,
       (n_orders::HUGEINT * 1000000 // tot)::BIGINT AS obs_ppm,
       (CASE digit {cases} END)::BIGINT AS exp_ppm,
       ABS((n_orders::HUGEINT * 1000000 // tot)
           - CASE digit {cases} END)::BIGINT AS abs_dev_ppm
FROM per
"""


PENDING_QUERIES["orders_benford_digits"] = orders_benford_digits
PENDING_ORACLE["orders_benford_digits"] = _sql_benford()


# --- Ship-lag trend (OLS slope) — PENDING round 7 ------------------------------
#
# Ops-health regression: is fulfilment getting slower over time? The monthly
# mean ship lag (l_shipdate - o_orderdate, in centi-days to keep the mean
# integer) is regressed on months-since-epoch per order priority with the
# closed-form OLS slope n·Σxy − Σx·Σy over n·Σx² − (Σx)², entirely in
# integers; the final slope floors to milli-centi-days-per-month with
# truncating division — Spark DIV and DuckDB // both truncate toward zero,
# which matters because the numerator CAN go negative (verified convention,
# see embedding_pca_topcomponent). Scale shape: ONE corpus-proportional
# stage — the lineitem⨝orders key join (co-partitioned, left to AQE) feeding
# a (priority, month) aggregate with map-side partials; the regression then
# runs on the BOUNDED monthly grid (#priorities × #months), never row grain.

def orders_shiplag_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long").alias("x"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lag"),
    )
    monthly = j.groupBy("priority", "x").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lag").cast("long").alias("sl"),
    ).select(
        "priority", "x",
        F.expr("sl * 100 div n").cast("long").alias("y"),
    )
    return (
        monthly.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            "priority", "n_months",
            F.expr("sy div n_months").cast("long").alias("lag_cdays_mean"),
            F.expr(
                "CAST((CAST(n_months * sxy - sx * sy AS DECIMAL(38,0)) * 1000)"
                " DIV CAST(n_months * sxx - sx * sx AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("slope_mcd_month"),
        )
    )


_SQL_SHIPLAG_TREND = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS x,
         (SUM(datediff('day', o_orderdate, l_shipdate))::BIGINT * 100
            // COUNT(*))::BIGINT AS y
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT priority,
       COUNT(*)::BIGINT AS n_months,
       (SUM(y) // COUNT(*))::BIGINT AS lag_cdays_mean,
       ((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))::HUGEINT * 1000
          // (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)))::BIGINT AS slope_mcd_month
FROM monthly
GROUP BY priority
"""

PENDING_QUERIES["orders_shiplag_trend"] = orders_shiplag_trend
PENDING_ORACLE["orders_shiplag_trend"] = _SQL_SHIPLAG_TREND


# --- Theil–Sen robust trend — PENDING round 7 ----------------------------------
#
# The robust twin of orders_shiplag_trend: the Theil–Sen estimator (median of
# all pairwise slopes) on the same (priority, month) grid — outlier months
# bend OLS but not the pairwise median. Exactness: each pairwise slope is
# quantized once to milli-units (dy·1000 div dx, truncating — both engines),
# and the median is the LOWER nearest-rank element rank = (n+1) div 2 under
# the total order (slope_q, x1, x2), so ties break identically. Scale shape:
# the pair self-join and the ranking window run over the BOUNDED monthly
# grid (≤ ~100 rows per priority → ≤ ~5 000 pairs), never row-grain data;
# the only corpus-proportional work is the same join + monthly aggregate the
# OLS row uses.

def orders_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long").alias("x"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lag"),
    )
    monthly = j.groupBy("priority", "x").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lag").cast("long").alias("sl"),
    ).select("priority", "x", F.expr("sl * 100 div n").cast("long").alias("y"))
    a = monthly.select("priority", F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = monthly.select("priority", F.col("x").alias("x2"), F.col("y").alias("y2"))
    pairs = a.join(b, "priority").filter(F.col("x1") < F.col("x2")).select(
        "priority", "x1", "x2",
        F.expr("(y2 - y1) * 1000 div (x2 - x1)").cast("long").alias("slope_q"),
    )
    wrk = Window.partitionBy("priority").orderBy("slope_q", "x1", "x2")
    wn = Window.partitionBy("priority")
    ranked = pairs.select(
        "priority", "slope_q",
        F.row_number().over(wrk).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_pairs"),
    )
    return (
        ranked.filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select(
            "priority",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("slope_q").alias("ts_slope_mcd_month"),
        )
    )


_SQL_THEILSEN = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS x,
         (SUM(datediff('day', o_orderdate, l_shipdate))::BIGINT * 100
            // COUNT(*))::BIGINT AS y
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.priority, a.x AS x1, b.x AS x2,
         ((b.y - a.y) * 1000 // (b.x - a.x))::BIGINT AS slope_q
  FROM monthly a JOIN monthly b ON a.priority = b.priority AND a.x < b.x
),
ranked AS (
  SELECT priority, slope_q,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY slope_q, x1, x2) AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS n_pairs
  FROM pairs
)
SELECT priority, n_pairs::BIGINT AS n_pairs,
       slope_q AS ts_slope_mcd_month
FROM ranked WHERE rn = (n_pairs + 1) // 2
"""

PENDING_QUERIES["orders_theilsen_trend"] = orders_theilsen_trend
PENDING_ORACLE["orders_theilsen_trend"] = _SQL_THEILSEN


# --- Supplier HHI concentration — PENDING round 7 ------------------------------
#
# Market-concentration audit: the Herfindahl–Hirschman index of supplier
# revenue within each nation, on the standard 0–10 000 point scale made
# integer-exact: per-supplier share quantized ONCE to basis points
# bp = rev·10 000 div nation_total (truncating), HHI = Σ bp² div 10 000 —
# the statistic is DEFINED over the quantized shares so both engines agree
# bit-for-bit (the quantization understates the true HHI by < 2·#suppliers
# bp², documented). Also reports the top supplier's share in basis points.
# Scale shape: one lineitem shuffle to supplier grain, a BROADCAST
# supplier→nation enrichment (dimension-sized), then nation-grain windows
# over the bounded supplier-per-nation domain.

def supplier_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(_rev_micros()).cast("long").alias("rev")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = supp.join(nat, supp.s_nationkey == nat.n_nationkey).select(
        F.col("s_suppkey").alias("l_suppkey"), F.col("n_name").alias("nation")
    )
    enriched = per_supp.join(F.broadcast(dim), "l_suppkey")
    wn = Window.partitionBy("nation")
    shares = enriched.select(
        "nation", "rev",
        F.expr(
            "CAST((CAST(rev AS DECIMAL(38,0)) * 10000)"
            " DIV CAST(sum(rev) over (partition by nation) AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("bp"),
        F.sum("rev").over(wn).alias("tot"),
    )
    return shares.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.max("tot").cast("long").alias("rev_micros"),
        F.expr("sum(bp * bp) div 10000").cast("long").alias("hhi_points"),
        F.max("bp").cast("long").alias("top_share_bp"),
    )


_SQL_HHI = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))::BIGINT AS rev
  FROM lineitem GROUP BY l_suppkey
),
shares AS (
  SELECT n.n_name AS nation, rev,
         (rev::HUGEINT * 10000
            // SUM(rev) OVER (PARTITION BY n.n_name))::BIGINT AS bp,
         SUM(rev) OVER (PARTITION BY n.n_name) AS tot
  FROM per_supp p
  JOIN supplier s ON s.s_suppkey = p.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
)
SELECT nation,
       COUNT(*)::BIGINT AS n_suppliers,
       MAX(tot)::BIGINT AS rev_micros,
       (SUM(bp * bp) // 10000)::BIGINT AS hhi_points,
       MAX(bp)::BIGINT AS top_share_bp
FROM shares
GROUP BY nation
"""

PENDING_QUERIES["supplier_hhi_concentration"] = supplier_hhi_concentration
PENDING_ORACLE["supplier_hhi_concentration"] = _SQL_HHI


# --- Seasonal index (ratio-to-moving-average) — PENDING round 7 ----------------
#
# The textbook multiplicative seasonal decomposition step: monthly revenue
# over a centered 2×12 moving average, then the seasonal index per
# month-of-year as the LOWER nearest-rank median of the ratios. Integer
# devices: the 2×12 MA is kept as 24 half-units ma24 = rev[t−6] +
# 2·Σ_{t−5..t+5} rev + rev[t+6] (never divided), the ratio quantizes once to
# ppm as rev_t·24·1e6 div ma24, and the median picks rank (n+1) div 2 under
# (ratio, month-index) — all reproducible bit-for-bit. Months without the
# full ±6 window are excluded (count(±5) = 11 AND both edge lags present).
# Scale shape: one shuffle to the BOUNDED monthly grid; the ordered window
# and the ranking run over that grid (≤ ~100 rows — the explicit
# single-partition window is a bounded-domain sort, stated not hidden).

def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    monthly = o.groupBy("m").agg(F.sum("cents").cast("long").alias("rev"))
    wo = Window.orderBy("m")
    wmid = wo.rowsBetween(-5, 5)
    scored = monthly.select(
        "m", "rev",
        F.sum("rev").over(wmid).alias("mid"),
        F.count(F.lit(1)).over(wmid).alias("nmid"),
        F.lag("rev", 6).over(wo).alias("lo"),
        F.lead("rev", 6).over(wo).alias("hi"),
    ).filter(
        (F.col("nmid") == 11) & F.col("lo").isNotNull() & F.col("hi").isNotNull()
    ).select(
        "m",
        (F.col("m") % 12 + 1).cast("long").alias("month"),
        F.expr(
            "CAST((CAST(rev AS DECIMAL(38,0)) * 24 * 1000000)"
            " DIV CAST(lo + 2 * mid + hi AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("ratio_ppm"),
    )
    wrk = Window.partitionBy("month").orderBy("ratio_ppm", "m")
    wn = Window.partitionBy("month")
    return (
        scored.select(
            "month", "ratio_ppm",
            F.row_number().over(wrk).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n_obs"),
        )
        .filter(F.col("rn") == F.expr("(n_obs + 1) div 2"))
        .select(
            "month",
            F.col("n_obs").cast("long").alias("n_obs"),
            F.col("ratio_ppm").alias("seasonal_ppm"),
        )
    )


_SQL_SEASONAL = """
WITH monthly AS (
  SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT AS m,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS rev
  FROM orders GROUP BY 1
),
scored AS (
  SELECT m, (m % 12 + 1)::BIGINT AS month,
         (rev::HUGEINT * 24 * 1000000 // (lo + 2 * mid + hi))::BIGINT AS ratio_ppm
  FROM (
    SELECT m, rev,
           SUM(rev) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS mid,
           COUNT(*) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS nmid,
           LAG(rev, 6) OVER (ORDER BY m) AS lo,
           LEAD(rev, 6) OVER (ORDER BY m) AS hi
    FROM monthly
  )
  WHERE nmid = 11 AND lo IS NOT NULL AND hi IS NOT NULL
)
SELECT month, n_obs::BIGINT AS n_obs, ratio_ppm AS seasonal_ppm
FROM (
  SELECT month, ratio_ppm,
         ROW_NUMBER() OVER (PARTITION BY month ORDER BY ratio_ppm, m) AS rn,
         COUNT(*) OVER (PARTITION BY month) AS n_obs
  FROM scored
)
WHERE rn = (n_obs + 1) // 2
"""

PENDING_QUERIES["orders_seasonal_index"] = orders_seasonal_index
PENDING_ORACLE["orders_seasonal_index"] = _SQL_SEASONAL


# --- Index-of-dispersion test — PENDING round 7 ---------------------------------
#
# Distribution-shape audit: are items-per-order Poisson (dispersion ≈ 1),
# under-dispersed (capped/uniform) or over-dispersed (bursty)? The index of
# dispersion var/mean collapses to the pure-integer rational
# (n·Σx² − (Σx)²) / ((n−1)·Σx), floored once to ppm through DECIMAL(38) —
# n·Σx² reaches ~1e12·1e14 at 100 TB, past int64. Grouped by order priority.
# Scale shape: one shuffle to order grain (count items per order, map-side
# partials), one bounded-grid aggregate per priority; no window, no join
# beyond the orderkey one.

def orders_dispersion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_orderpriority").alias("priority"), "x")
    )
    return (
        per_order.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            "priority", "n_orders",
            F.expr("sx div n_orders").cast("long").alias("mean_items"),
            F.expr(
                "CAST((CAST(n_orders AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)"
                " * 1000000 DIV (CAST(n_orders - 1 AS DECIMAL(38,0)) * sx) AS BIGINT)"
            ).alias("dispersion_ppm"),
        )
    )


_SQL_DISPERSION = """
WITH per_order AS (
  SELECT o_orderpriority AS priority, COUNT(*)::BIGINT AS x
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_orderkey, o_orderpriority
)
SELECT priority,
       COUNT(*)::BIGINT AS n_orders,
       (SUM(x) // COUNT(*))::BIGINT AS mean_items,
       ((COUNT(*)::HUGEINT * SUM(x * x) - SUM(x)::HUGEINT * SUM(x)) * 1000000
          // ((COUNT(*) - 1)::HUGEINT * SUM(x)))::BIGINT AS dispersion_ppm
FROM per_order
GROUP BY priority
"""

PENDING_QUERIES["orders_dispersion_test"] = orders_dispersion_test
PENDING_ORACLE["orders_dispersion_test"] = _SQL_DISPERSION


# --- Week-over-week revenue growth — PENDING round 7 ----------------------------
#
# The reporting-layer growth table: revenue per ISO-style week index
# (days-since-epoch div 7 — no year-boundary seam, both engines share the
# same integer week key), with week-over-week growth in signed ppm against
# the PREVIOUS OBSERVED week (lag over the bounded weekly grid; a gap week
# simply widens the step, stated not hidden). Growth = (rev − prev)·1e6 div
# prev with truncating division (negative growth occurs). Scale shape: one
# shuffle to the bounded weekly grid with map-side partials; the lag window
# orders that grid only.

def orders_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("datediff(o_orderdate, DATE '1970-01-01') div 7")
        .cast("long")
        .alias("week"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    weekly = o.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("rev_cents"),
    )
    w = Window.orderBy("week")
    return weekly.select(
        "week", "n_orders", "rev_cents",
        F.lag("rev_cents").over(w).alias("prev_cents"),
    ).select(
        "week", "n_orders", "rev_cents",
        F.expr(
            "CASE WHEN prev_cents IS NULL THEN NULL"
            " ELSE CAST((CAST(rev_cents AS DECIMAL(38,0)) - prev_cents) * 1000000"
            " DIV CAST(prev_cents AS DECIMAL(38,0)) AS BIGINT) END"
        ).alias("wow_ppm"),
    )


_SQL_REV_WOW = """
WITH weekly AS (
  SELECT (datediff('day', DATE '1970-01-01', o_orderdate) // 7)::BIGINT AS week,
         COUNT(*)::BIGINT AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_cents
  FROM orders GROUP BY 1
)
SELECT week, n_orders, rev_cents,
       CASE WHEN prev_cents IS NULL THEN NULL
            ELSE ((rev_cents::HUGEINT - prev_cents) * 1000000 // prev_cents) END::BIGINT
         AS wow_ppm
FROM (SELECT *, LAG(rev_cents) OVER (ORDER BY week) AS prev_cents FROM weekly)
"""

PENDING_QUERIES["orders_revenue_wow"] = orders_revenue_wow
PENDING_ORACLE["orders_revenue_wow"] = _SQL_REV_WOW


# --- Brand share shift — PENDING round 7 -----------------------------------------
#
# Mix-shift report: each part brand's revenue share of its half of the
# timeline (orders split at the fixture-independent calendar midpoint,
# computed as the integer mean of min/max epoch-day — both engines derive
# the same constant from the data, no magic date), and the share delta in
# signed ppm. A brand present in only one half keeps its row (missing side
# = 0) via a single conditional-aggregation pivot — ONE pass over the
# (brand × 2) grid, no self-join, so the corpus lineage below is evaluated
# once. Scale shape: lineitem⨝part is the one
# corpus join (part dimension broadcast-eligible at TPC-H ratios but left
# to AQE — it is corpus-proportional in general); everything after runs on
# the bounded (brand × 2) grid.

def parts_brand_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", _rev_micros().alias("rev")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr("datediff(o_orderdate, DATE '1970-01-01')").alias("d")
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    mid = o.agg(
        F.expr("(min(d) + max(d)) div 2").cast("long").alias("mid")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, "l_partkey")
        .crossJoin(F.broadcast(mid))
        .select(
            "p_brand",
            (F.col("d") > F.col("mid")).cast("int").alias("half"),
            "rev",
        )
    )
    per = j.groupBy("p_brand", "half").agg(F.sum("rev").cast("long").alias("brev"))
    wh = Window.partitionBy("half")
    shares = per.select(
        "p_brand", "half",
        F.expr(
            "CAST((CAST(brev AS DECIMAL(38,0)) * 1000000)"
            " DIV CAST(sum(brev) over (partition by half) AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("share_ppm"),
    )
    return (
        shares.groupBy("p_brand")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("half") == 0, F.col("share_ppm"))), F.lit(0)
            ).cast("long").alias("share_h1_ppm"),
            F.coalesce(
                F.max(F.when(F.col("half") == 1, F.col("share_ppm"))), F.lit(0)
            ).cast("long").alias("share_h2_ppm"),
        )
        .withColumn(
            "shift_ppm", F.col("share_h2_ppm") - F.col("share_h1_ppm")
        )
    )


_SQL_BRAND_SHIFT = """
WITH od AS (
  SELECT o_orderkey, datediff('day', DATE '1970-01-01', o_orderdate) AS d
  FROM orders
),
j AS (
  SELECT p.p_brand,
         CASE WHEN od.d > (SELECT (MIN(d) + MAX(d)) // 2 FROM od) THEN 1 ELSE 0 END AS half,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev
  FROM lineitem
  JOIN od ON l_orderkey = o_orderkey
  JOIN part p ON p.p_partkey = l_partkey
),
per AS (SELECT p_brand, half, SUM(rev)::BIGINT AS brev FROM j GROUP BY 1, 2),
shares AS (
  SELECT p_brand, half,
         (brev::HUGEINT * 1000000 // SUM(brev) OVER (PARTITION BY half))::BIGINT
           AS share_ppm
  FROM per
)
SELECT p_brand,
       COALESCE(MAX(CASE WHEN half = 0 THEN share_ppm END), 0)::BIGINT AS share_h1_ppm,
       COALESCE(MAX(CASE WHEN half = 1 THEN share_ppm END), 0)::BIGINT AS share_h2_ppm,
       (COALESCE(MAX(CASE WHEN half = 1 THEN share_ppm END), 0)
        - COALESCE(MAX(CASE WHEN half = 0 THEN share_ppm END), 0))::BIGINT AS shift_ppm
FROM shares
GROUP BY p_brand
"""

PENDING_QUERIES["parts_brand_share_shift"] = parts_brand_share_shift
PENDING_ORACLE["parts_brand_share_shift"] = _SQL_BRAND_SHIFT


# --- Customer value-tier migration matrix — PENDING round 7 ---------------------
#
# Customer-dynamics report: spend terciles computed INDEPENDENTLY in each
# half of the timeline (same calendar-midpoint split as the brand-shift
# row), then the transition matrix between tiers — including the 'churned'
# (first half only, tier_h2 NULL) and 'acquired' (second half only, tier_h1
# NULL) margins that a same-population matrix would hide — kept in ONE
# conditional-aggregation pivot pass (no half-vs-half self-join, so the
# order lineage is evaluated once). Tiering is
# ntile(3) over (spend, custkey) — the deterministic-tie device the RFM row
# pinned; like the RFM row, the tier windows are GLOBAL sorts over the
# customer-grain table (the honest cost of exact population quantiles —
# the approx-sketch rows are the scale alternative, stated not hidden).
# Scale shape: one shuffle to (customer, half) grain, two customer-grain
# sorts, one bounded 4×4 matrix aggregate.

def customer_tier_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("datediff(o_orderdate, DATE '1970-01-01')").alias("d"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    mid = o.agg(F.expr("(min(d) + max(d)) div 2").cast("long").alias("mid"))
    per = (
        o.crossJoin(F.broadcast(mid))
        .select(
            "o_custkey",
            (F.col("d") > F.col("mid")).cast("int").alias("half"),
            "cents",
        )
        .groupBy("o_custkey", "half")
        .agg(F.sum("cents").cast("long").alias("spend"))
    )
    wt = Window.partitionBy("half").orderBy("spend", "o_custkey")
    tiered = per.select(
        "o_custkey", "half", F.ntile(3).over(wt).cast("long").alias("tier")
    )
    return (
        tiered.groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("half") == 0, F.col("tier"))).alias("tier_h1"),
            F.max(F.when(F.col("half") == 1, F.col("tier"))).alias("tier_h2"),
        )
        .groupBy("tier_h1", "tier_h2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


_SQL_TIER_MIGRATION = """
WITH o AS (
  SELECT o_custkey, datediff('day', DATE '1970-01-01', o_orderdate) AS d,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
per AS (
  SELECT o_custkey,
         CASE WHEN d > (SELECT (MIN(d) + MAX(d)) // 2 FROM o) THEN 1 ELSE 0 END AS half,
         SUM(cents)::BIGINT AS spend
  FROM o GROUP BY 1, 2
),
tiered AS (
  SELECT o_custkey, half,
         NTILE(3) OVER (PARTITION BY half ORDER BY spend, o_custkey)::BIGINT AS tier
  FROM per
)
SELECT tier_h1, tier_h2, COUNT(*)::BIGINT AS n_customers
FROM (
  SELECT o_custkey,
         MAX(CASE WHEN half = 0 THEN tier END) AS tier_h1,
         MAX(CASE WHEN half = 1 THEN tier END) AS tier_h2
  FROM tiered GROUP BY o_custkey
)
GROUP BY 1, 2
"""

PENDING_QUERIES["customer_tier_migration"] = customer_tier_migration
PENDING_ORACLE["customer_tier_migration"] = _SQL_TIER_MIGRATION


# --- Rapid repeat-order audit — PENDING round 7 ---------------------------------
#
# The ops screen for accidental double submissions and scripted ordering: a
# customer placing MORE THAN ONE order inside the same calendar week
# (epoch-day div 7 — no year-boundary seam). One row per (customer, week)
# collision group: order count, total cents, and the colliding order ids as
# a deterministically SORTED CSV (the sort makes the value hash stable; the
# group is small by construction). An exact same-amount duplicate screen is
# vacuous on this schema — o_totalprice is effectively continuous (probed:
# zero collisions at sf0.01), so the week-grain recurrence is the honest
# signal. Scale shape: one shuffle to the (customer, week) composite key
# with map-side partials, HAVING count > 1 — selectivity does the rest; no
# window, no join.

def orders_rapid_repeat_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("datediff(o_orderdate, DATE '1970-01-01') div 7")
        .cast("long")
        .alias("week"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    return (
        o.groupBy("o_custkey", "week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.array_join(
                F.array_sort(F.collect_list(F.col("o_orderkey").cast("string"))),
                ",",
            ).alias("orderkeys"),
        )
        .filter(F.col("n_orders") > 1)
    )


_SQL_RAPID_REPEAT = """
SELECT o_custkey,
       (datediff('day', DATE '1970-01-01', o_orderdate) // 7)::BIGINT AS week,
       COUNT(*)::BIGINT AS n_orders,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS sum_cents,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY CAST(o_orderkey AS VARCHAR))
         AS orderkeys
FROM orders
GROUP BY 1, 2
HAVING COUNT(*) > 1
"""

PENDING_QUERIES["orders_rapid_repeat_orders"] = orders_rapid_repeat_orders
PENDING_ORACLE["orders_rapid_repeat_orders"] = _SQL_RAPID_REPEAT


# --- Return rate by fulfilment age — PENDING round 7 ----------------------------
#
# Does slow fulfilment drive returns? Return share (l_returnflag = 'R') per
# ship-lag bucket, power-of-2 weeks via the shared ilog2 bin() device
# (bucket = length(bin(lag_days div 7 + 1)) − 1, so 0 = same week,
# 1 = 1–2 weeks, 2 = 3–6, ...). Rate in ppm, plus the revenue at stake per
# bucket. Scale shape: the one lineitem⨝orders key join (AQE), a map-side
# bucket expression, one bounded bucket-grain aggregate — nothing else.

def orders_return_rate_by_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag", _rev_micros().alias("rev")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        (
            F.length(
                F.bin(F.expr("datediff(l_shipdate, o_orderdate) div 7") + 1)
            ) - 1
        ).cast("long").alias("age_bucket"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
        "rev",
    )
    return j.groupBy("age_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("ret").cast("long").alias("n_returned"),
        F.expr("sum(ret) * 1000000 div count(1)").cast("long").alias("return_ppm"),
        F.sum(F.when(F.col("ret") == 1, F.col("rev")).otherwise(0))
        .cast("long")
        .alias("returned_rev_micros"),
    )


_SQL_RETURN_BY_AGE = """
SELECT (length(bin((datediff('day', o_orderdate, l_shipdate) // 7) + 1)) - 1)::BIGINT
         AS age_bucket,
       COUNT(*)::BIGINT AS n_items,
       SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS n_returned,
       (SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000
          // COUNT(*))::BIGINT AS return_ppm,
       SUM(CASE WHEN l_returnflag = 'R'
                THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                ELSE 0 END)::BIGINT AS returned_rev_micros
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""

PENDING_QUERIES["orders_return_rate_by_age"] = orders_return_rate_by_age
PENDING_ORACLE["orders_return_rate_by_age"] = _SQL_RETURN_BY_AGE


# --- Single-source supply risk — PENDING round 7 --------------------------------
#
# The procurement-risk screen: parts observed shipping from fewer than two
# distinct suppliers are single-sourced — a supply-chain fragility metric.
# Supplier breadth comes from the DISTINCT (part, supplier) pairs actually
# traded in lineitem (no partsupp table in the fixture; the observed graph
# is the honest source). Per brand: parts traded, single-sourced parts and
# their ppm share, plus the max supplier breadth. Scale shape: one distinct
# to (part, supp) grain, one part-grain count, one broadcast part-dim
# enrichment, one bounded brand rollup.

def parts_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    ).distinct()
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_supp")
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    j = per_part.join(F.broadcast(p), "l_partkey")
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.count_if(F.col("n_supp") == 1).cast("long").alias("n_single_source"),
        F.expr("count_if(n_supp = 1) * 1000000 div count(1)")
        .cast("long")
        .alias("single_source_ppm"),
        F.max("n_supp").cast("long").alias("max_suppliers"),
    )


_SQL_SINGLE_SOURCE = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
per_part AS (
  SELECT l_partkey, COUNT(*)::BIGINT AS n_supp FROM pairs GROUP BY l_partkey
)
SELECT p.p_brand,
       COUNT(*)::BIGINT AS n_parts,
       COUNT(*) FILTER (WHERE n_supp = 1)::BIGINT AS n_single_source,
       (COUNT(*) FILTER (WHERE n_supp = 1) * 1000000 // COUNT(*))::BIGINT
         AS single_source_ppm,
       MAX(n_supp)::BIGINT AS max_suppliers
FROM per_part JOIN part p ON p.p_partkey = l_partkey
GROUP BY p.p_brand
"""

PENDING_QUERIES["parts_single_source_risk"] = parts_single_source_risk
PENDING_ORACLE["parts_single_source_risk"] = _SQL_SINGLE_SOURCE


# --- Ship-SLA attainment — PENDING round 7 --------------------------------------
#
# The fulfilment SLA dashboard row: per order priority, the share of line
# items shipped within 30 / 60 / 90 days of the order date, as three
# cumulative attainment ppm columns from ONE conditional-aggregate pass
# (no per-threshold subqueries), plus the worst observed lag. Scale shape:
# the lineitem⨝orders key join (AQE), then a single bounded
# priority-grain aggregate — the canonical one-join-one-agg report.

def orders_sla_attainment(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lag"),
    )
    def ppm(days: int):
        return (
            F.expr(f"count_if(lag <= {days}) * 1000000 div count(1)")
            .cast("long")
            .alias(f"within_{days}d_ppm")
        )
    return j.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        ppm(30), ppm(60), ppm(90),
        F.max("lag").cast("long").alias("max_lag_days"),
    )


_SQL_SLA = """
SELECT o_orderpriority AS priority,
       COUNT(*)::BIGINT AS n_items,
       (COUNT(*) FILTER (WHERE lag <= 30) * 1000000 // COUNT(*))::BIGINT AS within_30d_ppm,
       (COUNT(*) FILTER (WHERE lag <= 60) * 1000000 // COUNT(*))::BIGINT AS within_60d_ppm,
       (COUNT(*) FILTER (WHERE lag <= 90) * 1000000 // COUNT(*))::BIGINT AS within_90d_ppm,
       MAX(lag)::BIGINT AS max_lag_days
FROM (
  SELECT o_orderpriority, datediff('day', o_orderdate, l_shipdate)::BIGINT AS lag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
GROUP BY 1
"""

PENDING_QUERIES["orders_sla_attainment"] = orders_sla_attainment
PENDING_ORACLE["orders_sla_attainment"] = _SQL_SLA


# --- Day-of-week load uniformity — PENDING round 7 ------------------------------
#
# Is order intake uniform across weekdays? Benford-structure audit against
# the UNIFORM expectation: per day-of-week (epoch-day mod 7 — engine-
# agnostic, no locale-dependent dayname()), observed orders, expected in
# micro-orders floor(total·1e6/7), and the per-cell chi-square contribution
# floor((o·1e6 − e_micro)²/(e_micro·1e6)) — the integer-floored per-cell
# convention of quality_chi2_source_lang. Scale shape: one 7-group
# aggregate with map-side partials; the total is a window over 7 rows.

def orders_dow_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("pmod(datediff(o_orderdate, DATE '1970-01-01'), 7)")
        .cast("long")
        .alias("dow")
    )
    per = o.groupBy("dow").agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    wall = Window.orderBy("dow").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.withColumn("tot", F.sum("n_orders").over(wall)).select(
        "dow", "n_orders",
        F.expr("CAST(tot * 1000000 div 7 AS BIGINT)").alias("exp_micro"),
    ).select(
        "dow", "n_orders", "exp_micro",
        F.expr(
            "CAST(CAST(n_orders * 1000000 - exp_micro AS DECIMAL(38,0))"
            " * (n_orders * 1000000 - exp_micro)"
            " DIV (CAST(exp_micro AS DECIMAL(38,0)) * 1000000) AS BIGINT)"
        ).alias("chi2_cell"),
    )


_SQL_DOW_UNIFORMITY = """
WITH per AS (
  SELECT ((datediff('day', DATE '1970-01-01', o_orderdate) % 7 + 7) % 7)::BIGINT AS dow,
         COUNT(*)::BIGINT AS n_orders
  FROM orders GROUP BY 1
),
ex AS (
  SELECT dow, n_orders,
         (SUM(n_orders) OVER () * 1000000 // 7)::BIGINT AS exp_micro
  FROM per
)
SELECT dow, n_orders, exp_micro,
       ((n_orders::HUGEINT * 1000000 - exp_micro)
          * (n_orders::HUGEINT * 1000000 - exp_micro)
          // (exp_micro::HUGEINT * 1000000))::BIGINT AS chi2_cell
FROM ex
"""

PENDING_QUERIES["orders_dow_uniformity"] = orders_dow_uniformity
PENDING_ORACLE["orders_dow_uniformity"] = _SQL_DOW_UNIFORMITY


# --- Discount–quantity correlation — PENDING round 7 ----------------------------
#
# Do bigger discounts move bigger quantities? Pearson r between discount
# cents and quantity cents per part brand: exact BIGINT sufficient
# statistics at line grain, one IEEE sqrt + division tail floored at milli
# (the autocorr/assortativity device), r = 0 on degenerate variance. Scale
# shape: lineitem⨝part enrichment (broadcastable dimension), one bounded
# brand-grain aggregate of five sums.

def lineitem_discount_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 100).cast("long").alias("x"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("y"),
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    j = li.join(F.broadcast(p), "l_partkey")
    m = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "p_brand",
        F.col("n").alias("n_items"),
        F.when(
            (d1 > 0) & (d2 > 0),
            F.floor(
                num.cast("double")
                * F.lit(1000.0)
                / F.sqrt(d1.cast("double") * d2.cast("double"))
            ),
        ).otherwise(F.lit(0)).cast("long").alias("r_milli"),
    )


_SQL_DISC_QTY_CORR = """
WITH j AS (
  SELECT p.p_brand,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS y
  FROM lineitem JOIN part p ON p.p_partkey = l_partkey
),
m AS (
  SELECT p_brand, COUNT(*)::BIGINT AS n,
         SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
         SUM(x * y)::BIGINT AS sxy,
         SUM(x * x)::BIGINT AS sxx, SUM(y * y)::BIGINT AS syy
  FROM j GROUP BY p_brand
)
SELECT p_brand, n AS n_items,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN FLOOR(CAST(n * sxy - sx * sy AS DOUBLE) * 1000.0
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)))
            ELSE 0 END::BIGINT AS r_milli
FROM m
"""

PENDING_QUERIES["lineitem_discount_quantity_corr"] = lineitem_discount_quantity_corr
PENDING_ORACLE["lineitem_discount_quantity_corr"] = _SQL_DISC_QTY_CORR


# --- Customer balance profile — PENDING round 7 ---------------------------------
#
# Credit-risk snapshot on the customer dimension: per market segment, the
# share of customers in debit (negative account balance) in ppm, the exact
# nearest-rank median balance in cents (rank (n+1) div 2 under
# (cents, custkey) — deterministic ties), and the extremes. Scale shape:
# one segment-partitioned ranking window over the customer dimension (the
# smallest table in the schema — the honest exact-median cost), one bounded
# segment rollup.

def customers_balance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    wrk = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    wn = Window.partitionBy("c_mktsegment")
    ranked = c.select(
        "c_mktsegment", "cents",
        F.row_number().over(wrk).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
        F.sum(F.when(F.col("cents") < 0, 1).otherwise(0)).over(wn).alias("n_neg"),
    )
    return ranked.groupBy("c_mktsegment").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.expr("max(n_neg) * 1000000 div max(n)").cast("long").alias("debit_ppm"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("cents"))
        ).cast("long").alias("median_cents"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )


_SQL_BALANCE_PROFILE = """
WITH c AS (
  SELECT c_mktsegment, c_custkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
ranked AS (
  SELECT c_mktsegment, cents,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY cents, c_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n,
         SUM(CASE WHEN cents < 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY c_mktsegment) AS n_neg
  FROM c
)
SELECT c_mktsegment,
       MAX(n)::BIGINT AS n_customers,
       (MAX(n_neg) * 1000000 // MAX(n))::BIGINT AS debit_ppm,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)::BIGINT AS median_cents,
       MIN(cents)::BIGINT AS min_cents,
       MAX(cents)::BIGINT AS max_cents
FROM ranked
GROUP BY c_mktsegment
"""

PENDING_QUERIES["customers_balance_profile"] = customers_balance_profile
PENDING_ORACLE["customers_balance_profile"] = _SQL_BALANCE_PROFILE


# --- Part-type class revenue — PENDING round 7 ----------------------------------
#
# Dimension engineering on the free-text p_type ("STANDARD ANODIZED TIN"):
# roll revenue up to the FIRST word — the manufacturing class — with share
# ppm of total, ordered by an explicit rank for a stable driver hash. The
# string split is a map-side expression on the part dimension, so the big
# side still joins on the integer key and the derived class rides along
# (never a corpus-side string operation). Scale shape: lineitem⨝part
# (broadcastable dimension), one bounded class rollup, share via a window
# over that grid.

def parts_type_class_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", _rev_micros().alias("rev")
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_class"),
    )
    per = (
        li.join(F.broadcast(p), "l_partkey")
        .groupBy("type_class")
        .agg(F.sum("rev").cast("long").alias("rev_micros"))
    )
    wall = Window.orderBy("type_class").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wr = Window.orderBy(F.desc("rev_micros"), F.asc("type_class"))
    return per.withColumn("tot", F.sum("rev_micros").over(wall)).select(
        "type_class", "rev_micros",
        F.expr(
            "CAST(CAST(rev_micros AS DECIMAL(38,0)) * 1000000"
            " DIV CAST(tot AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("share_ppm"),
        F.row_number().over(wr).cast("long").alias("rank"),
    )


_SQL_TYPE_CLASS = """
WITH per AS (
  SELECT split_part(p_type, ' ', 1) AS type_class,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))::BIGINT AS rev_micros
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1
)
SELECT type_class, rev_micros,
       (rev_micros::HUGEINT * 1000000 // SUM(rev_micros) OVER ())::BIGINT
         AS share_ppm,
       ROW_NUMBER() OVER (ORDER BY rev_micros DESC, type_class)::BIGINT AS rank
FROM per
"""

PENDING_QUERIES["parts_type_class_revenue"] = parts_type_class_revenue
PENDING_ORACLE["parts_type_class_revenue"] = _SQL_TYPE_CLASS


# --- Trade-flow matrix — PENDING round 7 ----------------------------------------
#
# Q7 without the blinkers: revenue between EVERY (supplier nation, customer
# nation) pair, not one hand-picked pair — the full five-table star
# (lineitem ⨝ orders ⨝ customer ⨝ supplier ⨝ nation×2) rolled to the
# bounded 25×25 matrix, with share ppm and the domestic flag (the
# home-bias diagnostic falls straight out). Scale shape: the two fact-side
# joins are key joins (orderkey, suppkey — AQE decides broadcast vs
# shuffle); customer and the two nation legs are dimension enrichments on
# the already-joined keys; everything after is matrix-grain.

def trade_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev_micros().alias("rev")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .join(
            F.broadcast(n.select(
                F.col("n_nationkey").alias("cn_key"),
                F.col("n_name").alias("cust_nation"),
            )),
            F.col("c_nationkey") == F.col("cn_key"),
        )
    )
    per = j.groupBy("supp_nation", "cust_nation").agg(
        F.sum("rev").cast("long").alias("rev_micros"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    wall = Window.partitionBy()
    return per.select(
        "supp_nation", "cust_nation", "n_items", "rev_micros",
        F.expr(
            "CAST(CAST(rev_micros AS DECIMAL(38,0)) * 1000000"
            " DIV CAST(sum(rev_micros) over () AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("share_ppm"),
        (F.col("supp_nation") == F.col("cust_nation")).alias("domestic"),
    )


_SQL_TRADE_FLOW = """
WITH per AS (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         COUNT(*)::BIGINT AS n_items,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))::BIGINT AS rev_micros
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON ns.n_nationkey = s_nationkey
  JOIN nation nc ON nc.n_nationkey = c_nationkey
  GROUP BY 1, 2
)
SELECT supp_nation, cust_nation, n_items, rev_micros,
       (rev_micros::HUGEINT * 1000000 // SUM(rev_micros) OVER ())::BIGINT
         AS share_ppm,
       supp_nation = cust_nation AS domestic
FROM per
"""

PENDING_QUERIES["trade_flow_matrix"] = trade_flow_matrix
PENDING_ORACLE["trade_flow_matrix"] = _SQL_TRADE_FLOW


# --- Open-order aging — PENDING round 7 -----------------------------------------
#
# The accounts-receivable-style aging report on still-open orders
# (o_orderstatus = 'O'): age = days from order date to the corpus's last
# order date (both engines derive the same "as of" scalar from the data),
# banded by power-of-2 months via the shared ilog2 bin() device, with order
# counts and the open value at risk per band. Scale shape: one filtered
# scan + a broadcast one-row max-date, one bounded band rollup.

def orders_open_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.expr("datediff(o_orderdate, DATE '1970-01-01')").cast("long").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    asof = o.agg(F.max("d").alias("asof_d"))
    aged = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(asof))
        .select(
            (F.col("asof_d") - F.col("d")).alias("age_days"),
            "cents",
        )
        .select(
            "age_days", "cents",
            (F.length(F.bin(F.expr("age_days div 30") + 1)) - 1)
            .cast("long")
            .alias("band"),
        )
    )
    return aged.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_open"),
        F.sum("cents").cast("long").alias("open_cents"),
        F.min("age_days").cast("long").alias("min_age_days"),
        F.max("age_days").cast("long").alias("max_age_days"),
    )


_SQL_OPEN_AGING = """
WITH o AS (
  SELECT o_orderstatus,
         datediff('day', DATE '1970-01-01', o_orderdate)::BIGINT AS d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
aged AS (
  SELECT (SELECT MAX(d) FROM o) - d AS age_days, cents
  FROM o WHERE o_orderstatus = 'O'
)
SELECT (length(bin((age_days // 30) + 1)) - 1)::BIGINT AS band,
       COUNT(*)::BIGINT AS n_open,
       SUM(cents)::BIGINT AS open_cents,
       MIN(age_days)::BIGINT AS min_age_days,
       MAX(age_days)::BIGINT AS max_age_days
FROM aged
GROUP BY 1
"""

PENDING_QUERIES["orders_open_aging"] = orders_open_aging
PENDING_ORACLE["orders_open_aging"] = _SQL_OPEN_AGING


# --- Basket-size value curve — PENDING round 7 ----------------------------------
#
# Does order value scale linearly with basket size? Per basket size (line
# items per order): orders, mean order value in cents (truncating), and the
# MARGINAL value of the next item (lag difference over the bounded
# size grid — where the curve flattens, upselling stops paying). Scale
# shape: one order-grain count join (orderkey-keyed), one bounded
# size-grain rollup, one lag window over that grid.

def orders_size_value_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    size = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items")
    )
    j = size.join(o, size.l_orderkey == o.o_orderkey)
    per = j.groupBy("n_items").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr("sum(cents) div count(1)").cast("long").alias("mean_cents"),
    )
    w = Window.orderBy("n_items")
    return per.select(
        "n_items", "n_orders", "mean_cents",
        (F.col("mean_cents") - F.lag("mean_cents").over(w))
        .cast("long")
        .alias("marginal_cents"),
    )


_SQL_SIZE_VALUE = """
WITH size AS (
  SELECT l_orderkey, COUNT(*)::BIGINT AS n_items FROM lineitem GROUP BY 1
),
per AS (
  SELECT n_items, COUNT(*)::BIGINT AS n_orders,
         (SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // COUNT(*))::BIGINT
           AS mean_cents
  FROM size JOIN orders ON l_orderkey = o_orderkey
  GROUP BY n_items
)
SELECT n_items, n_orders, mean_cents,
       (mean_cents - LAG(mean_cents) OVER (ORDER BY n_items))::BIGINT
         AS marginal_cents
FROM per
"""

PENDING_QUERIES["orders_size_value_curve"] = orders_size_value_curve
PENDING_ORACLE["orders_size_value_curve"] = _SQL_SIZE_VALUE


# --- Supplier fulfilment speed ranking — PENDING round 7 ------------------------
#
# Vendor scorecard: per supplier, mean ship lag in centi-days (truncating,
# min-volume gate of SPEED_MIN_ITEMS so one lucky item can't top the
# board), ranked WITHIN the supplier's nation by (lag, suppkey) — the
# deterministic dense leaderboard procurement reviews. Scale shape: one
# lineitem⨝orders key join rolled to supplier grain, a broadcast
# supplier→nation enrichment, one nation-partitioned ranking window over
# the DIMENSION-sized supplier table.

SPEED_MIN_ITEMS = 10


def suppliers_speed_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_suppkey",
            F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lag"),
        )
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.expr("sum(lag) * 100 div count(1)").cast("long").alias("lag_cdays"),
        )
        .filter(F.col("n_items") >= SPEED_MIN_ITEMS)
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = s.join(n, s.s_nationkey == n.n_nationkey).select(
        "l_suppkey", F.col("n_name").alias("nation")
    )
    j = per.join(F.broadcast(dim), "l_suppkey")
    wr = Window.partitionBy("nation").orderBy("lag_cdays", "l_suppkey")
    return j.select(
        F.col("l_suppkey").alias("suppkey"),
        "nation", "n_items", "lag_cdays",
        F.row_number().over(wr).cast("long").alias("nation_rank"),
    )


_SQL_SPEED_RANKING = f"""
WITH per AS (
  SELECT l_suppkey, COUNT(*)::BIGINT AS n_items,
         (SUM(datediff('day', o_orderdate, l_shipdate)) * 100
            // COUNT(*))::BIGINT AS lag_cdays
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_suppkey
  HAVING COUNT(*) >= {SPEED_MIN_ITEMS}
)
SELECT p.l_suppkey AS suppkey, n.n_name AS nation, p.n_items, p.lag_cdays,
       ROW_NUMBER() OVER (PARTITION BY n.n_name
                          ORDER BY p.lag_cdays, p.l_suppkey)::BIGINT
         AS nation_rank
FROM per p
JOIN supplier s ON s.s_suppkey = p.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
"""

PENDING_QUERIES["suppliers_speed_ranking"] = suppliers_speed_ranking
PENDING_ORACLE["suppliers_speed_ranking"] = _SQL_SPEED_RANKING


# --- Revenue drawdown — PENDING round 7 -----------------------------------------
#
# The volatility lens on the weekly revenue series: for each week, the
# running peak of weekly revenue and the drawdown from that peak in ppm
# (peak − current)·1e6 div peak — plus, in one deterministic row per week,
# whether it set a new peak. The worst drawdown week is readable off the
# max of the column (left to the consumer — the per-week grain is the
# dashboard row). Scale shape: one bounded weekly aggregate, one ordered
# running-max window over that grid.

def orders_revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("datediff(o_orderdate, DATE '1970-01-01') div 7")
        .cast("long")
        .alias("week"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    weekly = o.groupBy("week").agg(F.sum("cents").cast("long").alias("rev"))
    w = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, 0)
    return weekly.select(
        "week", "rev",
        F.max("rev").over(w).alias("peak"),
    ).select(
        "week", "rev",
        F.col("peak").cast("long").alias("peak_rev"),
        F.expr(
            "CAST((CAST(peak AS DECIMAL(38,0)) - rev) * 1000000"
            " DIV CAST(peak AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("drawdown_ppm"),
        (F.col("rev") == F.col("peak")).alias("is_peak"),
    )


_SQL_REV_DRAWDOWN = """
WITH weekly AS (
  SELECT (datediff('day', DATE '1970-01-01', o_orderdate) // 7)::BIGINT AS week,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS rev
  FROM orders GROUP BY 1
),
p AS (
  SELECT week, rev,
         MAX(rev) OVER (ORDER BY week
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM weekly
)
SELECT week, rev, peak::BIGINT AS peak_rev,
       ((peak::HUGEINT - rev) * 1000000 // peak)::BIGINT AS drawdown_ppm,
       rev = peak AS is_peak
FROM p
"""

PENDING_QUERIES["orders_revenue_drawdown"] = orders_revenue_drawdown
PENDING_ORACLE["orders_revenue_drawdown"] = _SQL_REV_DRAWDOWN


# --- Round-7 registration wave 1 ------------------------------------------
# Flip these pending rows into the driver contract: the r6 green rows freed
# window slots (rotation policy in COVERAGE.md; order in
# queries/__init__._WINDOW_FRONT). The functions above are unchanged — the
# flip only moves the (query, oracle) pair between registries.
_REGISTER_WAVE1 = (
    "basket_part_pairs",
    "basket_association_rules",
    "cohort_monthly_ltv",
    "customer_rfm_segments",
    "linkage_fuzzy_part_names",
    "orders_backlog_timeseries",
)
for _n in _REGISTER_WAVE1:
    QUERIES[_n] = PENDING_QUERIES.pop(_n)
    ORACLE[_n] = PENDING_ORACLE.pop(_n)
del _n


# --- Little's law audit — PENDING round 8+ -------------------------------------
#
# Queueing theory as a data-quality diagnostic: over an interior
# observation window (the middle half of the order timeline, so boundary
# censoring is REAL and the identity is not vacuously exact), compare the
# time-averaged open-order count L against λ·W (arrival rate × mean
# latency of orders placed in the window) — Little's law. The residual
# quantifies edge effects (orders straddling the window) and any
# inconsistency between the placed/shipped extracts; on a healthy
# pipeline it is small but nonzero. All integer micro-units: the backlog
# time-integral is Σ per order of clipped [placed, shipped) overlap with
# the window — one scan over per-order lifetimes + a broadcast bounds
# row, no dense grid needed.


def orders_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = lambda c: F.floor(F.floor(F.unix_timestamp(c)) / 86400).cast("long")  # noqa: E731
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", day("o_orderdate").alias("p")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", day("l_shipdate").alias("sd")
    )
    done = li.groupBy("l_orderkey").agg(F.max("sd").alias("s"))
    lives = o.join(done, o.o_orderkey == done.l_orderkey).select("p", "s")
    bounds = lives.agg(
        F.min("p").alias("lo"), F.max("s").alias("hi")
    ).select(
        (F.col("lo") + F.expr("(hi - lo) div 4")).alias("lo2"),
        (F.col("hi") - F.expr("(hi - lo) div 4")).alias("hi2"),
    )
    j = lives.crossJoin(F.broadcast(bounds))
    overlap = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("s") - 1, F.col("hi2"))
        - F.greatest(F.col("p"), F.col("lo2"))
        + 1,
    )
    in_win = (F.col("p") >= F.col("lo2")) & (F.col("p") <= F.col("hi2"))
    agg = j.agg(
        F.max(F.col("hi2") - F.col("lo2") + 1).cast("long").alias("window_days"),
        F.sum(overlap).cast("long").alias("open_order_days"),
        F.sum(F.when(in_win, 1).otherwise(0)).cast("long").alias("n_placed"),
        F.sum(F.when(in_win, F.col("s") - F.col("p"))).cast("long").alias(
            "latency_days_sum"
        ),
    )
    micro = lambda num, den: F.expr(f"{num} * 1000000 div {den}")  # noqa: E731
    derived = agg.select(
        "window_days",
        "n_placed",
        micro("open_order_days", "window_days").cast("long").alias(
            "avg_open_orders_micro"
        ),
        micro("n_placed", "window_days").cast("long").alias(
            "arrivals_per_day_micro"
        ),
        micro("latency_days_sum", "n_placed").cast("long").alias(
            "avg_latency_days_micro"
        ),
    )
    return derived.select(
        "*",
        F.expr(
            "arrivals_per_day_micro * avg_latency_days_micro div 1000000"
        ).cast("long").alias("littles_rhs_micro"),
        F.expr(
            "(avg_open_orders_micro - arrivals_per_day_micro *"
            " avg_latency_days_micro div 1000000) * 1000000"
            " div greatest(CAST(1 AS BIGINT), avg_open_orders_micro)"
        ).cast("long").alias("littles_residual_ppm"),
    )


_SQL_LITTLES = """
WITH o AS (
  SELECT o_orderkey, CAST(FLOOR(FLOOR(epoch(o_orderdate)) / 86400) AS BIGINT) AS p
  FROM orders
),
done AS (
  SELECT l_orderkey,
         MAX(CAST(FLOOR(FLOOR(epoch(l_shipdate)) / 86400) AS BIGINT)) AS s
  FROM lineitem GROUP BY l_orderkey
),
lives AS (SELECT o.p, d.s FROM o JOIN done d ON d.l_orderkey = o.o_orderkey),
bounds AS (
  SELECT MIN(p) + (MAX(s) - MIN(p)) // 4 AS lo2,
         MAX(s) - (MAX(s) - MIN(p)) // 4 AS hi2
  FROM lives
),
agg AS (
  SELECT MAX(hi2 - lo2 + 1)::BIGINT AS window_days,
         SUM(GREATEST(0, LEAST(s - 1, hi2) - GREATEST(p, lo2) + 1))::BIGINT
           AS open_order_days,
         SUM(CASE WHEN p >= lo2 AND p <= hi2 THEN 1 ELSE 0 END)::BIGINT AS n_placed,
         SUM(CASE WHEN p >= lo2 AND p <= hi2 THEN s - p END)::BIGINT
           AS latency_days_sum
  FROM lives CROSS JOIN bounds
),
derived AS (
  SELECT window_days, n_placed,
         (open_order_days * 1000000 // window_days)::BIGINT AS avg_open_orders_micro,
         (n_placed * 1000000 // window_days)::BIGINT AS arrivals_per_day_micro,
         (latency_days_sum * 1000000 // n_placed)::BIGINT AS avg_latency_days_micro
  FROM agg
)
SELECT *,
       (arrivals_per_day_micro * avg_latency_days_micro // 1000000)::BIGINT
         AS littles_rhs_micro,
       ((avg_open_orders_micro
         - arrivals_per_day_micro * avg_latency_days_micro // 1000000) * 1000000
        // GREATEST(CAST(1 AS BIGINT), avg_open_orders_micro))::BIGINT
         AS littles_residual_ppm
FROM derived
"""

PENDING_QUERIES["orders_littles_law_audit"] = orders_littles_law_audit
PENDING_ORACLE["orders_littles_law_audit"] = _SQL_LITTLES


# --- price-volume-mix revenue decomposition — PENDING round 8+ -----------------
#
# The FP&A bridge every revenue review runs: ΔRevenue between the first
# and second half of the order timeline, per part type, split EXACTLY
# into price effect (Δp̄·q₀), volume effect (p̄₀·Δq), and the cross term
# (Δp̄·Δq) — with the truncation residual carried explicitly so
# price + volume + cross + residual = Δrev·1e6 is an IDENTITY, not an
# approximation (avg unit prices are truncated micro-cents). The period
# split is the integer midpoint day of the observed range (in-plan, no
# driver scalar); one join + one (type, half) agg; |types|-bounded
# output. Int64 audit at sf0.1: Δrev·1e6 ≈ 1.5e16, p̄·Δq ≈ 1.3e16 — an
# order of magnitude of headroom, documented like the variance rows.


def orders_revenue_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("rev_c"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.floor(F.unix_timestamp("o_orderdate")) / 86400).cast("long").alias("d"),
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(o, li.l_orderkey == o.o_orderkey).join(
        pt, li.l_partkey == pt.p_partkey
    )
    mid = o.agg(
        F.expr("(min(d) + max(d)) div 2").cast("long").alias("mid")
    )
    halves = j.crossJoin(F.broadcast(mid)).select(
        "p_type", "rev_c", "q", (F.col("d") > F.col("mid")).alias("h1")
    )
    cells = halves.groupBy("p_type").agg(
        F.sum(F.when(~F.col("h1"), F.col("rev_c")).otherwise(0)).cast("long").alias("rev0"),
        F.sum(F.when(F.col("h1"), F.col("rev_c")).otherwise(0)).cast("long").alias("rev1"),
        F.sum(F.when(~F.col("h1"), F.col("q")).otherwise(0)).cast("long").alias("q0"),
        F.sum(F.when(F.col("h1"), F.col("q")).otherwise(0)).cast("long").alias("q1"),
    )
    withp = cells.select(
        "*",
        F.expr("rev0 * 1000000 div q0").cast("long").alias("p0m"),
        F.expr("rev1 * 1000000 div q1").cast("long").alias("p1m"),
    )
    return withp.select(
        "p_type", "rev0", "rev1", "q0", "q1",
        F.expr("(p1m - p0m) * q0").cast("long").alias("price_effect_microcents"),
        F.expr("p0m * (q1 - q0)").cast("long").alias("volume_effect_microcents"),
        F.expr("(p1m - p0m) * (q1 - q0)").cast("long").alias("cross_effect_microcents"),
        F.expr(
            "(rev1 - rev0) * 1000000 - ((p1m - p0m) * q0 + p0m * (q1 - q0)"
            " + (p1m - p0m) * (q1 - q0))"
        ).cast("long").alias("truncation_residual_microcents"),
    )


_SQL_PVM = """
WITH li AS (
  SELECT l_orderkey, l_partkey,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS rev_c,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem
),
o AS (
  SELECT o_orderkey,
         CAST(FLOOR(FLOOR(epoch(o_orderdate)) / 86400) AS BIGINT) AS d
  FROM orders
),
mid AS (SELECT (MIN(d) + MAX(d)) // 2 AS mid FROM o),
halves AS (
  SELECT p.p_type, li.rev_c, li.q, o.d > mid.mid AS h1
  FROM li JOIN o ON o.o_orderkey = li.l_orderkey
  JOIN part p ON p.p_partkey = li.l_partkey
  CROSS JOIN mid
),
cells AS (
  SELECT p_type,
         SUM(CASE WHEN NOT h1 THEN rev_c ELSE 0 END)::BIGINT AS rev0,
         SUM(CASE WHEN h1 THEN rev_c ELSE 0 END)::BIGINT AS rev1,
         SUM(CASE WHEN NOT h1 THEN q ELSE 0 END)::BIGINT AS q0,
         SUM(CASE WHEN h1 THEN q ELSE 0 END)::BIGINT AS q1
  FROM halves GROUP BY p_type
),
withp AS (
  SELECT *, (rev0 * 1000000 // q0)::BIGINT AS p0m,
         (rev1 * 1000000 // q1)::BIGINT AS p1m
  FROM cells
)
SELECT p_type, rev0, rev1, q0, q1,
       ((p1m - p0m) * q0)::BIGINT AS price_effect_microcents,
       (p0m * (q1 - q0))::BIGINT AS volume_effect_microcents,
       ((p1m - p0m) * (q1 - q0))::BIGINT AS cross_effect_microcents,
       ((rev1 - rev0) * 1000000 - ((p1m - p0m) * q0 + p0m * (q1 - q0)
         + (p1m - p0m) * (q1 - q0)))::BIGINT AS truncation_residual_microcents
FROM withp
"""

PENDING_QUERIES["orders_revenue_pvm_bridge"] = orders_revenue_pvm_bridge
PENDING_ORACLE["orders_revenue_pvm_bridge"] = _SQL_PVM


# --- Round-8 registration: the whole pending layer flips in ----------------
# VERDICT r7 #1: the driver's 50-row window gates which rows get CHECKED per
# round, not how many may be REGISTERED — holding locally hash-verified
# operators out of the contract understates coverage and risks rows never
# receiving a driver row. Window order lives in queries/__init__.
flip_pending(PENDING_QUERIES, PENDING_ORACLE, QUERIES, ORACLE)


# --- item-based collaborative filtering (brand recommendations) -------------
#
# The recommendation primitive a purchase log feeds (item-based CF,
# Sarwar et al. 2001 / the Amazon item-to-item scheme): score each
# NOT-yet-bought brand for a customer as the sum of its co-occurrence
# counts with the brands the customer already buys, report top-3 per
# customer for the 1%-slice. Scale shape: the item-item co-occurrence
# matrix is catalog-bounded (|brands|^2 = 625 rows here — the whole point
# of item-based over user-based CF at scale) and broadcast; candidate
# scoring is one keyed join from the slice's ownership edges plus an anti
# join to drop owned brands; the only window is per-customer top-3.


def reco_brand_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    from pyspark import StorageLevel

    # persisted: THREE consumers (both cooc self-join sides and the
    # recommendation slice) otherwise re-run the lineitem x orders join —
    # the slice's pushed c % 100 filter changes the subtree, so exchange
    # reuse cannot cover it (guide §1.2: compute the base once)
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("o_custkey").alias("c"), F.col("p_brand").alias("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e2 = edges.select(F.col("c").alias("c2"), F.col("b").alias("b2"))
    cooc = (
        edges.join(e2, (F.col("c") == F.col("c2")) & (F.col("b") != F.col("b2")))
        .groupBy(F.col("b").alias("b_owned"), F.col("b2").alias("b_cand"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    slice_edges = edges.filter(F.col("c") % 100 == 0)
    scored = (
        slice_edges.join(
            F.broadcast(cooc), slice_edges.b == cooc.b_owned
        )
        .groupBy("c", "b_cand")
        .agg(F.sum("w").cast("long").alias("score"))
    )
    owned = slice_edges.select("c", F.col("b").alias("b_cand"))
    unowned = scored.join(owned, ["c", "b_cand"], "left_anti")
    w = Window.partitionBy("c").orderBy(F.desc("score"), F.col("b_cand"))
    return (
        unowned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("c").alias("c_custkey"),
            F.col("b_cand").alias("rec_brand"),
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


QUERIES["reco_brand_cooccurrence_topk"] = reco_brand_cooccurrence_topk

ORACLE["reco_brand_cooccurrence_topk"] = """
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, p.p_brand AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
),
cooc AS (
  SELECT e1.b AS b_owned, e2.b AS b_cand, COUNT(*)::BIGINT AS w
  FROM edges e1 JOIN edges e2 ON e1.c = e2.c AND e1.b <> e2.b
  GROUP BY 1, 2
),
slice_edges AS (SELECT c, b FROM edges WHERE c % 100 = 0),
scored AS (
  SELECT s.c, co.b_cand, SUM(co.w)::BIGINT AS score
  FROM slice_edges s JOIN cooc co ON co.b_owned = s.b
  GROUP BY 1, 2
),
unowned AS (
  SELECT sc.c, sc.b_cand, sc.score
  FROM scored sc
  WHERE NOT EXISTS (
    SELECT 1 FROM slice_edges o WHERE o.c = sc.c AND o.b = sc.b_cand
  )
),
ranked AS (
  SELECT c, b_cand, score,
         ROW_NUMBER() OVER (PARTITION BY c ORDER BY score DESC, b_cand) AS rank
  FROM unowned
)
SELECT c AS c_custkey, b_cand AS rec_brand, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
"""


# --- duplicate-invoice detection ----------------------------------------------
#
# The transactional near-dup audit (duplicate-payment detection — the
# record-linkage pattern finance teams run nightly): order pairs from the
# same customer within a price tolerance and a date window. Candidates come
# from a bucketize-then-refine equi-join (the events_error_blast_radius
# device): prices bucket at the tolerance scale, the left side explodes to
# its 3 adjacent buckets so every pair within tolerance shares a join key,
# and the exact predicates refine candidates only — no cartesian, no
# BroadcastNestedLoopJoin, keyed on (custkey, bucket) at any scale.

DUP_INV_PRICE_TOL = 5_000  # whole-currency units
DUP_INV_DAYS = 60
_DUP_INV_BUCKET = 10_000


def orders_duplicate_invoice_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        # FLOOR explicitly: a bare double->bigint cast truncates in Spark
        # but rounds in DuckDB — off-by-one on every .5+ cent price
        F.floor("o_totalprice").cast("bigint").alias("price_i"),
        F.to_date("o_orderdate").alias("d"),
    )
    bk = (F.col("price_i") / _DUP_INV_BUCKET).cast("bigint")
    left = o.select(
        F.col("o_orderkey").alias("k_a"),
        "o_custkey",
        F.col("price_i").alias("p_a"),
        F.col("d").alias("d_a"),
        F.explode(F.array(bk - 1, bk, bk + 1)).alias("bk"),
    )
    right = o.select(
        F.col("o_orderkey").alias("k_b"),
        "o_custkey",
        F.col("price_i").alias("p_b"),
        F.col("d").alias("d_b"),
        bk.alias("bk"),
    )
    cand = left.join(right, ["o_custkey", "bk"]).filter(F.col("k_a") < F.col("k_b"))
    return cand.filter(
        (F.abs(F.col("p_a") - F.col("p_b")) <= DUP_INV_PRICE_TOL)
        & (F.abs(F.datediff("d_a", "d_b")) <= DUP_INV_DAYS)
    ).select(
        "o_custkey",
        F.col("k_a").alias("order_a"),
        F.col("k_b").alias("order_b"),
        F.abs(F.col("p_a") - F.col("p_b")).cast("long").alias("price_diff"),
        F.abs(F.datediff("d_a", "d_b")).cast("long").alias("day_diff"),
    )


QUERIES["orders_duplicate_invoice_detection"] = orders_duplicate_invoice_detection

ORACLE["orders_duplicate_invoice_detection"] = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, CAST(FLOOR(o_totalprice) AS BIGINT) AS price_i,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
),
lft AS (
  SELECT o_orderkey AS k_a, o_custkey, price_i AS p_a, d AS d_a,
         (price_i // {_DUP_INV_BUCKET}) + x.off AS bk
  FROM o CROSS JOIN (VALUES (-1), (0), (1)) AS x(off)
),
rgt AS (
  SELECT o_orderkey AS k_b, o_custkey, price_i AS p_b, d AS d_b,
         price_i // {_DUP_INV_BUCKET} AS bk
  FROM o
)
SELECT l.o_custkey,
       l.k_a AS order_a, r.k_b AS order_b,
       abs(l.p_a - r.p_b)::BIGINT AS price_diff,
       abs(datediff('day', l.d_a, r.d_b))::BIGINT AS day_diff
FROM lft l JOIN rgt r ON l.o_custkey = r.o_custkey AND l.bk = r.bk
WHERE l.k_a < r.k_b
  AND abs(l.p_a - r.p_b) <= {DUP_INV_PRICE_TOL}
  AND abs(datediff('day', l.d_a, r.d_b)) <= {DUP_INV_DAYS}
"""


# --- Quarterly LTV cohort matrix — round 10 ------------------------------------
#
# Customer lifetime value by acquisition cohort: customers grouped by
# their FIRST order's calendar quarter, each cohort's order revenue
# tracked across quarter offsets, with the running cumulative LTV per
# still-reachable cohort cell — the finance twin of the events-side
# weekly retention matrix (that one counts RETURNING users; this one sums
# what they SPEND). Exact integer cents throughout (the _cents device);
# the cumulative runs over the calendar-bounded (cohort x offset) grid
# only, never the orders table.
#
# Scale shape: one per-customer MIN for the cohort stamp (map-side
# partials), one customer-keyed join back, one rollup onto the bounded
# grid, one window over that grid. Quarter index = year*4 + quarter - 1,
# identical integer arithmetic in both engines (no date truncation
# semantics involved).

def orders_ltv_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1)
        .cast("long").alias("q"),
        _cents(F.col("o_totalprice")).alias("cents"),
    )
    cohort = o.groupBy("o_custkey").agg(F.min("q").alias("cohort_q"))
    sizes = cohort.groupBy("cohort_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    cells = (
        o.join(cohort, "o_custkey")
        .groupBy("cohort_q", (F.col("q") - F.col("cohort_q")).alias("offset_q"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    wcum = (
        Window.partitionBy("cohort_q")
        .orderBy("offset_q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cells.join(F.broadcast(sizes), "cohort_q").select(
        "cohort_q",
        F.col("offset_q").cast("long").alias("offset_q"),
        "n_customers",
        "n_orders",
        "revenue_cents",
        F.sum("revenue_cents").over(wcum).cast("long").alias("cum_revenue_cents"),
        F.expr("revenue_cents div n_customers").cast("long")
        .alias("rev_per_customer_cents"),
    )


_SQL_LTV_COHORT = """
WITH o AS (
  SELECT o_custkey,
         (year(o_orderdate) * 4 + quarter(o_orderdate) - 1)::BIGINT AS q,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
cohort AS (SELECT o_custkey, MIN(q) AS cohort_q FROM o GROUP BY o_custkey),
sizes AS (SELECT cohort_q, COUNT(*)::BIGINT AS n_customers FROM cohort GROUP BY 1),
cells AS (
  SELECT c.cohort_q, o.q - c.cohort_q AS offset_q,
         COUNT(*)::BIGINT AS n_orders,
         SUM(o.cents)::BIGINT AS revenue_cents
  FROM o JOIN cohort c USING (o_custkey)
  GROUP BY 1, 2
)
SELECT cells.cohort_q,
       CAST(offset_q AS BIGINT) AS offset_q,
       n_customers,
       n_orders,
       revenue_cents,
       CAST(SUM(revenue_cents) OVER (PARTITION BY cells.cohort_q ORDER BY offset_q
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_revenue_cents,
       (revenue_cents // n_customers)::BIGINT AS rev_per_customer_cents
FROM cells JOIN sizes USING (cohort_q)
"""

QUERIES["orders_ltv_cohort_matrix"] = orders_ltv_cohort_matrix
ORACLE["orders_ltv_cohort_matrix"] = _SQL_LTV_COHORT


# --- Fulfillment-lag percentiles — round 10 ------------------------------------
#
# Ship-lag SLA distribution: per order priority, exact nearest-rank
# p50/p90/p99 of (first line-item ship date - order date) in days — the
# tail-latency read an ops team actually pages on (the mean hides the p99;
# orders_sla_attainment reports a threshold rate, this reports the
# distribution's shape). Exact percentiles, not a sketch: ranks come from
# a window over the VALUE-GROUPED (priority, lag_days) table (the
# corpus_length_pareto / pareto-ABC device — equal lags are
# interchangeable, so ranking the bounded distinct-value domain is exact
# and never sorts the fact table), and nearest-rank picks the group whose
# cumulative count first reaches ceil(p*n).
#
# Scale shape: one lineitem scan -> per-order MIN ship date (map-side),
# one order-keyed join, one (priority, lag) rollup, windows over the
# bounded value domain only.

LAG_PCTS = (50, 90, 99)


def orders_fulfillment_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship0"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    lags = o.join(
        first_ship, o.o_orderkey == first_ship.l_orderkey
    ).select(
        "o_orderpriority",
        F.datediff("ship0", "o_orderdate").cast("long").alias("lag_days"),
    )
    by_val = lags.groupBy("o_orderpriority", "lag_days").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wp = Window.partitionBy("o_orderpriority").orderBy("lag_days")
    cum = by_val.select(
        "o_orderpriority", "lag_days",
        F.sum("cnt").over(wp.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy("o_orderpriority").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    # nearest-rank: the smallest lag whose cumulative count reaches p% of n
    out = cum.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"),
        *[
            F.min(
                F.when(F.col("cum") * 100 >= F.col("n") * p, F.col("lag_days"))
            ).alias(f"p{p}_days")
            for p in LAG_PCTS
        ],
    )
    return out.select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        *[F.col(f"p{p}_days").cast("long").alias(f"p{p}_days") for p in LAG_PCTS],
    )


_SQL_LAG_PCT = f"""
WITH first_ship AS (
  SELECT l_orderkey, MIN(l_shipdate) AS ship0 FROM lineitem GROUP BY l_orderkey
),
lags AS (
  SELECT o.o_orderpriority,
         datediff('day', o.o_orderdate, f.ship0)::BIGINT AS lag_days
  FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey
),
by_val AS (
  SELECT o_orderpriority, lag_days, COUNT(*)::BIGINT AS cnt
  FROM lags GROUP BY 1, 2
),
cum AS (
  SELECT o_orderpriority, lag_days,
         SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY lag_days
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n
  FROM by_val
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       {", ".join(f"CAST(MIN(CASE WHEN cum * 100 >= n * {p} THEN lag_days END) AS BIGINT) AS p{p}_days" for p in LAG_PCTS)}
FROM cum GROUP BY o_orderpriority
"""

QUERIES["orders_fulfillment_lag_percentiles"] = orders_fulfillment_lag_percentiles
ORACLE["orders_fulfillment_lag_percentiles"] = _SQL_LAG_PCT


# --- Supplier revenue concentration (HHI) — round 10 ----------------------------
#
# Herfindahl-Hirschman index of lineitem revenue across suppliers, per
# supplier nation: the concentration read procurement risk reviews use
# next to parts_single_source_risk (that one flags single-sourced PARTS;
# this one scores whole-market concentration — HHI > 0.25 is the
# antitrust "highly concentrated" line). HHI = sum of squared revenue
# shares; computed EXACTLY as sum(rev_i^2) * 1e6 div tot^2 through
# DECIMAL(38)/HUGEINT (rev^2 overflows int64 at sf >= 0.1 — the
# established parts_type_class_revenue device), so no share is ever a
# float. One lineitem scan, supplier-keyed partials, |nations|-bounded
# output with a broadcast supplier->nation dim.

def orders_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(_rev_micros()).cast("long").alias("rev")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        F.col("s_suppkey").alias("l_suppkey"), "n_name"
    )
    per = per_supp.join(F.broadcast(dim), "l_suppkey").groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("rev").cast("long").alias("rev_micros"),
        F.sum(
            F.col("rev").cast("decimal(19,0)") * F.col("rev").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("ssq"),
    )
    return per.select(
        F.col("n_name").alias("nation"),
        "n_suppliers",
        "rev_micros",
        F.expr(
            "CAST((ssq * 1000000) DIV (CAST(rev_micros AS DECIMAL(38,0))"
            " * CAST(rev_micros AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("hhi_ppm"),
    )


_SQL_SUPPLIER_HHI = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))::BIGINT AS rev
  FROM lineitem GROUP BY l_suppkey
),
per AS (
  SELECT n.n_name AS nation,
         COUNT(*)::BIGINT AS n_suppliers,
         SUM(p.rev)::BIGINT AS rev_micros,
         SUM(CAST(p.rev AS HUGEINT) * p.rev) AS ssq
  FROM per_supp p
  JOIN supplier s ON s.s_suppkey = p.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY 1
)
SELECT nation, n_suppliers, rev_micros,
       CAST((ssq * 1000000) // (CAST(rev_micros AS HUGEINT) * rev_micros) AS BIGINT)
         AS hhi_ppm
FROM per
"""

QUERIES["orders_supplier_hhi"] = orders_supplier_hhi
ORACLE["orders_supplier_hhi"] = _SQL_SUPPLIER_HHI


# --- Skyline (Pareto-dominance front) — round 10 (session 2) -------------------
#
# The skyline operator (Börzsönyi et al., ICDE 2001): per order priority,
# the orders NOT dominated on (maximize o_totalprice, maximize
# o_orderdate) — dominance = better-or-equal in both dims, strictly
# better in at least one; identical points do not dominate each other, so
# all orders at a surviving (day, cents) point are counted. Spark has no
# skyline operator; the 2-D case reduces EXACTLY to windows over the
# value-grouped domain: group to (priority, day) keeping the per-day max
# cents and the count of orders AT that max, then a point survives iff
# its cents strictly exceed the running max over all LATER days (a
# later-or-equal day with >= cents dominates everything below it). The
# ORACLE is deliberately the naive quadratic NOT-EXISTS definition —
# semantically independent of the window device, so parity proves the
# reduction, not just the implementation twice.
#
# Scale shape: one orders scan -> (priority, day) rollup (bounded: |dates|
# x |priorities|); the ordered window runs over that bounded domain only.
# At 100 TB the grouped domain is still ~2.5k days x 5 priorities.

def orders_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(FLOOR(unix_timestamp(o_orderdate)) AS BIGINT) div 86400")
        .alias("day"),
        _cents(F.col("o_totalprice")).alias("cents"),
    )
    # per (priority, day): the frontier candidate is the max cents; orders
    # strictly below it are dominated at the same day already
    by_day = o.groupBy("o_orderpriority", "day", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("n_at_point")
    )
    wd = Window.partitionBy("o_orderpriority", "day")
    day_max = by_day.select(
        "o_orderpriority", "day", "cents", "n_at_point",
        F.max("cents").over(wd).alias("day_mc"),
    ).filter(F.col("cents") == F.col("day_mc"))
    # strict running max of later days' frontier: survivors strictly exceed it
    wlater = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("day").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        day_max.select(
            "o_orderpriority", "day", "cents", "n_at_point",
            F.max("cents").over(wlater).alias("later_mc"),
        )
        .filter(F.col("later_mc").isNull() | (F.col("cents") > F.col("later_mc")))
        .select(
            "o_orderpriority",
            F.col("day").cast("long").alias("day"),
            F.col("cents").cast("long").alias("cents"),
            "n_at_point",
        )
    )


_SQL_SKYLINE = """
WITH o AS (
  SELECT o_orderpriority AS p,
         CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
sky AS (
  SELECT p, d, c FROM o o1
  WHERE NOT EXISTS (
    SELECT 1 FROM o o2
    WHERE o2.p = o1.p AND o2.c >= o1.c AND o2.d >= o1.d
      AND (o2.c > o1.c OR o2.d > o1.d)
  )
)
SELECT p AS o_orderpriority,
       d::BIGINT AS day,
       c::BIGINT AS cents,
       COUNT(*)::BIGINT AS n_at_point
FROM sky GROUP BY 1, 2, 3
"""

QUERIES["orders_skyline_pareto"] = orders_skyline_pareto
ORACLE["orders_skyline_pareto"] = _SQL_SKYLINE


# --- Tolerance-bounded as-of join — round 10 (session 2) -----------------------
#
# The missing variant of the as-of surface (asof_latest_order matches
# unboundedly backward; pandas merge_asof calls this `tolerance`): each
# event matches the latest order of the same customer at or before the
# event, but only within ASOF_TOL_DAYS — matches staler than the
# tolerance are reported as misses (NULL key, NULL lag), because a
# 2-year-old order "explaining" today's event is attribution noise. The
# LEFT join keeps every event, so the output is an exact per-event
# attribution table with its miss-rate readable by aggregation.
#
# Scale shape: broadcast the bounded dimension (orders per key x tolerance
# window); per-event arg-max via one keyed window. At 100 TB the same
# semantics come from bucketing both sides by key and a within-bucket
# merge — the tolerance bound is what makes the state finite there (only
# TOL days of the order stream need to be co-resident).

ASOF_TOL_DAYS = 90


def asof_tolerance_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 86400").alias("ed"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.expr("CAST(FLOOR(unix_timestamp(o_orderdate)) AS BIGINT) div 86400")
        .alias("od"),
    )
    j = ev.join(
        F.broadcast(o),
        (F.col("user_id") == F.col("o_custkey"))
        & (F.col("od") <= F.col("ed"))
        & (F.col("od") >= F.col("ed") - ASOF_TOL_DAYS),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc_nulls_last("od"), F.desc_nulls_last("o_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id", "user_id",
            F.col("o_orderkey").cast("long").alias("asof_orderkey"),
            (F.col("ed") - F.col("od")).cast("long").alias("lag_days"),
        )
    )


_SQL_ASOF_TOL = f"""
WITH ev AS (
  SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS ed
  FROM events
),
o AS (
  SELECT o_custkey, o_orderkey,
         CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS od
  FROM orders
)
SELECT event_id, user_id,
       CAST(o_orderkey AS BIGINT) AS asof_orderkey,
       CAST(ed - od AS BIGINT) AS lag_days
FROM (
  SELECT e.event_id, e.user_id, e.ed, o.o_orderkey, o.od,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.od DESC NULLS LAST,
                                     o.o_orderkey DESC NULLS LAST) AS rn
  FROM ev e
  LEFT JOIN o ON e.user_id = o.o_custkey
             AND o.od <= e.ed AND o.od >= e.ed - {ASOF_TOL_DAYS}
) WHERE rn = 1
"""

QUERIES["asof_tolerance_latest_order"] = asof_tolerance_latest_order
ORACLE["asof_tolerance_latest_order"] = _SQL_ASOF_TOL


# --- Nearest-direction as-of join — round 10 (session 2) -----------------------
#
# Completes the as-of direction family (backward: asof_latest_order /
# asof_tolerance_latest_order; this is pandas merge_asof
# direction='nearest'): each event matches the order of its customer
# with the SMALLEST absolute day distance within +/- ASOF_TOL_DAYS —
# future orders are eligible too (the attribution question "which order
# is this event ABOUT" rather than "which order preceded it").
# Deterministic tie-break: equal distance prefers the past order
# (signed lag >= 0 first), then the higher order key — both spelled
# identically in the two engines.

def asof_nearest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 86400").alias("ed"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.expr("CAST(FLOOR(unix_timestamp(o_orderdate)) AS BIGINT) div 86400")
        .alias("od"),
    )
    j = ev.join(
        F.broadcast(o),
        (F.col("user_id") == F.col("o_custkey"))
        & (F.abs(F.col("ed") - F.col("od")) <= ASOF_TOL_DAYS),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.abs(F.col("ed") - F.col("od")).asc_nulls_last(),
        (F.col("ed") - F.col("od") >= 0).desc_nulls_last(),
        F.desc_nulls_last("o_orderkey"),
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id", "user_id",
            F.col("o_orderkey").cast("long").alias("nearest_orderkey"),
            (F.col("ed") - F.col("od")).cast("long").alias("signed_lag_days"),
        )
    )


_SQL_ASOF_NEAREST = f"""
WITH ev AS (
  SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS ed
  FROM events
),
o AS (
  SELECT o_custkey, o_orderkey,
         CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS od
  FROM orders
)
SELECT event_id, user_id,
       CAST(o_orderkey AS BIGINT) AS nearest_orderkey,
       CAST(ed - od AS BIGINT) AS signed_lag_days
FROM (
  SELECT e.event_id, e.user_id, e.ed, o.o_orderkey, o.od,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY ABS(e.ed - o.od) ASC NULLS LAST,
                                     (e.ed - o.od >= 0) DESC NULLS LAST,
                                     o.o_orderkey DESC NULLS LAST) AS rn
  FROM ev e
  LEFT JOIN o ON e.user_id = o.o_custkey
             AND ABS(e.ed - o.od) <= {ASOF_TOL_DAYS}
) WHERE rn = 1
"""

QUERIES["asof_nearest_order"] = asof_nearest_order
ORACLE["asof_nearest_order"] = _SQL_ASOF_NEAREST
