"""Extended analytical operator coverage with DuckDB oracles: the remaining
TPC-H query *shapes* (semi/anti joins, correlated aggregates, HAVING,
disjunctive multi-table predicates, conditional aggregation, argmax-over-agg,
distribution-of-counts) plus operator families the base set doesn't touch
(CUBE, PIVOT, exact interpolated percentiles, calendar rollup, FULL OUTER).

Fixture schemas are reduced TPC-H (no partsupp/commitdate/shipmode/phone), so
each query keeps the canonical plan shape with predicates adapted to the
columns that exist; docstrings name the TPC-H number they mirror.

Cross-engine determinism follows queries/tpch.py: money and quantities as
exact integer cents (``round(x*100)::bigint``), correlated comparisons as
pure integer inequalities, averages/ratios floor-truncated at 6 decimals,
percentiles computed over integer cents so the (n-1)*p linear interpolation
(quarter fractions of int64) is exact in both engines.

Scale posture: dimension sides broadcast explicitly where genuinely small
(part/supplier/customer filters), fact-fact joins shuffle on their keys with
AQE skew handling, every aggregation is partial map-side, and no query
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.tpch import _cents, _dsum, _rev_micros, _trunc6
from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.queries._pending import flip_pending


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate, zero joins — the predicate
    pushdown benchmark. Discount compared in integer percent so the double
    boundary (0.05/0.07) can't flip across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & disc_pct.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(_cents(F.col("l_extendedprice")) * disc_pct).cast("double") / F.lit(10000.0)).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join. The orders date filter prunes
    the probe side before the shuffle; returned-flag stands in for the
    missing commitdate predicate."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returns.
    customer/nation broadcast; the lineitem-orders join shuffles on orderkey;
    exact-integer revenue ranks deterministically with a custkey tie-break."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_micros()).alias("__rev"))
    )
    return (
        agg.orderBy(F.desc("__rev"), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.col("__rev").cast("double") / F.lit(10000.0)).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer including zero — the
    LEFT OUTER + double-aggregation shape. First groupBy is on the join key
    (no extra shuffle after the join), second input is one row per customer."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation over a broadcast join — promo share
    of one month's revenue. Integer-unit numerator/denominator; the final
    ratio is the only float op, floor-truncated."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = _rev_micros()
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        _trunc6(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.sum(rev).cast("double")
        ).alias("promo_share_pct")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: argmax over an aggregate — supplier(s) with max quarterly
    revenue. The revenue aggregate is computed once and self-compared against
    its broadcast global max (exact integers, so 'equals max' is exact)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_micros()).alias("__rev"))
    top = rev.join(F.broadcast(rev.agg(F.max("__rev").alias("__max"))), F.col("__rev") == F.col("__max"))
    return top.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_suppkey",
        "s_name",
        (F.col("__rev").cast("double") / F.lit(10000.0)).alias("total_revenue"),
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average — lineitems below 20% of
    their part's mean quantity. The correlated subquery becomes one grouped
    aggregate joined back on the key; the 0.2×avg comparison is the integer
    inequality 5·qty·n < Σqty (no float division anywhere)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        _cents(F.col("l_quantity")).alias("qc"),
        _cents(F.col("l_extendedprice")).alias("pc"),
    )
    stats = li.groupBy("l_partkey").agg(
        F.sum("qc").alias("sum_qc"), F.count(F.lit(1)).alias("n_li")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    small = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(stats, "l_partkey")
        .filter(F.col("qc") * 5 * F.col("n_li") < F.col("sum_qc"))
    )
    return small.agg(
        _trunc6(F.sum("pc").cast("double") / F.lit(700.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING over a fact aggregate, then joins back to
    orders/customer. The heavy groupBy runs FIRST so only qualifying
    orderkeys (few) reach the joins — the aggregate-then-join ordering that
    matters at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("sum_qc"))
        .filter(F.col("sum_qc") > 200 * 100)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = big.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        j.orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            (F.col("sum_qc").cast("double") / F.lit(100.0)).alias("total_qty"),
        )
    )


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three OR'd brand/size/quantity bands over the part join —
    the disjunctive-predicate shape Catalyst must keep join-pushable (the
    shared ``l_partkey = p_partkey`` stays an equi-join; the OR residual is a
    post-join filter)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            (F.sum(_rev_micros()).cast("double") / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (none since 2000-01-01), summarized per nation. Global threshold
    via an exact integer cross-check (bal·n > Σbal over positive balances),
    lapsed-customer detection via left-anti against the date-pruned orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    bal_c = _cents(F.col("c_acctbal"))
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.sum(bal_c).alias("sum_c"), F.count(F.lit(1)).alias("n_pos"))
    )
    rich = cust.join(F.broadcast(thresh), bal_c * F.col("n_pos") > F.col("sum_c"))
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        _dsum(F.col("c_acctbal")).alias("totacctbal"),
    )


def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: all 4 grouping combinations of (returnflag,
    linestatus) in one pass — partial aggregation handles the fan-out
    map-side, one shuffle total."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"), _dsum(F.col("l_quantity")).alias("sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


def grouping_sets_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the generalized grouping form that CUBE and ROLLUP
    specialize (§2.4): exactly the three levels a status report needs —
    (status, priority), (status), grand total — computed in ONE pass (an
    Expand node + a single shuffle) instead of three scans unioned. Distinct
    from `rollup_status_priority` in that the set list is arbitrary, not a
    prefix chain."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "revenue",
        )
    )


def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority, one column per order status. The
    value list is explicit ('O','F','P') so the plan is a single groupBy —
    no distinct-scan to discover pivot values (which would be a second pass
    at 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    pv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


def percentile_prices_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p25/p50/p75) of order value per
    status. Computed over integer CENTS so the (n-1)·p quarter-fraction
    interpolation is exact int64 arithmetic in both engines — bit-identical
    without truncation."""
    orders = load_table(spark, sf_dir, "orders")
    pc = _cents(F.col("o_totalprice"))
    g = orders.select("o_orderstatus", pc.alias("pc")).groupBy("o_orderstatus")
    agg = g.agg(F.expr("percentile(pc, array(0.25D, 0.5D, 0.75D))").alias("ps"))
    return agg.select(
        "o_orderstatus",
        (F.element_at("ps", 1) / F.lit(100.0)).alias("p25"),
        (F.element_at("ps", 2) / F.lit(100.0)).alias("p50"),
        (F.element_at("ps", 3) / F.lit(100.0)).alias("p75"),
    )


def monthly_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup: revenue and order count by (year, month) — the
    date-dimension groupBy every warehouse runs; year/month extraction is
    codegen'd scan-side."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


def full_outer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated keyspaces (event users vs ordering
    customers): both sides pre-aggregate to one row per key before the join,
    so the full-outer shuffle moves counters, not raw rows."""
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    oc = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = ev.join(oc, ev.user_id == oc.o_custkey, "full_outer")
    return j.select(
        F.coalesce(F.col("user_id"), F.col("o_custkey")).alias("key_id"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
    )


def rolling_30day_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-customer spend over the trailing 30 calendar
    days — the frame is value-based (day number), not row-based, so same-day
    orders are peers and the result is order-independent. One shuffle on the
    customer key."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("long").alias("day_num"),
        _cents(F.col("o_totalprice")).alias("pc"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-29, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "day_num",
        (F.sum("pc").over(w).cast("double") / F.lit(100.0)).alias("spend_30d"),
    )


def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile ranking: customers split into 10 spend deciles. Total spend in
    exact cents and a custkey tie-break make the ntile assignment fully
    deterministic in both engines.

    Scale shape (VERDICT r7 fix): a literal ``ntile(10) OVER (ORDER BY …)``
    is a single-partition sort over |customers| — here the tile comes from
    ``operators.ranking.ntile_exact`` (two-phase exact global rank + the
    closed-form tile), identical output with every data-proportional stage
    partitioned."""
    from cdc_postgresql_clickhouse_spark.operators.ranking import ntile_exact

    orders = load_table(spark, sf_dir, "orders")
    totals = orders.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("total_c")
    )
    tiled = ntile_exact(
        totals, 10, [F.col("total_c"), F.col("o_custkey")], out="decile"
    )
    return tiled.select(
        "o_custkey",
        (F.col("total_c").cast("double") / F.lit(100.0)).alias("total_spend"),
        "decile",
    )


def collect_priority_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list surface with deterministic output: the collected array is
    unordered by contract, so it is array_sort-normalized before hashing —
    the pattern for making any collect-based aggregate engine-portable."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.md5(F.array_join(F.array_sort(F.collect_list("o_orderpriority")), ",")).alias(
            "priority_fp"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "rolling_30day_spend": rolling_30day_spend,
    "customer_spend_deciles": customer_spend_deciles,
    "collect_priority_fingerprint": collect_priority_fingerprint,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_revenue": q10_returned_revenue,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q22_idle_customers": q22_idle_customers,
    "cube_returnflag_status": cube_returnflag_status,
    "grouping_sets_order_profile": grouping_sets_order_profile,
    "pivot_priority_by_status": pivot_priority_by_status,
    "percentile_prices_by_status": percentile_prices_by_status,
    "monthly_revenue_rollup": monthly_revenue_rollup,
    "full_outer_activity": full_outer_activity,
}

_REV_U = "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"

ORACLE = {
    "collect_priority_fingerprint": """
SELECT o_custkey,
       md5(array_to_string(list_sort(list(o_orderpriority)), ',')) AS priority_fp,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey
""",
    "rolling_30day_spend": """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS day_num,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc
  FROM orders
)
SELECT o_custkey, o_orderkey, day_num,
       CAST(SUM(pc) OVER (PARTITION BY o_custkey ORDER BY day_num
            RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS spend_30d
FROM o
""",
    "customer_spend_deciles": """
WITH totals AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_c
  FROM orders GROUP BY 1
)
SELECT o_custkey, CAST(total_c AS DOUBLE) / 100.0 AS total_spend,
       CAST(ntile(10) OVER (ORDER BY total_c, o_custkey) AS BIGINT) AS decile
FROM totals
""",
    "q4_order_priority": """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    "q6_forecast_revenue": """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
""",
    "q10_returned_revenue": f"""
WITH agg AS (
  SELECT c_custkey, c_name, c_acctbal, n_name, SUM({_REV_U}) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
SELECT c_custkey, c_name, CAST(rev AS DOUBLE) / 10000.0 AS revenue, c_acctbal, n_name
FROM agg ORDER BY rev DESC, c_custkey LIMIT 20
""",
    "q13_order_count_distribution": """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    "q14_promo_revenue": f"""
SELECT CAST(FLOOR(
  100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_U} ELSE 0 END) AS DOUBLE)
        / CAST(SUM({_REV_U}) AS DOUBLE) * 1000000.0) AS DOUBLE) / 1000000.0 AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
""",
    "q15_top_supplier": f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV_U}) AS rev_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_u AS DOUBLE) / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_u = (SELECT MAX(rev_u) FROM rev)
""",
    "q17_small_quantity_revenue": """
WITH li AS (
  SELECT l_partkey,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc
  FROM lineitem
),
stats AS (SELECT l_partkey AS sp, SUM(qc) AS sum_qc, COUNT(*) AS n_li FROM li GROUP BY 1)
SELECT CAST(FLOOR(CAST(SUM(pc) AS DOUBLE) / 700.0 * 1000000.0) AS DOUBLE) / 1000000.0 AS avg_yearly,
       COUNT(*) AS n_small
FROM li
JOIN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1' AND p_size <= 10) p ON l_partkey = p_partkey
JOIN stats ON l_partkey = sp
WHERE qc * 5 * n_li < sum_qc
""",
    "q18_large_orders": """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sum_qc
  FROM lineitem GROUP BY 1 HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 20000
)
SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, CAST(sum_qc AS DOUBLE) / 100.0 AS total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
    "q19_disjunctive_predicates": f"""
SELECT CAST(SUM({_REV_U}) AS DOUBLE) / 10000.0 AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
""",
    "q22_idle_customers": """
WITH thresh AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_c, COUNT(*) AS n_pos
  FROM customer WHERE c_acctbal > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, thresh
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * n_pos > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
""",
    "cube_returnflag_status": """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
""",
    "grouping_sets_order_profile": """
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
    "pivot_priority_by_status": """
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
FROM orders
GROUP BY o_orderpriority
""",
    "percentile_prices_by_status": """
SELECT o_orderstatus,
       quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.25) / 100.0 AS p25,
       quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.5)  / 100.0 AS p50,
       quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.75) / 100.0 AS p75
FROM orders
GROUP BY o_orderstatus
""",
    "monthly_revenue_rollup": """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS o_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1, 2
""",
    "full_outer_activity": """
WITH ev AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1),
oc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1)
SELECT COALESCE(user_id, o_custkey) AS key_id,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(n_orders, 0) AS n_orders
FROM ev FULL OUTER JOIN oc ON user_id = o_custkey
""",
}


# --- ranked-window profile — PENDING round 7 --------------------------------
#
# The remaining ranking-window surface in one row: ntile, percent_rank,
# and cume_dist over order value within status (ClickHouse exposes the
# same trio). percent_rank = (rank-1)/(n-1) and cume_dist = peers/n are
# single integer-ratio divisions — identical IEEE doubles in both
# engines (no sums, no truncation needed). Deterministic total order via
# (cents, o_orderkey). Aggregated per (status, decile) so the output is
# decile-bounded: min/max percent_rank of each decile pin the tile
# boundaries exactly.


def window_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_orderstatus", "o_orderkey", _cents(F.col("o_totalprice")).alias("pc")
    )
    w = Window.partitionBy("o_orderstatus").orderBy("pc", "o_orderkey")
    r = d.select(
        "o_orderstatus",
        "pc",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return r.groupBy("o_orderstatus", "decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("pc").cast("long").alias("mass_cents"),
        F.min("pr").alias("min_percent_rank"),
        F.max("pr").alias("max_percent_rank"),
        F.max("cd").alias("max_cume_dist"),
    )


_SQL_RANK_PROFILE = """
WITH d AS (
  SELECT o_orderstatus, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc
  FROM orders
),
r AS (
  SELECT o_orderstatus, pc,
         ntile(10) OVER w AS decile,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd
  FROM d
  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY pc, o_orderkey)
)
SELECT o_orderstatus, CAST(decile AS BIGINT) AS decile,
       COUNT(*)::BIGINT AS n_orders,
       SUM(pc)::BIGINT AS mass_cents,
       MIN(pr) AS min_percent_rank,
       MAX(pr) AS max_percent_rank,
       MAX(cd) AS max_cume_dist
FROM r GROUP BY o_orderstatus, decile
"""

# --- one-pass column profiler — PENDING round 7 -----------------------------
#
# The ANALYZE/data-profiling operator every engine ships: per column of
# ``orders`` — row count, null count, exact distinct count, min/max, and
# the deterministic mode (most frequent value, ties to the larger value)
# with its frequency. The scale-relevant design point: N columns profile
# in ONE scan — each row explodes to N (col_name, canonical_repr) pairs
# and every statistic is a keyed agg over that long grain, instead of N
# per-column scans/shuffles. Numeric columns render as zero-padded
# fixed-width strings so string MIN/MAX agrees with numeric order in
# both engines; money goes through exact cents, timestamps through epoch
# seconds.

_PROFILE_PAD = 12


def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def num(c):
        return F.lpad(c.cast("long").cast("string"), _PROFILE_PAD, "0")

    pairs = F.array(
        F.struct(F.lit("o_orderkey").alias("col_name"), num(F.col("o_orderkey")).alias("v")),
        F.struct(F.lit("o_custkey").alias("col_name"), num(F.col("o_custkey")).alias("v")),
        F.struct(F.lit("o_orderstatus").alias("col_name"), F.col("o_orderstatus").alias("v")),
        F.struct(
            F.lit("o_totalprice").alias("col_name"),
            num(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))).alias("v"),
        ),
        F.struct(
            F.lit("o_orderdate").alias("col_name"),
            num(F.floor(F.unix_timestamp("o_orderdate"))).alias("v"),
        ),
        F.struct(F.lit("o_orderpriority").alias("col_name"), F.col("o_orderpriority").alias("v")),
    )
    long = o.select(F.explode(pairs).alias("e")).select("e.*")
    g = long.groupBy("col_name", "v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return g.groupBy("col_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), F.col("cnt")).otherwise(0))
        .cast("long").alias("n_null"),
        F.count(F.when(F.col("v").isNotNull(), 1)).cast("long").alias("n_distinct"),
        F.min("v").alias("min_repr"),
        F.max("v").alias("max_repr"),
        F.max_by("v", F.struct("cnt", "v")).alias("mode_repr"),
        F.max("cnt").cast("long").alias("mode_count"),
    )


_SQL_PROFILE = f"""
WITH long AS (
  SELECT 'o_orderkey' AS col_name, lpad(CAST(o_orderkey AS VARCHAR), {_PROFILE_PAD}, '0') AS v FROM orders
  UNION ALL
  SELECT 'o_custkey', lpad(CAST(o_custkey AS VARCHAR), {_PROFILE_PAD}, '0') FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL
  SELECT 'o_totalprice',
         lpad(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), {_PROFILE_PAD}, '0')
  FROM orders
  UNION ALL
  SELECT 'o_orderdate',
         lpad(CAST(CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS VARCHAR), {_PROFILE_PAD}, '0')
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority FROM orders
),
g AS (SELECT col_name, v, COUNT(*)::BIGINT AS cnt FROM long GROUP BY col_name, v),
ranked AS (
  SELECT col_name, v, cnt,
         row_number() OVER (PARTITION BY col_name ORDER BY cnt DESC, v DESC) AS rn
  FROM g WHERE v IS NOT NULL
)
SELECT g.col_name,
       SUM(g.cnt)::BIGINT AS n_rows,
       SUM(CASE WHEN g.v IS NULL THEN g.cnt ELSE 0 END)::BIGINT AS n_null,
       COUNT(CASE WHEN g.v IS NOT NULL THEN 1 END)::BIGINT AS n_distinct,
       MIN(g.v) AS min_repr,
       MAX(g.v) AS max_repr,
       MAX(CASE WHEN r.rn = 1 THEN r.v END) AS mode_repr,
       MAX(g.cnt)::BIGINT AS mode_count
FROM g LEFT JOIN ranked r ON r.col_name = g.col_name AND r.v = g.v AND r.rn = 1
GROUP BY g.col_name
"""

PENDING_QUERIES = {
    "window_rank_profile": window_rank_profile,
    "profile_orders_columns": profile_orders_columns,
}
PENDING_ORACLE = {
    "window_rank_profile": _SQL_RANK_PROFILE,
    "profile_orders_columns": _SQL_PROFILE,
}


# --- data-validation expectation suite — PENDING round 7 --------------------
#
# The Deequ/Great-Expectations staple a 100 TB ingest pipeline runs before
# promoting a snapshot: a declarative battery of constraints (not-null,
# accepted values, numeric ranges, key uniqueness, referential integrity,
# derived-column consistency) evaluated in bulk, one report row per check
# with the violation count. Scale shape: all row-level checks for a table
# evaluate as conditional aggregates in ONE scan of that table (uniqueness
# rides the same agg as a single COUNT DISTINCT); each FK check is a
# key-projected LEFT join + null count — the probe scan reads exactly one
# parquet column and the dim side is broadcastable when small. Nothing
# collects; the report is check-count-sized. One expectation
# (``orders_orderdate_before_2000``) deliberately fails on this corpus so
# the row proves violation ACCOUNTING, not just all-zeros.

def validation_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    def report(table: str, agg_df: DataFrame, checks: list[str]) -> DataFrame:
        stack = ", ".join(f"'{c}', v_{i}" for i, c in enumerate(checks))
        return agg_df.select(
            F.expr(f"stack({len(checks)}, {stack}) AS (check_id, n_violations)"),
            F.lit(table).alias("table_name"),
            F.col("n").alias("n_rows"),
        )

    def fk(table: str, check: str, fact, f_key: str, dim, d_key: str) -> DataFrame:
        probe = fact.select(f_key).join(
            dim.select(d_key), F.col(f_key) == F.col(d_key), "left"
        )
        return probe.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_if(F.col(d_key).isNull()).cast("long").alias("v_0"),
        ).select(
            F.lit(check).alias("check_id"),
            F.col("v_0").alias("n_violations"),
            F.lit(table).alias("table_name"),
            F.col("n").alias("n_rows"),
        )

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cu = load_table(spark, sf_dir, "customer")
    pa = load_table(spark, sf_dir, "part")
    su = load_table(spark, sf_dir, "supplier")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")

    orders_checks = [
        "orders_status_accepted", "orders_totalprice_positive",
        "orders_orderdate_before_2000", "orders_orderkey_unique",
        "orders_custkey_not_null",
    ]
    o_agg = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")).cast("long").alias("v_0"),
        F.count_if(_cents(F.col("o_totalprice")) <= 0).cast("long").alias("v_1"),
        F.count_if(
            F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
        ).cast("long").alias("v_2"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("long").alias("v_3"),
        F.count_if(F.col("o_custkey").isNull()).cast("long").alias("v_4"),
    )
    li_checks = [
        "lineitem_quantity_range", "lineitem_discount_range",
        "lineitem_tax_range", "lineitem_extendedprice_positive",
    ]
    li_agg = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(
            ~F.round(F.col("l_quantity")).cast("long").between(1, 50)
        ).cast("long").alias("v_0"),
        F.count_if(~_cents(F.col("l_discount")).between(0, 10)).cast("long").alias("v_1"),
        F.count_if(~_cents(F.col("l_tax")).between(0, 8)).cast("long").alias("v_2"),
        F.count_if(_cents(F.col("l_extendedprice")) <= 0).cast("long").alias("v_3"),
    )
    docs_checks = ["documents_nchars_consistent", "documents_lang_nonempty"]
    docs_agg = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(F.col("n_chars") != F.length("text")).cast("long").alias("v_0"),
        F.count_if(
            F.col("lang").isNull() | (F.col("lang") == "")
        ).cast("long").alias("v_1"),
    )
    ev_agg = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(_cents(F.col("value")) <= 0).cast("long").alias("v_0"),
    )
    cu_agg = cu.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).cast("long").alias("v_0"),
    )
    parts = [
        report("orders", o_agg, orders_checks),
        report("lineitem", li_agg, li_checks),
        report("documents", docs_agg, docs_checks),
        report("events", ev_agg, ["events_value_positive"]),
        report("customer", cu_agg, ["customer_custkey_unique"]),
        fk("orders", "orders_custkey_fk", o, "o_custkey", cu, "c_custkey"),
        fk("lineitem", "lineitem_orderkey_fk", li, "l_orderkey", o, "o_orderkey"),
        fk("lineitem", "lineitem_partkey_fk", li, "l_partkey", pa, "p_partkey"),
        fk("lineitem", "lineitem_suppkey_fk", li, "l_suppkey", su, "s_suppkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_id", "table_name", "n_rows", "n_violations",
        F.when(F.col("n_violations") == 0, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("passed"),
    )


_SQL_EXPECTATIONS = """
WITH o AS (
  SELECT COUNT(*)::BIGINT AS n,
         COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))::BIGINT AS v_status,
         COUNT(*) FILTER (WHERE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) <= 0)::BIGINT AS v_price,
         COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '2000-01-01')::BIGINT AS v_date,
         (COUNT(*) - COUNT(DISTINCT o_orderkey))::BIGINT AS v_uniq,
         COUNT(*) FILTER (WHERE o_custkey IS NULL)::BIGINT AS v_null
  FROM orders
),
li AS (
  SELECT COUNT(*)::BIGINT AS n,
         COUNT(*) FILTER (WHERE CAST(FLOOR(l_quantity + 0.5) AS BIGINT) NOT BETWEEN 1 AND 50)::BIGINT AS v_qty,
         COUNT(*) FILTER (WHERE CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) NOT BETWEEN 0 AND 10)::BIGINT AS v_disc,
         COUNT(*) FILTER (WHERE CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT) NOT BETWEEN 0 AND 8)::BIGINT AS v_tax,
         COUNT(*) FILTER (WHERE CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) <= 0)::BIGINT AS v_price
  FROM lineitem
),
d AS (
  SELECT COUNT(*)::BIGINT AS n,
         COUNT(*) FILTER (WHERE n_chars <> length(text))::BIGINT AS v_chars,
         COUNT(*) FILTER (WHERE lang IS NULL OR lang = '')::BIGINT AS v_lang
  FROM documents
),
e AS (
  SELECT COUNT(*)::BIGINT AS n,
         COUNT(*) FILTER (WHERE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) <= 0)::BIGINT AS v_val
  FROM events
),
c AS (
  SELECT COUNT(*)::BIGINT AS n,
         (COUNT(*) - COUNT(DISTINCT c_custkey))::BIGINT AS v_uniq
  FROM customer
),
fk_oc AS (
  SELECT COUNT(*)::BIGINT AS n,
         COUNT(*) FILTER (WHERE c.c_custkey IS NULL)::BIGINT AS v
  FROM orders o2 LEFT JOIN customer c ON o2.o_custkey = c.c_custkey
),
fk_lo AS (
  SELECT COUNT(*)::BIGINT AS n,
         COUNT(*) FILTER (WHERE o2.o_orderkey IS NULL)::BIGINT AS v
  FROM lineitem l2 LEFT JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
),
fk_lp AS (
  SELECT COUNT(*)::BIGINT AS n,
         COUNT(*) FILTER (WHERE p.p_partkey IS NULL)::BIGINT AS v
  FROM lineitem l2 LEFT JOIN part p ON l2.l_partkey = p.p_partkey
),
fk_ls AS (
  SELECT COUNT(*)::BIGINT AS n,
         COUNT(*) FILTER (WHERE s.s_suppkey IS NULL)::BIGINT AS v
  FROM lineitem l2 LEFT JOIN supplier s ON l2.l_suppkey = s.s_suppkey
),
rows_ AS (
  SELECT 'orders_status_accepted' AS check_id, 'orders' AS table_name, n AS n_rows, v_status AS n_violations FROM o
  UNION ALL SELECT 'orders_totalprice_positive', 'orders', n, v_price FROM o
  UNION ALL SELECT 'orders_orderdate_before_2000', 'orders', n, v_date FROM o
  UNION ALL SELECT 'orders_orderkey_unique', 'orders', n, v_uniq FROM o
  UNION ALL SELECT 'orders_custkey_not_null', 'orders', n, v_null FROM o
  UNION ALL SELECT 'lineitem_quantity_range', 'lineitem', n, v_qty FROM li
  UNION ALL SELECT 'lineitem_discount_range', 'lineitem', n, v_disc FROM li
  UNION ALL SELECT 'lineitem_tax_range', 'lineitem', n, v_tax FROM li
  UNION ALL SELECT 'lineitem_extendedprice_positive', 'lineitem', n, v_price FROM li
  UNION ALL SELECT 'documents_nchars_consistent', 'documents', n, v_chars FROM d
  UNION ALL SELECT 'documents_lang_nonempty', 'documents', n, v_lang FROM d
  UNION ALL SELECT 'events_value_positive', 'events', n, v_val FROM e
  UNION ALL SELECT 'customer_custkey_unique', 'customer', n, v_uniq FROM c
  UNION ALL SELECT 'orders_custkey_fk', 'orders', n, v FROM fk_oc
  UNION ALL SELECT 'lineitem_orderkey_fk', 'lineitem', n, v FROM fk_lo
  UNION ALL SELECT 'lineitem_partkey_fk', 'lineitem', n, v FROM fk_lp
  UNION ALL SELECT 'lineitem_suppkey_fk', 'lineitem', n, v FROM fk_ls
)
SELECT check_id, table_name, n_rows, n_violations,
       (CASE WHEN n_violations = 0 THEN 1 ELSE 0 END)::BIGINT AS passed
FROM rows_
"""

PENDING_QUERIES["validation_expectations_report"] = validation_expectations_report
PENDING_ORACLE["validation_expectations_report"] = _SQL_EXPECTATIONS


# --- PIVOT→UNPIVOT round-trip — PENDING round 7 ---------------------------------
#
# The UNPIVOT (melt) half of the reshape surface, proved by algebra: pivot
# order counts to wide form (explicit value list — one groupBy, no
# discovery pass), melt back with ``DataFrame.unpivot``, and the long form
# must equal the direct GROUP BY — the oracle IS that direct aggregation,
# so the row passes only if unpivot(pivot(x)) = x for every populated cell.
# Zero-count cells materialized by the wide form are dropped on the way
# back (n > 0), mirroring the direct aggregation which never saw them.
# Scale shape: one shuffle for the pivot groupBy; the unpivot is a
# zero-shuffle row-local explode of 3 columns.

def pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    long = wide.unpivot(
        ids=["o_orderpriority"],
        values=["O", "F", "P"],
        variableColumnName="o_orderstatus",
        valueColumnName="n",
    )
    return long.filter(F.col("n").isNotNull() & (F.col("n") > 0)).select(
        "o_orderpriority",
        "o_orderstatus",
        F.col("n").cast("long").alias("n_orders"),
    )


_SQL_PIVOT_ROUNDTRIP = """
SELECT o_orderpriority, o_orderstatus, COUNT(*)::BIGINT AS n_orders
FROM orders
WHERE o_orderstatus IN ('O', 'F', 'P')
GROUP BY 1, 2
"""

PENDING_QUERIES["pivot_unpivot_roundtrip"] = pivot_unpivot_roundtrip
PENDING_ORACLE["pivot_unpivot_roundtrip"] = _SQL_PIVOT_ROUNDTRIP


# --- Round-7 registration wave 1 ------------------------------------------
# Flip these pending rows into the driver contract: the r6 green rows freed
# window slots (rotation policy in COVERAGE.md; order in
# queries/__init__._WINDOW_FRONT). The functions above are unchanged — the
# flip only moves the (query, oracle) pair between registries.
_REGISTER_WAVE1 = (
    "window_rank_profile",
    "profile_orders_columns",
)
for _n in _REGISTER_WAVE1:
    QUERIES[_n] = PENDING_QUERIES.pop(_n)
    ORACLE[_n] = PENDING_ORACLE.pop(_n)
del _n


# --- referential-integrity audit — PENDING round 8+ ---------------------------
#
# The cross-TABLE data-quality row next to the column-level
# ``validation_expectations_report``: orphan counts for every foreign-key
# edge of the star schema, one left-anti join each. Small parents
# (region/nation/customer/supplier/part at dimension scale) broadcast;
# the lineitem→orders edge is the one genuinely big-big check and shuffles
# on the key like any fact-fact join. The events.user_id→customer edge is
# included deliberately: the synthetic event stream is NOT FK-clean, so
# the audit proves the detector on real violations instead of reporting
# a vacuous zero column. Output is |edges|-bounded.

_FK_EDGES = (
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    ("events.user_id->customer.c_custkey", "events", "user_id", "customer", "c_custkey"),
)


def validation_fk_orphans_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, child_t, child_k, parent_t, parent_k in _FK_EDGES:
        child = load_table(spark, sf_dir, child_t).select(
            F.col(child_k).alias("__k")
        )
        parent = load_table(spark, sf_dir, parent_t).select(
            F.col(parent_k).alias("__k")
        ).distinct()
        orphans = child.join(parent, "__k", "left_anti")
        row = (
            child.agg(F.count(F.lit(1)).cast("long").alias("n_child_rows"))
            .crossJoin(
                F.broadcast(
                    orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
                )
            )
            .select(
                F.lit(name).alias("fk_edge"),
                "n_child_rows",
                "n_orphans",
                F.expr("n_orphans * 1000000 div n_child_rows")
                .cast("long")
                .alias("orphan_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# NULL child keys count as orphans on BOTH engines: Spark's left-anti keeps
# null-keyed rows (they match nothing), while a bare SQL NOT IN would
# silently drop them (NULL semantics) — spelled out explicitly here.
_SQL_FK_ORPHANS = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS fk_edge,
       (SELECT COUNT(*) FROM {child_t})::BIGINT AS n_child_rows,
       (SELECT COUNT(*) FROM {child_t} c
        WHERE c.{child_k} IS NULL OR c.{child_k} NOT IN
              (SELECT {parent_k} FROM {parent_t} WHERE {parent_k} IS NOT NULL)
       )::BIGINT AS n_orphans,
       ((SELECT COUNT(*) FROM {child_t} c
         WHERE c.{child_k} IS NULL OR c.{child_k} NOT IN
               (SELECT {parent_k} FROM {parent_t} WHERE {parent_k} IS NOT NULL)) * 1000000
        // (SELECT COUNT(*) FROM {child_t}))::BIGINT AS orphan_ppm"""
    for name, child_t, child_k, parent_t, parent_k in _FK_EDGES
)

PENDING_QUERIES["validation_fk_orphans_report"] = validation_fk_orphans_report
PENDING_ORACLE["validation_fk_orphans_report"] = _SQL_FK_ORPHANS


# --- Round-8 registration: the whole pending layer flips in ----------------
# VERDICT r7 #1: the driver's 50-row window gates which rows get CHECKED per
# round, not how many may be REGISTERED — holding locally hash-verified
# operators out of the contract understates coverage and risks rows never
# receiving a driver row. Window order lives in queries/__init__.
flip_pending(PENDING_QUERIES, PENDING_ORACLE, QUERIES, ORACLE)
