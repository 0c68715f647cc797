"""Layout operators: bucketed co-located joins must be shuffle-free and
salted operators must be row-identical to their plain equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.layout import (
    colocated_join,
    salted_join,
    skew_safe_count_distinct,
    write_bucketed,
)
from cdc_postgresql_clickhouse_spark.plans.inspect import formatted_plan, shuffle_count
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, path=str(base / "orders_b"))
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
        path=str(base / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_colocated_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    j = colocated_join(spark, left, right, "o_orderkey")
    assert shuffle_count(j) == 0, formatted_plan(j)


def test_colocated_join_correct(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    n = colocated_join(spark, left, right, "o_orderkey").count()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expected = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert n == expected


def test_salted_join_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    salted = salted_join(li, orders, "o_orderkey", n_salts=8)
    plain = li.join(orders, "o_orderkey")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_salted_left_join_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("o_custkey"), "event_id"
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    salted = salted_join(ev, orders, "o_custkey", n_salts=4, how="left")
    plain = ev.join(orders, "o_custkey", "left")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty()


def test_skew_safe_count_distinct_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = skew_safe_count_distinct(li, "l_suppkey", "l_partkey", n_salts=8)
    expected = li.groupBy("l_suppkey").agg(
        F.count_distinct("l_partkey").alias("n_distinct")
    )
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()


def test_date_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    """A dt predicate must reach the partition level: the planned scan
    lists ONLY the matching date directories (inputFiles is the proof),
    and the pruned read returns exactly the rows of those dates."""
    from cdc_postgresql_clickhouse_spark.operators.layout import (
        write_date_partitioned,
    )
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    path = str(tmp_path / "ev_by_date")
    write_date_partitioned(ev, path)

    days = sorted(
        r[0]
        for r in spark.read.parquet(path).select("dt").distinct().collect()
    )
    assert len(days) >= 3, "fixture spans too few days for a pruning test"
    pick = days[len(days) // 2]
    pruned = spark.read.parquet(path).filter(F.col("dt") == pick)
    plan = formatted_plan(pruned)
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "dt" in m.group(1), plan[:1500]
    want = ev.filter(F.date_format("ts", "yyyy-MM-dd") == pick).count()
    assert pruned.count() == want
