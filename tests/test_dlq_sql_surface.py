"""Dead-letter decode split and the spark.sql API surface."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.envelope import (
    decode_json_envelopes_with_dlq,
    golden_workload_envelopes,
)
from cdc_postgresql_clickhouse_spark.sources.registry import register_views


def test_dlq_split(spark):
    good = [json.dumps(e) for e in golden_workload_envelopes()]
    bad = [
        "{not json at all",
        json.dumps({"hello": "no envelope fields"}),
        json.dumps({"before": None, "after": None, "ts_ms": 1}),  # no op
    ]
    raw = spark.createDataFrame([(v,) for v in good + bad + [None]], "value string")
    valid, dead = decode_json_envelopes_with_dlq(raw)
    assert valid.count() == len(good)
    assert valid.filter(F.col("op").isNull()).count() == 0
    dead_rows = dead.collect()
    assert len(dead_rows) == len(bad)  # null tombstone dropped, not dead-lettered
    assert all(r["dlq_reason"] for r in dead_rows)
    # raw payloads preserved for replay-after-fix
    assert {r["raw_value"] for r in dead_rows} == set(bad)


def test_dlq_all_good_is_empty(spark):
    raw = spark.createDataFrame(
        [(json.dumps(e),) for e in golden_workload_envelopes()], "value string"
    )
    valid, dead = decode_json_envelopes_with_dlq(raw)
    assert dead.isEmpty()
    assert valid.count() == len(golden_workload_envelopes())


def test_sql_api_surface(spark, sf_dir):
    """The engine's tables are first-class through spark.sql too: the same
    query through SQL text and the DataFrame API returns identical rows."""
    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    li = spark.table("lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    via_df = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )
    assert via_sql.exceptAll(via_df).isEmpty()
    assert via_df.exceptAll(via_sql).isEmpty()


def test_sql_window_and_join_surface(spark, sf_dir):
    register_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )
    assert out.count() == 5
    assert out.filter(F.col("n_orders") <= 0).count() == 0
