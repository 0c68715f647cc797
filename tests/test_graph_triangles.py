"""Triangle-count invariants: hand-computable synthetic graph, plus the
soft-dedup weight identity (sum of weights = number of clusters +
singletons, every weight = 1e6 // size)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _events_df(spark, chains):
    rows = []
    i = 0
    t0 = datetime.datetime(2024, 1, 1)
    for u, types in chains:
        for et in types:
            rows.append((i, t0 + datetime.timedelta(seconds=i), u, et, 0.0, "{}"))
            i += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_triangle_count_hand_computed(spark, tmp_path):
    from cdc_postgresql_clickhouse_spark.queries.graph import graph_triangle_types

    # chains build undirected edges {a-b, b-c, a-c, c-d}: one triangle (a,b,c)
    df = _events_df(spark, [(1, ["a", "b", "c", "a"]), (2, ["c", "d"])])
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {r.event_type: r.n_triangles for r in graph_triangle_types(spark, str(tmp_path)).collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "d": 0}


def test_triangle_counts_fixture_bounds(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.graph import graph_triangle_types

    rows = graph_triangle_types(spark, sf_dir).collect()
    assert rows
    assert all(r.n_triangles >= 0 for r in rows)


def test_soft_weights_sum_to_cluster_count(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.cluster import clusters
    from cdc_postgresql_clickhouse_spark.queries.extras import dedup_soft_weights

    out = dedup_soft_weights(spark, sf_dir).cache()
    # every weight is exactly 1e6 // cluster_size
    bad = out.filter(
        F.col("weight_micro") != F.expr("CAST(1000000 div cluster_size AS BIGINT)")
    ).count()
    assert bad == 0
    # clustered docs all carry size >= 2 (LSH pairs imply at least a pair)
    comp_ids = {r.doc_id for r in clusters(spark, sf_dir).select("doc_id").collect()}
    sized = {r.doc_id: r.cluster_size for r in out.collect()}
    for d, sz in sized.items():
        if d in comp_ids:
            assert sz >= 2, (d, sz)
        else:
            assert sz == 1, (d, sz)
