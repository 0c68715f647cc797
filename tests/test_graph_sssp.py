"""Bellman-Ford SSSP invariants: source at distance 0, every edge relaxed
at the fixpoint (the fixture graph's diameter is far under SSSP_ITERS), and
unreached nodes flagged -1."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.graph import SSSP_SCALE, graph_sssp_types
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def _edges(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .select("src", "dst", F.expr(f"{SSSP_SCALE} div w").cast("long").alias("wm"))
    )


def test_sssp_source_zero_and_triangle_inequality(spark, sf_dir):
    dist = {r.event_type: r.dist_micro for r in graph_sssp_types(spark, sf_dir).collect()}
    assert dist
    assert dist[min(dist)] == 0  # the source is the min-label node
    for e in _edges(spark, sf_dir).collect():
        if dist.get(e.src, -1) >= 0:
            assert dist[e.dst] != -1, e  # reachable via this edge
            assert dist[e.dst] <= dist[e.src] + e.wm, (e, dist[e.src], dist[e.dst])


def test_sssp_unreachable_is_minus_one(spark):
    # a 3-node chain where 'c' only points INTO 'a': from source 'a',
    # 'b' is reachable, the isolated-from-a node 'z' is not
    import datetime

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    # user 1: a -> b (edge a->b); user 2: z -> z (self edge keeps z a node)
    for i, (u, et) in enumerate([(1, "a"), (1, "b"), (2, "z"), (2, "z")]):
        rows.append((i, t0 + datetime.timedelta(seconds=i), u, et, 0.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile, os, shutil

    tmp = tempfile.mkdtemp()
    try:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        dist = {r.event_type: r.dist_micro for r in graph_sssp_types(spark, tmp).collect()}
        assert dist["a"] == 0
        assert dist["b"] == SSSP_SCALE  # one edge of weight 1 -> 1e6 // 1
        assert dist["z"] == -1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_kcore_hindex_converges_on_planted_graph(spark):
    """Planted graph with known coreness: a 4-clique {10,11,12,13} (coreness
    3 each), a pendant 14-10 (coreness 1), and a path 20-21-22 (coreness 1).
    The h-index iteration must land on the exact coreness, and be
    non-increasing round over round (it starts at degree)."""
    from cdc_postgresql_clickhouse_spark.queries.graph import kcore_values

    clique = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    edges = clique + [(10, 14), (20, 21), (21, 22)]
    und = spark.createDataFrame(edges, "a int, b int")
    nbrs = und.selectExpr("a AS t", "b AS nb").unionByName(
        und.selectExpr("b AS t", "a AS nb")
    )
    got = {r.t: r.v for r in kcore_values(nbrs, iters=6).collect()}
    assert got == {10: 3, 11: 3, 12: 3, 13: 3, 14: 1, 20: 1, 21: 1, 22: 1}
    # monotone: one round from degree must be >= the fixpoint everywhere
    one = {r.t: r.v for r in kcore_values(nbrs, iters=1).collect()}
    assert all(one[t] >= got[t] for t in got)


def test_kcore_fixture_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.graph import graph_kcore_types

    out = graph_kcore_types(spark, sf_dir).cache()
    assert out.count() > 0
    # coreness is positive and bounded by n_nodes - 1
    n = out.count()
    assert out.filter((F.col("coreness") < 1) | (F.col("coreness") > n - 1)).count() == 0


def test_lpa_separates_planted_communities(spark):
    """Two 4-cliques bridged by a single weak edge: synchronous weighted LPA
    must label each clique by its own minimum node and not leak across the
    bridge."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.graph import lpa_labels

    c1 = [(a, b, 5) for a in "abcd" for b in "abcd" if a < b]
    c2 = [(a, b, 5) for a in "wxyz" for b in "wxyz" if a < b]
    edges = c1 + c2 + [("d", "w", 1)]  # weak bridge
    und = spark.createDataFrame(edges, "a string, b string, w long")
    nbrs = und.selectExpr("a AS t", "b AS nb", "w").unionByName(
        und.selectExpr("b AS t", "a AS nb", "w")
    )
    got = {r.t: r.lbl for r in lpa_labels(nbrs, iters=4).collect()}
    assert {got[n] for n in "abcd"} == {"a"}
    assert {got[n] for n in "wxyz"} == {"w"}


def test_lpa_fixture_labels_are_nodes(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.graph import graph_label_propagation

    out = graph_label_propagation(spark, sf_dir).collect()
    assert out
    nodes = {r.event_type for r in out}
    assert all(r.community in nodes for r in out)
