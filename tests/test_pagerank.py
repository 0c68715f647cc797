"""PageRank invariants: conservation bound, a hand-computable two-node
cycle, and hub dominance on a star graph — via the same integer arithmetic
the registered query uses."""

from __future__ import annotations

import math

from cdc_postgresql_clickhouse_spark.queries.graph import PR_DAMP, PR_ITERS, PR_SCALE


def _pagerank(edges: dict[tuple[str, str], int], iters: int = PR_ITERS):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    base = int(math.floor((1.0 - PR_DAMP) * PR_SCALE / n))
    out = {a: sum(w for (x, _), w in edges.items() if x == a) for a, _ in edges}
    r = {t: PR_SCALE // n for t in nodes}
    for _ in range(iters):
        s = {t: 0 for t in nodes}
        for (a, b), w in edges.items():
            s[b] += (r[a] * w) // out[a]
        r = {t: base + int(math.floor(PR_DAMP * float(s[t]))) for t in nodes}
    return r


def test_two_node_cycle_is_symmetric():
    r = _pagerank({("a", "b"): 3, ("b", "a"): 3})
    assert r["a"] == r["b"]
    # total mass stays ~SCALE (integer floors only lose nano-units)
    assert abs(sum(r.values()) - PR_SCALE) < 100


def test_star_graph_hub_dominates():
    edges = {("x1", "hub"): 1, ("x2", "hub"): 1, ("x3", "hub"): 1, ("hub", "x1"): 1}
    r = _pagerank(edges)
    assert r["hub"] > max(r["x1"], r["x2"], r["x3"])


def test_registered_query_mass_bound(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.graph import graph_pagerank_types

    out = graph_pagerank_types(spark, sf_dir)
    total = out.agg(F.sum("rank_nano")).first()[0]
    # dangling-free transition graph: mass conserved up to integer-floor loss
    assert 0.9 * PR_SCALE < total <= PR_SCALE
    assert out.filter(F.col("rank_nano") <= 0).count() == 0
