"""Property-based tests (hypothesis) for the round-4 operator algebra —
pure-Python twins of the committed expressions (constants imported from the
query modules so the properties track the registered definitions).

- KMV merge theorem: k-smallest of a union of k-smallest sets equals
  k-smallest of the union (what makes sketch_kmv_union exact).
- CMS one-sided error: the min-over-rows estimate never undercounts, for
  ANY token multiset under the registered salted-md5 cell function.
- HLL rho ladder: the generated CASE ladder equals leading-zeros+1.
- Bellman-Ford rounds: on graphs small enough that SSSP_ITERS rounds must
  converge, the round recurrence equals Dijkstra.
- Triangle kernel: oriented wedge-closure enumeration equals brute force.
- RRF dominance: a doc ranked at least as well in both systems never
  scores below the dominated doc.
"""

from __future__ import annotations

import hashlib
import heapq
import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_postgresql_clickhouse_spark.queries.dsir import DSIR_BUCKETS
from cdc_postgresql_clickhouse_spark.queries.graph import SSSP_ITERS, SSSP_SCALE
from cdc_postgresql_clickhouse_spark.queries.search import RRF_K
from cdc_postgresql_clickhouse_spark.queries.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    KMV_K,
    _CMS_HASH_DIGITS,
    _HLL_SUFFIX_BITS,
)


@settings(max_examples=200, deadline=None)
@given(
    a=st.sets(st.integers(min_value=0, max_value=10**6), max_size=200),
    b=st.sets(st.integers(min_value=0, max_value=10**6), max_size=200),
    k=st.integers(min_value=1, max_value=16),
)
def test_kmv_merge_theorem(a, b, k):
    ka, kb = sorted(a)[:k], sorted(b)[:k]
    merged = sorted(set(ka) | set(kb))[:k]
    direct = sorted(a | b)[:k]
    assert merged == direct


def _cms_cell(r: int, term: str) -> int:
    h = hashlib.md5(f"{r}:{term}".encode()).hexdigest()[:_CMS_HASH_DIGITS]
    return int(h, 16) % CMS_WIDTH


@settings(max_examples=100, deadline=None)
@given(tokens=st.lists(st.sampled_from([f"t{i}" for i in range(40)]), max_size=300))
def test_cms_never_undercounts(tokens):
    from collections import Counter

    true = Counter(tokens)
    cells = [Counter() for _ in range(CMS_DEPTH)]
    for t, c in true.items():
        for r in range(CMS_DEPTH):
            cells[r][_cms_cell(r, t)] += c
    for t, c in true.items():
        est = min(cells[r][_cms_cell(r, t)] for r in range(CMS_DEPTH))
        assert est >= c


@settings(max_examples=300, deadline=None)
@given(w=st.integers(min_value=0, max_value=(1 << _HLL_SUFFIX_BITS) - 1))
def test_hll_rho_ladder_equals_leading_zeros(w):
    # the generated CASE ladder: rho = i+1 for the largest i with
    # w >= 2^(SUFFIX-1-i); ELSE SUFFIX+1
    rho_case = _HLL_SUFFIX_BITS + 1
    for i in range(_HLL_SUFFIX_BITS):
        if w >= 1 << (_HLL_SUFFIX_BITS - 1 - i):
            rho_case = i + 1
            break
    rho_true = _HLL_SUFFIX_BITS - w.bit_length() + 1
    assert rho_case == rho_true


_graph = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=1, max_value=20),  # edge multiplicity -> weight
    ),
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(edges=_graph)
def test_bellman_ford_rounds_equal_dijkstra(edges):
    # dedupe to (src, dst) -> total count (the transition-graph build),
    # edge length = SSSP_SCALE // count; <= 6 nodes so SSSP_ITERS converges
    from collections import defaultdict

    w = defaultdict(int)
    for s, d, c in edges:
        w[(s, d)] += c
    if not w:
        return
    lengths = {e: SSSP_SCALE // c for e, c in w.items()}
    nodes = sorted({n for e in lengths for n in e})
    src = min(nodes)

    # the registered recurrence: dist holds only reached nodes
    dist = {src: 0}
    for _ in range(SSSP_ITERS):
        cand = dict(dist)
        for (a, b), wm in lengths.items():
            if a in dist:
                nd = dist[a] + wm
                if b not in cand or nd < cand[b]:
                    cand[b] = nd
        dist = cand

    # Dijkstra ground truth
    ref = {src: 0}
    pq = [(0, src)]
    adj = defaultdict(list)
    for (a, b), wm in lengths.items():
        adj[a].append((b, wm))
    while pq:
        d, n = heapq.heappop(pq)
        if d > ref.get(n, float("inf")):
            continue
        for b, wm in adj[n]:
            if d + wm < ref.get(b, float("inf")):
                ref[b] = d + wm
                heapq.heappush(pq, (d + wm, b))

    assert dist == ref


@settings(max_examples=200, deadline=None)
@given(
    edges=st.sets(
        st.tuples(st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=6))
    )
)
def test_triangle_wedge_closure_equals_bruteforce(edges):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in und for n in e})
    # registered kernel: wedge (a<b<c) on shared middle + closure semi-join
    tris = {
        (a, b, c)
        for (a, b) in und
        for (b2, c) in und
        if b2 == b and b < c and (a, c) in und
    }
    brute = {
        (a, b, c)
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    }
    assert tris == brute


@settings(max_examples=200, deadline=None)
@given(
    d1=st.integers(min_value=0, max_value=10),
    s1=st.integers(min_value=0, max_value=10),
    d2=st.integers(min_value=0, max_value=10),
    s2=st.integers(min_value=0, max_value=10),
)
def test_rrf_dominance(d1, s1, d2, s2):
    def contrib(r):
        return int(1000000.0 // (RRF_K + r)) if r > 0 else 0

    def dominates(x, y):
        # rank x is at least as good: present wherever y is, with rank <= y's
        def leg(rx, ry):
            return (ry == 0) or (rx != 0 and rx <= ry)

        return leg(x[0], y[0]) and leg(x[1], y[1])

    f1 = contrib(d1) + contrib(s1)
    f2 = contrib(d2) + contrib(s2)
    if dominates((d1, s1), (d2, s2)):
        assert f1 >= f2


def test_dsir_buckets_constant_sane():
    assert DSIR_BUCKETS == 1024 and HLL_M == 64 and KMV_K == 64
