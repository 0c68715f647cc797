"""Iterative graph analytics: weighted PageRank (Page et al. 1999) over the
event-type transition graph — the registry's fourth iterative pattern
(k-means, connected components, BPE, PageRank), in the shape Spark's own
GraphX/Pregel popularized: per round one keyed join (ranks → edges) and one
keyed sum (contributions → nodes).

Cross-engine exactness without a truncation step: ranks are INTEGER
nano-units (SCALE = 1e9). Per-edge contributions use long multiply +
integer division — exact — and the per-node combine is an INTEGER sum,
which is order-independent, so the nondeterministic combine order of a
distributed float sum can never surface (same trick as
``text_unigram_logprob``). The only float ops are the damping multiply and
the teleport base, identical single expressions in both engines. The oracle
unrolls PR_ITERS rounds as a CTE chain.

The fixture graph is small (event types as nodes); the PLAN is the one
you'd run on a billions-of-edges graph: the rank table partitions by node
id, edges by src, each round is shuffle-bounded by the edge list, and the
only driver state is the node count (one metadata-ish scalar). Dangling
nodes (no out-edges) leak their rank mass — the standard simplified
variant; redistributing it adds one scalar agg per round if wanted.

Reference tie-in: none (survey §2.13 extension).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.queries._pending import flip_pending

PR_ITERS = 5
PR_SCALE = 1_000_000_000
PR_DAMP = 0.85


def graph_pagerank_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    # ONE distributed pass builds the |types|²-bounded weighted edge
    # table; the PageRank fixpoint iterates on the COLLECTED model state
    # (the pca top_component / graph_hits_types contract — r13: the former
    # per-round keyed joins moved ~25 type-grain rows through 5 Spark jobs
    # of scheduling overhead, after ALREADY persisting both round inputs
    # as model state). Arithmetic is replicated exactly: truncating // on
    # non-negative ints, and math.floor(0.85 * float(s)) where the plan
    # FLOOR'd 0.85 * CAST(s AS DOUBLE) — s < 2^53, so the double is the
    # same value in both.
    erows = edges.collect()
    E = [(r["src"], r["dst"], int(r["w"])) for r in erows]
    ts = sorted({s for s, _, _ in E} | {d for _, d, _ in E})
    wout: dict = {}
    for s, _, w in E:
        wout[s] = wout.get(s, 0) + w
    n_nodes = len(ts)
    base = int(math.floor((1.0 - PR_DAMP) * PR_SCALE / n_nodes))
    ranks = {t: PR_SCALE // n_nodes for t in ts}
    for _ in range(PR_ITERS):
        sums = {t: 0 for t in ts}
        for s, d, w in E:
            sums[d] += (ranks[s] * w) // wout[s]
        ranks = {t: base + int(math.floor(PR_DAMP * float(sums[t]))) for t in ts}
    return spark.createDataFrame(
        [(t, ranks[t]) for t in ts], "event_type string, rank_nano long"
    )


def _sql_pr_round(i: int) -> str:
    return f"""
contrib{i} AS (
  SELECT e.dst AS t, (r.r * e.w) // e.wout AS c
  FROM e2 e JOIN r{i} r ON r.t = e.src
),
sums{i} AS (SELECT t, SUM(c) AS s FROM contrib{i} GROUP BY t),
r{i + 1} AS (
  SELECT n.t,
         CAST(b.base + FLOOR({PR_DAMP!r} * CAST(COALESCE(s.s, 0) AS DOUBLE)) AS BIGINT) AS r
  FROM nodes n CROSS JOIN basev b LEFT JOIN sums{i} s ON s.t = n.t
)"""


_SQL_PAGERANK = (
    f"""
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst, COUNT(*) AS w FROM seq WHERE src IS NOT NULL GROUP BY src, dst
),
nodes AS (
  SELECT DISTINCT t FROM (SELECT src AS t FROM edges UNION ALL SELECT dst FROM edges)
),
outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY src),
e2 AS (SELECT e.src, e.dst, e.w, o.wout FROM edges e JOIN outw o USING (src)),
nv AS (SELECT COUNT(*) AS n FROM nodes),
basev AS (
  SELECT CAST(FLOOR({1.0 - PR_DAMP!r} * {float(PR_SCALE)!r} / CAST(n AS DOUBLE)) AS BIGINT) AS base
  FROM nv
),
r0 AS (
  SELECT t, CAST({PR_SCALE} // n AS BIGINT) AS r FROM nodes CROSS JOIN nv
),"""
    + ",".join(_sql_pr_round(i) for i in range(PR_ITERS))
    + f"""
SELECT t AS event_type, r AS rank_nano FROM r{PR_ITERS}
"""
)

QUERIES = {"graph_pagerank_types": graph_pagerank_types}
ORACLE = {"graph_pagerank_types": _SQL_PAGERANK}


# --- single-source shortest paths (Bellman-Ford rounds) ---------------------
#
# SSSP over the same transition graph — the MIN-PLUS semiring twin of
# PageRank's sum-times rounds (the two canonical Pregel shapes). Edge
# length = 1e6 // weight (popular transitions are "short"), so every
# distance is an exact integer and the per-node combine is MIN — both
# order-independent, nothing to truncate. Unreached nodes report -1.
#
# Distance state holds ONLY reached nodes (no +infinity sentinel whose
# arithmetic could overflow, no NULL-propagation semantics to align between
# engines): each round is candidates = (previous distances) UNION ALL
# (previous ⋈ edges relaxations), then one MIN per node. SSSP_ITERS=6 fixed
# rounds — the oracle unrolls the same six, so the comparison is exact even
# if a pathological graph hasn't converged (the fixture's type graph has
# diameter well under 6).
#
# Scale shape: per round one keyed join (distances → out-edges) + one
# keyed MIN — shuffle bounded by the edge list, the same budget as a
# PageRank round; the only driver scalars are the source node id (min
# label, a metadata-ish aggregate) shared with the oracle by construction.

SSSP_ITERS = 6
SSSP_SCALE = 1_000_000


def graph_sssp_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    edges = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .select("src", "dst", F.expr(f"{SSSP_SCALE} div w").cast("long").alias("wm"))
    )
    # collected-model fixpoint (the graph_hits_types / pagerank contract,
    # r13): SSSP_ITERS rounds of exact-integer min-plus on the |types|²
    # edge list — candidates = carried distances ∪ relaxations, then MIN
    # per node, replicated verbatim on Python ints (order-free MIN / +).
    erows = edges.collect()
    E = [(r["src"], r["dst"], int(r["wm"])) for r in erows]
    ts = sorted({s for s, _, _ in E} | {d for _, d, _ in E})
    source = min(ts)
    dist = {source: 0}
    for _ in range(SSSP_ITERS):
        cand = dict(dist)
        for s, d, wm in E:
            if s in dist:
                nd = dist[s] + wm
                if d not in cand or nd < cand[d]:
                    cand[d] = nd
        dist = cand
    return spark.createDataFrame(
        [(t, dist.get(t, -1)) for t in ts], "event_type string, dist_micro long"
    )


def _sql_sssp_round(i: int) -> str:
    return f"""
cand{i} AS (
  SELECT e.dst AS t, d.d + e.wm AS d FROM e2 e JOIN d{i} d ON d.t = e.src
  UNION ALL SELECT t, d FROM d{i}
),
d{i + 1} AS (SELECT t, MIN(d) AS d FROM cand{i} GROUP BY t)"""


_SQL_SSSP = (
    f"""
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst, COUNT(*) AS w FROM seq WHERE src IS NOT NULL GROUP BY src, dst
),
e2 AS (SELECT src, dst, {SSSP_SCALE} // w AS wm FROM edges),
nodes AS (
  SELECT DISTINCT t FROM (SELECT src AS t FROM edges UNION ALL SELECT dst FROM edges)
),
d0 AS (
  SELECT t, CAST(0 AS BIGINT) AS d FROM nodes WHERE t = (SELECT MIN(t) FROM nodes)
),"""
    + ",".join(_sql_sssp_round(i) for i in range(SSSP_ITERS))
    + f"""
SELECT n.t AS event_type, CAST(COALESCE(d.d, -1) AS BIGINT) AS dist_micro
FROM nodes n LEFT JOIN d{SSSP_ITERS} d ON d.t = n.t
"""
)

QUERIES["graph_sssp_types"] = graph_sssp_types
ORACLE["graph_sssp_types"] = _SQL_SSSP


# --- triangle counting ------------------------------------------------------
#
# Per-node triangle counts over the UNDIRECTED transition graph — the third
# classic graph kernel (clustering-coefficient numerator). The standard
# distributed formulation: orient every edge low→high, join edges on the
# shared middle node to enumerate wedges (a<b<c), then close each wedge
# with a semi-join back to the edge list — each triangle is produced
# exactly once, and the join sizes are edge-list-bounded (wedges explode
# only on high-degree nodes; at scale the mitigation is the standard
# degree-ordered orientation, which this already is).

def graph_triangle_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    und = pairs.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct().persist()
    e1 = und.alias("e1")
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("e2")
    wedges = e1.join(e2, "b").filter(F.col("b") < F.col("c"))
    closer = und.select(F.col("a").alias("wa"), F.col("b").alias("wc"))
    tris = wedges.join(
        closer, (F.col("a") == F.col("wa")) & (F.col("c") == F.col("wc")), "leftsemi"
    ).select("a", "b", "c")
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    nodes = und.select(F.col("a").alias("event_type")).unionByName(
        und.select(F.col("b").alias("event_type"))
    ).distinct()
    return nodes.join(per_node, "event_type", "left").select(
        "event_type", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
    )


_SQL_TRIANGLES = """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM seq WHERE src IS NOT NULL AND src <> dst
),
tris AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b AND e1.b < e2.b
  WHERE EXISTS (SELECT 1 FROM und e3 WHERE e3.a = e1.a AND e3.b = e2.b)
),
per AS (
  SELECT t AS event_type, COUNT(*) AS n FROM (
    SELECT unnest([a, b, c]) AS t FROM tris
  ) GROUP BY t
),
nodes AS (SELECT DISTINCT a AS event_type FROM und
          UNION SELECT DISTINCT b FROM und)
SELECT n.event_type, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_triangles
FROM nodes n LEFT JOIN per p ON p.event_type = n.event_type
"""

QUERIES["graph_triangle_types"] = graph_triangle_types
ORACLE["graph_triangle_types"] = _SQL_TRIANGLES


# --- k-core decomposition (iterative h-index) --------------------------------
#
# Coreness of every node in the UNDIRECTED transition graph — the density
# primitive next to PageRank (importance), SSSP (distance), triangles
# (local clustering) and the CC machinery (components): the k-core is the
# maximal subgraph of minimum degree k, and a node's coreness is the
# largest k of a core containing it (community-strength / nucleus
# detection in corpus graphs).
#
# Sequential peeling (remove min-degree nodes repeatedly) is inherently
# serial; the DISTRIBUTED formulation is the h-index fixpoint of Lü et al.
# 2016 (Nature Physics): start c_0(v) = degree(v) and iterate
# c_{t+1}(v) = H({c_t(u) : u ~ v}) where H is the h-index (the largest h
# such that >= h neighbors have value >= h). The sequence is non-increasing
# and converges to coreness exactly; every quantity is an INTEGER and the
# synchronous update is order-independent, so both engines agree
# bit-for-bit at ANY fixed round count — the oracle unrolls KCORE_ITERS
# rounds whether or not the graph has converged (the fixture's 5-node type
# graph converges in 1-2).
#
# Per round: one keyed join (values → adjacency) + one windowed rank + one
# keyed MAX — shuffle bounded by the (symmetrized) edge list, the same
# budget as a PageRank round. The h-index itself is rank arithmetic: sort
# neighbor values desc, h = max_i min(v_i, i) — no doubles anywhere.
# localCheckpoint cuts the per-round lineage (state is |nodes| rows).

KCORE_ITERS = 4


def kcore_values(nbrs: DataFrame, iters: int = KCORE_ITERS) -> DataFrame:
    """Iterative h-index over a symmetric (t, nb) adjacency — returns
    (t, coreness). Factored out so tests can drive planted graphs.

    Collected-model fixpoint (the graph_hits_types contract, r13): the
    adjacency is |types|²-bounded; h = max_i min(v_i, i) over neighbor
    values sorted desc is pure integer rank arithmetic, replicated
    verbatim (synchronous update, order-independent)."""
    rows = nbrs.select("t", "nb").collect()
    A = [(r["t"], r["nb"]) for r in rows]
    adj: dict = {}
    for t, nb in A:
        adj.setdefault(t, []).append(nb)
    cur = {t: len(ns) for t, ns in adj.items()}
    for _ in range(iters):
        new = {}
        for t, ns in adj.items():
            nvs = sorted((cur[nb] for nb in ns if nb in cur), reverse=True)
            new[t] = max(min(v, i + 1) for i, v in enumerate(nvs)) if nvs else None
        cur = {t: v for t, v in new.items() if v is not None}
    t_dt = nbrs.schema["t"].dataType.simpleString()
    return nbrs.sparkSession.createDataFrame(
        sorted(cur.items()), f"t {t_dt}, v long"
    )


def graph_kcore_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    und = pairs.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    nbrs = (
        und.select(F.col("a").alias("t"), F.col("b").alias("nb"))
        .unionByName(und.select(F.col("b").alias("t"), F.col("a").alias("nb")))
        .persist()
    )
    return kcore_values(nbrs).select(
        F.col("t").alias("event_type"), F.col("v").alias("coreness")
    )


def _sql_kcore_round(i: int) -> str:
    return f"""
vals{i} AS (
  SELECT n.t, c.v AS nv FROM nbrs n JOIN c{i} c ON c.t = n.nb
),
ranked{i} AS (
  SELECT t, nv, row_number() OVER (PARTITION BY t ORDER BY nv DESC, t ASC) AS rn
  FROM vals{i}
),
c{i + 1} AS (
  SELECT t, CAST(MAX(LEAST(nv, rn)) AS BIGINT) AS v FROM ranked{i} GROUP BY t
)"""


_SQL_KCORE = (
    f"""
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM seq WHERE src IS NOT NULL AND src <> dst
),
nbrs AS (
  SELECT a AS t, b AS nb FROM und UNION ALL SELECT b AS t, a AS nb FROM und
),
c0 AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS v FROM nbrs GROUP BY t),"""
    + ",".join(_sql_kcore_round(i) for i in range(KCORE_ITERS))
    + f"""
SELECT t AS event_type, v AS coreness FROM c{KCORE_ITERS}
"""
)

QUERIES["graph_kcore_types"] = graph_kcore_types
ORACLE["graph_kcore_types"] = _SQL_KCORE


# --- label-propagation communities -------------------------------------------
#
# Community labels over the WEIGHTED undirected transition graph — the
# community-detection primitive (Raghavan et al. 2007 LPA) completing the
# graph family: importance (PageRank), distance (SSSP), local density
# (triangles), global density (k-core), components (CC), communities (LPA).
#
# Asynchronous LPA is famously nondeterministic (update order changes the
# result); the engine-exact form here is SYNCHRONOUS weighted LPA with a
# total-order tie-break: every round, each node adopts the label with the
# largest incident edge-weight sum, ties broken by SMALLEST label. With
# synchronous updates and the deterministic tie-break, both engines agree
# bit-for-bit at any fixed round count — the oracle unrolls LPA_ITERS
# rounds (synchronous LPA can 2-cycle on bipartite-ish structures rather
# than converge, which is WHY the contract is fixed-round equality, not
# convergence).
#
# Per round: one keyed join (labels → adjacency) + one keyed weighted count
# + one windowed argmax — edge-list-bounded like the other rounds; labels
# are node ids (strings), state is |nodes| rows, localCheckpoint per round.

LPA_ITERS = 4


def lpa_labels(nbrs: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """Synchronous weighted LPA over a symmetric (t, nb, w) adjacency —
    returns (t, lbl). Factored out for planted-graph tests.

    Collected-model fixpoint (the graph_hits_types / pagerank contract,
    r13): the adjacency is |types|²-bounded model state; per round each
    node adopts the label with the largest incident weight SUM (exact
    integer, order-free), ties to the SMALLEST label — replicated
    verbatim; rows whose nb carries no label are dropped exactly as the
    former per-round join dropped them."""
    rows = nbrs.select("t", "nb", "w").collect()
    A = [(r["t"], r["nb"], int(r["w"])) for r in rows]
    ts = sorted({t for t, _, _ in A})
    lbl = {t: t for t in ts}
    for _ in range(iters):
        sums: dict = {}
        for t, nb, w in A:
            lb = lbl.get(nb)
            if lb is None:
                continue
            key = (t, lb)
            sums[key] = sums.get(key, 0) + w
        best: dict = {}
        for (t, lb), s in sums.items():
            cand = (-s, lb)  # max weight sum, then smallest label
            if t not in best or cand < best[t]:
                best[t] = cand
        lbl = {t: best[t][1] for t in best}
    t_dt = nbrs.schema["t"].dataType.simpleString()
    return nbrs.sparkSession.createDataFrame(
        sorted(lbl.items()), f"t {t_dt}, lbl {t_dt}"
    )


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    und = (
        pairs.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    nbrs = (
        und.select(F.col("a").alias("t"), F.col("b").alias("nb"), "w")
        .unionByName(und.select(F.col("b").alias("t"), F.col("a").alias("nb"), "w"))
    )
    return lpa_labels(nbrs).select(
        F.col("t").alias("event_type"), F.col("lbl").alias("community")
    )


def _sql_lpa_round(i: int) -> str:
    return f"""
vals{i} AS (
  SELECT n.t, c.lbl, n.w FROM nbrs n JOIN l{i} c ON c.t = n.nb
),
sums{i} AS (SELECT t, lbl, SUM(w) AS s FROM vals{i} GROUP BY t, lbl),
l{i + 1} AS (
  SELECT t, lbl FROM (
    SELECT t, lbl, row_number() OVER (PARTITION BY t ORDER BY s DESC, lbl ASC) AS rn
    FROM sums{i}
  ) WHERE rn = 1
)"""


_SQL_LPA = (
    f"""
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, COUNT(*) AS w
  FROM seq WHERE src IS NOT NULL AND src <> dst
  GROUP BY least(src, dst), greatest(src, dst)
),
nbrs AS (
  SELECT a AS t, b AS nb, w FROM und UNION ALL SELECT b AS t, a AS nb, w FROM und
),
l0 AS (SELECT DISTINCT t, t AS lbl FROM nbrs),"""
    + ",".join(_sql_lpa_round(i) for i in range(LPA_ITERS))
    + f"""
SELECT t AS event_type, lbl AS community FROM l{LPA_ITERS}
"""
)

QUERIES["graph_label_propagation"] = graph_label_propagation
ORACLE["graph_label_propagation"] = _SQL_LPA


# --- degree profile ---------------------------------------------------------
#
# The descriptive-statistics companion of the iterative family: per-node
# in/out degree (distinct counterparties) and weighted degree (transition
# mass) over the same event-type transition graph. On a billions-of-edges
# graph this is two keyed aggs over the edge list plus one full-outer
# union-merge — no iteration, no driver state at all. ClickHouse users run
# exactly this as the first sanity query over a behavioral graph; here it is
# the degree-distribution input to power-law checks (Broder et al. 2000).


def graph_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    outd = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("out_deg"),
        F.sum("w").cast("long").alias("out_mass"),
    )
    ind = edges.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("in_deg"),
        F.sum("w").cast("long").alias("in_mass"),
    )
    return (
        outd.withColumnRenamed("src", "event_type")
        .join(ind.withColumnRenamed("dst", "event_type"), "event_type", "full_outer")
        .select(
            "event_type",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("out_mass", F.lit(0)).cast("long").alias("out_mass"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce("in_mass", F.lit(0)).cast("long").alias("in_mass"),
        )
    )


_SQL_DEGREE = """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst, COUNT(*) AS w FROM seq WHERE src IS NOT NULL GROUP BY src, dst
),
outd AS (
  SELECT src AS event_type, COUNT(*) AS out_deg, SUM(w) AS out_mass
  FROM edges GROUP BY src
),
ind AS (
  SELECT dst AS event_type, COUNT(*) AS in_deg, SUM(w) AS in_mass
  FROM edges GROUP BY dst
)
SELECT COALESCE(o.event_type, i.event_type) AS event_type,
       CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(o.out_mass, 0) AS BIGINT) AS out_mass,
       CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg,
       CAST(COALESCE(i.in_mass, 0) AS BIGINT) AS in_mass
FROM outd o FULL OUTER JOIN ind i ON o.event_type = i.event_type
"""

QUERIES["graph_degree_profile"] = graph_degree_profile
ORACLE["graph_degree_profile"] = _SQL_DEGREE


# --- community modularity report — PENDING round 7 --------------------------
#
# The eval row for the community family (Newman & Girvan 2004): per LPA
# community, Q_c = in_c/m − (deg_c/2m)² over the weighted undirected
# transition graph, as integer PPM via cross-multiplied truncating
# divisions — composes the registered label-propagation operator verbatim
# (the oracle nests its full unrolled SQL as a CTE, the recall-report
# device), so the score judges exactly the communities the driver row
# ships. Output is community-count bounded at any graph size.


def graph_modularity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    und = pairs.groupBy(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).agg(F.count(F.lit(1)).alias("w"))
    nbrs = und.select(F.col("a").alias("t"), F.col("b").alias("nb"), "w").unionByName(
        und.select(F.col("b").alias("t"), F.col("a").alias("nb"), "w")
    )
    labels = lpa_labels(nbrs)  # (t, lbl) — the registered operator's engine
    w2 = und.agg((F.sum("w") * 2).cast("long")).first()[0]  # scalar: 2m
    deg = nbrs.groupBy("t").agg(F.sum("w").cast("long").alias("deg"))
    lab_a = labels.select(F.col("t").alias("a"), F.col("lbl").alias("la"))
    lab_b = labels.select(F.col("t").alias("b"), F.col("lbl").alias("lb"))
    internal = (
        und.join(F.broadcast(lab_a), "a")
        .join(F.broadcast(lab_b), "b")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("community"))
        .agg(F.sum("w").cast("long").alias("internal_weight"))
    )
    per = (
        labels.join(deg, "t")
        .groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("deg").cast("long").alias("total_degree"),
        )
        .join(internal, "community", "left")
        .select(
            "community",
            "n_nodes",
            F.coalesce("internal_weight", F.lit(0)).cast("long").alias("internal_weight"),
            "total_degree",
        )
    )
    return per.select(
        "community",
        "n_nodes",
        "internal_weight",
        "total_degree",
        (
            F.expr(f"(2 * internal_weight * 1000000) div {w2}")
            - F.expr(f"(total_degree * total_degree * 1000000) div {w2 * w2}")
        ).cast("long").alias("q_contrib_ppm"),
    )


def _sql_modularity() -> str:
    return f"""
WITH lab AS ({ORACLE["graph_label_propagation"]}),
seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, COUNT(*) AS w
  FROM seq WHERE src IS NOT NULL AND src <> dst
  GROUP BY least(src, dst), greatest(src, dst)
),
nbrs AS (
  SELECT a AS t, b AS nb, w FROM und UNION ALL SELECT b AS t, a AS nb, w FROM und
),
w2v AS (SELECT SUM(w) * 2 AS w2 FROM und),
deg AS (SELECT t, SUM(w) AS deg FROM nbrs GROUP BY t),
internal AS (
  SELECT la.community AS community, SUM(u.w) AS internal_weight
  FROM und u
  JOIN lab la ON la.event_type = u.a
  JOIN lab lb ON lb.event_type = u.b
  WHERE la.community = lb.community
  GROUP BY la.community
),
per AS (
  SELECT l.community, COUNT(*) AS n_nodes, SUM(d.deg) AS total_degree
  FROM lab l JOIN deg d ON d.t = l.event_type
  GROUP BY l.community
)
SELECT p.community, CAST(p.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(i.internal_weight, 0) AS BIGINT) AS internal_weight,
       CAST(p.total_degree AS BIGINT) AS total_degree,
       CAST((2 * COALESCE(i.internal_weight, 0) * 1000000) // w.w2
            - (p.total_degree * p.total_degree * 1000000) // (w.w2 * w.w2)
            AS BIGINT) AS q_contrib_ppm
FROM per p LEFT JOIN internal i USING (community) CROSS JOIN w2v w
"""


PENDING_QUERIES = {"graph_modularity_report": graph_modularity_report}
PENDING_ORACLE = {"graph_modularity_report": _sql_modularity()}


# --- transition-entropy profile — PENDING round 7 ---------------------------
#
# Per-source-node Shannon entropy of the outgoing transition distribution
# — the behavioral-predictability statistic (entropy rate of the first-
# order Markov chain the transition matrix defines). The micro-floor
# device at edge grain: -log2 p floors once per edge on identical
# doubles, the per-node combine is an exact integer sum weighted by edge
# counts, and the average ships as micro-bits. One keyed agg over the
# edge list + one keyed combine — node-count-bounded output.


def graph_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("w"))
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))
    e_micro = F.floor(
        F.log(F.col("wout").cast("double") / F.col("w").cast("double"))
        / F.lit(float(__import__("math").log(2.0)))
        * F.lit(1000000.0)
    ).cast("long")
    per = (
        edges.join(F.broadcast(outw), "src")
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_destinations"),
            F.max("wout").alias("n_transitions"),
            F.sum(F.col("w") * e_micro).cast("long").alias("sum_u"),
        )
    )
    return per.select(
        F.col("src").alias("event_type"),
        "n_destinations",
        "n_transitions",
        F.expr("sum_u div n_transitions").cast("long").alias("entropy_microbits"),
    )


_SQL_TRANS_ENTROPY = f"""
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst, COUNT(*)::BIGINT AS w FROM seq WHERE src IS NOT NULL GROUP BY src, dst
),
outw AS (SELECT src, SUM(w)::BIGINT AS wout FROM edges GROUP BY src),
per AS (
  SELECT e.src, COUNT(*)::BIGINT AS n_destinations, MAX(o.wout) AS n_transitions,
         SUM(e.w * CAST(FLOOR(
           ln(CAST(o.wout AS DOUBLE) / CAST(e.w AS DOUBLE))
           / {float(__import__("math").log(2.0))!r} * 1000000.0) AS BIGINT))::BIGINT AS sum_u
  FROM edges e JOIN outw o USING (src)
  GROUP BY e.src
)
SELECT src AS event_type, n_destinations, CAST(n_transitions AS BIGINT) AS n_transitions,
       CAST(sum_u // n_transitions AS BIGINT) AS entropy_microbits
FROM per
"""

PENDING_QUERIES["graph_transition_entropy"] = graph_transition_entropy
PENDING_ORACLE["graph_transition_entropy"] = _SQL_TRANS_ENTROPY


# --- HITS hubs & authorities — PENDING round 7 ------------------------------
#
# Kleinberg's HITS (1999) over the weighted event-type transition graph —
# the other classic link-analysis fixpoint next to the registered
# PageRank: authority(t) = Σ_{s→t} hub(s)·w, hub(s) = Σ_{s→t} auth(t)·w,
# each L1-normalized per round. Integer nano-unit discipline throughout:
# `x div (S div SCALE)` renormalizes without the x*SCALE product that
# would overflow int64 (weighted raws reach ~1e13). Fixed HITS_ITERS
# rounds; the oracle unrolls them as a CTE chain. The fixpoint iterates
# on the COLLECTED |types|² edge table — bounded model state, the pca
# top_component contract (r13 optimization: the former per-round keyed
# joins + eager checkpoints moved ~25 rows through 16 Spark jobs of pure
# scheduling overhead).

HITS_ITERS = 4
HITS_SCALE = 1_000_000_000


def _hits_edges(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("w"))
    nodes = (
        edges.select(F.col("src").alias("t"))
        .unionByName(edges.select(F.col("dst").alias("t")))
        .distinct()
    )
    return edges, nodes


def graph_hits_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed pass builds the weighted type-transition graph; the
    HITS fixpoint then iterates on the COLLECTED edge table — |types|²
    rows of model state, the pca top_component / kmeans contract (the
    events scan is the data pass; the per-round joins moved ~25 type-grain
    rows through 8 Spark jobs + 8 eager localCheckpoints of pure
    scheduling overhead — measured 2.9 s → 1.0 s at sf0.1). The integer
    ladder (`x div (S div SCALE)` renormalization, truncating division on
    non-negative sums) is replicated exactly; Python ints are exact where
    the plan's BIGINTs are asserted non-overflowing (raws ≤ ~1e13)."""
    edges, _nodes = _hits_edges(spark, sf_dir)
    erows = edges.collect()  # |types|² bounded model state, never row data
    E = [(r["src"], r["dst"], int(r["w"])) for r in erows]
    ts = sorted({s for s, _, _ in E} | {d for _, d, _ in E})
    auth = {t: HITS_SCALE for t in ts}
    hub = {t: HITS_SCALE for t in ts}

    def _renorm(raw: dict) -> dict:
        s = sum(raw.values())
        d = s // HITS_SCALE  # non-negative sums: // == Spark's div
        # d == 0 would make Spark's `x div 0` NULL — unreachable on any
        # non-empty graph (initial mass is HITS_SCALE per node) but kept
        # faithful: propagate None exactly as the plan would
        return {t: (raw[t] // d if d else None) for t in ts}

    for _ in range(HITS_ITERS):
        ar = {t: 0 for t in ts}
        for s, dd, w in E:
            ar[dd] += hub[s] * w
        auth = _renorm(ar)
        hr = {t: 0 for t in ts}
        for s, dd, w in E:
            hr[s] += auth[dd] * w
        hub = _renorm(hr)
    return spark.createDataFrame(
        [(t, auth[t], hub[t]) for t in ts],
        "event_type string, authority_nano long, hub_nano long",
    )


def _sql_hits() -> str:
    parts = []
    prev_h, prev_a = "h0", "a0"
    for i in range(1, HITS_ITERS + 1):
        parts.append(f"""
araw{i} AS MATERIALIZED (
  SELECT n.t, COALESCE(x.v, 0) AS v FROM nodes n LEFT JOIN (
    SELECT e.dst AS t, SUM(p.h * e.w) AS v
    FROM edges e JOIN {prev_h} p ON p.t = e.src GROUP BY e.dst
  ) x ON x.t = n.t
),
sa{i} AS MATERIALIZED (SELECT SUM(v) AS s FROM araw{i}),
a{i} AS MATERIALIZED (SELECT t, CAST(v // (s // {HITS_SCALE}) AS BIGINT) AS a
         FROM araw{i} CROSS JOIN sa{i}),
hraw{i} AS MATERIALIZED (
  SELECT n.t, COALESCE(x.v, 0) AS v FROM nodes n LEFT JOIN (
    SELECT e.src AS t, SUM(p.a * e.w) AS v
    FROM edges e JOIN a{i} p ON p.t = e.dst GROUP BY e.src
  ) x ON x.t = n.t
),
sh{i} AS MATERIALIZED (SELECT SUM(v) AS s FROM hraw{i}),
h{i} AS MATERIALIZED (SELECT t, CAST(v // (s // {HITS_SCALE}) AS BIGINT) AS h
         FROM hraw{i} CROSS JOIN sh{i})""")
        prev_a, prev_h = f"a{i}", f"h{i}"
    chain = ",".join(parts)
    return f"""
WITH base AS (
  SELECT user_id, event_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
  FROM events
),
edges AS MATERIALIZED (
  SELECT src, event_type AS dst, COUNT(*)::BIGINT AS w
  FROM base WHERE src IS NOT NULL GROUP BY src, event_type
),
nodes AS MATERIALIZED (
  SELECT DISTINCT t FROM (
    SELECT src AS t FROM edges UNION ALL SELECT dst FROM edges
  )
),
h0 AS (SELECT t, CAST({HITS_SCALE} AS BIGINT) AS h FROM nodes),
a0 AS (SELECT t, CAST({HITS_SCALE} AS BIGINT) AS a FROM nodes),{chain}
SELECT {prev_a}.t AS event_type, {prev_a}.a AS authority_nano, {prev_h}.h AS hub_nano
FROM {prev_a} JOIN {prev_h} ON {prev_a}.t = {prev_h}.t
"""


PENDING_QUERIES["graph_hits_types"] = graph_hits_types
PENDING_ORACLE["graph_hits_types"] = _sql_hits()


# --- structural neighbor-Jaccard — PENDING round 7 ---------------------------
#
# Node-similarity report (the SimRank-lite building block role-mining uses):
# for each pair of event types, the Jaccard of their OUT-neighbor sets in the
# distinct directed transition graph — |N(a)∩N(b)| / |N(a)∪N(b)| in floored
# ppm. Pairs sharing zero neighbors are omitted (the co-neighbor join never
# generates them; the oracle mirrors that). Scale shape: the classic
# inverted-list device — distinct edges once, shared counts via the
# join-on-common-neighbor (fan-out bounded by per-neighbor in-degree, the
# hot-key candidate a salting pass would target on a power-law graph),
# degrees joined back at pair grain; nothing corpus-proportional shuffles
# more than once.

def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    e1 = edges.select(F.col("src").alias("a"), "dst")
    e2 = edges.select(F.col("src").alias("b"), "dst")
    shared = (
        e1.join(e2, "dst")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    return (
        shared.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.col("a").alias("type_a"),
            F.col("b").alias("type_b"),
            "n_shared", "deg_a", "deg_b",
            F.expr("n_shared * 1000000 div (deg_a + deg_b - n_shared)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )


_SQL_NBR_JACCARD = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
  FROM events
),
edges AS (
  SELECT DISTINCT src, event_type AS dst FROM seq
  WHERE src IS NOT NULL AND src <> event_type
),
deg AS (SELECT src, COUNT(*)::BIGINT AS deg FROM edges GROUP BY src),
shared AS (
  SELECT e1.src AS a, e2.src AS b, COUNT(*)::BIGINT AS n_shared
  FROM edges e1 JOIN edges e2 USING (dst)
  WHERE e1.src < e2.src
  GROUP BY 1, 2
)
SELECT a AS type_a, b AS type_b, n_shared,
       da.deg AS deg_a, db.deg AS deg_b,
       (n_shared * 1000000 // (da.deg + db.deg - n_shared))::BIGINT AS jaccard_ppm
FROM shared JOIN deg da ON da.src = a JOIN deg db ON db.src = b
"""

PENDING_QUERIES["graph_neighbor_jaccard"] = graph_neighbor_jaccard
PENDING_ORACLE["graph_neighbor_jaccard"] = _SQL_NBR_JACCARD


# --- Directed-edge reciprocity — PENDING round 7 ------------------------------
#
# The companion scalar to the neighbor-Jaccard above: what share of distinct
# directed transitions a→b also occur reversed b→a — high reciprocity means
# back-and-forth flows (navigation loops), low means funnel-like one-way
# traffic. Per SOURCE type: out-degree, reciprocated out-edges, and the
# share in ppm; the reverse probe is a self-semi-join of the distinct edge
# table on the swapped key. Scale shape: distinct edges once (the same
# user-partitioned lag pass every transition query rides), then edge-grain
# joins — bounded by the type-graph size, never the event count.

def graph_edge_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
        .persist()
    )
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = edges.join(rev, ["src", "dst"], "leftsemi")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("out_deg"))
    rdeg = recip.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_recip")
    )
    return (
        deg.join(rdeg, "src", "left")
        .select(
            F.col("src").alias("event_type"),
            "out_deg",
            F.coalesce("n_recip", F.lit(0)).cast("long").alias("n_recip"),
            F.expr("coalesce(n_recip, 0) * 1000000 div out_deg")
            .cast("long")
            .alias("recip_ppm"),
        )
    )


_SQL_RECIPROCITY = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
  FROM events
),
edges AS (
  SELECT DISTINCT src, event_type AS dst FROM seq
  WHERE src IS NOT NULL AND src <> event_type
),
recip AS (
  SELECT e.src, COUNT(*)::BIGINT AS n_recip
  FROM edges e
  WHERE EXISTS (SELECT 1 FROM edges r WHERE r.src = e.dst AND r.dst = e.src)
  GROUP BY e.src
),
deg AS (SELECT src, COUNT(*)::BIGINT AS out_deg FROM edges GROUP BY src)
SELECT d.src AS event_type, d.out_deg,
       COALESCE(r.n_recip, 0)::BIGINT AS n_recip,
       (COALESCE(r.n_recip, 0) * 1000000 // d.out_deg)::BIGINT AS recip_ppm
FROM deg d LEFT JOIN recip r ON r.src = d.src
"""

PENDING_QUERIES["graph_edge_reciprocity"] = graph_edge_reciprocity
PENDING_ORACLE["graph_edge_reciprocity"] = _SQL_RECIPROCITY


# --- Degree assortativity — PENDING round 7 -----------------------------------
#
# Newman's degree-mixing coefficient over the distinct transition graph: the
# Pearson correlation, across directed edges, between the OUT-degree of the
# edge's source and the IN-degree of its target. Positive r = hubs feed
# hubs; negative = hub-and-spoke funnels. Sufficient statistics are exact
# BIGINTs at edge grain; the only doubles are one IEEE-correctly-rounded
# sqrt and one division, floored once at milli grain (the autocorr-tail
# device). Degenerate variance → r = 0. Scale shape: two degree aggregates
# joined back to the edge list (broadcast — node-domain-sized for the type
# graph), one global sufficient-stats aggregate.

def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
        .persist()
    )
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("x"))
    ind = edges.groupBy("dst").agg(F.count(F.lit(1)).cast("long").alias("y"))
    e = edges.join(F.broadcast(outd), "src").join(F.broadcast(ind), "dst")
    m = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n_edges") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n_edges") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n_edges") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "n_edges",
        num.cast("long").alias("r_num"),
        d1.cast("long").alias("var_x"),
        d2.cast("long").alias("var_y"),
        F.when(
            (d1 > 0) & (d2 > 0),
            F.floor(
                num.cast("double")
                * F.lit(1000.0)
                / F.sqrt(d1.cast("double") * d2.cast("double"))
            ),
        ).otherwise(F.lit(0)).cast("long").alias("r_milli"),
    )


_SQL_ASSORTATIVITY = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
  FROM events
),
edges AS (
  SELECT DISTINCT src, event_type AS dst FROM seq
  WHERE src IS NOT NULL AND src <> event_type
),
outd AS (SELECT src, COUNT(*)::BIGINT AS x FROM edges GROUP BY src),
ind AS (SELECT dst, COUNT(*)::BIGINT AS y FROM edges GROUP BY dst),
m AS (
  SELECT COUNT(*)::BIGINT AS n_edges,
         SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
         SUM(x * y)::BIGINT AS sxy,
         SUM(x * x)::BIGINT AS sxx, SUM(y * y)::BIGINT AS syy
  FROM edges JOIN outd USING (src) JOIN ind USING (dst)
)
SELECT n_edges,
       (n_edges * sxy - sx * sy)::BIGINT AS r_num,
       (n_edges * sxx - sx * sx)::BIGINT AS var_x,
       (n_edges * syy - sy * sy)::BIGINT AS var_y,
       CASE WHEN n_edges * sxx - sx * sx > 0 AND n_edges * syy - sy * sy > 0
            THEN FLOOR(CAST(n_edges * sxy - sx * sy AS DOUBLE) * 1000.0
                       / sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE)
                              * CAST(n_edges * syy - sy * sy AS DOUBLE)))
            ELSE 0 END::BIGINT AS r_milli
FROM m
"""

PENDING_QUERIES["graph_degree_assortativity"] = graph_degree_assortativity
PENDING_ORACLE["graph_degree_assortativity"] = _SQL_ASSORTATIVITY


# --- Local clustering coefficient — PENDING round 7 ----------------------------
#
# The canonical ratio the triangle counts imply but never state: per node,
# C = 2·T / (d·(d−1)) over the UNDIRECTED distinct transition graph — how
# close each type's neighborhood is to a clique, in floored ppm (d < 2 →
# 0). Triangle counting reuses the oriented wedge-closure device of
# graph_triangle_types verbatim; the undirected degree is one aggregate
# over the symmetrized edge list. Scale shape: identical to the triangle
# row (wedge join bounded by neighbor lists) plus one degree aggregate and
# a node-grain join.

def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    tri = graph_triangle_types(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    und = pairs.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("event_type"))
        .unionByName(und.select(F.col("b").alias("event_type")))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    return tri.join(deg, "event_type").select(
        "event_type",
        "n_triangles",
        "d",
        F.expr(
            "CASE WHEN d < 2 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(2 * n_triangles * 1000000 div (d * (d - 1)) AS BIGINT) END"
        ).alias("cc_ppm"),
    )


_SQL_CLUSTERING_COEF = f"""
WITH tri AS ({_SQL_TRIANGLES}),
seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM seq WHERE src IS NOT NULL AND src <> dst
),
deg AS (
  SELECT event_type, COUNT(*)::BIGINT AS d FROM (
    SELECT a AS event_type FROM und UNION ALL SELECT b FROM und
  ) GROUP BY 1
)
SELECT t.event_type, t.n_triangles, deg.d,
       CASE WHEN deg.d < 2 THEN 0
            ELSE 2 * t.n_triangles * 1000000 // (deg.d * (deg.d - 1))
       END::BIGINT AS cc_ppm
FROM tri t JOIN deg USING (event_type)
"""

PENDING_QUERIES["graph_clustering_coefficient"] = graph_clustering_coefficient
PENDING_ORACLE["graph_clustering_coefficient"] = _SQL_CLUSTERING_COEF


# --- All-pairs distance profile — PENDING round 7 -------------------------------
#
# Eccentricity / closeness over the undirected distinct transition graph:
# APSP by min-plus DOUBLING — d_{t+1}(a,c) = min(d_t(a,c),
# min_b d_t(a,b) + d_t(b,c)) — so APSP_ROUNDS = 3 rounds cover any diameter
# ≤ 2³ (unrolled identically in the oracle, the kcore/PR convention).
# Per node: eccentricity (max finite distance), closeness as mean distance
# in milli-hops over REACHABLE other nodes (unreachable pairs simply never
# appear — stated), and the reachable count. All integers. Scale shape:
# each round is one self-join + min-combine keyed on the node domain —
# the bounded type graph here; on a billion-node graph the same plan is the
# standard log-diameter min-plus schedule.

APSP_ROUNDS = 3


def graph_distance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    und = pairs.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    # collected-model min-plus squaring (graph_hits_types contract, r13):
    # the undirected |types|² distance matrix doubles its horizon per
    # round on exact Python ints — same MIN-combine, same APSP_ROUNDS
    urows = und.collect()
    UE = [(r["a"], r["b"]) for r in urows]
    ts = sorted({a for a, _ in UE} | {b for _, b in UE})
    d: dict = {(t, t): 0 for t in ts}
    for a, b in UE:
        d[(a, b)] = 1
        d[(b, a)] = 1
    for _ in range(APSP_ROUNDS):
        nd = dict(d)
        for (xa, xb), xd in d.items():
            for (ya, yb), yd in d.items():
                if xb == ya:
                    k = (xa, yb)
                    s = xd + yd
                    if k not in nd or s < nd[k]:
                        nd[k] = s
        d = nd
    per: dict = {}
    for (a, b), dist in d.items():
        if a == b:
            continue
        n, mx, sm = per.get(a, (0, 0, 0))
        per[a] = (n + 1, max(mx, dist), sm + dist)
    return spark.createDataFrame(
        [(a, n, mx, (sm * 1000) // n) for a, (n, mx, sm) in sorted(per.items())],
        "event_type string, n_reachable long, eccentricity long, mean_dist_milli long",
    )


def _sql_apsp_round(t: int) -> str:
    return f"""
d{t + 1} AS (
  SELECT a, b, MIN(d) AS d FROM (
    SELECT a, b, d FROM d{t}
    UNION ALL
    SELECT x.a, y.b, x.d + y.d AS d
    FROM d{t} x JOIN d{t} y ON x.b = y.a
  ) GROUP BY a, b
)"""


_SQL_DISTANCE_PROFILE = (
    """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM seq WHERE src IS NOT NULL AND src <> dst
),
edges AS (
  SELECT a, b, 1::BIGINT AS d FROM und
  UNION ALL
  SELECT b, a, 1::BIGINT FROM und
),
d0 AS (
  SELECT a, b, MIN(d) AS d FROM (
    SELECT DISTINCT a, a AS b, 0::BIGINT AS d FROM edges
    UNION ALL
    SELECT a, b, d FROM edges
  ) GROUP BY a, b
),"""
    + ",".join(_sql_apsp_round(t) for t in range(APSP_ROUNDS))
    + f"""
SELECT a AS event_type,
       COUNT(*)::BIGINT AS n_reachable,
       MAX(d)::BIGINT AS eccentricity,
       (SUM(d) * 1000 // COUNT(*))::BIGINT AS mean_dist_milli
FROM d{APSP_ROUNDS}
WHERE a <> b
GROUP BY a
"""
)

PENDING_QUERIES["graph_distance_profile"] = graph_distance_profile
PENDING_ORACLE["graph_distance_profile"] = _SQL_DISTANCE_PROFILE


# --- Round-7 registration wave 1 ------------------------------------------
# Flip these pending rows into the driver contract: the r6 green rows freed
# window slots (rotation policy in COVERAGE.md; order in
# queries/__init__._WINDOW_FRONT). The functions above are unchanged — the
# flip only moves the (query, oracle) pair between registries.
_REGISTER_WAVE1 = (
    "graph_modularity_report",
    "graph_transition_entropy",
    "graph_hits_types",
)
for _n in _REGISTER_WAVE1:
    QUERIES[_n] = PENDING_QUERIES.pop(_n)
    ORACLE[_n] = PENDING_ORACLE.pop(_n)
del _n


# --- personalized PageRank — PENDING round 8+ ---------------------------------
#
# Topic-sensitive / personalized PageRank (Haveliwala 2002): the random
# surfer RESTARTS at a seed node instead of uniformly, giving proximity-
# to-seed scores — the link-analysis primitive behind related-item and
# local-community queries, and a genuinely different fixpoint from the
# registered uniform PageRank (same damping, different restart vector).
# Identical integer discipline: nano-unit ranks, truncating per-edge
# splits, FLOOR once per round on the damped sum; the restart mass goes
# whole to the seed. Same Pregel shape (keyed join + keyed agg per
# round); the oracle unrolls rounds as CTEs exactly like the uniform row.

PPR_SEED = "purchase"


def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    # collected-model fixpoint, same contract and arithmetic notes as
    # graph_pagerank_types (r13): restart mass goes whole to the seed
    erows = edges.collect()
    E = [(r["src"], r["dst"], int(r["w"])) for r in erows]
    ts = sorted({s for s, _, _ in E} | {d for _, d, _ in E})
    wout: dict = {}
    for s, _, w in E:
        wout[s] = wout.get(s, 0) + w
    base = int(math.floor((1.0 - PR_DAMP) * PR_SCALE))
    ranks = {t: (PR_SCALE if t == PPR_SEED else 0) for t in ts}
    for _ in range(PR_ITERS):
        sums = {t: 0 for t in ts}
        for s, d, w in E:
            sums[d] += (ranks[s] * w) // wout[s]
        ranks = {
            t: (base if t == PPR_SEED else 0)
            + int(math.floor(PR_DAMP * float(sums[t])))
            for t in ts
        }
    return spark.createDataFrame(
        [(t, ranks[t]) for t in ts], "event_type string, ppr_nano long"
    )


def _sql_ppr_round(i: int) -> str:
    return f"""
pcontrib{i} AS (
  SELECT e.dst AS t, (r.r * e.w) // e.wout AS c
  FROM e2 e JOIN pr{i} r ON r.t = e.src
),
psums{i} AS (SELECT t, SUM(c) AS s FROM pcontrib{i} GROUP BY t),
pr{i + 1} AS (
  SELECT n.t,
         CAST((CASE WHEN n.t = '{PPR_SEED}' THEN {int(math.floor((1.0 - PR_DAMP) * PR_SCALE))} ELSE 0 END)
              + FLOOR({PR_DAMP!r} * CAST(COALESCE(s.s, 0) AS DOUBLE)) AS BIGINT) AS r
  FROM nodes n LEFT JOIN psums{i} s ON s.t = n.t
)"""


_SQL_PPR = (
    f"""
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst, COUNT(*) AS w FROM seq WHERE src IS NOT NULL GROUP BY src, dst
),
nodes AS (
  SELECT DISTINCT t FROM (SELECT src AS t FROM edges UNION ALL SELECT dst FROM edges)
),
outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY src),
e2 AS (SELECT e.src, e.dst, e.w, o.wout FROM edges e JOIN outw o USING (src)),
pr0 AS (
  SELECT t, CAST(CASE WHEN t = '{PPR_SEED}' THEN {PR_SCALE} ELSE 0 END AS BIGINT) AS r
  FROM nodes
),"""
    + ",".join(_sql_ppr_round(i) for i in range(PR_ITERS))
    + f"""
SELECT t AS event_type, r AS ppr_nano FROM pr{PR_ITERS}
"""
)

PENDING_QUERIES["graph_personalized_pagerank"] = graph_personalized_pagerank
PENDING_ORACLE["graph_personalized_pagerank"] = _SQL_PPR


# --- Markov stationary distribution — PENDING round 8+ -------------------------
#
# The equilibrium diagnostic for the event-type Markov chain: power-
# iterate the ROW-STOCHASTIC transition matrix (no damping, no restart —
# the third fixpoint flavor after PageRank's damped-uniform and PPR's
# damped-seed) from the uniform vector, and report the stationary mass
# next to the EMPIRICAL type share. If the observed stream were generated
# by its own transition matrix at equilibrium, the two agree; the gap per
# type localizes non-stationarity (ramping types, session-boundary
# artifacts). Integer nano-units; each round's per-edge truncating split
# leaks < out_degree nano per node (bounded, law-pinned as mass
# conservation within n_nodes·|edges| nano per round). Same unrolled-CTE
# oracle device as the sibling fixpoints.

MARKOV_ITERS = 8


def graph_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    # collected-model fixpoint (graph_hits_types / pagerank contract, r13):
    # pure integer power-iteration on the |types|² edge table
    erows = edges.collect()
    E = [(r["src"], r["dst"], int(r["w"])) for r in erows]
    ts = sorted({s for s, _, _ in E} | {d for _, d, _ in E})
    wout: dict = {}
    for s, _, w in E:
        wout[s] = wout.get(s, 0) + w
    n_nodes = len(ts)
    ranks = {t: PR_SCALE // n_nodes for t in ts}
    for _ in range(MARKOV_ITERS):
        sums = {t: 0 for t in ts}
        for s, d, w in E:
            sums[d] += (ranks[s] * w) // wout[s]
        ranks = sums
    rdf = spark.createDataFrame(
        [(t, ranks[t]) for t in ts], "t string, r long"
    )
    emp = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = emp.agg(F.sum("cnt").cast("long").alias("tot"))
    emp2 = emp.crossJoin(F.broadcast(tot)).select(
        "t", F.expr("cnt * 1000000000 div tot").cast("long").alias("empirical_nano")
    )
    return F.broadcast(rdf).join(emp2, "t").select(
        F.col("t").alias("event_type"),
        F.col("r").alias("stationary_nano"),
        "empirical_nano",
        F.abs(F.col("r") - F.col("empirical_nano")).cast("long").alias(
            "equilibrium_gap_nano"
        ),
    )


def _sql_markov_round(i: int) -> str:
    return f"""
mcontrib{i} AS (
  SELECT e.dst AS t, (r.r * e.w) // e.wout AS c
  FROM e2 e JOIN mr{i} r ON r.t = e.src
),
mr{i + 1} AS (
  SELECT n.t, CAST(COALESCE(s.s, 0) AS BIGINT) AS r
  FROM nodes n LEFT JOIN (SELECT t, SUM(c) AS s FROM mcontrib{i} GROUP BY t) s
    ON s.t = n.t
)"""


_SQL_MARKOV = (
    f"""
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst, COUNT(*) AS w FROM seq WHERE src IS NOT NULL GROUP BY src, dst
),
nodes AS (
  SELECT DISTINCT t FROM (SELECT src AS t FROM edges UNION ALL SELECT dst FROM edges)
),
outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY src),
e2 AS (SELECT e.src, e.dst, e.w, o.wout FROM edges e JOIN outw o USING (src)),
nv AS (SELECT COUNT(*) AS n FROM nodes),
mr0 AS (
  SELECT t, CAST({PR_SCALE} // n AS BIGINT) AS r FROM nodes CROSS JOIN nv
),"""
    + ",".join(_sql_markov_round(i) for i in range(MARKOV_ITERS))
    + f"""
, emp AS (
  SELECT event_type AS t, COUNT(*)::BIGINT AS cnt FROM events GROUP BY event_type
),
emp2 AS (
  SELECT t, (cnt * 1000000000 // (SELECT SUM(cnt) FROM emp))::BIGINT AS empirical_nano
  FROM emp
)
SELECT r.t AS event_type,
       r.r AS stationary_nano,
       e.empirical_nano,
       abs(r.r - e.empirical_nano)::BIGINT AS equilibrium_gap_nano
FROM mr{MARKOV_ITERS} r JOIN emp2 e USING (t)
"""
)

PENDING_QUERIES["graph_markov_stationary"] = graph_markov_stationary
PENDING_ORACLE["graph_markov_stationary"] = _SQL_MARKOV


# --- Round-8 registration: the whole pending layer flips in ----------------
# VERDICT r7 #1: the driver's 50-row window gates which rows get CHECKED per
# round, not how many may be REGISTERED — holding locally hash-verified
# operators out of the contract understates coverage and risks rows never
# receiving a driver row. Window order lives in queries/__init__.
flip_pending(PENDING_QUERIES, PENDING_ORACLE, QUERIES, ORACLE)


# --- Bipartite audience projection — round 10 -----------------------------------
#
# The user-type bipartite graph projected onto types: two event types are
# linked by the users who engage with BOTH, weighted by the overlap
# coefficient |A∩B| / min(|A|,|B|) and Jaccard — AUDIENCE similarity, the
# orthogonal axis to graph_neighbor_jaccard (which scores structural
# similarity of out-neighbor sets in the time-ordered transition graph;
# this projection ignores order entirely). The classic bipartite-projection
# shape recommender and cannibalization analyses start from.
#
# Scale shape: the inverted-list device — one distinct (user, type) scan,
# the self-join fans out per user by their type count (bounded by |types|,
# the co-occurrence contract), per-type audience sizes broadcast back at
# pair grain; output is |types|^2/2-bounded. Integer-ppm weights.

def graph_type_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ut = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .persist()
    )
    deg = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("aud"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("co_users"))
    )
    da = deg.select(F.col("event_type").alias("type_a"), F.col("aud").alias("aud_a"))
    db = deg.select(F.col("event_type").alias("type_b"), F.col("aud").alias("aud_b"))
    return (
        co.join(F.broadcast(da), "type_a")
        .join(F.broadcast(db), "type_b")
        .select(
            "type_a", "type_b", "co_users", "aud_a", "aud_b",
            F.expr("co_users * 1000000 div least(aud_a, aud_b)").cast("long")
            .alias("overlap_ppm"),
            F.expr("co_users * 1000000 div (aud_a + aud_b - co_users)").cast("long")
            .alias("jaccard_ppm"),
        )
    )


_SQL_AUDIENCE_OVERLAP = """
WITH ut AS MATERIALIZED (
  SELECT DISTINCT user_id, event_type FROM events
),
deg AS (SELECT event_type, COUNT(*)::BIGINT AS aud FROM ut GROUP BY 1),
co AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*)::BIGINT AS co_users
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, co_users,
       da.aud AS aud_a, db.aud AS aud_b,
       (co_users * 1000000 // LEAST(da.aud, db.aud))::BIGINT AS overlap_ppm,
       (co_users * 1000000 // (da.aud + db.aud - co_users))::BIGINT AS jaccard_ppm
FROM co
JOIN deg da ON da.event_type = type_a
JOIN deg db ON db.event_type = type_b
"""

QUERIES["graph_type_audience_overlap"] = graph_type_audience_overlap
ORACLE["graph_type_audience_overlap"] = _SQL_AUDIENCE_OVERLAP


# --- Rich-club profile — round 11 ------------------------------------------------
#
# The hierarchy detector the degree/assortativity rows circle around
# (Zhou & Mondragon 2004; Colizza et al. 2006): order nodes by strength
# (weighted degree) and, for every club size r, measure how densely the
# top-r nodes connect AMONG THEMSELVES. A rising density profile means
# the hubs form a core that routes most traffic (a rich club); a flat one
# means hubs attach to the periphery (no core). Computed cumulatively:
# each undirected edge belongs to every club from max(rank_a, rank_b)
# up, so one rollup keyed on that max plus a running sum yields the whole
# profile — never one pass per club size. density_ppm is exact integers
# against the r*(r-1)/2 possible club edges.
#
# Scale shape: edges from the house transition-pair window; the rank
# table is node-bounded and broadcast to both endpoints; the profile is
# one |nodes|-row cumulative window. On a billion-edge graph the same
# plan holds — the only per-edge work is two broadcast lookups and one
# grouped sum.

def graph_rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    # fences: und feeds the strength fold AND the endpoint-rank join (and
    # its strength derivation reads it twice via the union); ranks feeds
    # both endpoints plus the profile spine — unfenced, the events scan +
    # transition window re-derive per branch (first cut: 21 shuffles /
    # 7 scans for a |nodes|-row report)
    und = pairs.groupBy(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("w")).localCheckpoint(eager=True)
    strength = (
        und.select(F.col("a").alias("t"), "w")
        .unionByName(und.select(F.col("b").alias("t"), "w"))
        .groupBy("t")
        .agg(F.sum("w").cast("long").alias("s"))
    )
    ranks = strength.select(
        "t", "s",
        F.row_number().over(Window.orderBy(F.desc("s"), F.asc("t")))
        .cast("long").alias("r"),
    ).localCheckpoint(eager=True)
    ra = ranks.select(F.col("t").alias("a"), F.col("r").alias("ra"))
    rb = ranks.select(F.col("t").alias("b"), F.col("r").alias("rb"))
    bym = (
        und.join(F.broadcast(ra), "a")
        .join(F.broadcast(rb), "b")
        .groupBy(F.greatest("ra", "rb").alias("m"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("e"),
            F.sum("w").cast("long").alias("wsum"),
        )
    )
    profile = ranks.select(F.col("r").alias("club_size"), "t", "s").join(
        bym, F.col("club_size") == F.col("m"), "left"
    )
    wc = Window.orderBy("club_size").rowsBetween(Window.unboundedPreceding, 0)
    cum = profile.select(
        "club_size",
        F.col("t").alias("entrant"),
        F.col("s").alias("entrant_strength"),
        F.sum(F.coalesce(F.col("e"), F.lit(0))).over(wc).cast("long")
        .alias("internal_edges"),
        F.sum(F.coalesce(F.col("wsum"), F.lit(0))).over(wc).cast("long")
        .alias("internal_weight"),
    )
    return cum.filter(F.col("club_size") >= 2).select(
        "club_size", "entrant", "entrant_strength", "internal_edges",
        "internal_weight",
        F.expr(
            "internal_edges * 2 * 1000000 div (club_size * (club_size - 1))"
        ).cast("long").alias("density_ppm"),
    )


_SQL_RICH_CLUB = """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
und AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, COUNT(*)::BIGINT AS w
  FROM seq WHERE src IS NOT NULL AND src <> dst
  GROUP BY 1, 2
),
strength AS (
  SELECT t, SUM(w)::BIGINT AS s FROM (
    SELECT a AS t, w FROM und UNION ALL SELECT b AS t, w FROM und
  ) GROUP BY t
),
ranks AS (
  SELECT t, s, row_number() OVER (ORDER BY s DESC, t)::BIGINT AS r FROM strength
),
bym AS (
  SELECT GREATEST(ra.r, rb.r) AS m, COUNT(*)::BIGINT AS e, SUM(und.w)::BIGINT AS wsum
  FROM und JOIN ranks ra ON ra.t = und.a JOIN ranks rb ON rb.t = und.b
  GROUP BY 1
),
cum AS (
  SELECT ranks.r AS club_size, ranks.t AS entrant, ranks.s AS entrant_strength,
         SUM(COALESCE(bym.e, 0)) OVER (ORDER BY ranks.r
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS internal_edges,
         SUM(COALESCE(bym.wsum, 0)) OVER (ORDER BY ranks.r
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS internal_weight
  FROM ranks LEFT JOIN bym ON bym.m = ranks.r
)
SELECT club_size, entrant, entrant_strength, internal_edges, internal_weight,
       (internal_edges * 2 * 1000000 // (club_size * (club_size - 1)))::BIGINT
         AS density_ppm
FROM cum WHERE club_size >= 2
"""

QUERIES["graph_rich_club_coefficient"] = graph_rich_club_coefficient
ORACLE["graph_rich_club_coefficient"] = _SQL_RICH_CLUB
