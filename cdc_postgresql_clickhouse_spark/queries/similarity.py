"""Similarity search over the ``embeddings`` table (64-dim float vectors),
with DuckDB oracles: brute-force cosine top-k (the exactness baseline) and
random-hyperplane LSH bucketing (the scale path), plus embedding-cosine
near-duplicate detection for the dedup suite.

Cross-engine float determinism: embeddings are cast float→double (exact),
dot products are left-to-right addition chains built identically on both
sides, and every similarity is ROUND(x, 6) before compare/threshold/rank —
double noise is ~1e-15, six decimals is far coarser.

LSH hyperplanes: ±1 weights derived from md5 in *Python at module load* and
baked as literals into both the Spark expression tree and the generated
oracle SQL — no joins, no per-row hashing, and the plans stay pure projection.

Scale notes: brute-force is O(queries × corpus) — the query set is a fixed
predicate (vec_id % 100 == 0) so cost grows linearly, not quadratically, with
the corpus; the LSH variant buckets first so pair generation is bounded by
bucket occupancy. Both are shuffle-light: one broadcast of the query side,
one groupBy per ranking.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_postgresql_clickhouse_spark.sources.registry import load_table

DIM = 64
N_PLANES = 8
NEARDUP_IDS = 200
DERIVED_OFFSET = 1_000_000


def _plane_weights() -> list[list[int]]:
    """Deterministic ±1 hyperplane weights from md5 (public knowledge:
    random-hyperplane LSH, Charikar 2002)."""
    ws = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            nib = int(hashlib.md5(f"p_{p}_{d}".encode()).hexdigest()[0], 16)
            row.append(1 if nib >= 8 else -1)
        ws.append(row)
    return ws


PLANES = _plane_weights()


def _emb_d(col: str = "embedding") -> Column:
    return F.col(col).cast("array<double>")


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold — same order as the SQL '+' chain."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _cos(a: Column, b: Column) -> Column:
    # FLOOR-truncate at 6 decimals: bit-identical across engines on identical
    # doubles, unlike ROUND (engines disagree on exact boundary digits).
    raw = _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))
    return F.floor(raw * F.lit(1000000.0)).cast("double") / F.lit(1000000.0)


def _cos_prenorm(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine from precomputed L2 norms. Per-PAIR work drops from three
    64-dim dot products to one — the norms are map-side, once per vector,
    before the pair join multiplies rows. na*nb is the same float product as
    sqrt(dot(a,a))*sqrt(dot(b,b)), so results are bit-identical to _cos and
    the oracle SQL (which still spells out all three dots) stays valid."""
    raw = _dot(a, b) / (na * nb)
    return F.floor(raw * F.lit(1000000.0)).cast("double") / F.lit(1000000.0)


def _norm(e: Column) -> Column:
    return F.sqrt(_dot(e, e))


# --- SQL twins -------------------------------------------------------------

_SQL_EMB = "CAST(embedding AS DOUBLE[])"


def _sql_dot(a: str, b: str) -> str:
    return "(" + " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(1, DIM + 1)) + ")"


def _sql_cos(a: str, b: str) -> str:
    raw = f"{_sql_dot(a, b)} / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)}))"
    return f"(CAST(FLOOR(({raw}) * 1000000.0) AS DOUBLE) / 1000000.0)"


def _sql_proj(p: int, vec: str) -> str:
    return "(" + " + ".join(f"({w}.0 * {vec}[{i + 1}])" for i, w in enumerate(PLANES[p])) + ")"


def _sql_bucket(vec: str) -> str:
    return (
        "("
        + " + ".join(f"(CASE WHEN {_sql_proj(p, vec)} > 0 THEN {1 << p} ELSE 0 END)" for p in range(N_PLANES))
        + ")"
    )


def _spark_proj_sql(p: int, vec: str) -> str:
    # flat sum, same association order as the DuckDB twin in _sql_proj
    return "(" + " + ".join(f"({w}.0D * element_at({vec}, {i + 1}))" for i, w in enumerate(PLANES[p])) + ")"


def _spark_bucket(vec_name: str) -> Column:
    """8-plane sign bucket as ONE parsed SQL expression. The equivalent
    nested-Column construction is ~4k Py4J calls (512 terms × 8 planes) and
    dominated wall-clock for this query's driver-side plan build."""
    bits = " + ".join(
        f"(CASE WHEN {_spark_proj_sql(p, vec_name)} > 0.0D THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return F.expr(f"CAST(({bits}) AS BIGINT)")


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for every 100th vector: broadcast the query side,
    scan the corpus once, per-query heap via ranked window."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_d().alias("e"), _norm(_emb_d()).alias("nrm")
    )
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    pairs = F.broadcast(q).join(emb, F.col("q_id") != F.col("vec_id"))
    scored = pairs.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        _cos_prenorm(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8-bit bucket per vector, then exact cosine only
    within buckets — the O(n²)-avoiding scale path."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", _emb_d().alias("e"))
    from pyspark import StorageLevel

    bucketed = emb.select(
        "vec_id", "e", _spark_bucket("e").alias("bucket"), _norm(F.col("e")).alias("nrm")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # persisted: the 512-term bucket projection and the norm are computed once
    # per vector, not once per self-join side / per pair
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.bucket").alias("bucket"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _cos_prenorm(F.col("a.e"), F.col("b.e"), F.col("a.nrm"), F.col("b.nrm")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.2)
    )


def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection: base vectors (vec_id < 200) plus derived
    affine-perturbed copies; pairs with cosine ≥ 0.8. All-pairs on the
    bounded sub-corpus (the verify stage; LSH is the candidate stage)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", _emb_d().alias("e"))
    base = emb.filter(F.col("vec_id") < NEARDUP_IDS)
    derived = base.select(
        (F.col("vec_id") + DERIVED_OFFSET).alias("vec_id"),
        F.transform(F.col("e"), lambda x: x * 0.9 + 0.01).alias("e"),
    )
    from pyspark import StorageLevel

    corpus = (
        base.unionByName(derived)
        .withColumn("nrm", _norm(F.col("e")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = corpus.alias("a"), corpus.alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _cos_prenorm(F.col("a.e"), F.col("b.e"), F.col("a.nrm"), F.col("b.nrm")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.8)
    )


N_CENTROIDS = 16
N_PROBE = 2


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: coarse quantizer → inverted lists → probe.

    The coarse quantizer is the first N_CENTROIDS vectors (deterministic
    seed centroids; production would k-means these — the *index structure*
    is identical). Every vector is assigned to its nearest centroid by
    cosine (argmax with centroid-id tie-break) = the inverted lists; a query
    probes its N_PROBE nearest centroids and ranks only those lists'
    vectors — the corpus scan per query drops from O(n) to
    O(n·nprobe/n_centroids).

    Scale shape: assignment is a broadcast (16 centroids) cross-score — one
    map-side pass; the probe join is keyed on centroid id, so at 100 TB the
    inverted lists are just a table bucketed by cid. No O(n²) anywhere."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_d().alias("e"), _norm(_emb_d()).alias("nrm")
    )
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )
    scored = F.broadcast(cents).join(emb, how="cross").select(
        "vec_id",
        "cid",
        _cos_prenorm(F.col("e"), F.col("ce"), F.col("nrm"), F.col("cn")).alias("cs"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.col("cid"))
    ranked = scored.withColumn("rn", F.row_number().over(w_assign))
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
    probes = (
        ranked.filter((F.col("vec_id") % 100 == 0) & (F.col("rn") <= N_PROBE))
        .select(F.col("vec_id").alias("q_id"), "cid")
    )
    cand = F.broadcast(probes).join(assign, "cid").filter(F.col("q_id") != F.col("vec_id"))
    q_side = emb.select(F.col("vec_id").alias("q_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn"))
    pair = (
        cand.join(F.broadcast(q_side), "q_id")
        .join(emb, "vec_id")
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos_prenorm(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")).alias("cos_sim"),
        )
    )
    w_rank = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        pair.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 5)
        .select("q_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_buckets": ann_lsh_buckets,
    "ann_ivf_topk": ann_ivf_topk,
    "embedding_cosine_neardup": embedding_cosine_neardup,
}

ORACLE = {
    "ann_bruteforce_topk": f"""
WITH emb AS (SELECT vec_id, {_SQL_EMB} AS e FROM embeddings),
q AS (SELECT vec_id AS q_id, e AS qe FROM emb WHERE vec_id % 100 = 0),
scored AS (
  SELECT q_id, vec_id AS neighbor_id, {_sql_cos('qe', 'e')} AS cos_sim
  FROM q JOIN emb ON q_id <> vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
""",
    "ann_lsh_buckets": f"""
WITH emb AS (SELECT vec_id, {_SQL_EMB} AS e FROM embeddings),
bucketed AS (SELECT vec_id, e, CAST({_sql_bucket('e')} AS BIGINT) AS bucket FROM emb)
SELECT a.bucket AS bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_sql_cos('a.e', 'b.e')} AS cos_sim
FROM bucketed a
JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_sql_cos('a.e', 'b.e')} >= 0.2
""",
    "ann_ivf_topk": f"""
WITH emb AS (SELECT vec_id, {_SQL_EMB} AS e FROM embeddings),
cents AS (SELECT vec_id AS cid, e AS ce FROM emb WHERE vec_id < {N_CENTROIDS}),
assign_scored AS (
  SELECT vec_id, cid, {_sql_cos('e', 'ce')} AS cs,
         row_number() OVER (PARTITION BY vec_id ORDER BY {_sql_cos('e', 'ce')} DESC, cid) AS rn
  FROM emb CROSS JOIN cents
),
assign AS (SELECT vec_id, cid FROM assign_scored WHERE rn = 1),
probes AS (SELECT vec_id AS q_id, cid FROM assign_scored
           WHERE vec_id % 100 = 0 AND rn <= {N_PROBE}),
cand AS (
  SELECT p.q_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.q_id
),
pair AS (
  SELECT c.q_id, c.neighbor_id, {_sql_cos('q.e', 'n.e')} AS cos_sim
  FROM cand c
  JOIN emb q ON q.vec_id = c.q_id
  JOIN emb n ON n.vec_id = c.neighbor_id
)
SELECT q_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
       ORDER BY cos_sim DESC, neighbor_id) AS rank FROM pair)
WHERE rank <= 5
""",
    "embedding_cosine_neardup": f"""
WITH base AS (SELECT vec_id, {_SQL_EMB} AS e FROM embeddings WHERE vec_id < {NEARDUP_IDS}),
derived AS (SELECT vec_id + {DERIVED_OFFSET} AS vec_id,
                   list_transform(e, x -> x * 0.9 + 0.01) AS e FROM base),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM derived)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_sql_cos('a.e', 'b.e')} AS cos_sim
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE {_sql_cos('a.e', 'b.e')} >= 0.8
""",
}
