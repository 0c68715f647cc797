"""PCA top principal component by integer power iteration — the iterative
LINEAR-ALGEBRA family member next to k-means (vector quantization), BPE
(merge learning), and PageRank (spectral ranking): the dominant direction
of the embedding cloud, the statistic behind whitening, ABTT-style
common-direction removal (Mu & Viswanath 2018), and drift monitoring of an
embedding pipeline.

Integer-exact cross-engine discipline (no float sums anywhere):
- components quantize ONCE to milli-units (floor(x·1000 + 0.5), the one
  shared IEEE step, identical in both engines);
- the mean is an integer TRUNCATING division (Spark ``div``, DuckDB
  ``//``, and a sign-aware helper in the driver loop — all three truncate
  toward zero for either sign; verified, since Python ``//`` floors);
- the covariance is an exact integer sum of bounded products
  (|c| ≤ 2·10³ ⇒ per-term ≤ 4·10⁶ — int64-safe up to ~2·10¹² rows), then
  trunc-scaled by n so its magnitude is row-count-free;
- each power-iteration round is w = C·v in pure int64 (≤ 64·4·10⁶·10⁶ ≈
  2.6·10¹⁴), down-shifted by 2²⁰ and renormalized to ±10⁶ by truncating
  division against max|w| — deterministic rescaling, no sqrt, no norm.

Scale shape: the ONLY corpus-proportional stage is the covariance build
(an i-keyed self-join exploding dim² products per row — the canonical
X·Xᵀ partial-aggregation plan, combiner-friendly on (j,k)). Everything
after runs on the 64²-cell matrix; per-round driver state is the 64-entry
vector (the k-means/BPE model contract). The oracle unrolls PCA_ITERS
rounds as CTEs with max|w| cross-joined as a scalar, exactly the PageRank
oracle device.

Reference tie-in: none (survey §2.13 extension; the reference has no
vector surface at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table

PCA_DIM = 64
PCA_ITERS = 8  # flat synthetic spectra converge slowly; 8 rounds reach
# Rayleigh quotient >= 0.95 lambda_1 on the fixtures (test-pinned). On real
# embedding data with a dominant direction fewer rounds suffice.
_V_SCALE = 1_000_000
_W_SHIFT = 1 << 20


def _tdiv_py(a: int, b: int) -> int:
    """Truncate-toward-zero division (b > 0) — matches Spark ``div`` and
    DuckDB ``//``; Python's ``//`` floors, so negative numerators differ."""
    return -((-a) // b) if a < 0 else a // b


def _centered(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, int]:
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("i"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    xi = emb.select(
        "i",
        F.posexplode("e").alias("j", "x"),
    ).select("i", "j", F.floor(F.col("x") * 1000 + F.lit(0.5)).cast("long").alias("x"))
    n = xi.select("i").distinct().count()  # scalar: row count
    mu = xi.groupBy("j").agg(F.sum("x").alias("sx")).select(
        "j", F.expr(f"sx div {n}").cast("long").alias("mu")
    )
    cen = xi.join(F.broadcast(mu), "j").select(
        "i", "j", (F.col("x") - F.col("mu")).alias("c")
    )
    return cen, n


def _cov_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C'_jk = trunc(Σ_i c_ij·c_ik / n) — the 64×64 integer matrix."""
    from pyspark import StorageLevel

    cen, n = _centered(spark, sf_dir)
    a = cen.alias("a")
    b = cen.select(
        F.col("i"), F.col("j").alias("k"), F.col("c").alias("c2")
    ).alias("b")
    cov = (
        a.join(b, "i")
        .groupBy("j", "k")
        .agg(F.sum(F.col("c") * F.col("c2")).alias("cjk0"))
        .select("j", "k", F.expr(f"cjk0 div {n}").cast("long").alias("cjk"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return cov


def embedding_pca_topcomponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    cov = _cov_scaled(spark, sf_dir)
    v = [(_V_SCALE if j == 0 else 0) for j in range(PCA_DIM)]
    for _ in range(PCA_ITERS):
        vmap = "map(" + ", ".join(f"{k}, {v[k]}" for k in range(PCA_DIM)) + ")"
        rows = (
            cov.withColumn("vk", F.element_at(F.expr(vmap), F.col("k").cast("int")))
            .groupBy("j")
            .agg(F.sum(F.col("cjk") * F.col("vk")).alias("w"))
            .collect()
        )  # model-sized collect: 64 scalars per round (k-means contract)
        w = {int(r.j): int(r.w) for r in rows}
        wr = {j: _tdiv_py(w.get(j, 0), _W_SHIFT) for j in range(PCA_DIM)}
        m = max(1, max(abs(x) for x in wr.values()))
        v = [_tdiv_py(wr[j] * _V_SCALE, m) for j in range(PCA_DIM)]
    out = spark.createDataFrame(
        [(j, v[j]) for j in range(PCA_DIM)], "dim long, v_micro long"
    )
    return out


def _sql_round(t: int) -> str:
    return f"""
w{t} AS (
  SELECT c.j, SUM(c.cjk * v.v) AS w
  FROM covp c JOIN v{t} v ON v.j = c.k GROUP BY c.j
),
wr{t} AS (SELECT j, w // {_W_SHIFT} AS wr FROM w{t}),
m{t} AS (SELECT GREATEST(1, MAX(ABS(wr))) AS m FROM wr{t}),
v{t + 1} AS (
  SELECT j, (wr * {_V_SCALE}) // m AS v FROM wr{t} CROSS JOIN m{t}
)"""


_SQL_PCA = (
    f"""
WITH xi AS (
  SELECT vec_id AS i, j,
         CAST(FLOOR(CAST(embedding[j + 1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM (SELECT vec_id, embedding, unnest(range(0, {PCA_DIM})) AS j FROM embeddings)
),
nv AS (SELECT COUNT(*) AS n FROM embeddings),
mu AS (SELECT j, SUM(x) // n AS mu FROM xi CROSS JOIN nv GROUP BY j, n),
cen AS (SELECT x.i, x.j, x.x - m.mu AS c FROM xi x JOIN mu m ON m.j = x.j),
cov AS (
  SELECT a.j, b.j AS k, SUM(a.c * b.c) AS cjk
  FROM cen a JOIN cen b ON a.i = b.i GROUP BY a.j, b.j
),
covp AS MATERIALIZED (SELECT j, k, cjk // n AS cjk FROM cov CROSS JOIN nv),
v0 AS (
  SELECT j, CAST(CASE WHEN j = 0 THEN {_V_SCALE} ELSE 0 END AS BIGINT) AS v
  FROM (SELECT DISTINCT j FROM mu)
),"""
    + ",".join(_sql_round(t) for t in range(PCA_ITERS))
    + f"""
SELECT CAST(j AS BIGINT) AS dim, CAST(v AS BIGINT) AS v_micro FROM v{PCA_ITERS}
"""
)

QUERIES = {"embedding_pca_topcomponent": embedding_pca_topcomponent}
ORACLE = {"embedding_pca_topcomponent": _SQL_PCA}
