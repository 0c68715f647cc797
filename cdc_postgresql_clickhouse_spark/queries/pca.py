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

Scale shape: the ONLY corpus-proportional stage is the covariance build,
and it shuffles NO corpus data at all — outer products are built row-side
(nested transforms over the materialized centered array, flat long array
positions encoding (j,k)) and flow straight into the dim²-group partial
aggregation, so the only shuffle is 64² partials per task. The dim²-cell
matrix and the 64-entry iterate are MODEL-sized driver state (the k-means
k×dim contract), so the renormalized rounds run on exact driver integers.
The oracle unrolls PCA_ITERS rounds as CTEs with max|w| cross-joined as a
scalar, exactly the PageRank oracle device.

Reference tie-in: none (survey §2.13 extension; the reference has no
vector surface at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.queries._pending import flip_pending

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


# Upper-triangle position maps: flat pos p (row-major over pairs (j, k),
# k >= j) -> j and k, as one-shot literal lookup arrays (the _planes_lit
# lesson: one SQL string, one parse — never a per-element Py4J build).
_TRI_JK: list[tuple[int, int]] = [
    (j, k) for j in range(PCA_DIM) for k in range(j, PCA_DIM)
]
_TRI_J_ARR = "array(" + ",".join(str(j) for j, _ in _TRI_JK) + ")"
_TRI_K_ARR = "array(" + ",".join(str(k) for _, k in _TRI_JK) + ")"


def _cov_tri(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, int]:
    """(tri, n): tri holds C'_jk = trunc(Σ_i c_ij·c_ik / n) for the UPPER
    TRIANGLE k >= j only — C is symmetric and its cells are exact integer
    sums of per-row products (cj·ck = ck·cj termwise), so the mirror half
    is reconstructed loss-free by every consumer. Halves the dominant
    per-row product work (4096 -> 2080 interpreted multiplies) and the
    explode/aggregate row count behind it (guide §2.2: shuffle/aggregate
    fewer rows when the dropped half carries no information).

    Plan: the mean is one cheap agg whose 64 values ride back as literals
    (model-sized, the k-means contract); the outer products are then built
    ROW-SIDE (nested index-aware transforms over the embedding array) and
    flow straight into the (j, k) partial aggregation — one corpus scan,
    ONE shuffle of tri-size partials per task, and no i-keyed self-join
    (the earlier draft shuffled the full (i, j, x) explosion on i:
    dim²·n rows through a join for no information gain)."""
    from pyspark import StorageLevel

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    xi_arr = F.transform(
        "e", lambda x: F.floor(x * 1000 + F.lit(0.5)).cast("long")
    )
    n = emb.count()  # scalar: row count
    sums = emb.select(F.posexplode(xi_arr).alias("j", "x")).groupBy("j").agg(
        F.sum("x").alias("sx")
    )
    mu = {
        int(r.j): _tdiv_py(int(r.sx), n) for r in sums.collect()
    }  # model-sized collect: 64 means
    mu_arr = "array(" + ", ".join(str(mu[j]) for j in range(PCA_DIM)) + ")"
    cen_arr = F.expr(
        f"transform({_xi_sql_expr()}, (x, j) -> x - element_at({mu_arr}, j + 1))"
    )
    # materialize the centered array BEFORE the nested lambda: an array
    # expression referenced inside a lambda is re-evaluated per element
    # (no CSE across lambda boundaries — the same pitfall as shingling).
    # The flat product array carries (j, k) as its POSITION so the hot
    # path allocates plain longs, never structs; slice(ce, j+1, DIM-j)
    # restricts the inner pass to k >= j.
    ce = emb.select(cen_arr.alias("ce"))
    prods = F.expr(
        "flatten(transform(ce, (cj, j) -> "
        f"transform(slice(ce, j + 1, {PCA_DIM} - j), ck -> cj * ck)))"
    )
    tri = (
        ce.select(F.posexplode(prods).alias("pos", "p"))
        .groupBy("pos")
        .agg(F.sum("p").alias("cjk0"))
        .select(
            F.expr(f"element_at({_TRI_J_ARR}, pos + 1)").cast("long").alias("j"),
            F.expr(f"element_at({_TRI_K_ARR}, pos + 1)").cast("long").alias("k"),
            F.expr(f"cjk0 div {n}").cast("long").alias("cjk"),
        )
    )
    return tri, n


def _xi_sql_expr() -> str:
    """The milli-unit quantization as a SQL-text expression over column e
    (shared by the centered-array expression built in _cov_tri)."""
    return "transform(e, x -> cast(floor(x * 1000 + 0.5) as bigint))"


def top_component(spark: SparkSession, sf_dir: str) -> list[int]:
    """The converged iterate as driver integers — the model other
    operators (residual removal) compose."""
    tri, _n = _cov_tri(spark, sf_dir)
    # dim² cells = MODEL-sized (the k-means k×dim contract): one collect,
    # then the 8 renormalized matrix-vector rounds run on exact driver
    # integers — per-round Spark jobs over a 4096-row table would pay 8×
    # job-scheduling overhead to move model-sized data (measured: the
    # rounds, not the covariance scan, dominated wall-clock that way).
    # The mirror half of the symmetric C is filled driver-side: C_kj has
    # the identical integer value (termwise-commuted exact sum).
    C: dict[tuple[int, int], int] = {}
    for r in tri.collect():
        C[(int(r.j), int(r.k))] = int(r.cjk)
        C[(int(r.k), int(r.j))] = int(r.cjk)
    v = [(_V_SCALE if j == 0 else 0) for j in range(PCA_DIM)]
    for _ in range(PCA_ITERS):
        w = [
            sum(C.get((j, k), 0) * v[k] for k in range(PCA_DIM))
            for j in range(PCA_DIM)
        ]
        wr = [_tdiv_py(x, _W_SHIFT) for x in w]
        m = max(1, max(abs(x) for x in wr))
        v = [_tdiv_py(x * _V_SCALE, m) for x in wr]
    return v


def embedding_pca_topcomponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = top_component(spark, sf_dir)
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


# the covariance prelude (xi/nv/mu/cen/covp CTEs) is shared verbatim with
# the isotropy report below — one fragment, two oracles.
_SQL_COV_PRELUDE = f"""
WITH xi AS (
  SELECT vec_id AS i, j,
         CAST(FLOOR(CAST(embedding[j + 1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM (SELECT vec_id, embedding, unnest(range(0, {PCA_DIM})) AS j FROM embeddings)
),
nv AS (SELECT COUNT(*) AS n FROM embeddings),
mu AS MATERIALIZED (SELECT j, SUM(x) // n AS mu FROM xi CROSS JOIN nv GROUP BY j, n),
cen AS MATERIALIZED (SELECT x.i, x.j, x.x - m.mu AS c FROM xi x JOIN mu m ON m.j = x.j),
cov AS (
  SELECT a.j, b.j AS k, SUM(a.c * b.c) AS cjk
  FROM cen a JOIN cen b ON a.i = b.i GROUP BY a.j, b.j
),
covp AS MATERIALIZED (SELECT j, k, cjk // n AS cjk FROM cov CROSS JOIN nv)"""

_SQL_PCA = (
    _SQL_COV_PRELUDE
    + f""",
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


# --- common-direction removal report — PENDING round 7 ----------------------
#
# "All-but-the-top" (Mu & Viswanath 2018): embedding clouds concentrate
# energy in a few common directions that drown similarity signal;
# removing the top component is the standard post-processing. This row
# reports, per label, how much variance the top component carries —
# the diagnostic that decides whether removal is warranted. Exact
# integers throughout: per-row projection p = Σ c_j·v_j is int64-safe
# (≤ 2·10³·10⁶·64), the removed energy uses consistently DOWN-SHIFTED
# squares ((p div 2¹⁰)² div (v·v div 2²⁰)) so nothing overflows, and the
# share ships as integer PPM. The oracle re-derives v by nesting the
# FULL unrolled PCA SQL as a CTE (the modularity/recall-report device) —
# the report judges exactly the component the registered row ships.

_P_SHIFT = 1 << 10
_V2_SHIFT = 1 << 20


def embedding_pca_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    v = top_component(spark, sf_dir)
    v2s = max(1, _tdiv_py(sum(x * x for x in v), _V2_SHIFT))
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("e")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = emb.count()
    sums = emb.select(
        F.posexplode(F.expr(_xi_sql_expr())).alias("j", "x")
    ).groupBy("j").agg(F.sum("x").alias("sx"))
    mu = {int(r.j): _tdiv_py(int(r.sx), n) for r in sums.collect()}
    mu_arr = "array(" + ", ".join(str(mu[j]) for j in range(PCA_DIM)) + ")"
    ce = emb.select(
        "label",
        F.expr(
            f"transform({_xi_sql_expr()}, (x, j) -> x - element_at({mu_arr}, j + 1))"
        ).alias("ce"),
    )
    # Unrolled integer dot/sum-of-squares chains: the HOF aggregate fold is
    # CodegenFallback (interpreted, boxed per element); these Projects are
    # whole-stage-codegen-covered, the exact context where the similarity
    # family's paired A/B proved the unroll (OPTIMIZATION_r13 §1). Integer
    # addition is order-free, so the `+`-chain is bit-identical to the fold.
    p_sql = " + ".join(
        f"element_at(ce, {j + 1}) * ({v[j]})" for j in range(PCA_DIM)
    )
    var_sql = " + ".join(
        f"element_at(ce, {j + 1}) * element_at(ce, {j + 1})"
        for j in range(PCA_DIM)
    )
    scored = ce.selectExpr(
        "label",
        f"({p_sql}) AS p",
        f"({var_sql}) AS var_row",
    )
    per = scored.select(
        "label",
        "var_row",
        F.expr(f"((p div {_P_SHIFT}) * (p div {_P_SHIFT})) div {v2s}").alias("rem_row"),
    ).groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("var_row").cast("long").alias("var_mass"),
        F.sum("rem_row").cast("long").alias("removed_mass"),
    )
    return per.select(
        "label",
        "n_vectors",
        "var_mass",
        "removed_mass",
        F.expr("removed_mass * 1000000 div var_mass").cast("long").alias(
            "removed_ppm"
        ),
    )


_SQL_RESIDUAL = f"""
WITH vtab AS MATERIALIZED ({_SQL_PCA}),
v2v AS (
  SELECT GREATEST(1, SUM(v_micro * v_micro) // {_V2_SHIFT}) AS v2s FROM vtab
),
xi AS (
  SELECT vec_id AS i, label, j,
         CAST(FLOOR(CAST(embedding[j + 1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM (SELECT vec_id, label, embedding, unnest(range(0, {PCA_DIM})) AS j FROM embeddings)
),
nv AS (SELECT COUNT(*) AS n FROM embeddings),
mu AS (SELECT j, SUM(x) // n AS mu FROM xi CROSS JOIN nv GROUP BY j, n),
cen AS (SELECT x.i, x.label, x.j, x.x - m.mu AS c FROM xi x JOIN mu m ON m.j = x.j),
scored AS (
  SELECT c.i, c.label,
         SUM(c.c * v.v_micro) AS p,
         SUM(c.c * c.c) AS var_row
  FROM cen c JOIN vtab v ON v.dim = c.j
  GROUP BY c.i, c.label
),
per AS (
  SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vectors,
         SUM(var_row) AS var_mass,
         SUM(((p // {_P_SHIFT}) * (p // {_P_SHIFT})) // v2.v2s) AS removed_mass
  FROM scored CROSS JOIN v2v v2
  GROUP BY label
)
SELECT label, CAST(n_vectors AS BIGINT) AS n_vectors,
       CAST(var_mass AS BIGINT) AS var_mass,
       CAST(removed_mass AS BIGINT) AS removed_mass,
       CAST(removed_mass * 1000000 // var_mass AS BIGINT) AS removed_ppm
FROM per
"""

PENDING_QUERIES = {"embedding_pca_residual": embedding_pca_residual}
PENDING_ORACLE = {"embedding_pca_residual": _SQL_RESIDUAL}


# --- per-label centroid drift across the split — PENDING round 7 ------------
#
# Embedding-distribution drift monitor: for each label, the squared L2
# shift between the TRAIN-half and VAL-half centroids under the
# registered content-keyed md5 split — the embedding-side twin of
# ``text_source_drift_klm`` (a healthy embedding space shows near-zero
# split drift; a large shift means the split is not exchangeable or the
# embedding depends on the split key — either is a data bug worth an
# alarm). Integer milli-unit discipline (the PCA family's device):
# per-component sums are exact integer additions (partition-order safe),
# centroids are integer divisions, and the drift is an integer sum of
# squared differences. Component grain is |labels| x DIM — constant-size
# shuffle whatever the corpus.


def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    split = F.when(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2) < "1a", "val"
    ).otherwise("train")
    base = emb.select(
        F.col("label").cast("long").alias("label"),
        split.alias("split"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("j", "v"),
    ).select(
        "label", "split", "j",
        F.floor(F.col("v") * 1000 + F.lit(0.5)).cast("long").alias("x"),
    )
    sums = base.groupBy("label", "split", "j").agg(
        F.sum("x").cast("long").alias("sx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    cent = sums.select(
        "label", "split", "j", F.expr("sx div n").cast("long").alias("mu"), "n"
    )
    a = cent.filter(F.col("split") == "train").select(
        "label", "j", F.col("mu").alias("mu_t"), F.col("n").alias("n_train")
    )
    b = cent.filter(F.col("split") == "val").select(
        "label", "j", F.col("mu").alias("mu_v"), F.col("n").alias("n_val")
    )
    d = a.join(b, ["label", "j"]).select(
        "label", "n_train", "n_val",
        (F.col("mu_t") - F.col("mu_v")).alias("dd"),
    )
    return d.groupBy("label").agg(
        F.max("n_train").cast("long").alias("n_train"),
        F.max("n_val").cast("long").alias("n_val"),
        F.sum(F.col("dd") * F.col("dd")).cast("long").alias("drift_sq_milli2"),
        F.max(F.abs(F.col("dd"))).cast("long").alias("max_shift_milli"),
    )


_SQL_DRIFT = f"""
WITH xi AS (
  SELECT label,
         CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) < '1a'
              THEN 'val' ELSE 'train' END AS split,
         j,
         CAST(FLOOR(CAST(embedding[j + 1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM (SELECT vec_id, label, embedding, unnest(range(0, {PCA_DIM})) AS j
        FROM embeddings)
),
sums AS (
  SELECT CAST(label AS BIGINT) AS label, split, j,
         SUM(x)::BIGINT AS sx, COUNT(*)::BIGINT AS n
  FROM xi GROUP BY 1, 2, 3
),
cent AS (SELECT label, split, j, sx // n AS mu, n FROM sums),
d AS (
  SELECT a.label, a.n AS n_train, b.n AS n_val, a.mu - b.mu AS dd
  FROM cent a JOIN cent b ON a.label = b.label AND a.j = b.j
  WHERE a.split = 'train' AND b.split = 'val'
)
SELECT label,
       CAST(MAX(n_train) AS BIGINT) AS n_train,
       CAST(MAX(n_val) AS BIGINT) AS n_val,
       CAST(SUM(dd * dd) AS BIGINT) AS drift_sq_milli2,
       CAST(MAX(ABS(dd)) AS BIGINT) AS max_shift_milli
FROM d GROUP BY label
"""

PENDING_QUERIES["embedding_centroid_drift"] = embedding_centroid_drift
PENDING_ORACLE["embedding_centroid_drift"] = _SQL_DRIFT


# --- Round-7 registration wave 1 ------------------------------------------
# Flip these pending rows into the driver contract: the r6 green rows freed
# window slots (rotation policy in COVERAGE.md; order in
# queries/__init__._WINDOW_FRONT). The functions above are unchanged — the
# flip only moves the (query, oracle) pair between registries.
_REGISTER_WAVE1 = (
    "embedding_pca_residual",
    "embedding_centroid_drift",
)
for _n in _REGISTER_WAVE1:
    QUERIES[_n] = PENDING_QUERIES.pop(_n)
    ORACLE[_n] = PENDING_ORACLE.pop(_n)
del _n


# --- embedding norm outliers — PENDING round 8+ ------------------------------
#
# The broken-embedding detector every vector pipeline runs before indexing:
# vectors whose L2 norm is wildly off their label's typical norm are
# truncated inputs, all-zero failures, or un-normalized stragglers from a
# different encoder checkpoint. Integer-exact end to end: dimensions
# quantize once to milli-units (the shared floor(x·1000 + 0.5) step), the
# SQUARED norm is an exact int64 sum of bounded products (|q| ≤ ~10³ ⇒
# term ≤ 10⁶, × 64 dims ≪ int64), and the per-label robust gate is the
# registered Hampel median/MAD machinery (`sketches.mad_report`) verbatim —
# same nearest-rank half/quarter-unit devices, same cross-multiplied
# cutoff, no sqrt and no doubles anywhere. One scan, two rank windows
# keyed by label: the same two-shuffle shape as events_anomaly_mad.


def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_postgresql_clickhouse_spark.queries.sketches import mad_report

    emb = load_table(spark, sf_dir, "embeddings")
    norm2 = F.expr(
        "aggregate(transform(embedding, x -> CAST(FLOOR(x * 1000 + 0.5) AS BIGINT)),"
        " CAST(0 AS BIGINT), (a, v) -> a + v * v)"
    )
    d = emb.select(F.col("label").cast("long").alias("event_type"), norm2.alias("c"))
    rep = mad_report(d)
    return rep.select(
        F.col("event_type").alias("label"),
        F.col("n_events").cast("long").alias("n_vecs"),
        F.col("median_halfcents").cast("long").alias("median_norm2_halfunits"),
        F.col("mad_qcents").cast("long").alias("mad_norm2_quarterunits"),
        F.col("n_anomalies").cast("long").alias("n_outliers"),
    )


def _sql_norm_outliers() -> str:
    from cdc_postgresql_clickhouse_spark.queries.sketches import _MAD_DEN, _MAD_NUM

    return f"""
WITH d AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(list_sum(list_transform(embedding,
              x -> CAST(FLOOR(x * 1000 + 0.5) AS BIGINT)
                   * CAST(FLOOR(x * 1000 + 0.5) AS BIGINT))) AS BIGINT) AS c
  FROM embeddings
),
r AS (
  SELECT label, c,
         row_number() OVER (PARTITION BY label ORDER BY c) AS rn,
         COUNT(*) OVER (PARTITION BY label) AS n
  FROM d
),
med AS (
  SELECT label,
         CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN c END)
              + SUM(CASE WHEN rn = n // 2 + 1 THEN c END) AS BIGINT) AS med_hc
  FROM r GROUP BY label
),
dev AS (
  SELECT d.label, med.med_hc, abs(d.c * 2 - med.med_hc) AS ad_hc
  FROM d JOIN med USING (label)
),
r2 AS (
  SELECT label, med_hc, ad_hc,
         row_number() OVER (PARTITION BY label ORDER BY ad_hc) AS rn,
         COUNT(*) OVER (PARTITION BY label) AS n
  FROM dev
),
madf AS (
  SELECT label,
         CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN ad_hc END)
              + SUM(CASE WHEN rn = n // 2 + 1 THEN ad_hc END) AS BIGINT) AS mad_qc
  FROM r2 GROUP BY label
)
SELECT dev.label,
       COUNT(*)::BIGINT AS n_vecs,
       MAX(dev.med_hc)::BIGINT AS median_norm2_halfunits,
       MAX(madf.mad_qc)::BIGINT AS mad_norm2_quarterunits,
       CAST(SUM(CASE WHEN dev.ad_hc * {_MAD_DEN} > madf.mad_qc * {_MAD_NUM}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN madf USING (label)
GROUP BY dev.label
"""


PENDING_QUERIES["embedding_norm_outliers"] = embedding_norm_outliers
PENDING_ORACLE["embedding_norm_outliers"] = _sql_norm_outliers()


# --- Round-8 registration: the whole pending layer flips in ----------------
# VERDICT r7 #1: the driver's 50-row window gates which rows get CHECKED per
# round, not how many may be REGISTERED — holding locally hash-verified
# operators out of the contract understates coverage and risks rows never
# receiving a driver row. Window order lives in queries/__init__.
flip_pending(PENDING_QUERIES, PENDING_ORACLE, QUERIES, ORACLE)


# --- Isotropy / effective-rank report — round 10 -----------------------------
#
# The eigendecomposition-free isotropy diagnostics an embedding pipeline
# monitors BEFORE deciding on whitening or ABTT removal (the residual
# report above measures the cure; this measures the disease):
#
# - participation ratio tr(C)^2 / ||C||_F^2 — the effective number of
#   dimensions carrying variance ((sum lambda)^2 / sum lambda^2 in [1, d]),
#   computable exactly from the integer covariance cells because C is
#   symmetric (Frobenius^2 = sum of squared eigenvalues); no eigensolve,
#   no iteration, no driver rounds.
# - anisotropy ||mu||^2 / E||x||^2 — the Ethayarajh-style mean-cosine
#   proxy (how far the cloud sits from the origin relative to its size);
#   near 0 = centered/isotropic, near 1 = everything points one way.
#
# Exactness: both ratios are built from the SAME integer moments the PCA
# family ships (milli-quantized components, truncating integer divisions),
# so the only floats are two final divisions of exact int64s — identical
# IEEE operations in both engines, micro-floored once. Scale shape: one
# corpus scan feeding dim^2-bounded partials (the _cov_tri plan) plus
# one row-side fold for E||x||^2; output is a single row of model-sized
# scalars. At extreme row counts the raw second moment would approach
# int64 (2.6e8/row); rescale the quantization step before the sum there.

def embedding_isotropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    xi_arr = F.expr(_xi_sql_expr())
    n = emb.count()
    sums = emb.select(F.posexplode(xi_arr).alias("j", "x")).groupBy("j").agg(
        F.sum("x").alias("sx")
    )
    mu = {int(r.j): _tdiv_py(int(r.sx), n) for r in sums.collect()}
    mu_norm2 = sum(v * v for v in mu.values())
    mu_arr = "array(" + ", ".join(str(mu[j]) for j in range(PCA_DIM)) + ")"
    cen_arr = F.expr(
        f"transform({_xi_sql_expr()}, (x, j) -> x - element_at({mu_arr}, j + 1))"
    )
    # Upper-triangle covariance pass (the _cov_tri shape, inlined to share
    # this query's persisted emb/mu): trace reads the diagonal cells and
    # Frobenius² counts each off-diagonal cell twice — the exact mirror of
    # the symmetric full matrix, in half the per-row product work.
    ce = emb.select(cen_arr.alias("ce"))
    prods = F.expr(
        "flatten(transform(ce, (cj, j) -> "
        f"transform(slice(ce, j + 1, {PCA_DIM} - j), ck -> cj * ck)))"
    )
    covagg = (
        ce.select(F.posexplode(prods).alias("pos", "p"))
        .groupBy("pos")
        .agg(F.sum("p").alias("cjk0"))
        .select(
            F.expr(f"element_at({_TRI_J_ARR}, pos + 1)").alias("j"),
            F.expr(f"element_at({_TRI_K_ARR}, pos + 1)").alias("k"),
            F.expr(f"cjk0 div {n}").alias("cjk"),
        )
        .agg(
            F.sum(F.when(F.col("j") == F.col("k"), F.col("cjk")).otherwise(F.lit(0)))
            .cast("long").alias("trace_scaled"),
            F.sum(
                F.when(F.col("j") == F.col("k"), F.col("cjk") * F.col("cjk"))
                .otherwise(F.lit(2) * F.col("cjk") * F.col("cjk"))
            ).cast("long").alias("frob2_scaled"),
        )
    )
    x2 = emb.select(
        F.sum(
            F.expr(f"aggregate({_xi_sql_expr()}, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")
        ).alias("tot_x2")
    )
    pr = (
        F.floor(
            F.col("trace_scaled").cast("double") * F.col("trace_scaled").cast("double")
            / F.col("frob2_scaled").cast("double") * F.lit(1000000.0)
        ).cast("double") / F.lit(1000000.0)
    )
    return covagg.join(x2).select(
        F.lit(PCA_DIM).cast("long").alias("d"),
        F.lit(n).cast("long").alias("n_vectors"),
        "trace_scaled",
        "frob2_scaled",
        pr.alias("participation_ratio"),
        F.lit(mu_norm2).cast("long").alias("mu_norm2_scaled"),
        F.expr(f"tot_x2 div {n}").cast("long").alias("mean_norm2_scaled"),
        F.expr(f"{mu_norm2} * 1000000 div (tot_x2 div {n})").cast("long")
        .alias("anisotropy_ppm"),
    )


_SQL_ISOTROPY = (
    _SQL_COV_PRELUDE
    + f""",
tf AS (
  SELECT SUM(CASE WHEN j = k THEN cjk ELSE 0 END) AS trace_scaled,
         SUM(cjk * cjk) AS frob2_scaled
  FROM covp
),
mu2 AS (SELECT SUM(mu * mu) AS mu_norm2 FROM mu),
x2 AS (SELECT SUM(x * x) // (SELECT n FROM nv) AS mean_norm2 FROM xi)
SELECT CAST({PCA_DIM} AS BIGINT) AS d,
       CAST((SELECT n FROM nv) AS BIGINT) AS n_vectors,
       CAST(trace_scaled AS BIGINT) AS trace_scaled,
       CAST(frob2_scaled AS BIGINT) AS frob2_scaled,
       CAST(FLOOR(CAST(trace_scaled AS DOUBLE) * CAST(trace_scaled AS DOUBLE)
                  / CAST(frob2_scaled AS DOUBLE) * 1000000.0) AS DOUBLE) / 1000000.0
         AS participation_ratio,
       CAST(mu_norm2 AS BIGINT) AS mu_norm2_scaled,
       CAST(mean_norm2 AS BIGINT) AS mean_norm2_scaled,
       CAST(mu_norm2 * 1000000 // mean_norm2 AS BIGINT) AS anisotropy_ppm
FROM tf CROSS JOIN mu2 CROSS JOIN x2
"""
)

QUERIES["embedding_isotropy_report"] = embedding_isotropy_report
ORACLE["embedding_isotropy_report"] = _SQL_ISOTROPY
