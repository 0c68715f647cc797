"""PCA power-iteration checks. The synthetic fixture's spectrum is nearly
flat (lambda2/lambda1 ~ 0.93), so exact top-eigenvector convergence in
bounded rounds is mathematically impossible — the honest pins are
(1) EXACT equivalence of the registered integer iteration to a numpy
    integer reference (catches any Spark-side arithmetic drift), and
(2) Rayleigh-quotient ASCENT: the iterate's quotient must climb from the
    seed and finish >= 0.9 of the true lambda_1 (power iteration's actual
    guarantee under a flat spectrum)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.pca import (
    PCA_DIM,
    PCA_ITERS,
    _V_SCALE,
    _W_SHIFT,
    embedding_pca_topcomponent,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def _int_cov(spark, sf_dir):
    X = np.array(
        [
            r.e
            for r in load_table(spark, sf_dir, "embeddings")
            .select(F.col("embedding").cast("array<double>").alias("e"))
            .collect()
        ]
    )
    xi = np.floor(X * 1000 + 0.5).astype(np.int64)
    n = xi.shape[0]
    mu = np.trunc(xi.sum(axis=0) / n).astype(np.int64)
    c = xi - mu
    return np.trunc((c.T @ c) / n).astype(np.int64)


def _ref_iterate(cov, iters):
    v = np.zeros(PCA_DIM, dtype=np.int64)
    v[0] = _V_SCALE
    for _ in range(iters):
        w = cov @ v
        wr = np.trunc(w / _W_SHIFT).astype(np.int64)
        m = max(1, int(np.abs(wr).max()))
        v = np.trunc(wr.astype(np.float64) * _V_SCALE / m).astype(np.int64)
    return v


def test_pca_matches_integer_reference_exactly(spark, sf_dir):
    out = embedding_pca_topcomponent(spark, sf_dir).toPandas().sort_values("dim")
    got = out.v_micro.to_numpy().astype(np.int64)
    cov = _int_cov(spark, sf_dir)
    ref = _ref_iterate(cov, PCA_ITERS)
    assert (got == ref).all(), (got[:8], ref[:8])


def test_pca_rayleigh_quotient_ascends_toward_lambda1(spark, sf_dir):
    cov = _int_cov(spark, sf_dir)
    l1 = float(np.linalg.eigvalsh(cov.astype(float))[-1])

    def rq(v):
        v = v.astype(float)
        return (v @ cov @ v) / (v @ v)

    v0 = np.zeros(PCA_DIM, dtype=np.int64)
    v0[0] = _V_SCALE
    out = embedding_pca_topcomponent(spark, sf_dir).toPandas().sort_values("dim")
    v = out.v_micro.to_numpy().astype(np.int64)
    assert rq(v) > rq(v0)
    assert rq(v) >= 0.9 * l1, (rq(v), l1)


def test_pca_output_contract(spark, sf_dir):
    out = embedding_pca_topcomponent(spark, sf_dir).toPandas()
    assert len(out) == PCA_DIM
    assert sorted(out.dim) == list(range(PCA_DIM))
    # renormalization law: the largest |component| is exactly the scale
    assert out.v_micro.abs().max() == 1_000_000
