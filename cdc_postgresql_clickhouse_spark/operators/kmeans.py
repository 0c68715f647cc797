"""Distributed Lloyd (k-means) refinement for the IVF coarse quantizer.

``queries/similarity.py::ann_ivf_topk`` seeds its quantizer with the first
``k`` vectors ("production would k-means these"). This module IS that
production step: a deterministic, DataFrame-only Lloyd iteration loop that
turns the seed centroids into refined ones, cutting quantization error and
evening out inverted-list occupancy (skewed lists are what break IVF probe
cost at scale).

Scale shape, per iteration:
- **Assignment** is a pure map pass: the k×dim centroid matrix rides along
  as ONE array<array<double>> literal (same device as the LSH plane matrix —
  a single Py4J call, O(1) expression tree), and each vector's nearest
  centroid is an argmax over a ``transform`` of that literal. No join, no
  shuffle, no Python.
- **Update** is one map-side-combining groupBy over k groups × dim running
  means — shuffle volume is k rows per map partition.
- The k×dim model state (and ONLY it — never row data) is collected to the
  driver between iterations; that is the canonical iterative-refinement
  shape (MLlib's KMeans treeAggregates exactly the same state). At
  k=sqrt(n) even a 10-billion-vector corpus keeps this under a few MB.

Determinism: seeds are the first k vectors by id; per-dimension means are
FLOOR-truncated to 9 dp after each iteration so the float-combine order of
the distributed average (which varies with partition scheduling) can never
surface in the refined model; cosine ties break toward the smaller centroid
id. Same inputs → bit-identical centroids, every run.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRUNC = 1_000_000_000.0  # 9 dp: far above distributed-sum noise (~1e-12)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _assign_cid(vec: Column, cents: list[list[float]], norms: list[float]) -> Column:
    """Nearest-centroid id by cosine (argmax; ties → smaller cid), computed
    against the centroid matrix as a single literal."""
    m = F.lit([[float(x) for x in c] for c in cents])
    n = F.lit([float(x) for x in norms])
    vnorm = F.sqrt(_dot(vec, vec))
    sims = F.transform(m, lambda c, i: _dot(c, vec) / (F.element_at(n, i + 1) * vnorm))
    best = F.array_max(
        F.zip_with(
            sims,
            F.sequence(F.lit(0), F.lit(len(cents) - 1)),
            lambda s, i: F.struct(s.alias("s"), (-i).alias("ni")),
        )
    )
    return (-best.getField("ni")).cast("int")


def _norms(cents: list[list[float]]) -> list[float]:
    return [math.sqrt(sum(x * x for x in c)) or 1.0 for c in cents]


def lloyd_refine(
    emb: DataFrame,
    *,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "e",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Refined centroids after ``iters`` Lloyd iterations from the
    first-k-vectors seed. Returns the k×dim model (row i = centroid i);
    empty clusters retain their previous centroid."""
    dim = len(emb.select(vec_col).first()[0])
    seed = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [[float(x) for x in r[0]] for r in seed]
    for _ in range(iters):
        cid = _assign_cid(F.col(vec_col), cents, _norms(cents))
        per_dim = [
            F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"d{i}") for i in range(dim)
        ]
        rows = emb.select(cid.alias("cid"), vec_col).groupBy("cid").agg(*per_dim).collect()
        new = list(cents)
        for r in rows:
            new[r["cid"]] = [
                math.floor(r[f"d{i}"] * _TRUNC) / _TRUNC for i in range(dim)
            ]
        cents = new
    return cents


def quantization_error(emb: DataFrame, cents: list[list[float]], vec_col: str = "e") -> float:
    """Mean (1 − cosine to assigned centroid) over the corpus — the scalar
    that must fall as Lloyd iterates. One map pass + one scalar agg."""
    m = F.lit([[float(x) for x in c] for c in cents])
    n = F.lit(_norms(cents))
    vec = F.col(vec_col)
    vnorm = F.sqrt(_dot(vec, vec))
    sims = F.transform(m, lambda c, i: _dot(c, vec) / (F.element_at(n, i + 1) * vnorm))
    return emb.select((1.0 - F.array_max(sims)).alias("d")).agg(F.avg("d")).first()[0]
