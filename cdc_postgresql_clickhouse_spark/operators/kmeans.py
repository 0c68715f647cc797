"""Distributed Lloyd (k-means) refinement for the IVF coarse quantizer.

``queries/similarity.py::ann_ivf_topk`` seeds its quantizer with the first
``k`` vectors ("production would k-means these"). This module IS that
production step: a deterministic, DataFrame-only Lloyd iteration loop that
turns the seed centroids into refined ones, cutting quantization error and
evening out inverted-list occupancy (skewed lists are what break IVF probe
cost at scale).

Scale shape, per iteration:
- **Assignment** scores each vector against the k×dim centroid MODEL —
  broadcast as ONE row of nested arrays — inside a single per-row
  ``transform`` fold, with the vector's own norm hoisted to one column
  (the former k-row cross join fanned every vector k ways into a
  SortAggregate and re-derived sqrt(dot(v,v)) per centroid row). The
  argmax is ``array_position`` of ``array_max`` (first max in cid order =
  smaller-cid tie-break). No shuffle of the corpus side, and the model
  arriving as broadcast DATA (not literals) keeps the generated code
  IDENTICAL across iterations, k, and datasets: a literal-matrix variant
  re-Janino-compiled the argmax expression once per iteration per
  centroid state, which dominated wall-clock at small data sizes.
- **Update** is one posexplode → (cid, dim)-keyed avg — shuffle volume is
  k×dim rows per map partition (map-side combine), and the generated code
  is dim-independent.
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


def _dot(a: Column, b: Column, n: int, unroll: bool = False) -> Column:
    """Sequential left fold seeded with +0.0 — identical IEEE-754 result
    in both physical forms (same element order, same +0.0 seed). Default
    is the aggregate(zip_with(...)) HOF; ``unroll=True`` emits the chain
    unrolled over the static length ``n`` so the product-sum compiles
    into whole-stage codegen — opt-in per the queries/similarity.py
    ``_dot`` contract (faster only where the consuming operator is
    codegen-covered; the Lloyd assignment's broadcast-cross + agg is,
    quantization_error's transform lambda is interpreted either way)."""
    if not unroll:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
    s: Column = F.lit(0.0)
    for i in range(1, n + 1):
        s = s + F.element_at(a, i) * F.element_at(b, i)
    return s


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
    empty clusters retain their previous centroid. The per-iteration math
    (centroid-first dot, cn·vnorm denominator, argmax with smaller-cid
    tie-break, 9-dp FLOOR truncation of the per-dim means) is bit-identical
    to the literal-matrix formulation it replaced — only the physical shape
    changed (one-row broadcast model + per-row array argmax + posexplode
    avg, for iteration-stable codegen)."""
    spark = emb.sparkSession
    seed = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [[float(x) for x in r[0]] for r in seed]
    dim = len(cents[0])
    vec = F.col(vec_col)
    for _ in range(iters):
        # One-row broadcast MODEL + per-row array argmax (r14): the former
        # broadcast k-row cross join + max(struct) argmax paid a k-way row
        # fan-out into a SortAggregate (struct buffers have no mutable
        # HashAggregate encoding) AND recomputed sqrt(dot(v,v)) once per
        # centroid row — half the interpreted fold work. Now the vector
        # norm is hoisted to ONE column per row and the k cosines fold
        # inside a single transform(); argmax-with-smaller-cid-tie-break is
        # array_position-of-array_max (first occurrence of the max in cid
        # order = smallest cid — same doubles, same tie-break, verified
        # value-identical). Generated code stays identical across
        # iterations (the model arrives as broadcast DATA, not literals).
        model_df = spark.createDataFrame(
            [([list(c) for c in cents], _norms(cents))],
            "cm array<array<double>>, cns array<double>",
        )
        sims = F.transform(
            F.col("cm"),
            lambda c, i: _dot(c, vec, dim)
            / (F.element_at(F.col("cns"), i + 1) * F.col("__vn")),
        )
        assigned = (
            emb.select(id_col, vec_col, F.sqrt(_dot(vec, vec, dim)).alias("__vn"))
            .join(F.broadcast(model_df), how="cross")
            .select(sims.alias("__sims"), vec)
            .select(
                (F.array_position(F.col("__sims"), F.array_max(F.col("__sims"))) - 1)
                .cast("int")
                .alias("cid"),
                vec,
            )
        )
        rows = (
            assigned.select("cid", F.posexplode(vec).alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]
        for r in rows:
            new[r["cid"]][r["i"]] = math.floor(r["m"] * _TRUNC) / _TRUNC
        cents = new
    return cents


def quantization_error(emb: DataFrame, cents: list[list[float]], vec_col: str = "e") -> float:
    """Mean (1 − cosine to assigned centroid) over the corpus — the scalar
    that must fall as Lloyd iterates. One map pass + one scalar agg."""
    m = F.lit([[float(x) for x in c] for c in cents])
    n = F.lit(_norms(cents))
    dim = len(cents[0])
    vec = F.col(vec_col)
    vnorm = F.sqrt(_dot(vec, vec, dim))
    sims = F.transform(m, lambda c, i: _dot(c, vec, dim) / (F.element_at(n, i + 1) * vnorm))
    return emb.select((1.0 - F.array_max(sims)).alias("d")).agg(F.avg("d")).first()[0]
