"""Scale-safe exact ranking devices.

``Window.orderBy`` with no partition spec moves EVERY input row onto one
task (Spark's own WindowExec warns) — correct at sf0.1, a scale-killer at
100 TB when the window grain is data-proportional (customers, users).
VERDICT r7 flagged four such queries. These helpers replace the global
window with equivalents whose every data-proportional stage is
partitioned, leaving only BOUNDED single-task work (≤ n_parts offset rows,
≤ n_buckets·k candidate rows):

- ``global_row_number`` — exact 1-based global rank via two-phase rank:
  range-repartition on the order columns (partition p's rows all precede
  partition p+1's), row_number WITHIN each partition, then add per-
  partition cumulative offsets (≤ n_parts rows — a bounded window, joined
  back broadcast). One range shuffle + one bounded-key window; identical
  output to ``row_number() OVER (ORDER BY ...)`` whenever the order is
  total (callers tie-break to uniqueness, as all registered queries do).
- ``ntile_exact`` — exact ``ntile(k)`` from the global rank by the closed
  form (first n%k tiles get ceil(n/k) rows, the rest floor(n/k)), so no
  global sort at all.
- ``grouped_topk`` — per-group top-k where groups are few but group size
  is data-proportional: a salted local top-k prunes each group to
  ≤ n_buckets·k candidates, then the real per-group window ranks only
  those. Any global top-k row is necessarily in its salt-bucket's top-k,
  so the prune is lossless.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _two_phase_rank(
    df: DataFrame,
    order_cols: list[Column],
    out: str,
    n_parts: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared core: returns (ranked df with ``out`` = exact global rank,
    bounded per-partition counts df). The range-partitioned scan is
    persisted — it feeds the counts, the local ranking, AND (for ntile)
    the total-count side, and an unpersisted barrier would re-run the
    upstream aggregation once per branch (the chained-RFM case went 3^3×
    without it). Harness-level clearCache reclaims it, the repo-wide
    convention for multi-branch query internals.

    RangePartitioner boundaries come from deterministic reservoir sampling
    (seed = f(partition index)), so every pass over ``part`` sees identical
    partition ids; boundary placement itself cannot change the result
    because offset+local_rn telescopes to the global rank for ANY split of
    a total order."""
    if n_parts is None:
        n_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    part = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # bounded global window: ≤ n_parts rows, never data-proportional
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = (
        part.withColumn("__lrn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )
    return ranked, counts


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    n_parts: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number over a TOTAL order (callers must
    tie-break to uniqueness) without a single-partition sort."""
    ranked, _ = _two_phase_rank(df, order_cols, out, n_parts)
    return ranked


def ntile_exact(
    df: DataFrame,
    k: int,
    order_cols: list[Column],
    out: str = "tile",
    n_parts: int | None = None,
) -> DataFrame:
    """Exact ``ntile(k) OVER (ORDER BY order_cols)`` (identical bucketing:
    the first n % k tiles take ceil(n/k) rows, the rest floor(n/k)) built
    on the two-phase global rank — no data-proportional single-task sort.
    ``order_cols`` must define a total order. The total count reuses the
    bounded per-partition counts (no extra pass over the data)."""
    ranked, counts = _two_phase_rank(df, order_cols, "__r", n_parts)
    n_row = counts.agg(F.sum("__cnt").cast("long").alias("__n"))
    q, rem = f"(__n div {k})", f"(__n % {k})"
    tile = F.expr(
        f"CASE WHEN {q} = 0 THEN __r "
        f"WHEN __r <= ({q} + 1) * {rem} THEN (__r + {q}) div ({q} + 1) "
        f"ELSE {rem} + (__r - ({q} + 1) * {rem} + {q} - 1) div {q} END"
    ).cast("long")
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .withColumn(out, tile)
        .drop("__r", "__n")
    )


def ntile_exact_grouped(
    df: DataFrame,
    k: int,
    group_col: str,
    order_cols: list[Column],
    out: str = "tile",
    n_parts: int | None = None,
) -> DataFrame:
    """Exact per-group ``ntile(k) OVER (PARTITION BY group ORDER BY …)``
    for a FEW groups each of data-proportional size, in ONE two-phase
    pass: range-repartition on (group, order) so each group's rows are
    range-ordered across partitions, rank within (partition, group), and
    add per-(group, partition) cumulative offsets (≤ groups·n_parts rows —
    bounded). Chaining N single-group passes costs N range shuffles; a
    melt + this costs one. ``order_cols`` must totally order rows WITHIN
    each group."""
    if n_parts is None:
        n_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    part = (
        df.repartitionByRange(n_parts, F.col(group_col), *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = part.groupBy("__pid", group_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # bounded windows over ≤ groups·n_parts rows
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(group_col)
    offsets = counts.select(
        group_col,
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_tot).cast("long").alias("__n"),
    )
    w_local = Window.partitionBy("__pid", group_col).orderBy(*order_cols)
    ranked = (
        part.withColumn("__lrn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["__pid", group_col])
        .withColumn("__r", (F.col("__off") + F.col("__lrn")).cast("long"))
    )
    q, rem = f"(__n div {k})", f"(__n % {k})"
    tile = F.expr(
        f"CASE WHEN {q} = 0 THEN __r "
        f"WHEN __r <= ({q} + 1) * {rem} THEN (__r + {q}) div ({q} + 1) "
        f"ELSE {rem} + (__r - ({q} + 1) * {rem} + {q} - 1) div {q} END"
    ).cast("long")
    return ranked.withColumn(out, tile).drop(
        "__pid", "__lrn", "__off", "__r", "__n"
    )


def grouped_topk(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_col: Column,
    rank_out: str = "rk",
    n_buckets: int = 32,
) -> DataFrame:
    """Top-k rows per group for FEW groups of data-proportional size.
    A plain ``row_number() OVER (PARTITION BY group ORDER BY ...)`` puts a
    whole group on one task; here a salted local top-k (partitioned by
    (group, hash-bucket)) prunes losslessly to ≤ n_buckets·k candidates
    per group before the real per-group ranking runs. ``salt_col`` must be
    deterministic per row (hash the tie-break key)."""
    b = df.withColumn("__b", F.pmod(F.xxhash64(salt_col), F.lit(n_buckets)))
    w_local = Window.partitionBy(*part_cols, "__b").orderBy(*order_cols)
    cand = (
        b.withColumn("__lrk", F.row_number().over(w_local))
        .filter(F.col("__lrk") <= k)
        .drop("__lrk", "__b")
    )
    w_final = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return cand.withColumn(rank_out, F.row_number().over(w_final)).filter(
        F.col(rank_out) <= k
    )
