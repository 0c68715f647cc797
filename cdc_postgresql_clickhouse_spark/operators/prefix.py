"""Two-phase distributed prefix sum — the scale path for running cumsums.

A window ``partitionBy(group).orderBy(key)`` cumsum parallelizes ACROSS
groups but serializes WITHIN one: a single enormous group (one source with
most of a 100 TB corpus) lands on one task. The classic fix (Blelloch scan,
and what `training.py`'s shard-packing docstring promises) is two-phase:

1. range-repartition the rows by (group, key) so each physical partition
   holds a contiguous key range — Spark assigns range buckets to partition
   ids in sort order, so ``spark_partition_id()`` is monotone in the key;
2. a LOCAL exclusive cumsum per (group, physical partition) — bounded by
   partition size, embarrassingly parallel;
3. per-(group, partition) subtotals — a partition-count-sized table — get
   their own exclusive cumsum per group (tiny window) and broadcast back
   as offsets;
4. row prefix = local prefix + partition offset.

The arithmetic is identical to the one-window formulation (integer sums
reassociate freely), pinned by ``tests/test_prefix.py`` for several
partition counts, including the equal-boundary-key hazard: ORDER KEYS MUST
BE UNIQUE per group (give ties a unique tiebreaker column) — the range
partitioner may split duplicate keys across adjacent partitions, but with
distinct keys every row's placement is order-consistent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exclusive_cumsum_distributed(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive per-group running sum of ``value_col`` in ``order_cols``
    order, computed without any group-sized window partition. Returns the
    input columns plus ``out_col`` (long). Order keys must be unique within
    each group (see module docstring)."""
    ranged = (
        df.repartitionByRange(num_partitions, *group_cols, *order_cols)
        if num_partitions
        else df.repartitionByRange(*group_cols, *order_cols)
    )
    # __pid is consumed by TWO branches (local prefix + subtotal offsets).
    # The range partitioner SAMPLES its boundaries, so re-executing the
    # exchange could re-draw them and disagree between branches; pin one
    # materialization (Spark's ReuseExchange usually dedups the subtree,
    # but correctness must not depend on an optimizer rule firing). At
    # production scale the same pin is a persist() or a staging write.
    staged = ranged.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    local_w = (
        Window.partitionBy(*group_cols, "__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = staged.withColumn(
        "__local_before",
        F.coalesce(F.sum(value_col).over(local_w), F.lit(0)).cast("long"),
    )
    sub_w = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        staged.groupBy(*group_cols, "__pid")
        .agg(F.sum(value_col).cast("long").alias("__sub"))
        .withColumn(
            "__offset",
            F.coalesce(F.sum("__sub").over(sub_w), F.lit(0)).cast("long"),
        )
        .drop("__sub")
    )
    joined = local.join(F.broadcast(offsets), [*group_cols, "__pid"])
    out: Column = (F.col("__local_before") + F.col("__offset")).cast("long")
    return joined.withColumn(out_col, out).drop("__pid", "__local_before", "__offset")
