"""Stream-stream joins (extension surface beyond the reference): watermarked
interval joins — the attribution shape ("join each purchase to the same
user's views within the preceding N minutes").

Spark semantics recap: a stream-stream inner join needs BOTH sides
watermarked AND a time-range condition so the state store can evict — the
watermark bounds how long a view is retained waiting for future purchases,
the interval bounds the match window. The SAME function works on batch
DataFrames (withWatermark is a no-op there), which is how the DuckDB-gated
twin ``events_purchase_attribution`` verifies the join semantics the
streaming test then re-runs through ``readStream``.

Scale: state size ~= input rate × watermark horizon per side, partitioned by
the equi-key (user_id) — the planner shuffles both sides on user_id, so skew
tooling (AQE/salting) applies as in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Interval join: (purchase, view) pairs where the view happened in the
    ``lookback`` window ending at the purchase, same user. Output columns:
    ``user_id, purchase_id, purchase_ts, value, view_id, view_ts``."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
    )
    return p.join(v, cond, "inner").select(
        "user_id", "purchase_id", "purchase_ts", "value", "view_id", "view_ts"
    )


def purchase_attribution_left_join(
    views: DataFrame,
    purchases: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """LEFT-OUTER interval join: every purchase emits — paired with each
    same-user view in the ``lookback`` window, or with NULL view columns
    once the watermark passes the point where no matching view can still
    arrive (view_ts ≤ purchase_ts, so that point is purchase_ts + the
    watermark delay). This is the Structured Streaming outer-join contract:
    both sides watermarked + an event-time range in the join condition, so
    the state store can both evict matched state AND prove a purchase
    unmatched. The same function works on batch DataFrames (withWatermark
    is a no-op; the planner runs a plain left join), which is how the
    DuckDB twin verifies the semantics.

    NOTE for finite sources: unmatched rows emit only in a micro-batch
    AFTER the watermark has advanced past them — drive the stream with a
    late sentinel (and one further batch to apply it) or the tail of the
    left side stays in state at stream end."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
    )
    return p.join(v, cond, "left_outer").select(
        "user_id", "purchase_id", "purchase_ts", "value", "view_id", "view_ts"
    )
