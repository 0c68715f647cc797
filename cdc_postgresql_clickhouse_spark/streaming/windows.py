"""Streaming window operators (survey §2.10 ST6 — available beyond the
reference's surface) and a custom stateful CDC operator on the state-store
API.

The reference needs **no** watermarks (version-based last-writer-wins is
strictly stronger, ST2); these operators exist for the extension surface
where event-time semantics *are* wanted:

- tumbling window counts with watermark (late data dropped after the bound);
- native session windows (gap-based, the streaming twin of
  ``queries.events.events_sessionize``);
- ``applyInPandasWithState`` keyed max-version dedup — the state-store
  alternative to the table-merge design in ``streaming.pipeline`` (kept as a
  demonstration; the table-merge is the recommended 100 TB posture because
  state lives in storage, not executor memory — ST3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampNTZType


def _tz_aware_ts(events: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to tz-aware TIMESTAMP.

    ``withWatermark`` rejects TIMESTAMP_NTZ; sources that read parquet
    without the isAdjustedToUTC flag surface NTZ. The session is pinned to
    UTC, so the cast is value-identical — guard here instead of depending on
    the registry's normalization."""
    if isinstance(events.schema[col].dataType, TimestampNTZType):
        return events.withColumn(col, F.col(col).cast("timestamp"))
    return events


def tumbling_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts; append-mode capable. With
    ``value_col`` also sums that column (DECIMAL-summed then cast to double —
    the exact aggregation shape of the batch twin
    ``queries.events.events_tumbling_5min``, so stream and batch results are
    bitwise comparable)."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value")
        )
    out = (
        _tz_aware_ts(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(*aggs)
    )
    cols = ["n_events"] + (["sum_value"] if value_col is not None else [])
    return out.select(F.col("w.start").alias("window_start"), "event_type", *cols)


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "60 minutes") -> DataFrame:
    """Native gap-based session windows (F.session_window)."""
    return (
        _tz_aware_ts(events).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


STATE_SCHEMA = StructType([StructField("max_version", LongType())])
DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("version", LongType()),
        StructField("event_type", StringType()),
    ]
)


def stateful_max_version_dedup(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-key last-writer-wins on the state store.

    Emits only events that advance the key's max version — the streaming
    form of the ReplacingMergeTree contest (reference
    ``clickhouse_schemas.sql:11-13``). Unbounded key cardinality would grow
    executor state; prefer the table-merge pipeline at scale (ST3).
    """

    out_cols = [f.name for f in DEDUP_OUT_SCHEMA.fields]

    # self-contained closure: executor workers may not have this repo on
    # sys.path (cloudpickle would otherwise reference this module by name)
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # vectorized per Arrow batch: after an ascending sort, a row advances
        # the max iff it exceeds the carried-in max AND differs from its
        # predecessor (strictly-increasing filter) — no per-row Python loop
        max_v = state.get[0] if state.exists else -1
        frames: list[pd.DataFrame] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("event_id")
            ids = pdf["event_id"]
            newer = ids.gt(max_v) & (ids.diff().fillna(float("inf")).gt(0))
            sel = pdf.loc[newer]
            if len(sel):
                max_v = int(sel["event_id"].iloc[-1])
                frames.append(
                    pd.DataFrame(
                        {
                            "user_id": sel["user_id"].astype("int64"),
                            "version": sel["event_id"].astype("int64"),
                            "event_type": sel["event_type"],
                        }
                    )
                )
        state.update((max_v,))
        if frames:
            yield pd.concat(frames, ignore_index=True)[out_cols]
        else:
            yield pd.DataFrame(columns=out_cols)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked SLIDING windows (overlapping — each event lands in
    window/slide frames); append-mode capable, flushed by the same
    far-future-sentinel device as the tumbling twin. Spark aligns sliding
    window starts to multiples of the slide, which is exactly the batch
    twin's two-bucket expansion (events_sliding_10min)."""
    return (
        _tz_aware_ts(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_dec",
        )
    )
