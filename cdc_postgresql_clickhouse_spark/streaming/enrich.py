"""Streaming enrichment: stream ⨝ dimension joins.

The reference has no joins (SURVEY §2.3), but a CDC engine feeding an
analytical store almost always enriches the change stream with dimension
attributes on the way in. Two shapes, chosen by dimension size:

- ``enrich_with_dim`` — stream-static BROADCAST join: the dimension is a
  batch DataFrame broadcast to every task; no shuffle of the stream, no
  streaming state. Spark re-plans the static side each micro-batch, so a
  refreshed dimension view is picked up automatically (slowly-changing dims
  read from a table path get the latest snapshot per batch).
- For dimension tables too big to broadcast, the scale path is the state
  table itself: pre-bucket BOTH the stream sink and the dimension by the
  join key (operators/layout.py) and join downstream, co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static broadcast join. ``stream`` may be a streaming OR batch
    DataFrame (the transform is shared, like the CDC MV transform); ``dim``
    must be batch. Left join by default: an unmatched dimension key must not
    drop change events."""
    d = dim.select(on, *dim_cols) if dim_cols else dim
    return stream.join(F.broadcast(d), on, how)
