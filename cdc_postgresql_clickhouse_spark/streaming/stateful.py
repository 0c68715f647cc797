"""Arbitrary-state streaming on the transformWithStateInPandas API (Spark
4.0+ StatefulProcessor): per-user lifetime aggregates maintained in keyed
ValueState across micro-batches.

This is the modern replacement surface for ``applyInPandasWithState`` (see
``streaming.windows.stateful_max_version_dedup`` for that form): typed state
handles (value/list/map), timers, and TTL come from the runtime instead of
hand-rolled tuples. Kept alongside the table-merge pipeline — the
recommended 100 TB posture still keeps unbounded keyed state in the TABLE
(survey ST3), while this API is for state that must react within the stream
(timers, TTL, in-flight sessions).

Batch equivalence: draining any prefix of the stream leaves each user's
state equal to the batch groupBy over the same rows — pinned by
``tests/test_stateful_tws.py``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    protocol; absent in this sandbox (like delta-spark — see
    ``operators.state.delta_available`` for the same guarded pattern)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_lifetime_stats(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) over an event stream.

    Emits one row per user per micro-batch containing the post-batch totals;
    the latest emission per user equals the batch aggregate over all rows
    seen so far (last-writer-wins consumption, same as the CDC state reads).

    Raises ImportError where protobuf is unavailable (``tws_available()``);
    use ``streaming.windows.stateful_max_version_dedup``
    (applyInPandasWithState) as the dependency-free stateful form.
    """
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires protobuf (google.protobuf), "
            "which is not installed; use applyInPandasWithState operators "
            "(streaming/windows.py) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n LONG, total DOUBLE")

        def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="append",
        timeMode="none",
    )
