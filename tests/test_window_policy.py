"""Rotation-policy guard: every registered query that has never had a
driver CORRECTNESS row must sit inside the driver's 50-query window
(COVERAGE.md policy rule 2). A new query appended after position 49 would
silently never be driver-verified — this test makes that a red build
instead."""

from __future__ import annotations

import glob
import json
import os

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_never_driver_checked_queries_register_inside_window():
    from cdc_postgresql_clickhouse_spark.queries import all_oracles, all_queries

    names = list(all_queries())
    assert len(names) == len(set(names))
    # every query still has an oracle twin (100% oracle coverage invariant)
    assert set(names) == set(all_oracles())

    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            data = json.load(f)
        if isinstance(data, dict):
            seen |= set(data)
    window = set(names[:WINDOW])
    never = [n for n in names if n not in seen]
    outside = [n for n in never if n not in window]
    assert not outside, f"never-driver-checked queries outside the window: {outside}"


def test_window_front_is_exactly_the_driver_window():
    """_WINDOW_FRONT must be exactly the 50 driver-checked names, in order —
    a shorter list silently delegates window tail composition to module
    order; a longer one silently truncates."""
    from cdc_postgresql_clickhouse_spark.queries import _WINDOW_FRONT, all_queries

    assert len(_WINDOW_FRONT) == WINDOW
    assert len(set(_WINDOW_FRONT)) == WINDOW
    names = list(all_queries())
    assert names[:WINDOW] == _WINDOW_FRONT
