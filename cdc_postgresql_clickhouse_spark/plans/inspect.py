"""Physical-plan inspection: the feedback loop for scale tuning.

Every operator's contract here is not just "right rows" but "right plan":
filters pushed into the parquet scan, columns pruned (ReadSchema), small
sides broadcast, shuffle count minimal, expressions inside whole-stage
codegen. These helpers parse ``explain("formatted")`` output so tests can
assert plan shape and regressions fail loudly (see tests/test_plans.py).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters entries across scans."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each parquet scan — column pruning evidence."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Exchange nodes in the (pre-AQE) physical plan tree."""
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage codegen spans (wider is better — fewer breaks)."""
    plan = formatted_plan(df)
    ids = set(re.findall(r"\[codegen id : (\d+)\]", plan))
    return len(ids)
