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


def unpartitioned_window_orders(df: DataFrame) -> list[str]:
    """The ORDER spec of every Window node that has NO partition spec — the
    single-task global-sort anti-pattern (VERDICT r7). A partitioned Window
    prints three top-level bracket groups after ``Window `` (functions,
    partition spec, order spec); a global one prints two. Returns the order
    text of each global node so tests can whitelist windows over BOUNDED
    inputs (the ranking device's ≤ n_parts ``__pid`` offset rows) while
    failing any over a data-proportional grain."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for line in plan.splitlines():
        m = re.search(r"\bWindow \[", line)
        if m is None:
            continue
        rest = line[m.start() + len("Window ") :]
        groups: list[str] = []
        depth, cur = 0, ""
        for ch in rest:
            if ch == "[":
                depth += 1
                if depth == 1:
                    cur = ""
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur)
                    continue
            if depth >= 1:
                cur += ch
        # two groups = (functions, X). X is an ORDER spec (global window —
        # the anti-pattern) only when it carries a sort direction; a
        # partition-only window (no ORDER BY) prints its partition spec
        # there and is fine.
        if len(groups) == 2 and ("ASC" in groups[1] or "DESC" in groups[1]):
            out.append(groups[1])
    return out
