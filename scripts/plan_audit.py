"""Physical-plan audit over the bench headline set: per query, the numbers
that matter at 100 TB — shuffle (Exchange) count, broadcast joins, nested
-loop joins (should be none outside the documented IVF assignment pass),
parquet scans with pushed filters, and cache reuse. Usage:

    python scripts/plan_audit.py [sf_dir] [query ...]

The per-query rows make plan regressions visible at a glance; the pinned
subset lives in tests/test_plans.py and friends — this is the full-surface
observability tool.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from cdc_postgresql_clickhouse_spark.plans.inspect import formatted_plan  # noqa: E402
from cdc_postgresql_clickhouse_spark.queries import all_queries  # noqa: E402
from cdc_postgresql_clickhouse_spark.session import get_spark  # noqa: E402


def audit(plan: str) -> dict[str, int]:
    tree = re.findall(r"\(\d+\) ([A-Za-z]+)", plan)
    return {
        "shuffles": sum(1 for n in tree if n == "Exchange"),
        "bcast_joins": sum(1 for n in tree if n.startswith("BroadcastHashJoin")),
        "smj": sum(1 for n in tree if n.startswith("SortMergeJoin")),
        "nested_loop": sum(1 for n in tree if n.startswith("BroadcastNestedLoopJoin")),
        "scans": sum(1 for n in tree if n == "Scan"),
        "cache_reads": plan.count("InMemoryTableScan") + plan.count("TableCacheQueryStage"),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
    }


def audit_shared_bases(spark, sf_dir: str) -> list[str]:
    """The shared-base contract (VERDICT r11 #8): every declared consumer of
    a shared memo must READ the materialized base — its physical plan scans
    the memo's checkpoint blocks (ExistingRDD) instead of re-deriving the
    base from parquet. Returns a list of violations (empty = contract
    holds). Run by ``--shared-base`` and pinned by
    tests/test_shared_memos.py."""
    from bench import SHARED_MEMO_CONSUMERS, SHARED_MEMOS

    qs = all_queries()
    violations: list[str] = []
    for consumer, memo in sorted(SHARED_MEMO_CONSUMERS.items()):
        reset, warm = SHARED_MEMOS[memo]
        reset()
        warm(spark, sf_dir)
        plan = formatted_plan(qs[consumer](spark, sf_dir))
        if "ExistingRDD" not in plan:
            violations.append(
                f"{consumer}: no ExistingRDD scan with a warm '{memo}' memo "
                f"(the consumer re-derives the base instead of reading it)"
            )
        reset()
    return violations


def main() -> int:
    if "--shared-base" in sys.argv[1:]:
        args = [a for a in sys.argv[1:] if a != "--shared-base"]
        sf_dir = args[0] if args else "/root/testdata/sf0.01"
        spark = get_spark()
        spark.sparkContext.setLogLevel("ERROR")
        bad = audit_shared_bases(spark, sf_dir)
        for v in bad:
            print(f"FAIL {v}")
        print(f"shared-base contract: {'OK' if not bad else f'{len(bad)} violation(s)'}")
        return 1 if bad else 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    names = [n for n in HEADLINE if not only or n in only] or sorted(only)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    unknown = set(names) - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    hdr = ("query", "shuffles", "bcast", "smj", "nestloop", "scans", "cache", "pushed")
    print(f"{hdr[0]:35s} " + " ".join(f"{h:>8s}" for h in hdr[1:]))
    for name in names:
        a = audit(formatted_plan(qs[name](spark, sf_dir)))
        print(
            f"{name:35s} {a['shuffles']:8d} {a['bcast_joins']:8d} {a['smj']:8d} "
            f"{a['nested_loop']:8d} {a['scans']:8d} {a['cache_reads']:8d} {a['pushed']:8d}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
