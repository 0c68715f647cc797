"""Standalone per-query timing with bench.py's exact methodology:
fresh JVM per invocation, warm-up at sf0.001, clearCache + memo reset per
run, declared consumers get their memo warmed OUTSIDE the timed region,
best-of-N wall-clock of `.count()`.

Usage: python scripts/qbench.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
       SPARK_GRAFT_REPEATS (default 5)
Prints one line per query: `<name> <best_sec> rows=<n>`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SHARED_MEMOS, SHARED_MEMO_CONSUMERS, _reset_all_memos  # noqa: E402
from cdc_postgresql_clickhouse_spark.queries import all_queries  # noqa: E402
from cdc_postgresql_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "5")))
    spark = get_spark(
        app_name="cdc-spark-qbench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.sql.codegen.cache.maxEntries": "5000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        registry[name](spark, warm_dir).count()

    def probe() -> float:
        from bench import _calibration_probe

        return _calibration_probe(spark)

    if os.environ.get("SPARK_GRAFT_PROBE"):
        print(f"# probe_pre {probe():.3f}", flush=True)
    for name in names:
        best, rows = float("inf"), None
        for _ in range(repeats):
            spark.catalog.clearCache()
            _reset_all_memos()
            memo = SHARED_MEMO_CONSUMERS.get(name)
            if memo is not None:
                SHARED_MEMOS[memo][1](spark, sf_dir)
            t0 = time.perf_counter()
            rows = registry[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        print(f"{name} {best:.3f} rows={rows}", flush=True)
    if os.environ.get("SPARK_GRAFT_PROBE"):
        print(f"# probe_post {probe():.3f}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
