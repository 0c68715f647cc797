"""Paired in-JVM A/B for the load_table small-scan repartition (r14):
for each query, alternate SPARK_GRAFT_SCAN_REPARTITION=0/1 across repeats
in ONE session (the gate is read at query-build time), so both arms see
identical JVM state, cache state, and host conditions. Prints best-of-N
per arm plus the calibration probe.

Usage: python scripts/abrepart.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
       SPARK_GRAFT_REPEATS (default 4, per arm)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SHARED_MEMOS, SHARED_MEMO_CONSUMERS, _calibration_probe, _reset_all_memos  # noqa: E402
from cdc_postgresql_clickhouse_spark.queries import all_queries  # noqa: E402
from cdc_postgresql_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "4")))
    spark = get_spark(
        app_name="cdc-spark-abrepart",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.sql.codegen.cache.maxEntries": "5000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        for arm in ("0", "1"):
            os.environ["SPARK_GRAFT_SCAN_REPARTITION"] = arm
            registry[name](spark, warm_dir).count()

    print(f"# probe_pre {_calibration_probe(spark):.3f}", flush=True)
    for name in names:
        best = {"0": float("inf"), "1": float("inf")}
        rows = {}
        for _ in range(repeats):
            for arm in ("0", "1"):
                os.environ["SPARK_GRAFT_SCAN_REPARTITION"] = arm
                spark.catalog.clearCache()
                _reset_all_memos()
                memo = SHARED_MEMO_CONSUMERS.get(name)
                if memo is not None:
                    SHARED_MEMOS[memo][1](spark, sf_dir)
                t0 = time.perf_counter()
                rows[arm] = registry[name](spark, sf_dir).count()
                best[arm] = min(best[arm], time.perf_counter() - t0)
        tag = "SAME" if rows["0"] == rows["1"] else "ROWS-DIFFER"
        print(
            f"{name} base={best['0']:.3f} repart={best['1']:.3f} "
            f"ratio={best['0'] / best['1']:.2f}x rows={rows['1']} {tag}",
            flush=True,
        )
    print(f"# probe_post {_calibration_probe(spark):.3f}", flush=True)
    os.environ.pop("SPARK_GRAFT_SCAN_REPARTITION", None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
