"""Local emulation of the driver's full correctness gate: every registered
query vs its DuckDB oracle at a given sf dir. Usage:

    python scripts/parity_sweep.py [--pending] [sf_dir] [query ...]

--pending sweeps the round-7 PENDING layer (PENDING_QUERIES/PENDING_ORACLE
across the query modules) instead of the registered contract — the flip
validation tool. Prints one line per query (OK/FAIL/ERR) and a final
summary; exit code 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from tests.oracle_harness import compare, duckdb_con  # noqa: E402
from cdc_postgresql_clickhouse_spark.session import get_spark  # noqa: E402


def _pending_maps() -> tuple[dict, dict]:
    import importlib

    qs: dict = {}
    oracles: dict = {}
    mods = (
        "tokenizer cdc chunking search sketches skew graph text_ext pca tpch_ext "
        "events tpch_more training quality text streaming_queries similarity "
        "cluster dedup corpus"
    ).split()
    for m in mods:
        mod = importlib.import_module(f"cdc_postgresql_clickhouse_spark.queries.{m}")
        qs.update(getattr(mod, "PENDING_QUERIES", {}))
        oracles.update(getattr(mod, "PENDING_ORACLE", {}))
    return qs, oracles


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--pending"]
    pending = "--pending" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark()
    if pending:
        qs, oracles = _pending_maps()
    else:
        qs, oracles = entry.queries(), entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}; known: {sorted(qs)}")
        return 2
    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        # drop every persisted barrier from the previous query: a 177-query
        # session otherwise ACCUMULATES the postings/shingle/word/embedding
        # caches until the single local JVM aborts mid-sweep (observed at
        # sf0.1 — the driver's own gate runs far fewer queries per session)
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            sql = oracles.get(name)
            if sql is None:
                n = df.count()
                print(f"OK   {name}: rows={n} (no oracle) [{time.time()-t0:.1f}s]")
                continue
            # per-QUERY DuckDB connection, same hygiene as the pytest
            # harness: one long-lived instance across 200+ oracle queries
            # accumulates allocator state until a heavy CTE stack dies on a
            # transient OOM (observed once on the PCA row mid-sweep;
            # standalone it passes) — reconnecting is milliseconds
            con = duckdb_con(sf_dir)
            try:
                issues = [i for i in compare(df, con, sql, name) if "[WARN]" not in i]
            finally:
                con.close()
            if issues:
                failures.append(name)
                print(f"FAIL {name} [{time.time()-t0:.1f}s]")
                for i in issues:
                    print(f"     {i}")
            else:
                print(f"OK   {name} [{time.time()-t0:.1f}s]")
        except Exception:
            failures.append(name)
            print(f"ERR  {name} [{time.time()-t0:.1f}s]")
            traceback.print_exc(limit=3)
    print(f"\n{ran - len(failures)}/{ran} pass; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
