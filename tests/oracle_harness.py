"""Local emulation of the driver's correctness gate: run a Spark query and
its DuckDB oracle side-by-side, compare row count, column names/types, and
order-insensitive values (exact; floats compared bitwise with a reported max
abs diff on mismatch)."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

from cdc_postgresql_clickhouse_spark.sources.registry import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound the oracle's memory and give it a spill path: DuckDB defaults to
    # ~80% of host RAM with no temp_directory on an in-memory connection, so
    # a heavy oracle (the ANN CTE stacks) racing a large Spark JVM for the
    # same RAM dies with OutOfMemoryException instead of going out-of-core
    # (observed once under full-suite memory pressure). An explicit cap +
    # temp dir makes the oracle spill instead of fail.
    tmp = os.environ.get("TMPDIR", "/tmp")
    con.execute(f"SET temp_directory='{os.path.join(tmp, 'duckdb_oracle_spill')}'")
    # Cap at min(16GB, 40% of physical RAM): a fixed 16GB on a small host
    # would RAISE DuckDB's cap above its 80%-of-RAM default and make the OOM
    # this setting exists to avoid more likely. Env-overridable for odd hosts.
    limit = os.environ.get("ORACLE_DUCKDB_MEMORY_LIMIT")
    if limit is None:
        try:
            pages = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
            limit = f"{min(24.0, pages * 0.4 / 2**30):.1f}GB"
        except (ValueError, OSError, AttributeError):
            limit = "4.0GB"
    con.execute(f"SET memory_limit='{limit}'")
    # Bound oracle parallelism: DuckDB 1.0 defaults to every host thread
    # (32 here) and per-thread sort/window buffers are PINNED — the heavy
    # ANN cross-join + rank oracles intermittently exhausted the buffer
    # manager ("failed to allocate block of 2048 bytes") at full width even
    # with spill configured. 8 threads cuts pinned memory 4x; the oracle is
    # the correctness twin, not the thing being benchmarked.
    con.execute(f"SET threads={int(os.environ.get('ORACLE_DUCKDB_THREADS', '8'))}")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            out[c] = s.map(lambda v: str(v) if v is not None and not isinstance(v, float) else v)
    sort_cols = list(out.columns)
    out = out.sort_values(sort_cols, na_position="last").reset_index(drop=True)
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    issues: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    if len(sp) != len(du):
        issues.append(f"{name}: row count spark={len(sp)} duckdb={len(du)}")
    if sorted(sp.columns) != sorted(du.columns):
        issues.append(f"{name}: columns spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
        return issues
    sp_n, du_n = _normalize(sp), _normalize(du)
    if len(sp_n) != len(du_n):
        return issues
    for c in sp_n.columns:
        a, b = sp_n[c], du_n[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af = a.astype(float).to_numpy()
            bf = b.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            eq = (af == bf) | both_nan
            if not eq.all():
                bad = ~eq
                md = np.nanmax(np.abs(af[bad] - bf[bad])) if bad.any() else 0.0
                issues.append(
                    f"{name}.{c}: {bad.sum()}/{len(af)} float mismatches, max abs diff {md:.3e}"
                )
        else:
            ne = ~(a.eq(b) | (a.isna() & b.isna()))
            if ne.any():
                i = int(np.argmax(ne.to_numpy()))
                issues.append(
                    f"{name}.{c}: {int(ne.sum())}/{len(a)} mismatches, first at row {i}: "
                    f"spark={a.iloc[i]!r} duckdb={b.iloc[i]!r}"
                )
    # dtype drift worth knowing about (driver checks schema)
    for c in sp_n.columns:
        if str(sp_n[c].dtype) != str(du_n[c].dtype):
            issues.append(f"{name}.{c}: dtype spark={sp_n[c].dtype} duckdb={du_n[c].dtype} [WARN]")
    issues.extend(type_lint(spark_df, con, sql, name))
    return issues


# --- result-type lint --------------------------------------------------------
#
# Two driver rounds were lost to result-TYPE divergence that value comparison
# cannot see after pandas coercion: r4 (DuckDB float percentile interpolation
# vs Spark bigint) and r6 (DuckDB widening SUM(BIGINT) to HUGEINT → Arrow
# decimal128(38,0) vs Spark int64 — values identical, driver value-hash
# differs). The lint compares TYPE FAMILIES at the Arrow layer, where the
# driver hashes, using a LIMIT-0 bind of the oracle (no execution cost):
# an oracle column whose Arrow family (int/float/decimal/...) differs from
# its Spark twin's is a HARD failure, not a [WARN].

_ARROW_FAMILY_TESTS = (
    ("decimal", "is_decimal"),
    ("int", "is_integer"),
    ("float", "is_floating"),
    ("bool", "is_boolean"),
    ("str", "is_string"),
    ("str", "is_large_string"),
    ("timestamp", "is_timestamp"),
    ("date", "is_date"),
    ("binary", "is_binary"),
    ("binary", "is_large_binary"),
    ("list", "is_list"),
    ("list", "is_large_list"),
    ("list", "is_fixed_size_list"),
    ("struct", "is_struct"),
    ("map", "is_map"),
    ("null", "is_null"),
)

_SPARK_FAMILY = {
    "byte": "int", "short": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "boolean": "bool", "string": "str",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp", "date": "date",
    "binary": "binary", "void": "null",
}


def _arrow_family(t) -> str:
    import pyarrow.types as pt

    for fam, pred in _ARROW_FAMILY_TESTS:
        if getattr(pt, pred)(t):
            return fam
    return str(t)


def _spark_family(dt) -> str:
    s = dt.simpleString()
    if s.startswith("decimal"):
        return "decimal"
    if s.startswith("array"):
        return "list"
    if s.startswith("struct"):
        return "struct"
    if s.startswith("map"):
        return "map"
    return _SPARK_FAMILY.get(s, s)


def type_lint(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> list[str]:
    """Hard type-family parity between the Spark result schema and the
    oracle's Arrow output schema (LIMIT-0 bind — planning only)."""
    issues: list[str] = []
    try:
        oracle = con.execute(f"SELECT * FROM (\n{sql}\n) AS _type_lint LIMIT 0").arrow().schema
    except Exception as e:  # pragma: no cover - lint must not mask the real run
        return [f"{name}: type-lint bind failed: {e}"]
    spark_fields = {f.name: f.dataType for f in spark_df.schema.fields}
    for field in oracle:
        if field.name not in spark_fields:
            continue  # column-set parity is compare()'s job
        ofam = _arrow_family(field.type)
        sfam = _spark_family(spark_fields[field.name])
        if ofam == "null" or sfam == "null":
            continue  # untyped NULL literal matches anything
        if ofam != sfam:
            issues.append(
                f"{name}.{field.name}: result-type family mismatch — "
                f"oracle {field.type} ({ofam}) vs spark "
                f"{spark_fields[field.name].simpleString()} ({sfam}); the driver "
                f"value-hash distinguishes these even when values match "
                f"(cast the oracle, e.g. ::BIGINT / ::DOUBLE)"
            )
    return issues


def _spark_sql_type(dt) -> str:
    return dt.simpleString()


def schema_summary(spark_df) -> dict[str, str]:
    return {f.name: _spark_sql_type(f.dataType) for f in spark_df.schema.fields}
