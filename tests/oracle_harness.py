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
    con.execute("SET memory_limit='16GB'")
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
    return issues


def _spark_sql_type(dt) -> str:
    return dt.simpleString()


def schema_summary(spark_df) -> dict[str, str]:
    return {f.name: _spark_sql_type(f.dataType) for f in spark_df.schema.fields}
