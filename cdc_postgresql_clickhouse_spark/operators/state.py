"""ReplacingMergeTree semantics in Spark: current-state view + idempotent upsert.

The reference keeps per-key latest state in
``ReplacingMergeTree(version, is_deleted) ORDER BY booking_id``
(``schemas/clickhouse_schemas.sql:11-13``): duplicate keys collapse to the
max-version row at merge time, a surviving ``is_deleted=1`` row is dropped,
and correct reads require query-time finalization (``FINAL``,
``README.md:309-318``).

Spark design (survey §2.10 ST3): state lives in the **table**, not in any
streaming state store — key cardinality is bounded by storage, not executor
memory, which is the 100 TB posture. Two equivalent consumption modes:

1. ``current_state`` — read-time dedup view (the ``FINAL`` analogue, R1):
   window arg-max per key. Single hash-partition shuffle on the key; at scale
   the input is pre-bucketed by key so the shuffle is a no-op.
2. ``apply_changes`` — batch/micro-batch upsert that materializes the merged
   state (the background-merge analogue). On Delta this is ``MERGE INTO``;
   on plain parquet we implement merge-by-rewrite: union(state, updates) →
   arg-max → overwrite. With state partitioned by key-hash bucket, only
   buckets containing updated keys need rewriting at scale.

Version semantics, NOT event time (survey ST2): a late event simply loses the
max-version contest; no watermarks. Idempotent under at-least-once replay
(``clickhouse_sink_configuration.json:13``) because arg-max over a multiset
is replay-invariant.

Tie-break for equal versions (ClickHouse keeps the last-inserted row, which
is nondeterministic): deterministic order (version, ts_ms, is_deleted) so a
delete wins over a non-delete at the same version instant — then ALL
remaining columns (sorted by name, descending) as a final disambiguator, so
the winner is a pure function of the change multiset. Full determinism
matters on Spark specifically: task retries and speculative execution
re-evaluate partitions, and an arrival-order-dependent winner would make
state non-reproducible across retries (hypothesis found exactly this:
tests/test_properties.py::test_arrival_order_invariance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_KEY = ("booking_id",)
DEFAULT_VERSION_ORDER = ("version", "ts_ms", "is_deleted")


def _total_order(
    df: DataFrame, key_cols: tuple[str, ...], version_cols: tuple[str, ...]
) -> list:
    """Version order extended to a TOTAL order: remaining columns (sorted by
    name) break any residual tie, making the per-key winner a deterministic
    function of the change multiset — retry/replay/speculation-safe."""
    rest = sorted(set(df.columns) - set(key_cols) - set(version_cols))
    return [F.col(c).desc() for c in (*version_cols, *rest)]


def current_state(
    updates: DataFrame,
    key_cols: tuple[str, ...] = DEFAULT_KEY,
    version_cols: tuple[str, ...] = DEFAULT_VERSION_ORDER,
    deleted_col: str = "is_deleted",
    keep_internal: bool = False,
) -> DataFrame:
    """R1 — the FINAL-equivalent current-state view (survey §2.10 ST5).

    Arg-max per key over the version order, then soft-delete filter. One
    shuffle by key; Catalyst pushes the subsequent filter and any caller
    projections into the scan.
    """
    w = Window.partitionBy(*key_cols).orderBy(*_total_order(updates, key_cols, version_cols))
    out = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .filter(F.col(deleted_col) == 0)
    )
    if not keep_internal:
        out = out.drop(deleted_col, "ts_ms")
    return out


def snapshot_load(snapshot: DataFrame, version: int = 1) -> DataFrame:
    """S7 — initial cross-DB load with literal version stamping.

    The reference backfills via ClickHouse's ``postgresql()`` table function,
    stamping ``1 AS version`` (``README.md:156-168``); snapshots are outside
    the streaming path (``snapshot.mode=never``,
    ``debezium_configuration.json:23``). Spark form: any batch read (JDBC /
    parquet) → stamp version + not-deleted.
    """
    return (
        snapshot.withColumn("version", F.lit(version).cast("long"))
        .withColumn("is_deleted", F.lit(0))
        .withColumn("ts_ms", F.lit(0).cast("long"))
    )


def apply_changes(
    state: DataFrame | None,
    updates: DataFrame,
    key_cols: tuple[str, ...] = DEFAULT_KEY,
    version_cols: tuple[str, ...] = DEFAULT_VERSION_ORDER,
    deleted_col: str = "is_deleted",
) -> DataFrame:
    """Idempotent batch upsert: merge updates into state, keep max-version row
    per key, retain tombstones *in the merged state* so a later replay of an
    older event still loses (S9/S10). Reads of the result go through
    ``current_state`` (or its ``keep_internal`` form is this function's
    output filtered).

    Equivalent to Delta ``MERGE INTO ... WHEN MATCHED AND s.version >
    t.version`` but expressed as union + arg-max so it works on any store and
    stays a single shuffle. Tombstones are retained (not dropped) which is
    exactly ClickHouse's part-merge behavior before ``FINAL``.
    """
    merged = updates if state is None else state.unionByName(updates, allowMissingColumns=True)
    w = Window.partitionBy(*key_cols).orderBy(*_total_order(merged, key_cols, version_cols))
    return merged.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def read_state(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None  # first batch: no state yet


def write_state(state: DataFrame, path: str, key_buckets: int | None = None) -> None:
    """Materialize merged state. Overwrite-by-rewrite on parquet; on Delta
    this becomes MERGE + OPTIMIZE. ``key_buckets`` repartitions by key hash
    so a cluster rewrite only touches dirty buckets."""
    out = state
    if key_buckets:
        out = state.repartition(key_buckets, *DEFAULT_KEY)
    out.write.mode("overwrite").parquet(path)


def compact_state(
    spark: SparkSession, path: str, key_buckets: int = 8
) -> None:
    """The OPTIMIZE / background-merge analogue (ClickHouse merges parts
    continuously; ``OPTIMIZE TABLE ... DEDUPLICATE`` forces it,
    /root/reference/README.md:310). Micro-batch upserts leave one file-set
    per batch; compaction rewrites the state into ``key_buckets`` key-hashed
    files, restoring scan locality and making subsequent merges touch fewer
    files. Run out-of-band (the streaming query keeps working either way) —
    on Delta this maps to OPTIMIZE + ZORDER and needs no read-block."""
    state = read_state(spark, path)
    if state is None:
        return
    tmp = f"{path}.compact-tmp"
    write_state(state, tmp, key_buckets=key_buckets)
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    import os

    os.rename(tmp, path)


def consistency_check(source: DataFrame, replica: DataFrame) -> bool:
    """The reference's verification methodology (``README.md:309-329``):
    identical entries + identical counts, expressed as two-sided exceptAll."""
    cols = sorted(set(source.columns) & set(replica.columns))
    s, r = source.select(*cols), replica.select(*cols)
    return s.exceptAll(r).isEmpty() and r.exceptAll(s).isEmpty()
