"""Order-statistics distinct sketch: KMV (k minimum values, Bar-Yossef et
al. 2002 / Beyer et al. SIGMOD'07) per event type — the mergeable
distinct-count estimator behind theta sketches, complementing the
hash-threshold sampler in ``queries/events.py``.

Why KMV here: like the threshold sketch it is a pure function of the id SET
(not of partitioning or merge order), so the DuckDB twin is exact and the
driver hash-verifies an approximate operator end-to-end. Unlike the
threshold sketch, its memory is a FIXED k hashes per group regardless of
corpus size — the property that makes it a sketch: at 100 TB the per-group
state that crosses the shuffle is k rows, and two KMV states merge by
keeping the k smallest of the union (how a map-side partial would combine).

Estimator: with U(0,1)-uniform hashes, E[distinct] = (k-1)/h_(k) where
h_(k) is the k-th smallest hash. Hashes are the first 12 hex digits of
md5(user_id) normalized by 16^12 — engine-identical strings, integer
decode via the shared nibble fold, one double division at the end. Groups
with fewer than k distinct hashes report their exact count (standard
small-cardinality fallback).

Scale shape: one distinct shuffle on (event_type, hash) — at extreme
volume insert a per-partition top-k combine first (sort_array(slice) over
collect_set per partition) to cap shuffle volume at k per partition-group;
then one k-row window per group. No data-size-proportional state anywhere
past the distinct.

Reference tie-in: ClickHouse ``uniq``/``uniqTheta`` family
(`/root/reference/README.md` verification queries use exact count); survey
§2.13 extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table

KMV_K = 64
_HEX_DIGITS = 12
_NORM = float(16 ** _HEX_DIGITS)


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str, k: int = KMV_K) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type", F.substring(F.md5(F.col("user_id").cast("string")), 1, _HEX_DIGITS).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    per = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_tracked"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )
    # conv(hex, 16, 10) on 12 hex digits fits a signed long exactly (2^48)
    vk = F.conv(F.col("hk"), 16, 10).cast("long") / F.lit(_NORM)
    est = F.when(F.col("n_tracked") < k, F.col("n_tracked").cast("double")).otherwise(
        F.lit(float(k - 1)) / vk
    )
    return per.select(
        "event_type",
        "n_tracked",
        (F.floor(est * F.lit(1000000.0)).cast("double") / F.lit(1000000.0)).alias("kmv_estimate"),
    )


# integer value of the first 12 md5 hex digits via an explicit nibble chain
# (DuckDB has no base-16 conv); identical to Spark's conv(h, 16, 10)
_SQL_HEX12 = "(" + " + ".join(
    f"(instr('0123456789abcdef', substring(h, {i + 1}, 1)) - 1) * {16 ** (_HEX_DIGITS - 1 - i)}"
    for i in range(_HEX_DIGITS)
) + ")"

_SQL_KMV = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         substring(md5(CAST(user_id AS VARCHAR)), 1, {_HEX_DIGITS}) AS h
  FROM events
),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
  QUALIFY rn <= {KMV_K}
),
per AS (
  SELECT event_type,
         COUNT(*) AS n_tracked,
         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS h
  FROM ranked GROUP BY event_type
)
SELECT event_type,
       n_tracked,
       CAST(FLOOR(
         (CASE WHEN n_tracked < {KMV_K}
               THEN CAST(n_tracked AS DOUBLE)
               ELSE {float(KMV_K - 1)} / (CAST({_SQL_HEX12} AS BIGINT) / {_NORM!r})
          END) * 1000000.0) AS DOUBLE) / 1000000.0 AS kmv_estimate
FROM per
"""

QUERIES = {"sketch_kmv_distinct": sketch_kmv_distinct}
ORACLE = {"sketch_kmv_distinct": _SQL_KMV}


# --- robust anomaly detection (median / MAD) --------------------------------
#
# Median-absolute-deviation outlier flagging per event type — the robust
# z-score ("Hampel identifier") that survives the heavy tails a mean/stddev
# rule chokes on. Cross-engine exactness: values become integer CENTS first
# (floor(v*100 + 0.5) on identical doubles), so every percentile
# interpolation lands on exact binary fractions (x.0/x.5/x.25) and Spark's
# percentile() equals DuckDB's quantile_cont() bit-for-bit. Scale shape: two
# keyed aggregations + one keyed join back; exact percentiles shuffle the
# group's values — at extreme per-group volume swap percentile() for
# approx_percentile with a documented tolerance (the estimate then stops
# being oracle-checkable, which is why the registered form is exact).

MAD_SIGMA = 1.4826  # consistency constant: MAD ≈ sigma for normal data
MAD_CUTOFF = 3.0


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    )
    med = d.groupBy("event_type").agg(F.percentile("c", 0.5).alias("med"))
    dev = d.join(med, "event_type").select(
        "event_type", "med", F.abs(F.col("c") - F.col("med")).alias("ad")
    )
    madf = dev.groupBy("event_type").agg(F.percentile("ad", 0.5).alias("mad"))
    res = dev.join(madf, "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("med").alias("median_cents"),
        F.max("mad").alias("mad_cents"),
        F.sum(
            F.when(F.col("ad") > F.lit(MAD_CUTOFF * MAD_SIGMA) * F.col("mad"), 1).otherwise(0)
        ).alias("n_anomalies"),
    )
    return res


_SQL_MAD = f"""
WITH d AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
med AS (
  SELECT event_type, quantile_cont(CAST(c AS DOUBLE), 0.5) AS med
  FROM d GROUP BY event_type
),
dev AS (
  SELECT d.event_type, med.med, abs(d.c - med.med) AS ad
  FROM d JOIN med USING (event_type)
),
madf AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       COUNT(*) AS n_events,
       MAX(dev.med) AS median_cents,
       MAX(madf.mad) AS mad_cents,
       SUM(CASE WHEN dev.ad > {MAD_CUTOFF * MAD_SIGMA!r} * madf.mad THEN 1 ELSE 0 END) AS n_anomalies
FROM dev JOIN madf USING (event_type)
GROUP BY dev.event_type
"""

QUERIES["events_anomaly_mad"] = events_anomaly_mad
ORACLE["events_anomaly_mad"] = _SQL_MAD


# --- EWMA (ordered sequential fold) -----------------------------------------
#
# Exponentially-weighted moving average of each user's value stream — the
# classic online smoother (Roberts 1959, EWMA control charts). This is the
# registry's canonical ORDERED-FOLD pattern: a sequential recurrence
# (state_t = f(state_{t-1}, x_t)) that no commutative aggregate expresses.
# The distributed form: ONE groupBy collects each key's (ts, id, value)
# triples, sort_array imposes the event order deterministically (total
# order: ts then event_id), and a higher-order aggregate() folds the
# recurrence per key — per-key cost is its own history, keys run in
# parallel, and the shuffle is the same single hash partition a sessionize
# pays. alpha = 0.5 makes every intermediate an exact binary fraction
# ((acc + x) * 0.5 on integer cents), so the fold is bit-identical in both
# engines with no truncation step at all.

def events_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("us"),
            F.col("event_id").alias("eid"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        ).alias("s"),
    )
    arr = d.groupBy("user_id").agg(F.sort_array(F.collect_list("s")).alias("a"))
    ewma = F.aggregate(
        F.slice("a", 2, F.size("a") - 1),
        F.element_at("a", 1).getField("c").cast("double"),
        lambda acc, s: (acc + s.getField("c")) * F.lit(0.5),
    )
    return arr.select(
        "user_id",
        F.size("a").cast("long").alias("n_events"),
        F.element_at("a", -1).getField("c").alias("last_cents"),
        ewma.alias("ewma_cents"),
    )


_SQL_EWMA = """
WITH d AS (
  SELECT user_id,
         {'us': epoch_us(ts), 'eid': event_id,
          'c': CAST(FLOOR(value * 100 + 0.5) AS BIGINT)} AS s
  FROM events
),
arr AS (
  SELECT user_id, list_sort(list(s)) AS a FROM d GROUP BY user_id
)
SELECT user_id,
       len(a)::BIGINT AS n_events,
       a[-1].c AS last_cents,
       list_reduce(list_prepend(CAST(a[1].c AS DOUBLE),
                                list_transform(a[2:], x -> CAST(x.c AS DOUBLE))),
                   (acc, x) -> (acc + x) * 0.5) AS ewma_cents
FROM arr
"""

QUERIES["events_user_ewma"] = events_user_ewma
ORACLE["events_user_ewma"] = _SQL_EWMA
