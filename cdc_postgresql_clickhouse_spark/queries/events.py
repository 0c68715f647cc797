"""Event-stream analytics with DuckDB oracles: time bucketing, sessionization,
semi-structured JSON — the batch twins of the Structured Streaming surface
(survey §2.10 ST6; the streaming forms live in ``streaming/``).

Portability: time buckets are computed on floor-epoch seconds (bigint) so
both engines bucket identically; Spark uses its native ``F.window`` and
converts the window start back to epoch, the oracle computes the aligned
bucket arithmetically — same result by construction (tumbling windows are
epoch-aligned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.queries._pending import flip_pending

DEC = "decimal(18,2)"


def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows via native F.window (same operator the
    streaming path uses with a watermark); map-side partial agg, one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag → new-session flag → running
    sum as session index → per-session aggregates. Two windows + one groupBy,
    all shuffled once on user_id (same partitioning reused across stages)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.floor(F.unix_timestamp("ts")).cast("long").alias("es")
    )
    w_order = Window.partitionBy("user_id").orderBy("es", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("es").over(w_order).isNull() | ((F.col("es") - F.lag("es").over(w_order)) > 1800),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    run = Window.partitionBy("user_id").orderBy("es", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.withColumn("session_idx", F.sum("new_sess").over(run))
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("es").alias("session_start_epoch"),
        (F.max("es") - F.min("es")).alias("duration_s"),
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access (the reference's schemaless-JSON hop, S11):
    JSON path extraction stays JVM-side via get_json_object."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select((k % 10).alias("k_mod"), F.col("value"))
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.floor(F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1)) * 1e6)
                .cast("double") / F.lit(1000000.0)
            ).alias("avg_value"),
        )
    )


def events_sliding_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min length, 5 min slide) via native F.window —
    each event lands in exactly length/slide = 2 windows. The oracle derives
    the same two epoch-aligned starts arithmetically; map-side the window
    explode is a bounded ×2 fan-out, then one shuffle on the window start."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "n_events",
            "sum_value",
        )
    )


def events_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (``streaming.joins.purchase_attribution_join``): per user, how many
    (purchase, view-within-10-minutes-before) pairs and how many distinct
    attributed purchases. The join shuffles both sides on user_id; the
    interval predicate is evaluated post-join (in streaming it additionally
    bounds state eviction)."""
    from cdc_postgresql_clickhouse_spark.streaming.joins import purchase_attribution_join

    ev = load_table(spark, sf_dir, "events")
    pairs = purchase_attribution_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("purchase_id").alias("n_attributed"),
    )


def events_error_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-less range join, bucketized: for every error event, count/sum ALL
    events (any user) within ±60 s — "what was happening around each error".

    The naive plan for a pure time-band predicate is a
    BroadcastNestedLoopJoin: O(errors × events), the classic range-join
    scale-killer. Bucketize-then-refine makes it an EQUI-join: each event
    lands in one 60 s bucket; each error probes buckets {b-1, b, b+1}
    (3-row explode on the small side only); the exact ±60 s predicate
    refines post-join. Any event within the band provably falls in one of
    the three probed buckets, and each event has exactly ONE bucket, so no
    pair is ever produced twice (no distinct needed). At 100 TB both sides
    shuffle-partition on the bucket key — pair cost is bounded by bucket
    occupancy, never |A|×|B| (same principle as Spark's range-join-hint
    bucketing and KDB band joins).
    """
    w = 60
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.floor(F.unix_timestamp("ts")).cast("long").alias("es"), "event_type", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("es").alias("err_es")
    )
    probes = errors.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.floor(F.col("err_es") / w) - 1),
                F.floor(F.col("err_es") / w),
                (F.floor(F.col("err_es") / w) + 1),
            )
        ),
    )
    others = ev.select(
        F.col("event_id").alias("o_id"), F.col("es").alias("o_es"), "value"
    ).withColumn("bucket", F.floor(F.col("o_es") / w))
    pairs = probes.join(others, "bucket").filter(
        (F.abs(F.col("o_es") - F.col("err_es")) <= w) & (F.col("o_id") != F.col("err_id"))
    )
    per_err = pairs.groupBy("err_id").agg(
        F.count(F.lit(1)).alias("n_nearby"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )
    # left join back so zero-neighbor errors still report (n_nearby = 0)
    return errors.select("err_id").join(per_err, "err_id", "left").select(
        "err_id",
        F.coalesce(F.col("n_nearby"), F.lit(0)).alias("n_nearby"),
        "sum_value",
    )


def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count sketch via hash-threshold sampling (distinct sampling,
    Gibbons VLDB'01 — the relational cousin of ClickHouse ``uniq``/HLL):
    count only users whose md5 lands in the first 1/16 of hash space, scale
    by 16. Unlike HLL registers, this sketch is pure relational algebra —
    the threshold filter is a map-side predicate (at 100 TB it drops ~94 %
    of rows BEFORE the distinct shuffle), the estimate is deterministic
    (a function of the user-id set, not of partitioning or merge order),
    and the DuckDB twin is exact — so the driver hash-verifies an
    *approximate* operator, which HLL's engine-specific registers never
    allow. Built-in ``approx_count_distinct`` remains the constant-memory
    alternative when cross-engine determinism isn't required."""
    ev = load_table(spark, sf_dir, "events")
    sampled_user = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) == "0", F.col("user_id")
    )
    return ev.groupBy("event_type").agg(
        (F.countDistinct(sampled_user) * 16).alias("est_distinct_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# Registration order is load-bearing: the driver's correctness gate checks
# the first 50 registered queries, so the entries that have never had a
# driver row (error_blast_radius, sketch, purchase_attribution) register
# ahead of the twice-proven window queries.
QUERIES = {
    "events_error_blast_radius": events_error_blast_radius,
    "sketch_distinct_users": sketch_distinct_users,
    "events_purchase_attribution": events_purchase_attribution,
    "events_tumbling_5min": events_tumbling_5min,
    "events_sliding_10min": events_sliding_10min,
    "events_sessionize": events_sessionize,
    "events_json_extract": events_json_extract,
}

ORACLE = {
    # the oracle states the RANGE-JOIN SEMANTICS directly (theta join);
    # the Spark side must reproduce it through the bucketized plan
    "events_error_blast_radius": """
WITH ev AS (
  SELECT event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, event_type, value FROM events
),
err AS (SELECT event_id AS err_id, es AS err_es FROM ev WHERE event_type = 'error'),
agg AS (
  SELECT e.err_id, COUNT(o.event_id) AS n_nearby,
         CAST(SUM(CAST(o.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM err e
  LEFT JOIN ev o ON abs(o.es - e.err_es) <= 60 AND o.event_id <> e.err_id
  GROUP BY e.err_id
)
SELECT err_id, n_nearby, sum_value FROM agg
""",
    "sketch_distinct_users": """
SELECT event_type,
       COUNT(DISTINCT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) = '0'
                           THEN user_id END) * 16 AS est_distinct_users,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
    "events_purchase_attribution": """
WITH v AS (SELECT user_id, ts AS view_ts, event_id AS view_id FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id FROM events WHERE event_type = 'purchase')
SELECT p.user_id, COUNT(*) AS n_pairs,
       COUNT(DISTINCT p.purchase_id) AS n_attributed
FROM p JOIN v ON v.user_id = p.user_id
  AND v.view_ts >= p.purchase_ts - INTERVAL 10 MINUTE
  AND v.view_ts <= p.purchase_ts
GROUP BY 1
""",
    "events_tumbling_5min": """
SELECT CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 300) * 300 AS BIGINT) AS bucket_start,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    "events_sessionize": """
WITH base AS (
  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
                 THEN 1 ELSE 0 END AS new_sess
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
), sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY es, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       MIN(es) AS session_start_epoch, MAX(es) - MIN(es) AS duration_s
FROM sess GROUP BY user_id, session_idx
""",
    "events_sliding_10min": """
WITH b AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, value FROM events),
expanded AS (
  SELECT (es // 300) * 300 AS s, value FROM b
  UNION ALL
  SELECT (es // 300) * 300 - 300 AS s, value FROM b
)
SELECT CAST(s AS BIGINT) AS bucket_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM expanded GROUP BY 1
""",
    "events_json_extract": """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       COUNT(*) AS n,
       CAST(FLOOR((CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 1000000.0) AS DOUBLE) / 1000000.0 AS avg_value
FROM events
GROUP BY 1
""",
}


# --- minute gap-fill (ClickHouse ORDER BY ... WITH FILL analogue) -------------
#
# Telemetry dashboards need DENSE time series: a minute with zero events must
# appear as an explicit zero row, not a gap (ClickHouse ships this as WITH
# FILL / WITH FILL STEP; reference-adjacent surface). Per event type, the
# grid spans that type's own [first, last] active minute.
#
# Scale shape: one keyed agg for the sparse counts, one 2-row-per-type agg
# for the ranges, then the grid is EXPLODED from per-type sequences (43k
# minutes/month — array explode per type row, trivially parallel) and
# left-joined back on (type, minute). At extreme spans (years x seconds) the
# sequence array per type gets large: swap the generator for a
# spark.range(lo, hi, step) cross-joined with the type list — same join, the
# grid side just changes producer. No corpus-sized shuffle beyond the
# original count agg either way.


def events_minute_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(ts) div 60 * 60").cast("long").alias("minute_start"),
        "value",
    )
    per = ev.groupBy("event_type", "minute_start").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )
    rng = ev.groupBy("event_type").agg(
        F.min("minute_start").alias("lo"), F.max("minute_start").alias("hi")
    )
    grid = rng.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(60).cast("long"))).alias("minute_start"),
    )
    return grid.join(per, ["event_type", "minute_start"], "left").select(
        "event_type",
        "minute_start",
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


QUERIES["events_minute_gapfill"] = events_minute_gapfill

ORACLE["events_minute_gapfill"] = """
WITH ev AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 60 * 60 AS minute_start,
         value
  FROM events
),
per AS (
  SELECT event_type, minute_start, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM ev GROUP BY 1, 2
),
rng AS (SELECT event_type, MIN(minute_start) AS lo, MAX(minute_start) AS hi FROM ev GROUP BY 1),
grid AS (
  SELECT event_type, unnest(range(lo, hi + 60, 60)) AS minute_start FROM rng
)
SELECT g.event_type, CAST(g.minute_start AS BIGINT) AS minute_start,
       CAST(COALESCE(p.n_events, 0) AS BIGINT) AS n_events,
       COALESCE(p.sum_value, 0.0) AS sum_value
FROM grid g
LEFT JOIN per p ON p.event_type = g.event_type AND p.minute_start = g.minute_start
"""


# --- forward-fill (LOCF) over the dense grid ---------------------------------
#
# The other WITH FILL mode (ClickHouse INTERPOLATE / pandas ffill): silent
# minutes carry the LAST OBSERVED value forward instead of zero — gauges and
# state metrics (queue depth, temperature) fill this way, counters fill with
# zeros (events_minute_gapfill). last_value = the value of the latest event
# in the minute (max_by event_id within the minute, then carried forward);
# minutes before a type's first event stay NULL by definition of the grid
# (the grid starts at the type's first active minute, so row 1 always has a
# value).
#
# Scale shape: gapfill's grid + ONE ordered window per type (ignoreNulls
# last) — the same single-shuffle-per-key posture as the running windows.


def events_minute_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(ts) div 60 * 60").cast("long").alias("minute_start"),
        "event_id",
        "value",
    )
    per = ev.groupBy("event_type", "minute_start").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max_by("value", "event_id").alias("minute_value"),
    )
    rng = ev.groupBy("event_type").agg(
        F.min("minute_start").alias("lo"), F.max("minute_start").alias("hi")
    )
    grid = rng.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(60).cast("long"))).alias("minute_start"),
    )
    joined = grid.join(per, ["event_type", "minute_start"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        "minute_start",
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        F.last("minute_value", ignorenulls=True).over(w).alias("filled_value"),
    )


QUERIES["events_minute_locf"] = events_minute_locf

ORACLE["events_minute_locf"] = """
WITH ev AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 60 * 60 AS minute_start,
         event_id, value
  FROM events
),
per AS (
  SELECT event_type, minute_start, COUNT(*) AS n_events,
         arg_max(value, event_id) AS minute_value
  FROM ev GROUP BY 1, 2
),
rng AS (SELECT event_type, MIN(minute_start) AS lo, MAX(minute_start) AS hi FROM ev GROUP BY 1),
grid AS (
  SELECT event_type, unnest(range(lo, hi + 60, 60)) AS minute_start FROM rng
),
joined AS (
  SELECT g.event_type, g.minute_start,
         COALESCE(p.n_events, 0) AS n_events, p.minute_value
  FROM grid g
  LEFT JOIN per p ON p.event_type = g.event_type AND p.minute_start = g.minute_start
)
SELECT event_type, CAST(minute_start AS BIGINT) AS minute_start,
       CAST(n_events AS BIGINT) AS n_events,
       last_value(minute_value IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY minute_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM joined
"""


# --- equi-width histogram (ClickHouse `histogram` analogue) -----------------
#
# Per-type equi-width value histogram with INTEGER bucket math: values become
# cents (the registry's shared floor(v*100+0.5) step), per-type bounds come
# from one keyed agg, and the bucket width is floor((hi-lo)/NB)+1 — strictly
# greater than (hi-lo)/NB, so (c-lo) div width < NB always: the bucket index
# is provably in [0, NB) with no float edge cases. Two keyed aggs + one
# broadcast-sized join (per-type bounds), everything else map-side; the plan
# is bounded by the event table scan at any scale.

HIST_BUCKETS = 8


def events_histogram_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    )
    bounds = ev.groupBy("event_type").agg(
        F.min("c").alias("lo"), F.max("c").alias("hi")
    )
    b = bounds.select(
        "event_type",
        "lo",
        (F.expr(f"(hi - lo) div {HIST_BUCKETS}") + 1).cast("long").alias("width"),
    )
    d = ev.join(F.broadcast(b), "event_type").select(
        "event_type",
        "lo",
        "width",
        F.expr("(c - lo) div width").cast("long").alias("bucket"),
        "c",
    )
    return d.groupBy("event_type", "bucket").agg(
        F.max(F.col("lo") + F.col("bucket") * F.col("width")).alias("bucket_lo_cents"),
        F.max(F.col("lo") + (F.col("bucket") + 1) * F.col("width") - 1).alias(
            "bucket_hi_cents"
        ),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("c").cast("long").alias("mass_cents"),
    )


QUERIES["events_histogram_equi"] = events_histogram_equi

ORACLE["events_histogram_equi"] = f"""
WITH ev AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
bounds AS (
  SELECT event_type, MIN(c) AS lo, (MAX(c) - MIN(c)) // {HIST_BUCKETS} + 1 AS width
  FROM ev GROUP BY event_type
),
d AS (
  SELECT e.event_type, b.lo, b.width, (e.c - b.lo) // b.width AS bucket, e.c
  FROM ev e JOIN bounds b USING (event_type)
)
SELECT event_type, bucket,
       MAX(lo + bucket * width) AS bucket_lo_cents,
       MAX(lo + (bucket + 1) * width - 1) AS bucket_hi_cents,
       COUNT(*) AS n_events,
       SUM(c)::BIGINT AS mass_cents
FROM d GROUP BY event_type, bucket
"""


# --- winsorized robust statistics -------------------------------------------
#
# Winsorized mean per event type: clamp to the nearest-rank p10/p90 before
# averaging — the trimming-free robust mean (outliers are pulled to the
# fence, not dropped, so the count is preserved). Integer-exact end to end:
# cents, nearest-rank fences k = ceil(q·n) by integer arithmetic
# ((q·n + 99) div 100), the clamp is greatest/least on BIGINT, and the mean
# ships as micro-cents (sum·1e6 div n). One rank window + one keyed agg to
# extract fences + one broadcast-sized join back + one keyed agg — the same
# two-shuffle shape as the MAD row.


def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    )
    wp = Window.partitionBy("event_type")
    r = ev.withColumn("rn", F.row_number().over(wp.orderBy("c"))).withColumn(
        "n", F.count(F.lit(1)).over(wp)
    )
    fences = r.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.expr("(10 * n + 99) div 100"), F.col("c"))).alias(
            "p10_cents"
        ),
        F.max(F.when(F.col("rn") == F.expr("(90 * n + 99) div 100"), F.col("c"))).alias(
            "p90_cents"
        ),
    )
    clamped = ev.join(F.broadcast(fences), "event_type").select(
        "event_type",
        "p10_cents",
        "p90_cents",
        F.greatest("p10_cents", F.least("p90_cents", F.col("c"))).alias("wc"),
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("p10_cents").alias("p10_cents"),
        F.max("p90_cents").alias("p90_cents"),
        F.sum("wc").cast("long").alias("winsorized_sum_cents"),
        F.expr("sum(wc) * 1000000 div count(1)").cast("long").alias(
            "winsorized_mean_microcents"
        ),
    )


QUERIES["events_winsorized_stats"] = events_winsorized_stats

ORACLE["events_winsorized_stats"] = """
WITH ev AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
fences AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (10 * n + 99) // 100 THEN c END) AS p10_cents,
         MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN c END) AS p90_cents
  FROM r GROUP BY event_type
),
clamped AS (
  SELECT e.event_type, f.p10_cents, f.p90_cents,
         GREATEST(f.p10_cents, LEAST(f.p90_cents, e.c)) AS wc
  FROM ev e JOIN fences f USING (event_type)
)
SELECT event_type, COUNT(*) AS n_events,
       MAX(p10_cents) AS p10_cents, MAX(p90_cents) AS p90_cents,
       SUM(wc)::BIGINT AS winsorized_sum_cents,
       (SUM(wc) * 1000000 // COUNT(*))::BIGINT AS winsorized_mean_microcents
FROM clamped GROUP BY event_type
"""


# --- top event paths (session-path mining) ----------------------------------
#
# The "what do users actually do" query: global top-10 three-step event-type
# paths over per-user timelines — ClickHouse funnels' exploratory sibling
# (sequenceCount over every window). Two lags inside the per-user window
# (scale-safe: partitioned by user), one keyed count, and a top-k that
# plans as TakeOrderedAndProject (no global sort). Deterministic tie-break:
# count desc, path asc.

TOP_PATHS_K = 10


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        F.lag("event_type", 2).over(w).alias("a"),
        F.lag("event_type", 1).over(w).alias("b"),
        F.col("event_type").alias("c"),
    ).filter(F.col("a").isNotNull())
    counted = d.groupBy(
        F.concat_ws(">", "a", "b", "c").alias("path")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    ranked = counted.orderBy(F.desc("n_paths"), F.asc("path")).limit(TOP_PATHS_K)
    from pyspark.sql.window import Window as W2

    return ranked.select(
        "path",
        "n_paths",
        F.row_number()
        .over(W2.orderBy(F.desc("n_paths"), F.asc("path")))
        .cast("long")
        .alias("rank"),
    )


QUERIES["events_top_paths"] = events_top_paths

ORACLE["events_top_paths"] = f"""
WITH seq AS (
  SELECT lag(event_type, 2) OVER w AS a,
         lag(event_type, 1) OVER w AS b,
         event_type AS c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counted AS (
  SELECT a || '>' || b || '>' || c AS path, COUNT(*)::BIGINT AS n_paths
  FROM seq WHERE a IS NOT NULL GROUP BY 1
)
SELECT path, n_paths,
       CAST(row_number() OVER (ORDER BY n_paths DESC, path ASC) AS BIGINT) AS rank
FROM counted
ORDER BY n_paths DESC, path ASC
LIMIT {TOP_PATHS_K}
"""


# --- rolling (trailing-window) median ---------------------------------------
#
# Per-type trailing 15-row median of the value stream — the robust moving
# baseline behind the Hampel filter's sliding form (the batch MAD row is
# the global-window special case). Integer-exact: cents in, sorted frame
# pick by rank arithmetic in HALF-cents out (lo+hi ranks collapse the
# even/odd cases exactly as events_anomaly_mad does). The frame is
# materialized per row via a bounded collect_list window (15 longs) and
# sorted with sort_array — per-row O(w log w) with w a compile-time
# constant, partitioned by type: no global sort, no unbounded state.

ROLL_W = 15


def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("es", "event_id")
        .rowsBetween(-(ROLL_W - 1), 0)
    )
    d = ev.withColumn("arr", F.sort_array(F.collect_list("c").over(w)))
    m = F.size("arr")
    med_hc = F.element_at(
        "arr", F.expr("cast((size(arr) + 1) div 2 as int)")
    ) + F.element_at("arr", F.expr("cast(size(arr) div 2 + 1 as int)"))
    return d.select(
        "event_id",
        "event_type",
        "c",
        m.cast("long").alias("frame_n"),
        med_hc.cast("long").alias("rolling_median_halfcents"),
    )


QUERIES["events_rolling_median"] = events_rolling_median

ORACLE["events_rolling_median"] = f"""
WITH ev AS (
  SELECT event_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
framed AS (
  SELECT event_id, event_type, c,
         list_sort(list(c) OVER (
           PARTITION BY event_type ORDER BY es, event_id
           ROWS BETWEEN {ROLL_W - 1} PRECEDING AND CURRENT ROW)) AS arr
  FROM ev
)
SELECT event_id, event_type, c,
       CAST(len(arr) AS BIGINT) AS frame_n,
       CAST(arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1] AS BIGINT)
         AS rolling_median_halfcents
FROM framed
"""


# --- hourly seasonality profile — PENDING round 7 ---------------------------
#
# Per-type hour-of-day activity profile (UTC) — the seasonal baseline a
# CUSUM/anomaly layer normalizes against. One keyed agg; mean value as
# micro-cents by integer division. Output is (#types × 24)-bounded.


def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("hour_utc"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    return ev.groupBy("event_type", "hour_utc").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("c").cast("long").alias("mass_cents"),
        F.expr("sum(c) * 1000000 div count(1)").cast("long").alias(
            "mean_microcents"
        ),
    )


_SQL_HOURLY = """
SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_utc,
       COUNT(*)::BIGINT AS n_events,
       SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))::BIGINT AS mass_cents,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) * 1000000 // COUNT(*) AS BIGINT)
         AS mean_microcents
FROM events GROUP BY event_type, EXTRACT(hour FROM ts)
"""

PENDING_QUERIES = {"events_hourly_seasonality": events_hourly_seasonality}
PENDING_ORACLE = {"events_hourly_seasonality": _SQL_HOURLY}


# --- burstiness (Fano factor) — PENDING round 7 -----------------------------
#
# Per-type Fano factor of the per-minute arrival counts over the DENSE
# minute grid (silent minutes count — that's what burstiness means):
# F = Var/Mean, 1 for Poisson arrivals, >1 bursty, <1 regular. Exact
# integers via the computational identity
# Var/Mean = (m·Σc² − (Σc)²) / (m·Σc), shipped as micro-units with one
# truncating division — counts are integers, so every term is exact.


def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(ts) div 60 * 60").cast("long").alias("minute_start"),
    )
    per = ev.groupBy("event_type", "minute_start").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    rng = ev.groupBy("event_type").agg(
        F.min("minute_start").alias("lo"), F.max("minute_start").alias("hi")
    )
    grid = rng.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(60).cast("long"))).alias("minute_start"),
    )
    dense = grid.join(per, ["event_type", "minute_start"], "left").select(
        "event_type", F.coalesce("c", F.lit(0).cast("long")).alias("c")
    )
    agg = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return agg.select(
        "event_type",
        F.col("m").alias("n_minutes"),
        F.col("s1").alias("n_events"),
        F.expr("(m * s2 - s1 * s1) * 1000000 div (m * s1)").cast("long").alias(
            "fano_micro"
        ),
    )


ORACLE_BURSTINESS = """
WITH ev AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 60 * 60 AS minute_start
  FROM events
),
per AS (
  SELECT event_type, minute_start, COUNT(*)::BIGINT AS c
  FROM ev GROUP BY event_type, minute_start
),
rng AS (SELECT event_type, MIN(minute_start) AS lo, MAX(minute_start) AS hi FROM ev GROUP BY 1),
grid AS (SELECT event_type, unnest(range(lo, hi + 60, 60)) AS minute_start FROM rng),
dense AS (
  SELECT g.event_type, COALESCE(p.c, 0) AS c
  FROM grid g LEFT JOIN per p
    ON p.event_type = g.event_type AND p.minute_start = g.minute_start
),
agg AS (
  SELECT event_type, COUNT(*)::BIGINT AS m, SUM(c)::BIGINT AS s1,
         SUM(c * c)::BIGINT AS s2
  FROM dense GROUP BY event_type
)
SELECT event_type, m AS n_minutes, s1 AS n_events,
       CAST((m * s2 - s1 * s1) * 1000000 // (m * s1) AS BIGINT) AS fano_micro
FROM agg
"""

PENDING_QUERIES["events_burstiness"] = events_burstiness
PENDING_ORACLE["events_burstiness"] = ORACLE_BURSTINESS


# --- capped sessionization — PENDING round 7 --------------------------------
#
# Gap + MAX-DURATION sessionization: a session closes on a 30-min gap OR
# when it has run 2 hours since ITS OWN START — the cap every production
# sessionizer applies to runaway sessions (bots, idle heartbeats). The
# cap makes the rule genuinely SEQUENTIAL: a boundary depends on the
# current session's start, which depends on all earlier boundaries, so no
# window/lag formulation exists (the gap-only rule is the classic
# lag+cumsum; the capped rule is the registry's ordered-fold device with
# an all-integer [prev_es, session_start, n_capped, n_gap] accumulator —
# exact in both engines, no floats anywhere). The gap-only count rides in
# the same fold and is law-pinned equal to the window-based
# ``events_sessionize`` session count per user.

SESS_GAP_S = 1800
SESS_CAP_S = 7200


def events_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
            F.col("event_id").alias("eid"),
        ).alias("s"),
    )
    arr = ev.groupBy("user_id").agg(F.sort_array(F.collect_list("s")).alias("a"))
    e1 = F.element_at("a", 1).getField("es")

    def step(acc, s):
        es = s.getField("es")
        capped = (es - F.element_at(acc, 1) > SESS_GAP_S) | (
            es - F.element_at(acc, 2) > SESS_CAP_S
        )
        gap = es - F.element_at(acc, 1) > SESS_GAP_S
        return F.array(
            es,
            F.when(capped, es).otherwise(F.element_at(acc, 2)),
            F.element_at(acc, 3) + F.when(capped, 1).otherwise(0),
            F.element_at(acc, 4) + F.when(gap, 1).otherwise(0),
        )

    folded = F.aggregate(
        F.slice(F.col("a"), 2, F.greatest(F.size("a") - 1, F.lit(0))),
        F.array(e1, e1, F.lit(1).cast("long"), F.lit(1).cast("long")),
        step,
    )
    return arr.select(
        "user_id",
        F.size("a").cast("long").alias("n_events"),
        F.element_at(folded, 4).cast("long").alias("n_sessions_gap"),
        F.element_at(folded, 3).cast("long").alias("n_sessions_capped"),
    )


ORACLE_SESS_CAPPED = f"""
WITH d AS (
  SELECT user_id,
         {{'es': CAST(FLOOR(epoch(ts)) AS BIGINT), 'eid': event_id}} AS s
  FROM events
),
arr AS (SELECT user_id, list_sort(list(s)) AS a FROM d GROUP BY user_id),
st AS (
  SELECT user_id, len(a)::BIGINT AS n_events,
    list_reduce(
      list_prepend([a[1].es, a[1].es, CAST(1 AS BIGINT), CAST(1 AS BIGINT)],
                   list_transform(a[2:], x -> [x.es, 0, 0, 0])),
      (acc, x) -> [x[1],
                   CASE WHEN x[1] - acc[1] > {SESS_GAP_S}
                          OR x[1] - acc[2] > {SESS_CAP_S}
                        THEN x[1] ELSE acc[2] END,
                   acc[3] + CASE WHEN x[1] - acc[1] > {SESS_GAP_S}
                                   OR x[1] - acc[2] > {SESS_CAP_S}
                                 THEN 1 ELSE 0 END,
                   acc[4] + CASE WHEN x[1] - acc[1] > {SESS_GAP_S}
                                 THEN 1 ELSE 0 END]) AS v
  FROM arr
)
SELECT user_id, n_events, v[4] AS n_sessions_gap, v[3] AS n_sessions_capped
FROM st
"""

PENDING_QUERIES["events_sessionize_capped"] = events_sessionize_capped
PENDING_ORACLE["events_sessionize_capped"] = ORACLE_SESS_CAPPED


# --- hourly latency bands — PENDING round 7 ---------------------------------
#
# The observability classic: per (event_type, hour-of-day), nearest-rank
# p50/p95 of the value distribution plus the count — the SLO band chart
# every dashboard draws. Nearest-rank (ceil(p*n), the winsorized row's
# convention) keeps every number an exact integer; the grain is bounded
# (|types| x 24) so the output is a constant-size report at any corpus
# scale. One shuffle to the (type, hour) grain, rank window inside it.


def events_hourly_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("hour"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    wp = Window.partitionBy("event_type", "hour")
    r = ev.withColumn("rn", F.row_number().over(wp.orderBy("c"))).withColumn(
        "n", F.count(F.lit(1)).over(wp)
    )
    return r.groupBy("event_type", "hour").agg(
        F.max("n").cast("long").alias("n_events"),
        F.max(F.when(F.col("rn") == F.expr("(50 * n + 99) div 100"), F.col("c")))
        .cast("long").alias("p50_cents"),
        F.max(F.when(F.col("rn") == F.expr("(95 * n + 99) div 100"), F.col("c")))
        .cast("long").alias("p95_cents"),
    )


ORACLE_HOURLY_BANDS = """
WITH ev AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
r AS (
  SELECT event_type, hour, c,
         row_number() OVER (PARTITION BY event_type, hour ORDER BY c) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, hour) AS n
  FROM ev
)
SELECT event_type, hour,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN c END) AS BIGINT) AS p50_cents,
       CAST(MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN c END) AS BIGINT) AS p95_cents
FROM r GROUP BY event_type, hour
"""

PENDING_QUERIES["events_hourly_latency_bands"] = events_hourly_latency_bands
PENDING_ORACLE["events_hourly_latency_bands"] = ORACLE_HOURLY_BANDS


# --- DAU / WAU / MAU + stickiness — PENDING round 7 -------------------------
#
# The product-analytics staple: per day on the dense grid, distinct
# active users over the trailing 1 / 7 / 30 days, plus the DAU/MAU
# stickiness ratio (integer PPM). Exact sliding DISTINCT does not
# decompose into a running sum, so the scale shape is SUPPORT EXPLODE:
# each distinct (user, active-day) pair supports the 30 days whose
# trailing window contains it (a bounded 30x fan-out of the per-user-day
# grain — corpus-bounded, unlike a per-event fan-out), then one distinct
# + keyed count per window length. Days are pure integers; no date
# arithmetic in either engine.

_ACTIVE_WINDOWS = (1, 7, 30)


def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 86400").alias("d"),
    )
    ud = ev.distinct()
    lo_hi = ud.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    counts = {}
    for w in _ACTIVE_WINDOWS:
        support = ud.select(
            "user_id",
            F.explode(F.sequence(F.col("d"), F.col("d") + F.lit(w - 1))).alias("sd"),
        ).distinct()
        counts[w] = support.groupBy(F.col("sd").alias("d")).agg(
            F.count(F.lit(1)).cast("long").alias(f"n{w}")
        )
    grid = lo_hi.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    out = grid
    for w in _ACTIVE_WINDOWS:
        out = out.join(counts[w], "d", "left")
    return out.select(
        F.col("d").alias("day_index"),
        F.coalesce("n1", F.lit(0).cast("long")).alias("dau"),
        F.coalesce("n7", F.lit(0).cast("long")).alias("wau"),
        F.coalesce("n30", F.lit(0).cast("long")).alias("mau"),
        F.when(
            F.coalesce("n30", F.lit(0)) > 0,
            F.expr("coalesce(n1, 0) * 1000000 div coalesce(n30, 1)"),
        ).otherwise(F.lit(0)).cast("long").alias("stickiness_ppm"),
    )


ORACLE_ACTIVE = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d
  FROM events
),
lim AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ud),
grid AS (SELECT unnest(range(lo, hi + 1)) AS d FROM lim),
s1 AS (
  SELECT d, COUNT(*)::BIGINT AS n1 FROM ud GROUP BY d
),
s7 AS (
  SELECT sd AS d, COUNT(DISTINCT user_id)::BIGINT AS n7 FROM (
    SELECT user_id, unnest(range(d, d + 7)) AS sd FROM ud
  ) GROUP BY sd
),
s30 AS (
  SELECT sd AS d, COUNT(DISTINCT user_id)::BIGINT AS n30 FROM (
    SELECT user_id, unnest(range(d, d + 30)) AS sd FROM ud
  ) GROUP BY sd
)
SELECT g.d AS day_index,
       COALESCE(s1.n1, 0) AS dau,
       COALESCE(s7.n7, 0) AS wau,
       COALESCE(s30.n30, 0) AS mau,
       CASE WHEN COALESCE(s30.n30, 0) > 0
            THEN COALESCE(s1.n1, 0) * 1000000 // COALESCE(s30.n30, 1)
            ELSE 0 END AS stickiness_ppm
FROM grid g
LEFT JOIN s1 ON s1.d = g.d
LEFT JOIN s7 ON s7.d = g.d
LEFT JOIN s30 ON s30.d = g.d
"""

PENDING_QUERIES["events_active_users"] = events_active_users
PENDING_ORACLE["events_active_users"] = ORACLE_ACTIVE


# --- session-level type co-occurrence — PENDING round 7 ---------------------
#
# Which event types co-occur within the SAME session? The behavioral
# basket analysis at session grain: sessions from the registered gap rule
# (30 min), distinct types per session, a<b oriented pairs, support +
# integer-PPM lift against independent session membership. Pair fan-out
# is quadratic only in the per-session DISTINCT-TYPE count (bounded by
# |types|, here <= 5), never in events; the session build is the standard
# lag+cumsum single key shuffle.


def events_session_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
    )
    w_order = Window.partitionBy("user_id").orderBy("es", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("es").over(w_order).isNull()
            | ((F.col("es") - F.lag("es").over(w_order)) > 1800),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("sid", F.sum("new_sess").over(run)).select(
        F.concat_ws("#", "user_id", "sid").alias("session_key"), "event_type"
    ).distinct()
    n_sessions = sess.select("session_key").distinct().count()
    member = sess.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_member")
    )
    a = sess.alias("a")
    b = sess.select(
        "session_key", F.col("event_type").alias("type_b")
    ).alias("b")
    pairs = (
        a.join(b, "session_key")
        .filter(F.col("event_type") < F.col("type_b"))
        .groupBy(F.col("event_type").alias("type_a"), "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    ma = member.select(F.col("event_type").alias("type_a"), F.col("n_member").alias("n_a"))
    mb = member.select(F.col("event_type").alias("type_b"), F.col("n_member").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .select(
            "type_a", "type_b", "support", "n_a", "n_b",
            F.expr("support * 1000000 div n_a").cast("long").alias("conf_ab_ppm"),
            F.expr(f"support * CAST({int(n_sessions)} AS BIGINT) * 1000000"
                   " div (n_a * n_b)").cast("long").alias("lift_ppm"),
        )
    )


ORACLE_SESSION_PAIRS = """
WITH flagged AS (
  SELECT user_id, event_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
         CASE WHEN lag(CAST(FLOOR(epoch(ts)) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) IS NULL
                 OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                    - lag(CAST(FLOOR(epoch(ts)) AS BIGINT))
                      OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess0 AS (
  SELECT user_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY es, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
sess AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) || '#' || CAST(sid AS VARCHAR) AS session_key,
         event_type
  FROM sess0
),
ns AS (SELECT COUNT(DISTINCT session_key) AS n FROM sess),
member AS (SELECT event_type, COUNT(*)::BIGINT AS n_member FROM sess GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*)::BIGINT AS support
  FROM sess a JOIN sess b
    ON a.session_key = b.session_key AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.support,
       ma.n_member AS n_a, mb.n_member AS n_b,
       p.support * 1000000 // ma.n_member AS conf_ab_ppm,
       p.support * ns.n * 1000000 // (ma.n_member * mb.n_member) AS lift_ppm
FROM pairs p
JOIN member ma ON ma.event_type = p.type_a
JOIN member mb ON mb.event_type = p.type_b
CROSS JOIN ns
"""

PENDING_QUERIES["events_session_type_pairs"] = events_session_type_pairs
PENDING_ORACLE["events_session_type_pairs"] = ORACLE_SESSION_PAIRS


# --- first-order Markov next-event prediction eval — PENDING round 7 --------
#
# The model-eval angle on the transition graph the entropy/HITS/PageRank
# rows already build: fit the first-order Markov chain (argmax next type
# per current type, ties to the lexicographically smallest destination)
# and score it IN-SAMPLE — per source type, the share of real transitions
# the chain predicts correctly. This is exactly the modal destination's
# share, so accuracy is pure integer counting; it upper-bounds any
# constant-per-state predictor and is the baseline a sequence model must
# beat. Scale shape: one lag window per user partition, one edge-grain
# groupBy — the eval itself runs on the type x type edge table.

def events_markov_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("w"))
    rk = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    top = edges.withColumn("rn", F.row_number().over(rk))
    return (
        top.groupBy("src")
        .agg(
            F.sum("w").cast("long").alias("n_transitions"),
            F.count(F.lit(1)).cast("long").alias("n_destinations"),
            F.max(F.when(F.col("rn") == 1, F.col("dst"))).alias("top_next"),
            F.max(F.when(F.col("rn") == 1, F.col("w"))).cast("long").alias("n_correct"),
        )
        .select(
            F.col("src").alias("event_type"),
            "n_transitions",
            "n_destinations",
            "top_next",
            "n_correct",
            F.expr("n_correct * 1000000 div n_transitions").cast("long")
            .alias("accuracy_ppm"),
        )
    )


ORACLE_MARKOV = """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst, COUNT(*)::BIGINT AS w FROM seq WHERE src IS NOT NULL GROUP BY src, dst
),
ranked AS (
  SELECT src, dst, w, row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC) AS rn
  FROM edges
)
SELECT src AS event_type,
       SUM(w)::BIGINT AS n_transitions,
       COUNT(*)::BIGINT AS n_destinations,
       MAX(CASE WHEN rn = 1 THEN dst END) AS top_next,
       MAX(CASE WHEN rn = 1 THEN w END)::BIGINT AS n_correct,
       (MAX(CASE WHEN rn = 1 THEN w END) * 1000000 // SUM(w))::BIGINT AS accuracy_ppm
FROM ranked
GROUP BY src
"""

PENDING_QUERIES["events_markov_accuracy"] = events_markov_accuracy
PENDING_ORACLE["events_markov_accuracy"] = ORACLE_MARKOV


# --- lag-k autocorrelation of the per-day count series — PENDING round 7 ----
#
# The telemetry time-series primitive next to the seasonal/CUSUM/Holt
# rows: per event type, Pearson autocorrelation of the DAILY event-count
# series at lags 1..3, computed over the DENSE day grid (absent days
# count 0 — the gapfill matters: skipping empty days silently shifts the
# lag alignment). All five sufficient statistics (n, Sx, Sy, Sxx, Syy,
# Sxy) are exact BIGINTs from one (type, day) pre-aggregation; the only
# doubles are one IEEE-correctly-rounded sqrt and one division, floored
# at milli grain (the graph_transition_entropy precedent for a
# deterministic transcendental tail). Scale shape: the raw scan reduces
# to type x day grain in ONE shuffle; the lag self-join and moment sums
# run on that model-sized series table.

ACF_LAGS = (1, 2, 3)


def events_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 86400").alias("d"),
    )
    counts = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lim = ev.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    grid = lim.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    types = counts.select("event_type").distinct()
    series = (
        grid.crossJoin(types)
        .join(counts, ["event_type", "d"], "left")
        .select("event_type", "d", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    lagged = series.select(
        "event_type", "d", "c", F.explode(F.array(*[F.lit(k) for k in ACF_LAGS])).alias("lag")
    )
    joined = lagged.alias("x").join(
        series.alias("y"),
        (F.col("x.event_type") == F.col("y.event_type"))
        & (F.col("y.d") == F.col("x.d") + F.col("x.lag")),
    ).select(
        F.col("x.event_type").alias("event_type"),
        F.col("x.lag").alias("lag"),
        F.col("x.c").alias("cx"),
        F.col("y.c").alias("cy"),
    )
    m = joined.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("cx").cast("long").alias("sx"),
        F.sum("cy").cast("long").alias("sy"),
        F.sum(F.col("cx") * F.col("cx")).cast("long").alias("sxx"),
        F.sum(F.col("cy") * F.col("cy")).cast("long").alias("syy"),
        F.sum(F.col("cx") * F.col("cy")).cast("long").alias("sxy"),
    )
    num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "event_type",
        "lag",
        "n_pairs",
        num.cast("long").alias("acf_num"),
        d1.cast("long").alias("var_x"),
        d2.cast("long").alias("var_y"),
        F.when(
            (d1 > 0) & (d2 > 0),
            F.floor(
                num.cast("double")
                * F.lit(1000.0)
                / F.sqrt(d1.cast("double") * d2.cast("double"))
            ),
        ).otherwise(F.lit(0)).cast("long").alias("rho_milli"),
    )


ORACLE_ACF = f"""
WITH ev AS (
  SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d FROM events
),
counts AS (SELECT event_type, d, COUNT(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
lim AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ev),
grid AS (SELECT unnest(range(lo, hi + 1)) AS d FROM lim),
types AS (SELECT DISTINCT event_type FROM counts),
series AS (
  SELECT t.event_type, g.d, COALESCE(c.c, 0)::BIGINT AS c
  FROM grid g CROSS JOIN types t
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.d = g.d
),
lags AS (SELECT unnest(ARRAY{list(ACF_LAGS)}) AS lag),
joined AS (
  SELECT x.event_type, l.lag, x.c AS cx, y.c AS cy
  FROM series x
  CROSS JOIN lags l
  JOIN series y ON y.event_type = x.event_type AND y.d = x.d + l.lag
),
m AS (
  SELECT event_type, lag,
         COUNT(*)::BIGINT AS n_pairs,
         SUM(cx)::BIGINT AS sx, SUM(cy)::BIGINT AS sy,
         SUM(cx * cx)::BIGINT AS sxx, SUM(cy * cy)::BIGINT AS syy,
         SUM(cx * cy)::BIGINT AS sxy
  FROM joined GROUP BY 1, 2
)
SELECT event_type, lag, n_pairs,
       (n_pairs * sxy - sx * sy)::BIGINT AS acf_num,
       (n_pairs * sxx - sx * sx)::BIGINT AS var_x,
       (n_pairs * syy - sy * sy)::BIGINT AS var_y,
       CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
            THEN CAST(FLOOR(
              CAST(n_pairs * sxy - sx * sy AS DOUBLE) * 1000.0
              / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                     * CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS BIGINT)
            ELSE 0 END AS rho_milli
FROM m
"""

PENDING_QUERIES["events_autocorr_daily"] = events_autocorr_daily
PENDING_ORACLE["events_autocorr_daily"] = ORACLE_ACF


# --- time-weighted average value per user — PENDING round 7 ------------------
#
# The telemetry TWAP: a user's value series averaged by HOLDING TIME, not
# by observation count — each event's cents weight is the seconds until
# the user's next event, so bursty samples stop dominating the mean (the
# canonical fix for irregularly-sampled gauges). The last event has no
# successor and carries zero weight; users whose events all share one
# second have zero total weight and are excluded (their TWAP is
# undefined). Pure integer: cents x seconds summed, one truncating
# division at the end. Scale shape: one lead() window per user partition,
# one keyed agg — no self-join, no driver state.

def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        F.col("event_id").alias("eid"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "eid")
    d = ev.select(
        "user_id", "cents",
        (F.lead("es").over(w) - F.col("es")).alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull())
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("dur_s").cast("long").alias("total_dur_s"),
            F.sum(F.col("dur_s") * F.col("cents")).cast("long").alias("weighted_cents_s"),
        )
        .filter(F.col("total_dur_s") > 0)
        .select(
            "user_id", "n_intervals", "total_dur_s",
            F.expr("weighted_cents_s div total_dur_s").cast("long").alias("twap_cents"),
        )
    )


ORACLE_TWAP = """
WITH seq AS (
  SELECT user_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         lead(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w
           - CAST(FLOOR(epoch(ts)) AS BIGINT) AS dur_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
),
agg AS (
  SELECT user_id,
         COUNT(*)::BIGINT AS n_intervals,
         SUM(dur_s)::BIGINT AS total_dur_s,
         SUM(dur_s * cents)::BIGINT AS weighted_cents_s
  FROM seq WHERE dur_s IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_intervals, total_dur_s,
       (weighted_cents_s // total_dur_s)::BIGINT AS twap_cents
FROM agg WHERE total_dur_s > 0
"""

PENDING_QUERIES["events_twap"] = events_twap
PENDING_ORACLE["events_twap"] = ORACLE_TWAP


# --- Change-point locator (CUSUM argmax) — PENDING round 7 ---------------------------
#
# Page's cumulative-sum change-point locator per event type: with the series
# centred on its own mean, the |prefix sum| peaks at the most likely level
# shift. The mean is never materialized — S_k = n·prefix_k − k·total keeps
# the centred prefix exact in int64 (cents×n: safe to ~1e9 rows/type; switch
# the products to DECIMAL(38) beyond). Ordering is (epoch-second, event_id),
# the argmax tie-break is the EARLIEST k, both pinned identically in the
# oracle via the same ROW_NUMBER sort. Scale shape: one window pass per type
# partition (prefix + row_number in a single sort), one rank-1 filter — no
# self-join, no driver state; the second window orders the same partition key
# so AQE reuses the shuffle.

def events_changepoint_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        F.col("event_id").alias("eid"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    wseq = Window.partitionBy("event_type").orderBy("es", "eid")
    wall = Window.partitionBy("event_type")
    scored = ev.select(
        "event_type", "es",
        F.row_number().over(wseq).alias("k"),
        (
            F.count(F.lit(1)).over(wall)
            * F.sum("cents").over(wseq.rowsBetween(Window.unboundedPreceding, 0))
        ).alias("np"),
        F.sum("cents").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n_events"),
    ).select(
        "event_type", "es", "k", "n_events",
        F.abs(F.col("np") - F.col("k") * F.col("total")).alias("s_abs"),
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("s_abs"), F.asc("k"))
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("k").cast("long").alias("cp_k"),
            F.col("es").cast("long").alias("cp_es"),
            F.col("s_abs").cast("long").alias("s_abs_max"),
        )
    )


ORACLE_CUSUM = """
WITH seq AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
         event_id AS eid,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
scored AS (
  SELECT event_type, es,
         ROW_NUMBER() OVER w AS k,
         COUNT(*) OVER (PARTITION BY event_type)
           * SUM(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS np,
         SUM(cents) OVER (PARTITION BY event_type) AS total,
         COUNT(*) OVER (PARTITION BY event_type) AS n_events
  FROM seq
  WINDOW w AS (PARTITION BY event_type ORDER BY es, eid)
),
ranked AS (
  SELECT event_type, n_events, k, es,
         abs(np - k * total) AS s_abs,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(np - k * total) DESC, k ASC) AS rn
  FROM scored
)
SELECT event_type,
       n_events::BIGINT AS n_events,
       k::BIGINT AS cp_k,
       es::BIGINT AS cp_es,
       s_abs::BIGINT AS s_abs_max
FROM ranked WHERE rn = 1
"""

PENDING_QUERIES["events_changepoint_argmax"] = events_changepoint_argmax
PENDING_ORACLE["events_changepoint_argmax"] = ORACLE_CUSUM


# --- Bot-behavior score — PENDING round 7 --------------------------------------
#
# The traffic-quality filter a training-data pipeline runs before counting
# anything per-user: behavioral features that separate scripted traffic from
# humans — burst rate (max events in any single minute), median
# inter-arrival gap (lower nearest-rank, rank (n+1) div 2), overall rate in
# events-per-hour milli-units, and type diversity — plus a thresholded
# is_bot verdict (burst ≥ BOT_BURST_PER_MIN or median gap ≤ BOT_MIN_GAP_S;
# frozen integer constants, same in the oracle). All integer: gaps in whole
# epoch seconds, rate = n·3600·1000 div span (single-event users: span 0 →
# rate NULL, never a bot). Scale shape: everything partitions by user_id —
# one (user, minute) pre-agg for bursts, one lag + ranking window pass for
# gaps, one user-grain agg; no global window, no driver state.

BOT_BURST_PER_MIN = 5
BOT_MIN_GAP_S = 120


def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        F.col("event_id").alias("eid"),
        "event_type",
    )
    burst = (
        ev.groupBy("user_id", F.expr("es div 60").alias("minute"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").alias("max_per_min"))
    )
    wseq = Window.partitionBy("user_id").orderBy("es", "eid")
    gaps = ev.select(
        "user_id", (F.col("es") - F.lag("es").over(wseq)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    wrk = Window.partitionBy("user_id").orderBy("gap")
    wn = Window.partitionBy("user_id")
    med = (
        gaps.select(
            "user_id", "gap",
            F.row_number().over(wrk).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("ng"),
        )
        .filter(F.col("rn") == F.expr("(ng + 1) div 2"))
        .select("user_id", F.col("gap").alias("med_gap_s"))
    )
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        (F.max("es") - F.min("es")).alias("span_s"),
    )
    return (
        base.join(burst, "user_id")
        .join(med, "user_id", "left")
        .select(
            "user_id", "n_events", "n_types", "max_per_min",
            F.col("med_gap_s").cast("long").alias("med_gap_s"),
            F.when(
                F.col("span_s") > 0,
                F.expr("n_events * 3600000 div span_s"),
            ).cast("long").alias("rate_mhz"),
            (
                (F.col("max_per_min") >= BOT_BURST_PER_MIN)
                | (F.col("med_gap_s") <= BOT_MIN_GAP_S)
            ).alias("is_bot"),
        )
    )


_SQL_BOT_SCORE = f"""
WITH ev AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, event_id AS eid,
         event_type
  FROM events
),
burst AS (
  SELECT user_id, MAX(c) AS max_per_min FROM (
    SELECT user_id, es // 60 AS minute, COUNT(*)::BIGINT AS c
    FROM ev GROUP BY 1, 2
  ) GROUP BY user_id
),
gaps AS (
  SELECT user_id, gap FROM (
    SELECT user_id,
           es - LAG(es) OVER (PARTITION BY user_id ORDER BY es, eid) AS gap
    FROM ev
  ) WHERE gap IS NOT NULL
),
med AS (
  SELECT user_id, gap AS med_gap_s FROM (
    SELECT user_id, gap,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap) AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS ng
    FROM gaps
  ) WHERE rn = (ng + 1) // 2
),
base AS (
  SELECT user_id, COUNT(*)::BIGINT AS n_events,
         COUNT(DISTINCT event_type)::BIGINT AS n_types,
         MAX(es) - MIN(es) AS span_s
  FROM ev GROUP BY user_id
)
SELECT b.user_id, b.n_events, b.n_types, burst.max_per_min,
       med.med_gap_s::BIGINT AS med_gap_s,
       CASE WHEN b.span_s > 0
            THEN b.n_events * 3600000 // b.span_s END::BIGINT AS rate_mhz,
       (burst.max_per_min >= {BOT_BURST_PER_MIN}
        OR med.med_gap_s <= {BOT_MIN_GAP_S}) AS is_bot
FROM base b
JOIN burst USING (user_id)
LEFT JOIN med USING (user_id)
"""

PENDING_QUERIES["events_bot_score"] = events_bot_score
PENDING_ORACLE["events_bot_score"] = _SQL_BOT_SCORE


# --- Time-RANGE frame rolling sum — PENDING round 7 ----------------------------
#
# The window-surface feature the ROWS-frame queries can't express: a rolling
# sum over a TIME range (all same-type events in the preceding 600 s,
# RANGE BETWEEN 600 PRECEDING AND CURRENT ROW on the integer epoch-second
# key) — RANGE frames bound by VALUE distance, so co-timed events share one
# frame regardless of row order, which is exactly why the per-row result is
# deterministic without an event_id tie-break. Summarized to type grain for
# a bounded driver row: the peak 10-minute load (cents and event count) per
# type and when it peaked (earliest peak second on ties). Scale shape: one
# window pass partitioned by type ordered by the second (Spark evaluates
# RANGE frames with a sliding aggregate over the sorted partition, same as
# the ROWS path), then a type-grain arg-max — no self-join, no explode.

def events_range_frame_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("es")
        .rangeBetween(-600, Window.currentRow)
    )
    scored = ev.select(
        "event_type", "es",
        F.sum("cents").over(w).alias("win_cents"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    )
    return scored.groupBy("event_type").agg(
        F.max_by(
            F.struct("win_cents", "win_n", "es"),
            F.struct(F.col("win_cents"), F.col("win_n"), (-F.col("es")).alias("nes")),
        ).alias("__p")
    ).select(
        "event_type",
        F.col("__p.win_cents").cast("long").alias("peak_10m_cents"),
        F.col("__p.win_n").cast("long").alias("peak_10m_events"),
        F.col("__p.es").cast("long").alias("peak_es"),
    )


_SQL_RANGE_PEAK = """
WITH scored AS (
  SELECT event_type, es,
         SUM(cents) OVER w AS win_cents,
         COUNT(*) OVER w AS win_n
  FROM (
    SELECT event_type,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
  )
  WINDOW w AS (PARTITION BY event_type ORDER BY es
               RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY win_cents DESC, win_n DESC, es ASC) AS rn
  FROM scored
)
SELECT event_type,
       win_cents::BIGINT AS peak_10m_cents,
       win_n::BIGINT AS peak_10m_events,
       es::BIGINT AS peak_es
FROM ranked WHERE rn = 1
"""

PENDING_QUERIES["events_range_frame_peak"] = events_range_frame_peak
PENDING_ORACLE["events_range_frame_peak"] = _SQL_RANGE_PEAK


# --- Entry-type bounce rate — PENDING round 7 -----------------------------------
#
# The web-analytics landing report transplanted to event streams: group
# sessions (the standard 30-min-gap device, identical to events_sessionize)
# by their ENTRY event type and report how many bounce (single-event
# sessions), plus bounce share in ppm and the mean session length in
# milli-events. Entry = first event by (es, event_id) — min_by, so it rides
# the same user-partitioned shuffle as the session aggregate. Scale shape:
# one user-grain window pass (lag + running sum — one sort), one
# (user, session) aggregate, one bounded entry-type rollup; the partitioning
# is reused across all three stages.

def events_entry_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
    )
    w_order = Window.partitionBy("user_id").orderBy("es", "event_id")
    run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("es").over(w_order).isNull()
            | ((F.col("es") - F.lag("es").over(w_order)) > 1800),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("session_idx", F.sum("new_sess").over(run))
    per_sess = sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min_by("event_type", F.struct("es", "event_id")).alias("entry_type"),
    )
    return per_sess.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.count_if(F.col("n_events") == 1).cast("long").alias("n_bounces"),
        F.expr(
            "count_if(n_events = 1) * 1000000 div count(1)"
        ).cast("long").alias("bounce_ppm"),
        F.expr("sum(n_events) * 1000 div count(1)").cast("long").alias(
            "mean_len_milli"
        ),
    )


ORACLE_BOUNCE = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag_es IS NULL OR es - lag_es > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM (
    SELECT *, LAG(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS lag_es
    FROM ev
  )
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY es, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
),
per_sess AS (
  SELECT user_id, session_idx,
         COUNT(*)::BIGINT AS n_events,
         FIRST(event_type ORDER BY es, event_id) AS entry_type
  FROM sess GROUP BY 1, 2
)
SELECT entry_type,
       COUNT(*)::BIGINT AS n_sessions,
       COUNT(*) FILTER (WHERE n_events = 1)::BIGINT AS n_bounces,
       (COUNT(*) FILTER (WHERE n_events = 1) * 1000000 // COUNT(*))::BIGINT
         AS bounce_ppm,
       (SUM(n_events) * 1000 // COUNT(*))::BIGINT AS mean_len_milli
FROM per_sess
GROUP BY entry_type
"""

PENDING_QUERIES["events_entry_bounce_rate"] = events_entry_bounce_rate
PENDING_ORACLE["events_entry_bounce_rate"] = ORACLE_BOUNCE


# --- Signup→purchase conversion latency — PENDING round 7 -----------------------
#
# The funnel-latency complement of funnel_windowed: per signup-week cohort,
# the nearest-rank median and p90 of the time from a user's FIRST signup to
# their first purchase at-or-after it (users without a qualifying purchase
# drop out — this is the converted-population latency, stated not hidden).
# Rank arithmetic: median rank (n+1) div 2, p90 rank ceil(9n/10) =
# (9n+9) div 10, both picked from ONE ranking window via conditional
# aggregation. Scale shape: two user-grain aggregates (first signup,
# first qualifying purchase — the join is user-keyed, co-partitioned), one
# cohort-grain ranking window over per-user rows, one bounded weekly rollup.

def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("es").alias("s_es"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("es").alias("p_es"))
        .join(s, "user_id")
        .filter(F.col("p_es") >= F.col("s_es"))
        .groupBy("user_id")
        .agg(F.min("p_es").alias("p_es"), F.max("s_es").alias("s_es"))
    )
    lat = p.select(
        F.expr("s_es div 604800").cast("long").alias("week"),
        (F.col("p_es") - F.col("s_es")).alias("lat_s"),
    )
    wrk = Window.partitionBy("week").orderBy("lat_s")
    wn = Window.partitionBy("week")
    ranked = lat.select(
        "week", "lat_s",
        F.row_number().over(wrk).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("week").agg(
        F.max("n").cast("long").alias("n_converted"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("lat_s"))
        ).cast("long").alias("median_lat_s"),
        F.max(
            F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("lat_s"))
        ).cast("long").alias("p90_lat_s"),
    )


ORACLE_CONV_LATENCY = """
WITH ev AS (
  SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events
),
s AS (
  SELECT user_id, MIN(es) AS s_es FROM ev WHERE event_type = 'signup'
  GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(e.es) AS p_es, MAX(s.s_es) AS s_es
  FROM ev e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.es >= s.s_es
  GROUP BY e.user_id
),
ranked AS (
  SELECT (s_es // 604800)::BIGINT AS week, p_es - s_es AS lat_s,
         ROW_NUMBER() OVER (PARTITION BY s_es // 604800 ORDER BY p_es - s_es) AS rn,
         COUNT(*) OVER (PARTITION BY s_es // 604800) AS n
  FROM p
)
SELECT week,
       MAX(n)::BIGINT AS n_converted,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN lat_s END)::BIGINT AS median_lat_s,
       MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lat_s END)::BIGINT AS p90_lat_s
FROM ranked
GROUP BY week
"""

PENDING_QUERIES["events_conversion_latency"] = events_conversion_latency
PENDING_ORACLE["events_conversion_latency"] = ORACLE_CONV_LATENCY


# --- Activity streaks (gaps and islands) — PENDING round 7 ----------------------
#
# The canonical gaps-and-islands pattern, absent from the surface until now:
# consecutive-day activity runs per user via the island key
# day − dense_rank(day) (constant within a run of consecutive distinct days,
# the textbook device — no recursion, no self-join). Report per user:
# active days, number of islands, the LONGEST streak with its start day
# (earliest on ties), and the longest gap between islands. Scale shape: one
# distinct to (user, day) grain, one user-partitioned ranking window, one
# (user, island) aggregate, one user rollup — a single user-keyed shuffle
# chain, no global state.

def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").alias("day"),
    ).distinct()
    wdr = Window.partitionBy("user_id").orderBy("day")
    isl = ev.select(
        "user_id", "day",
        (F.col("day") - F.dense_rank().over(wdr)).alias("grp"),
        (F.col("day") - F.lag("day").over(wdr)).alias("gap"),
    )
    runs = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day").alias("start_day"),
    )
    wbest = Window.partitionBy("user_id").orderBy(
        F.desc("len"), F.asc("start_day")
    )
    best = (
        runs.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("longest_streak"),
            F.col("start_day").alias("streak_start_day"),
        )
    )
    base = isl.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_days"),
        F.countDistinct("grp").cast("long").alias("n_islands"),
        F.coalesce(
            F.max(F.when(F.col("gap") > 1, F.col("gap") - 1)), F.lit(0)
        ).cast("long").alias("longest_gap_days"),
    )
    return base.join(best, "user_id")


ORACLE_STREAKS = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         day - DENSE_RANK() OVER (PARTITION BY user_id ORDER BY day) AS grp,
         day - LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS gap
  FROM ud
),
runs AS (
  SELECT user_id, grp, COUNT(*)::BIGINT AS len, MIN(day) AS start_day
  FROM isl GROUP BY 1, 2
),
best AS (
  SELECT user_id, len AS longest_streak, start_day AS streak_start_day
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY len DESC, start_day) AS rn
    FROM runs
  ) WHERE rn = 1
),
base AS (
  SELECT user_id, COUNT(*)::BIGINT AS n_active_days,
         COUNT(DISTINCT grp)::BIGINT AS n_islands,
         COALESCE(MAX(CASE WHEN gap > 1 THEN gap - 1 END), 0)::BIGINT
           AS longest_gap_days
  FROM isl GROUP BY user_id
)
SELECT b.user_id, b.n_active_days, b.n_islands, b.longest_gap_days,
       s.longest_streak, s.streak_start_day
FROM base b JOIN best s USING (user_id)
"""

PENDING_QUERIES["events_activity_streaks"] = events_activity_streaks
PENDING_ORACLE["events_activity_streaks"] = ORACLE_STREAKS


# --- Streak hazard curve (discrete survival) — PENDING round 7 ------------------
#
# Discrete-time survival over the activity islands above: for each streak
# length k, the hazard h(k) = P(a streak ENDS at exactly k days | it reached
# k) = (#islands of length k) / (#islands of length ≥ k) — the churn curve
# product teams read ("day-3 cliff"). Pure integers: the at-risk set is a
# suffix sum over the BOUNDED length histogram (descending cumulative
# window), hazard ships in ppm. Scale shape: reuses the single user-keyed
# shuffle chain of the streak report down to (user, island) grain, then
# everything runs on the length histogram — corpus-independent domain.

def events_streak_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").alias("day"),
    ).distinct()
    wdr = Window.partitionBy("user_id").orderBy("day")
    isl = ev.select(
        "user_id", "day",
        (F.col("day") - F.dense_rank().over(wdr)).alias("grp"),
    )
    runs = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    hist = runs.groupBy("len").agg(F.count(F.lit(1)).cast("long").alias("n_end"))
    wrisk = Window.orderBy(F.desc("len")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return hist.select(
        F.col("len").alias("k"),
        "n_end",
        F.sum("n_end").over(wrisk).alias("n_at_risk"),
    ).select(
        "k", "n_end",
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.expr("n_end * 1000000 div n_at_risk").cast("long").alias("hazard_ppm"),
    )


ORACLE_STREAK_HAZARD = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         day - DENSE_RANK() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM ud
),
runs AS (
  SELECT user_id, grp, COUNT(*)::BIGINT AS len FROM isl GROUP BY 1, 2
),
hist AS (SELECT len, COUNT(*)::BIGINT AS n_end FROM runs GROUP BY len)
SELECT len AS k, n_end,
       SUM(n_end) OVER (ORDER BY len DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS n_at_risk,
       (n_end * 1000000 // SUM(n_end) OVER (ORDER BY len DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS hazard_ppm
FROM hist
"""

PENDING_QUERIES["events_streak_hazard"] = events_streak_hazard
PENDING_ORACLE["events_streak_hazard"] = ORACLE_STREAK_HAZARD


# --- Error-impact difference-in-differences — PENDING round 7 -------------------
#
# The two-group pre/post comparison an incident review runs: users who ever
# hit an 'error' event (treated) vs users who never did (control), mean
# event value in cents before vs after the timeline midpoint
# ((min+max) div 2 of the epoch seconds — both engines derive the same
# constant), and the DiD estimate (T_post − T_pre) − (C_post − C_pre). The
# naive observational caveats (treatment is not randomized, 'ever-treated'
# peeks across the midpoint) are design facts of the report, stated not
# hidden — the row verifies the ARITHMETIC, all truncating integer
# divisions. Scale shape: one per-user any-error flag (map-side partials)
# joined back user-keyed, one bounded (group, period) aggregate, one final
# 4-cell pivot.

def events_did_error_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    treated = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("t")
    )
    mid = ev.agg(F.expr("(min(es) + max(es)) div 2").cast("long").alias("mid"))
    cells = (
        ev.join(treated, "user_id")
        .crossJoin(F.broadcast(mid))
        .select(
            "t",
            (F.col("es") > F.col("mid")).cast("int").alias("post"),
            "cents",
        )
        .groupBy("t", "post")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("sum(cents) div count(1)").cast("long").alias("mean_cents"),
        )
    )
    pv = cells.groupBy().agg(
        F.max(F.when((F.col("t") == 1) & (F.col("post") == 0), F.col("mean_cents"))).alias("t_pre"),
        F.max(F.when((F.col("t") == 1) & (F.col("post") == 1), F.col("mean_cents"))).alias("t_post"),
        F.max(F.when((F.col("t") == 0) & (F.col("post") == 0), F.col("mean_cents"))).alias("c_pre"),
        F.max(F.when((F.col("t") == 0) & (F.col("post") == 1), F.col("mean_cents"))).alias("c_post"),
        F.sum("n").cast("long").alias("n_events"),
    )
    return pv.select(
        "n_events",
        F.col("t_pre").cast("long").alias("treated_pre_cents"),
        F.col("t_post").cast("long").alias("treated_post_cents"),
        F.col("c_pre").cast("long").alias("control_pre_cents"),
        F.col("c_post").cast("long").alias("control_post_cents"),
        (
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre"))
        ).cast("long").alias("did_cents"),
    )


ORACLE_DID = """
WITH ev AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
treated AS (
  SELECT user_id, MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS t
  FROM ev GROUP BY user_id
),
cells AS (
  SELECT t.t,
         CASE WHEN e.es > (SELECT (MIN(es) + MAX(es)) // 2 FROM ev) THEN 1 ELSE 0 END AS post,
         COUNT(*)::BIGINT AS n,
         (SUM(e.cents) // COUNT(*))::BIGINT AS mean_cents
  FROM ev e JOIN treated t USING (user_id)
  GROUP BY 1, 2
)
SELECT SUM(n)::BIGINT AS n_events,
       MAX(CASE WHEN t = 1 AND post = 0 THEN mean_cents END)::BIGINT AS treated_pre_cents,
       MAX(CASE WHEN t = 1 AND post = 1 THEN mean_cents END)::BIGINT AS treated_post_cents,
       MAX(CASE WHEN t = 0 AND post = 0 THEN mean_cents END)::BIGINT AS control_pre_cents,
       MAX(CASE WHEN t = 0 AND post = 1 THEN mean_cents END)::BIGINT AS control_post_cents,
       ((MAX(CASE WHEN t = 1 AND post = 1 THEN mean_cents END)
         - MAX(CASE WHEN t = 1 AND post = 0 THEN mean_cents END))
        - (MAX(CASE WHEN t = 0 AND post = 1 THEN mean_cents END)
           - MAX(CASE WHEN t = 0 AND post = 0 THEN mean_cents END)))::BIGINT AS did_cents
FROM cells
"""

PENDING_QUERIES["events_did_error_impact"] = events_did_error_impact
PENDING_ORACLE["events_did_error_impact"] = ORACLE_DID


# --- Fano factor across timescales — PENDING round 7 ----------------------------
#
# Multi-scale burstiness: the Fano factor (windowed count variance over
# mean) of each event type at three window sizes — 1 minute, 10 minutes,
# 1 hour. Poisson traffic holds F ≈ 1 at every scale; bursty traffic grows
# with the window. Windows with zero events COUNT (the dense grid runs from
# the type's first to last window — variance against a sparse grid would
# understate burstiness), built by an explicit bounded generator, never a
# row explode. Same integer rational as the dispersion row:
# fano_ppm = (n·Σc² − (Σc)²)·1e6 div ((n−1)·Σc) through DECIMAL(38).
# Scale shape: per scale one (type, window) count (map-side partials) plus
# a grid count DERIVED from each type's min/max window index (two scalars —
# the zero windows are arithmetic, never materialized), one bounded rollup.

FANO_SCALES = [60, 600, 3600]


def events_fano_timescales(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
    )
    out = None
    for w in FANO_SCALES:
        cnt = ev.select(
            "event_type", F.expr(f"es div {w}").alias("win")
        ).groupBy("event_type", "win").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        per = cnt.groupBy("event_type").agg(
            (F.max("win") - F.min("win") + 1).cast("long").alias("n_wins"),
            F.sum("c").alias("sc"),
            F.sum(F.col("c") * F.col("c")).alias("scc"),
        )
        row = per.select(
            "event_type",
            F.lit(w).cast("long").alias("scale_s"),
            "n_wins",
            F.expr(
                "CAST((CAST(n_wins AS DECIMAL(38,0)) * scc - CAST(sc AS DECIMAL(38,0)) * sc)"
                " * 1000000 DIV (CAST(n_wins - 1 AS DECIMAL(38,0)) * sc) AS BIGINT)"
            ).alias("fano_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_fano() -> str:
    blocks = []
    for w in FANO_SCALES:
        blocks.append(f"""
SELECT event_type, CAST({w} AS BIGINT) AS scale_s,
       (MAX(win) - MIN(win) + 1)::BIGINT AS n_wins,
       (((MAX(win) - MIN(win) + 1)::HUGEINT * SUM(c * c)
          - SUM(c)::HUGEINT * SUM(c)) * 1000000
         // ((MAX(win) - MIN(win))::HUGEINT * SUM(c)))::BIGINT AS fano_ppm
FROM (
  SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // {w} AS win,
         COUNT(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
)
GROUP BY event_type""")
    return " UNION ALL ".join(blocks)


PENDING_QUERIES["events_fano_timescales"] = events_fano_timescales
PENDING_ORACLE["events_fano_timescales"] = _sql_fano()


# --- Value-distribution drift (total variation) — PENDING round 7 ---------------
#
# Did the VALUE distribution shift between the two halves of the timeline?
# Per event type: pool both halves, cut into 10 equal-count buckets
# (ntile over the unique total order (cents, es, eid)), then the total
# variation distance between the halves' bucket shares —
# tv_ppm = Σ_d |p_d·1e6 div n1 − q_d·1e6 div n2| div 2, DEFINED over the
# floored shares so both engines agree bit-for-bit (±10 ppm of the real TV).
# The KS row tests doc lengths; this is the bucketed drift statistic
# monitoring uses (a PSI without the floating log). Scale shape: the ntile
# window partitions by type over event grain — the honest cost of exact
# pooled quantiles (the sketch rows are the approximate path); after that,
# one bounded (type × 10 × 2) aggregate.

def events_value_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        F.col("event_id").alias("eid"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    mid = ev.agg(F.expr("(min(es) + max(es)) div 2").cast("long").alias("mid"))
    wd = Window.partitionBy("event_type").orderBy("cents", "es", "eid")
    bucketed = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.ntile(10).over(wd).cast("long").alias("d"),
        (F.col("es") > F.col("mid")).cast("int").alias("half"),
    )
    cells = bucketed.groupBy("event_type", "d").agg(
        F.count_if(F.col("half") == 0).cast("long").alias("p"),
        F.count_if(F.col("half") == 1).cast("long").alias("q"),
    )
    wt = Window.partitionBy("event_type")
    scored = cells.select(
        "event_type", "p", "q",
        F.sum("p").over(wt).alias("n1"),
        F.sum("q").over(wt).alias("n2"),
    )
    return scored.groupBy("event_type").agg(
        F.max("n1").cast("long").alias("n_first_half"),
        F.max("n2").cast("long").alias("n_second_half"),
        F.expr(
            "CAST(sum(abs(p * 1000000 div n1 - q * 1000000 div n2)) div 2 AS BIGINT)"
        ).alias("tv_ppm"),
    )


ORACLE_VALUE_DRIFT = """
WITH ev AS (
  SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, event_id AS eid,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
bucketed AS (
  SELECT event_type,
         NTILE(10) OVER (PARTITION BY event_type ORDER BY cents, es, eid) AS d,
         CASE WHEN es > (SELECT (MIN(es) + MAX(es)) // 2 FROM ev)
              THEN 1 ELSE 0 END AS half
  FROM ev
),
cells AS (
  SELECT event_type, d,
         COUNT(*) FILTER (WHERE half = 0)::BIGINT AS p,
         COUNT(*) FILTER (WHERE half = 1)::BIGINT AS q
  FROM bucketed GROUP BY 1, 2
),
scored AS (
  SELECT event_type, p, q,
         SUM(p) OVER (PARTITION BY event_type) AS n1,
         SUM(q) OVER (PARTITION BY event_type) AS n2
  FROM cells
)
SELECT event_type,
       MAX(n1)::BIGINT AS n_first_half,
       MAX(n2)::BIGINT AS n_second_half,
       (SUM(ABS(p * 1000000 // n1 - q * 1000000 // n2)) // 2)::BIGINT AS tv_ppm
FROM scored
GROUP BY event_type
"""

PENDING_QUERIES["events_value_drift_tv"] = events_value_drift_tv
PENDING_ORACLE["events_value_drift_tv"] = ORACLE_VALUE_DRIFT


# --- Concurrency synchrony bands — PENDING round 7 ------------------------------
#
# Flash-crowd profile: how many minutes saw 1, 2–3, 4–7, ... concurrently
# active distinct users (power-of-2 bands via the shared ilog2 bin()
# device) — the load-shape histogram capacity planning reads next to the
# per-user burst features of the bot score. Scale shape: one
# (minute, user) distinct, one minute-grain distinct count (both map-side
# partial-able), one bounded band rollup.

def events_synchrony_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(floor(unix_timestamp(ts) / 60) AS BIGINT)").alias("minute"),
        "user_id",
    ).distinct()
    per_min = ev.groupBy("minute").agg(
        F.count(F.lit(1)).cast("long").alias("u")
    )
    banded = per_min.select(
        "u", (F.length(F.bin(F.col("u"))) - 1).cast("long").alias("band")
    )
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_minutes"),
        F.min("u").cast("long").alias("min_users"),
        F.max("u").cast("long").alias("max_users"),
    )


ORACLE_SYNCHRONY = """
WITH m AS (
  SELECT DISTINCT CAST(FLOOR(epoch(ts) / 60) AS BIGINT) AS minute, user_id
  FROM events
),
per_min AS (SELECT minute, COUNT(*)::BIGINT AS u FROM m GROUP BY minute)
SELECT (length(bin(u)) - 1)::BIGINT AS band,
       COUNT(*)::BIGINT AS n_minutes,
       MIN(u)::BIGINT AS min_users,
       MAX(u)::BIGINT AS max_users
FROM per_min
GROUP BY 1
"""

PENDING_QUERIES["events_synchrony_minutes"] = events_synchrony_minutes
PENDING_ORACLE["events_synchrony_minutes"] = ORACLE_SYNCHRONY


# --- Self-transition rate — PENDING round 7 -------------------------------------
#
# The diagonal the transition-graph rows all EXCLUDE (src ≠ dst), measured:
# per event type, the share of consecutive same-user pairs that repeat the
# type — scripted retries and UI double-fires live here. Per type of the
# EARLIER event: adjacent pairs, self-repeats, ppm, and the longest
# uninterrupted run of the type (islands over the run-key
# row_number − row_number-within-type, the gaps-and-islands device at
# value grain). Scale shape: one user-partitioned window pass, one bounded
# type rollup.

def events_self_transition_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    wt = Window.partitionBy("user_id", "event_type").orderBy("es", "event_id")
    seq = ev.select(
        "user_id", "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        (F.row_number().over(w) - F.row_number().over(wt)).alias("runkey"),
    )
    runs = seq.groupBy("user_id", "event_type", "runkey").agg(
        F.count(F.lit(1)).cast("long").alias("runlen")
    )
    longest = runs.groupBy("event_type").agg(
        F.max("runlen").cast("long").alias("longest_run")
    )
    pairs = seq.filter(F.col("nxt").isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.count_if(F.col("nxt") == F.col("event_type")).cast("long").alias("n_self"),
        F.expr("count_if(nxt = event_type) * 1000000 div count(1)")
        .cast("long")
        .alias("self_ppm"),
    )
    return pairs.join(longest, "event_type")


ORACLE_SELF_TRANSITION = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER w AS nxt,
         ROW_NUMBER() OVER w
           - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
           AS runkey
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
),
runs AS (
  SELECT user_id, event_type, runkey, COUNT(*)::BIGINT AS runlen
  FROM seq GROUP BY 1, 2, 3
),
longest AS (
  SELECT event_type, MAX(runlen)::BIGINT AS longest_run FROM runs GROUP BY 1
),
pairs AS (
  SELECT event_type,
         COUNT(*)::BIGINT AS n_pairs,
         COUNT(*) FILTER (WHERE nxt = event_type)::BIGINT AS n_self,
         (COUNT(*) FILTER (WHERE nxt = event_type) * 1000000
            // COUNT(*))::BIGINT AS self_ppm
  FROM seq WHERE nxt IS NOT NULL
  GROUP BY event_type
)
SELECT p.event_type, p.n_pairs, p.n_self, p.self_ppm, l.longest_run
FROM pairs p JOIN longest l USING (event_type)
"""

PENDING_QUERIES["events_self_transition_rate"] = events_self_transition_rate
PENDING_ORACLE["events_self_transition_rate"] = ORACLE_SELF_TRANSITION


# --- Error MTBF bands — PENDING round 7 -----------------------------------------
#
# Reliability profile: mean time between 'error' events per user (users
# with ≥ 2 errors — one error has no "between"), banded by power-of-2 hours
# via the shared ilog2 bin() device. MTBF per user is the exact integer
# span div (n_errors − 1) — no per-gap window needed: consecutive-gap mean
# telescopes to (last − first)/(n − 1). Scale shape: one error-filtered
# per-user aggregate (min/max/count, map-side partials), one bounded band
# rollup.

def events_error_mtbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    ).select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
    )
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_err"),
        F.min("es").alias("lo"),
        F.max("es").alias("hi"),
    ).filter(F.col("n_err") >= 2).select(
        F.expr("(hi - lo) div (n_err - 1)").cast("long").alias("mtbf_s")
    )
    banded = per.select(
        "mtbf_s",
        (F.length(F.bin(F.expr("mtbf_s div 3600") + 1)) - 1)
        .cast("long")
        .alias("band"),
    )
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("mtbf_s").cast("long").alias("min_mtbf_s"),
        F.max("mtbf_s").cast("long").alias("max_mtbf_s"),
    )


ORACLE_ERROR_MTBF = """
WITH per AS (
  SELECT user_id, COUNT(*)::BIGINT AS n_err,
         MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS lo,
         MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS hi
  FROM events WHERE event_type = 'error'
  GROUP BY user_id
),
m AS (
  SELECT (hi - lo) // (n_err - 1) AS mtbf_s FROM per WHERE n_err >= 2
)
SELECT (length(bin((mtbf_s // 3600) + 1)) - 1)::BIGINT AS band,
       COUNT(*)::BIGINT AS n_users,
       MIN(mtbf_s)::BIGINT AS min_mtbf_s,
       MAX(mtbf_s)::BIGINT AS max_mtbf_s
FROM m
GROUP BY 1
"""

PENDING_QUERIES["events_error_mtbf"] = events_error_mtbf
PENDING_ORACLE["events_error_mtbf"] = ORACLE_ERROR_MTBF


# --- Newcomer load share — PENDING round 7 --------------------------------------
#
# How much of each week's traffic comes from users in their FIRST week?
# High newcomer share means load growth is acquisition-driven (and caches
# keyed on returning users won't help); low means a stable heavy-user base.
# Per week: events, events from users whose first-ever event fell in that
# same week, share in ppm, and distinct newcomers. Scale shape: one
# per-user min (map-side partials), one user-keyed join back, one bounded
# weekly rollup.

def events_newcomer_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(unix_timestamp(ts) / 604800) AS BIGINT)").alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("w0"))
    j = ev.join(first, "user_id").select(
        "week",
        "user_id",
        (F.col("week") == F.col("w0")).cast("int").alias("fresh"),
    )
    return j.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("fresh").cast("long").alias("n_fresh_events"),
        F.expr("sum(fresh) * 1000000 div count(1)")
        .cast("long")
        .alias("fresh_ppm"),
        F.countDistinct(
            F.when(F.col("fresh") == 1, F.col("user_id"))
        ).cast("long").alias("n_newcomers"),
    )


ORACLE_NEWCOMER = """
WITH ev AS (
  SELECT user_id, CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS week
  FROM events
),
first AS (SELECT user_id, MIN(week) AS w0 FROM ev GROUP BY user_id)
SELECT week,
       COUNT(*)::BIGINT AS n_events,
       SUM(CASE WHEN week = w0 THEN 1 ELSE 0 END)::BIGINT AS n_fresh_events,
       (SUM(CASE WHEN week = w0 THEN 1 ELSE 0 END) * 1000000
          // COUNT(*))::BIGINT AS fresh_ppm,
       COUNT(DISTINCT CASE WHEN week = w0 THEN user_id END)::BIGINT
         AS n_newcomers
FROM ev JOIN first USING (user_id)
GROUP BY week
"""

PENDING_QUERIES["events_newcomer_load"] = events_newcomer_load
PENDING_ORACLE["events_newcomer_load"] = ORACLE_NEWCOMER


# --- Hour-of-week load profile — PENDING round 7 --------------------------------
#
# The 168-cell load heatmap behind capacity scheduling: events per
# (day-of-week, hour) cell — dow from epoch-day mod 7 (engine-agnostic, no
# locale daynames), share of total in ppm, and the global rank (hottest
# cell first, deterministic (n DESC, dow, hour) tie-break). Scale shape:
# map-side cell key, one bounded 168-cell aggregate; share and rank are
# windows over that grid.

def events_hour_of_week_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("pmod(CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT), 7)")
        .cast("long")
        .alias("dow"),
        F.expr("pmod(CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT), 24)")
        .cast("long")
        .alias("hour"),
    )
    per = ev.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    wall = Window.partitionBy()
    wr = Window.orderBy(F.desc("n_events"), "dow", "hour")
    return per.select(
        "dow", "hour", "n_events",
        F.expr("n_events * 1000000 div sum(n_events) over ()")
        .cast("long")
        .alias("share_ppm"),
        F.row_number().over(wr).cast("long").alias("rank"),
    )


ORACLE_HOUR_OF_WEEK = """
WITH per AS (
  SELECT ((CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 7 + 7) % 7) AS dow,
         ((CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) % 24 + 24) % 24) AS hour,
         COUNT(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
)
SELECT dow::BIGINT AS dow, hour::BIGINT AS hour, n_events,
       (n_events * 1000000 // SUM(n_events) OVER ())::BIGINT AS share_ppm,
       ROW_NUMBER() OVER (ORDER BY n_events DESC, dow, hour)::BIGINT AS rank
FROM per
"""

PENDING_QUERIES["events_hour_of_week_profile"] = events_hour_of_week_profile
PENDING_ORACLE["events_hour_of_week_profile"] = ORACLE_HOUR_OF_WEEK


# --- Seasonal strength (balanced η²) — PENDING round 7 --------------------------
#
# How much of a type's hourly load variance is EXPLAINED by hour-of-day?
# One-way ANOVA R² on the balanced dense design (D whole days × 24 hours,
# zero cells counted), where balance collapses eta² to pure integers:
# with S_h the per-hour totals, S the grand total, N = 24·D and Q = Σx²
# over the dense grid, η² = (24·ΣS_h² − S²) / (N·Q − S²) — no per-group
# division survives. Days are truncated to the fixture's [min_day, max_day]
# full range; zero cells contribute zero to every sum, so the dense grid is
# ARITHMETIC (D from two scalars), never materialized. η² ≈ 1e6 means the
# daily shape explains everything (then the seasonal-adjusted anomaly row
# is the right detector); ≈ 0 means hour-of-day is noise. Floored ppm via
# DECIMAL(38).

def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").alias("day"),
        F.expr("pmod(CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT), 24)")
        .alias("hour"),
    )
    span = ev.agg(
        (F.max("day") - F.min("day") + 1).cast("long").alias("n_days")
    )
    cells = ev.groupBy("event_type", "day", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    hourly = cells.groupBy("event_type", "hour").agg(
        F.sum("x").alias("sh"), F.sum(F.col("x") * F.col("x")).alias("qh")
    )
    per = hourly.groupBy("event_type").agg(
        F.sum("sh").cast("long").alias("s"),
        F.sum("qh").cast("long").alias("q"),
        F.sum(F.col("sh") * F.col("sh")).cast("long").alias("ssh"),
    )
    return per.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.col("s").alias("n_events"),
        F.expr(
            "CAST(CAST(24 * ssh - s * s AS DECIMAL(38,0)) * 1000000"
            " DIV CAST(24 * n_days * q - s * s AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("eta2_ppm"),
    )


ORACLE_SEASONAL_STRENGTH = """
WITH ev AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
         ((CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) % 24 + 24) % 24) AS hour
  FROM events
),
span AS (SELECT (MAX(day) - MIN(day) + 1)::BIGINT AS n_days FROM ev),
cells AS (
  SELECT event_type, day, hour, COUNT(*)::BIGINT AS x
  FROM ev GROUP BY 1, 2, 3
),
hourly AS (
  SELECT event_type, hour, SUM(x) AS sh, SUM(x * x) AS qh
  FROM cells GROUP BY 1, 2
),
per AS (
  SELECT event_type, SUM(sh)::BIGINT AS s, SUM(qh)::BIGINT AS q,
         SUM(sh * sh)::BIGINT AS ssh
  FROM hourly GROUP BY event_type
)
SELECT event_type, s AS n_events,
       ((24::HUGEINT * ssh - s::HUGEINT * s) * 1000000
          // (24::HUGEINT * (SELECT n_days FROM span) * q - s::HUGEINT * s))::BIGINT
         AS eta2_ppm
FROM per
"""

PENDING_QUERIES["events_seasonal_strength"] = events_seasonal_strength
PENDING_ORACLE["events_seasonal_strength"] = ORACLE_SEASONAL_STRENGTH


# --- Trend-break report — PENDING round 7 ---------------------------------------
#
# Did each type's daily volume TREND change between the two halves of the
# timeline? Closed-form integer OLS (the orders_shiplag_trend device) fit
# separately per (type, half) on the DENSE daily count grid — zero days
# count, derived arithmetically (zeros add nothing to Σy/Σxy but DO extend
# Σx/Σx², so the dense sums come from the closed-form range identities
# Σx = (lo+hi)(hi−lo+1)/2 and Σx² via the square-pyramid formula — no grid
# materialization). Slopes floor to milli-events/day; the break statistic
# is their difference. Scale shape: one (type, half, day) aggregate with
# map-side partials, one bounded (type × 2) rollup + pivot.

def events_trend_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").alias("day"),
    )
    span = ev.agg(
        F.min("day").alias("lo"),
        F.max("day").alias("hi"),
        F.expr("(min(day) + max(day)) div 2").cast("long").alias("mid"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    halves = daily.crossJoin(F.broadcast(span)).select(
        "event_type", "day", "c",
        (F.col("day") > F.col("mid")).cast("int").alias("half"),
        "lo", "hi", "mid",
    )
    agg = halves.groupBy("event_type", "half").agg(
        F.sum("c").alias("sy"),
        F.sum(F.col("day") * F.col("c")).alias("sxy"),
        F.max(F.when(F.col("half") == 0, F.col("lo")).otherwise(F.col("mid") + 1)).alias("a"),
        F.max(F.when(F.col("half") == 0, F.col("mid")).otherwise(F.col("hi"))).alias("b"),
    )
    # dense-grid x-sums over [a, b]: n = b-a+1, Σx, Σx² by closed form
    slope = agg.select(
        "event_type", "half",
        F.expr("b - a + 1").alias("n"),
        F.expr("(a + b) * (b - a + 1) div 2").alias("sx"),
        F.expr(
            "(b * (b + 1) * (2 * b + 1) - (a - 1) * a * (2 * a - 1)) div 6"
        ).alias("sxx"),
        "sy", "sxy",
    ).select(
        "event_type", "half",
        F.expr(
            "CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) * 1000"
            " DIV CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("slope_milli"),
    )
    return slope.groupBy("event_type").agg(
        F.max(F.when(F.col("half") == 0, F.col("slope_milli"))).cast("long").alias("slope_pre_milli"),
        F.max(F.when(F.col("half") == 1, F.col("slope_milli"))).cast("long").alias("slope_post_milli"),
    ).withColumn(
        "break_milli", F.col("slope_post_milli") - F.col("slope_pre_milli")
    )


ORACLE_TREND_BREAK = """
WITH ev AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
span AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi, (MIN(day) + MAX(day)) // 2 AS mid
  FROM ev
),
daily AS (
  SELECT event_type, day, COUNT(*)::BIGINT AS c FROM ev GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         CASE WHEN day > (SELECT mid FROM span) THEN 1 ELSE 0 END AS half,
         SUM(c) AS sy, SUM(day * c) AS sxy,
         MAX(CASE WHEN day > (SELECT mid FROM span)
                  THEN (SELECT mid FROM span) + 1
                  ELSE (SELECT lo FROM span) END) AS a,
         MAX(CASE WHEN day > (SELECT mid FROM span)
                  THEN (SELECT hi FROM span)
                  ELSE (SELECT mid FROM span) END) AS b
  FROM daily GROUP BY 1, 2
),
slope AS (
  SELECT event_type, half,
         (((b - a + 1)::HUGEINT * sxy
            - ((a + b) * (b - a + 1) // 2)::HUGEINT * sy) * 1000
           // ((b - a + 1)::HUGEINT
                 * ((b * (b + 1) * (2 * b + 1) - (a - 1) * a * (2 * a - 1)) // 6)
               - ((a + b) * (b - a + 1) // 2)::HUGEINT
                 * ((a + b) * (b - a + 1) // 2)))::BIGINT AS slope_milli
  FROM agg
)
SELECT event_type,
       MAX(CASE WHEN half = 0 THEN slope_milli END)::BIGINT AS slope_pre_milli,
       MAX(CASE WHEN half = 1 THEN slope_milli END)::BIGINT AS slope_post_milli,
       (MAX(CASE WHEN half = 1 THEN slope_milli END)
        - MAX(CASE WHEN half = 0 THEN slope_milli END))::BIGINT AS break_milli
FROM slope
GROUP BY event_type
"""

PENDING_QUERIES["events_trend_break"] = events_trend_break
PENDING_ORACLE["events_trend_break"] = ORACLE_TREND_BREAK


# --- Round-7 registration wave 1 ------------------------------------------
# Flip these pending rows into the driver contract: the r6 green rows freed
# window slots (rotation policy in COVERAGE.md; order in
# queries/__init__._WINDOW_FRONT). The functions above are unchanged — the
# flip only moves the (query, oracle) pair between registries.
_REGISTER_WAVE1 = (
    "events_hourly_seasonality",
    "events_burstiness",
    "events_sessionize_capped",
    "events_hourly_latency_bands",
)
for _n in _REGISTER_WAVE1:
    QUERIES[_n] = PENDING_QUERIES.pop(_n)
    ORACLE[_n] = PENDING_ORACLE.pop(_n)
del _n


# --- minute OHLC bars — PENDING round 8+ --------------------------------------
#
# The canonical ClickHouse time-series rollup (the shape its AggregatingMT
# materialized views exist for, cf. the reference's MV at
# clickhouse_schemas.sql:49-58): per (event_type, minute), open/high/low/
# close of the integer cent value plus volume. Open/close are version
# arg-min/arg-max over the (epoch-micros, event_id) order key — the exact
# same ordered-arg-max algebra as the CDC current-state merge (A2), which
# makes the bar mergeable: partial bars from two data slices combine by
# the same min_by/max_by/min/max/sum, so at 100 TB this is ONE map-side
# partial agg + one keyed shuffle, and the streaming variant could reuse
# the sketch-ingest recipe verbatim. Both engines compare the order key
# as a (us, eid) row value — no synthetic packed key, no overflow.


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    d = ev.withColumn("minute_idx", F.expr("us div 60000000").cast("long"))
    return d.groupBy("event_type", "minute_idx").agg(
        F.min_by("c", F.struct("us", "eid")).cast("long").alias("open_cents"),
        F.max("c").cast("long").alias("high_cents"),
        F.min("c").cast("long").alias("low_cents"),
        F.max_by("c", F.struct("us", "eid")).cast("long").alias("close_cents"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("c").cast("long").alias("volume_cents"),
    )


_SQL_OHLC = """
WITH ev AS (
  SELECT event_type,
         epoch_us(ts) AS us,
         event_id AS eid,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
d AS (
  SELECT *, CAST(us // 60000000 AS BIGINT) AS minute_idx,
         row_number() OVER (PARTITION BY event_type, CAST(us // 60000000 AS BIGINT)
                            ORDER BY us, eid) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, CAST(us // 60000000 AS BIGINT)) AS n
  FROM ev
)
SELECT event_type, minute_idx,
       MAX(CASE WHEN rn = 1 THEN c END)::BIGINT AS open_cents,
       MAX(c)::BIGINT AS high_cents,
       MIN(c)::BIGINT AS low_cents,
       MAX(CASE WHEN rn = n THEN c END)::BIGINT AS close_cents,
       COUNT(*)::BIGINT AS n_events,
       SUM(c)::BIGINT AS volume_cents
FROM d GROUP BY event_type, minute_idx
"""

PENDING_QUERIES["events_ohlc_bars"] = events_ohlc_bars
PENDING_ORACLE["events_ohlc_bars"] = _SQL_OHLC


# --- last-touch attribution — PENDING round 8+ --------------------------------
#
# Marketing attribution, the workload funnels feed: every `purchase` is
# credited to the LATEST strictly-preceding non-purchase event by the same
# user within a lookback window. The carried "last touch" is a running MAX
# of the (us, eid, event_type) struct over non-purchase rows — struct
# ordering is dominated by (us, eid), so the max IS the latest touch and
# the whole thing is ONE pass over the per-user window (no per-conversion
# lookback join). Per credited channel: conversions, share in integer PPM;
# purchases with no in-window touch report as the 'unattributed' row.
# Scale: windows partition by user (parallel), then one tiny keyed agg.

ATTR_WINDOW_S = 7 * 24 * 3600


def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "eid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.max(
        F.when(
            F.col("event_type") != "purchase",
            F.struct("us", "eid", "event_type"),
        )
    ).over(w)
    credited = (
        ev.withColumn("t", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("t").isNotNull()
                & (
                    F.col("us") - F.col("t.us")
                    <= F.lit(ATTR_WINDOW_S * 1_000_000).cast("long")
                ),
                F.col("t.event_type"),
            )
            .otherwise(F.lit("unattributed"))
            .alias("channel"),
        )
    )
    cells = credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions")
    )
    total = cells.agg(F.sum("n_conversions").cast("long").alias("t"))
    return cells.crossJoin(F.broadcast(total)).select(
        "channel",
        "n_conversions",
        F.expr("n_conversions * 1000000 div t").cast("long").alias("share_ppm"),
    )


_SQL_ATTRIBUTION = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id AS eid, event_type FROM events
),
touched AS (
  SELECT user_id, us, eid, event_type,
         MAX(CASE WHEN event_type <> 'purchase' THEN (us, eid, event_type) END)
           OVER (PARTITION BY user_id ORDER BY us, eid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t
  FROM ev
),
credited AS (
  SELECT CASE WHEN t IS NOT NULL AND us - t[1] <= {ATTR_WINDOW_S * 1_000_000}
              THEN CAST(t[3] AS VARCHAR) ELSE 'unattributed' END AS channel
  FROM touched WHERE event_type = 'purchase'
),
cells AS (SELECT channel, COUNT(*)::BIGINT AS n_conversions FROM credited GROUP BY channel)
SELECT channel, n_conversions,
       (n_conversions * 1000000 // (SELECT SUM(n_conversions) FROM cells))::BIGINT AS share_ppm
FROM cells
"""

PENDING_QUERIES["events_attribution_last_touch"] = events_attribution_last_touch
PENDING_ORACLE["events_attribution_last_touch"] = _SQL_ATTRIBUTION


# --- Kaplan-Meier conversion survival — PENDING round 8+ ----------------------
#
# Survival analysis enters the registry: the Kaplan-Meier estimator of
# "time from first activity to first purchase", with users who never
# convert RIGHT-CENSORED at their last observed event — the statistically
# honest version of time-to-convert (dropping non-converters biases the
# curve optimistic; counting them as converted biases it pessimistic).
# S(t) = Π_{s<=t} (1 - d_s/n_s) over event days, computed as an ordered
# integer fold in PPM with truncating division (both engines run the
# literal same op sequence; the accumulator carries [survival_ppm,
# consumed] so the at-risk count n_s = total - consumed needs no second
# pass). The day-grain table is |distinct T|-bounded (corpus time span in
# days), so the collect_list is model-sized state — the same bounded-
# array device as the rolling-median frame, never event-sized.

_KM_B = 1 << 31  # (d, c) pair encoding base for the cross-engine fold


def km_estimator(per_user: DataFrame) -> DataFrame:
    """The KM tail over a per-user (first_day, conv_day, last_day) table —
    factored out so the streaming variant (per-user state maintained by
    order-free min/min/max merges, ``streaming/sketch.py``) scores with
    the EXACT batch expression tree."""
    tt = per_user.select(
        F.when(
            F.col("conv_day").isNotNull(), F.col("conv_day") - F.col("first_day")
        )
        .otherwise(F.col("last_day") - F.col("first_day"))
        .cast("long")
        .alias("t"),
        F.col("conv_day").isNotNull().alias("e"),
    )
    day_t = tt.groupBy("t").agg(
        F.sum(F.when(F.col("e"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("e"), 0).otherwise(1)).cast("long").alias("c"),
    )
    arr = day_t.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "c"))).alias("a"),
        F.sum(F.col("d") + F.col("c")).cast("long").alias("tot"),
    )
    ex = arr.select("a", "tot", F.posexplode("a").alias("i", "x"))
    before = F.expr(
        "aggregate(slice(a, 1, i), CAST(0 AS BIGINT), (acc, y) -> acc + y.d + y.c)"
    )
    surv = F.expr(
        "element_at(aggregate(slice(a, 1, i + 1),"
        " array(CAST(1000000 AS BIGINT), CAST(0 AS BIGINT)),"
        " (acc, y) -> array("
        "   element_at(acc, 1) * ((tot - element_at(acc, 2)) - y.d)"
        "     div (tot - element_at(acc, 2)),"
        "   element_at(acc, 2) + y.d + y.c)), 1)"
    )
    return ex.select(
        F.col("x.t").alias("t_days"),
        (F.col("tot") - before).cast("long").alias("n_at_risk"),
        F.col("x.d").alias("n_converted"),
        F.col("x.c").alias("n_censored"),
        surv.cast("long").alias("survival_ppm"),
    )


def km_per_user(ev: DataFrame) -> DataFrame:
    """Per-user survival state from (user_id, day, event_type) rows: every
    field is an order-free min/min/max — the mergeable-sketch algebra."""
    return ev.groupBy("user_id").agg(
        F.min("day").alias("first_day"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("day"))).alias(
            "conv_day"
        ),
        F.max("day").alias("last_day"),
    )


def events_km_conversion_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").cast("long").alias("day"),
        "event_type",
    )
    return km_estimator(km_per_user(ev))


_SQL_KM = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type FROM events
),
per_user AS (
  SELECT user_id, MIN(day) AS first_day,
         MIN(CASE WHEN event_type = 'purchase' THEN day END) AS conv_day,
         MAX(day) AS last_day
  FROM ev GROUP BY user_id
),
tt AS (
  SELECT CAST(CASE WHEN conv_day IS NOT NULL THEN conv_day - first_day
              ELSE last_day - first_day END AS BIGINT) AS t,
         conv_day IS NOT NULL AS e
  FROM per_user
),
day_t AS (
  SELECT t, SUM(CASE WHEN e THEN 1 ELSE 0 END)::BIGINT AS d,
         SUM(CASE WHEN e THEN 0 ELSE 1 END)::BIGINT AS c
  FROM tt GROUP BY t
),
arr AS (
  SELECT list(t ORDER BY t) AS ts,
         list(d * {_KM_B} + c ORDER BY t) AS es,
         SUM(d + c)::BIGINT AS tot
  FROM day_t
),
idx AS (
  SELECT ts, es, tot, unnest(generate_series(1, len(ts))) AS i FROM arr
)
SELECT ts[i] AS t_days,
       (tot - list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(es[1:i-1], x -> x // {_KM_B} + x % {_KM_B})),
          (a, b) -> a + b))::BIGINT AS n_at_risk,
       (es[i] // {_KM_B})::BIGINT AS n_converted,
       (es[i] % {_KM_B})::BIGINT AS n_censored,
       list_reduce(
         list_prepend([CAST(1000000 AS BIGINT), CAST(0 AS BIGINT)],
           list_transform(es[1:i], x -> [x // {_KM_B}, x % {_KM_B}])),
         (acc, x) -> [acc[1] * ((tot - acc[2]) - x[1]) // (tot - acc[2]),
                      acc[2] + x[1] + x[2]]
       )[1]::BIGINT AS survival_ppm
FROM idx
"""

PENDING_QUERIES["events_km_conversion_survival"] = events_km_conversion_survival
PENDING_ORACLE["events_km_conversion_survival"] = _SQL_KM


# --- Poisson-bootstrap confidence intervals — PENDING round 8+ -----------------
#
# Uncertainty quantification enters the registry: a 95% bootstrap CI for
# the per-type mean value, by the POISSON bootstrap (Chamandy et al. 2012,
# "Estimating Uncertainty for Massive Data Streams" — the Google recipe) —
# the distributed form of resampling: instead of drawing n-out-of-n (which
# needs global coordination), each row enters replicate b with weight
# w ~ Poisson(1), independent per (row, b), so every replicate is one
# map-side weight + the same keyed agg as the plain mean. Determinism:
# w is drawn by an md5-derived 16-bit uniform against the PRECOMPUTED
# integer CDF ladder of Poisson(1) (thresholds frozen as literals, tail
# capped at w=5 — cumP(4)=0.9963), so both engines draw the identical
# replicate weights. Replicate means are integer micro-units; the CI is
# nearest-rank p2.5/p97.5 over B=64 replicate means. Cost: B× map-side
# fan-out into a (type, b)-keyed agg — bounded, no global resample.

BOOT_B = 64
_POISSON_CDF16 = (24109, 48218, 60273, 64291, 65296)  # w = 0..4, else 5


def events_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI for the per-type mean (map-side replicate
    weights, keyed agg, per-type replicate windows bounded by BOOT_B).

    COST NOTE (VERDICT r8): the explode amplifies the events table
    BOOT_B (=64)x BY DESIGN — that is the canonical scale-out bootstrap
    (weights are per-(row, replicate), no resampling shuffle), and it is
    why this is the most expensive bench line. At 100 TB, either budget
    the 64x map cost consciously or drop B; do not treat the amplification
    as an accident to optimize away."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("event_id").alias("eid"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    # One md5 digest carries eight 16-bit uniforms (32 hex chars / 4), so
    # the B=64 draws need 8 digests per event, not 64 — the hash was ~80%
    # of this line's cost (VERDICT r11 #5). The digests materialize as an
    # array column BELOW the explode boundary so they are evaluated once
    # per event (the no-CSE-across-lambda pitfall documented at
    # text_bigram_logprob); replicate b then slices digest b div 8 at
    # offset (b % 8)*4. The DuckDB twin and the Python law-test twin draw
    # identically.
    hashed = ev.select(
        "event_type", "eid", "c",
        F.array(
            *[
                F.md5(F.concat_ws(":", F.col("eid"), F.lit(str(k))))
                for k in range(BOOT_B // 8)
            ]
        ).alias("hs"),
    )
    exploded = hashed.select(
        "event_type", "eid", "c", "hs",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    u = F.conv(
        F.expr(
            "substring(element_at(hs, CAST(b div 8 AS INT) + 1),"
            " CAST((b % 8) * 4 AS INT) + 1, 4)"
        ),
        16, 10,
    ).cast("long")
    ladder = F.when(u < _POISSON_CDF16[0], 0)
    for i in range(1, len(_POISSON_CDF16)):
        ladder = ladder.when(u < _POISSON_CDF16[i], i)
    w = ladder.otherwise(len(_POISSON_CDF16)).cast("long")
    reps = (
        exploded.withColumn("w", w)
        .groupBy("event_type", "b")
        .agg(
            F.sum("w").cast("long").alias("sw"),
            F.sum(F.col("w") * F.col("c")).cast("long").alias("swc"),
        )
        .filter(F.col("sw") > 0)
        .select("event_type", "b", F.expr("swc * 1000000 div sw").alias("m"))
    )
    wr = Window.partitionBy("event_type")
    ranked = reps.withColumn("rn", F.row_number().over(wr.orderBy("m", "b"))).withColumn(
        "nb", F.count(F.lit(1)).over(wr)
    )
    ci = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.expr("(25 * nb + 999) div 1000"), F.col("m")))
        .cast("long").alias("boot_lo_micro"),
        F.max(F.when(F.col("rn") == F.expr("(975 * nb + 999) div 1000"), F.col("m")))
        .cast("long").alias("boot_hi_micro"),
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
    )
    point = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.expr("sum(c) * 1000000 div count(1)").cast("long").alias("mean_micro"),
    )
    return point.join(ci, "event_type").select(
        "event_type", "n_events", "mean_micro",
        "boot_lo_micro", "boot_hi_micro", "n_replicates",
    )


def _sql_bootstrap() -> str:
    # one digest = eight 16-bit draws; replicate b reads digest b//8 at
    # hex offset (b % 8)*4 — mirrors the Spark array-of-8-digests form
    hs = ", ".join(
        f"md5(CAST(eid AS VARCHAR) || ':{k}')" for k in range(BOOT_B // 8)
    )
    u = "(" + " + ".join(
        f"(instr('0123456789abcdef',"
        f" substring(hs[(b // 8) + 1], (b % 8) * 4 + {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    ) + ")"
    arms = " ".join(
        f"WHEN {u} < {t} THEN {i}" for i, t in enumerate(_POISSON_CDF16)
    )
    return f"""
WITH ev AS (
  SELECT event_type, event_id AS eid,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
hashed AS (
  SELECT event_type, eid, c, [{hs}] AS hs FROM ev
),
exploded AS (
  SELECT event_type, eid, c, hs, CAST(b AS BIGINT) AS b
  FROM hashed, (SELECT unnest(range({BOOT_B})) AS b)
),
weighted AS (
  SELECT event_type, b, c,
         CAST(CASE {arms} ELSE {len(_POISSON_CDF16)} END AS BIGINT) AS w
  FROM exploded
),
reps AS (
  SELECT event_type, b, SUM(w * c) * 1000000 // SUM(w) AS m
  FROM weighted GROUP BY event_type, b
  HAVING SUM(w) > 0
),
ranked AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type ORDER BY m, b) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS nb
  FROM reps
),
ci AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (25 * nb + 999) // 1000 THEN m END)::BIGINT
           AS boot_lo_micro,
         MAX(CASE WHEN rn = (975 * nb + 999) // 1000 THEN m END)::BIGINT
           AS boot_hi_micro,
         COUNT(*)::BIGINT AS n_replicates
  FROM ranked GROUP BY event_type
),
point AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_events,
         (SUM(c) * 1000000 // COUNT(*))::BIGINT AS mean_micro
  FROM ev GROUP BY event_type
)
SELECT p.event_type, p.n_events, p.mean_micro,
       c.boot_lo_micro, c.boot_hi_micro, c.n_replicates
FROM point p JOIN ci c USING (event_type)
"""


PENDING_QUERIES["events_bootstrap_mean_ci"] = events_bootstrap_mean_ci
PENDING_ORACLE["events_bootstrap_mean_ci"] = _sql_bootstrap()


# --- A/B power analysis (minimum detectable effect) — PENDING round 8+ ---------
#
# The experimentation-platform planning row: for a 50/50 split of each
# event type's CURRENT traffic, the minimum detectable effect on the mean
# value at alpha = 5% (two-sided) and 80% power — MDE = (z_{0.975} +
# z_{0.80}) · sqrt(2 σ²/n_arm), the sample-size formula every A/B tool
# inverts. Integer discipline: σ² is the exact integer sample variance
# (n·Σc² − (Σc)²) div (n(n−1)) in cents², the z-sum is the FROZEN literal
# 2.801585 (no runtime quantile functions), and the single IEEE step is
# sqrt — correctly rounded by the standard, hence bit-identical across
# engines — floored once to micro-cents. Int64 audit: Σc² ≤ n·(10^4
# cents)² ⇒ safe beyond 10^10 rows per type; n·Σc² ≤ 10^18 at the
# fixture's value range (documented bound, same as the variance rows).

_AB_ZSUM_PPM = 2_801_585  # z_0.975 + z_0.80 in micro-units


def events_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    stats = agg.select(
        "event_type",
        "n_events",
        F.expr("s * 1000000 div n_events").cast("long").alias("mean_cents_micro"),
        F.expr("(n_events * s2 - s * s) div (n_events * (n_events - 1))")
        .cast("long")
        .alias("var_cents2"),
        F.expr("n_events div 2").cast("long").alias("n_per_arm"),
    )
    mde = F.floor(
        F.lit(float(_AB_ZSUM_PPM))
        * F.sqrt(
            F.lit(2.0) * F.col("var_cents2").cast("double")
            / F.col("n_per_arm").cast("double")
        )
    ).cast("long")
    return stats.select("*", mde.alias("mde_cents_micro")).select(
        "*",
        F.expr(
            "mde_cents_micro * 1000000 div greatest(CAST(1 AS BIGINT),"
            " mean_cents_micro)"
        ).cast("long").alias("mde_rel_ppm"),
    )


_SQL_AB_POWER = f"""
WITH ev AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
agg AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_events,
         SUM(c)::BIGINT AS s, SUM(c * c)::BIGINT AS s2
  FROM ev GROUP BY event_type
),
stats AS (
  SELECT event_type, n_events,
         (s * 1000000 // n_events)::BIGINT AS mean_cents_micro,
         ((n_events * s2 - s * s) // (n_events * (n_events - 1)))::BIGINT
           AS var_cents2,
         (n_events // 2)::BIGINT AS n_per_arm
  FROM agg
),
m AS (
  SELECT *,
         CAST(FLOOR({float(_AB_ZSUM_PPM)!r}
              * sqrt(2.0 * CAST(var_cents2 AS DOUBLE)
                     / CAST(n_per_arm AS DOUBLE))) AS BIGINT) AS mde_cents_micro
  FROM stats
)
SELECT *,
       (mde_cents_micro * 1000000
        // GREATEST(CAST(1 AS BIGINT), mean_cents_micro))::BIGINT AS mde_rel_ppm
FROM m
"""

PENDING_QUERIES["events_ab_power_mde"] = events_ab_power_mde
PENDING_ORACLE["events_ab_power_mde"] = _SQL_AB_POWER


# --- first-touch attribution — PENDING round 8+ --------------------------------
#
# The other end of the attribution spectrum (the pair brackets every
# position-based scheme): each CONVERTING USER's first purchase is
# credited to the user's EARLIEST non-purchase event preceding it — the
# acquisition-channel view, vs last-touch's closing-channel view. One
# keyed agg per user (min_by over order-key structs, before-the-purchase
# guarded in the aggregate's filter), then the tiny channel rollup; no
# windows at all, so this is cheaper than last-touch at any scale. Users
# converting on their very first event report 'unattributed'.


def events_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
        "event_type",
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.struct("us", "eid")
            )
        ).alias("fp"),
        F.min(
            F.when(
                F.col("event_type") != "purchase",
                F.struct("us", "eid", "event_type"),
            )
        ).alias("ft"),
    )
    credited = per_user.filter(F.col("fp").isNotNull()).select(
        F.when(
            F.col("ft").isNotNull()
            & (
                F.struct(F.col("ft.us"), F.col("ft.eid"))
                < F.struct(F.col("fp.us"), F.col("fp.eid"))
            ),
            F.col("ft.event_type"),
        )
        .otherwise(F.lit("unattributed"))
        .alias("channel")
    )
    cells = credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_converting_users")
    )
    total = cells.agg(F.sum("n_converting_users").cast("long").alias("t"))
    return cells.crossJoin(F.broadcast(total)).select(
        "channel",
        "n_converting_users",
        F.expr("n_converting_users * 1000000 div t").cast("long").alias("share_ppm"),
    )


_SQL_FIRST_TOUCH = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id AS eid, event_type FROM events
),
per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase' THEN (us, eid) END) AS fp,
         MIN(CASE WHEN event_type <> 'purchase' THEN (us, eid, event_type) END) AS ft
  FROM ev GROUP BY user_id
),
credited AS (
  SELECT CASE WHEN ft IS NOT NULL AND (ft[1], ft[2]) < (fp[1], fp[2])
              THEN CAST(ft[3] AS VARCHAR) ELSE 'unattributed' END AS channel
  FROM per_user WHERE fp IS NOT NULL
),
cells AS (
  SELECT channel, COUNT(*)::BIGINT AS n_converting_users FROM credited GROUP BY channel
)
SELECT channel, n_converting_users,
       (n_converting_users * 1000000
        // (SELECT SUM(n_converting_users) FROM cells))::BIGINT AS share_ppm
FROM cells
"""

PENDING_QUERIES["events_attribution_first_touch"] = events_attribution_first_touch
PENDING_ORACLE["events_attribution_first_touch"] = _SQL_FIRST_TOUCH


# --- user-activity concentration — PENDING round 8+ ----------------------------
#
# The whale report: how concentrated is event volume across users? Gini
# coefficient by the integer rank formula (the token-Gini device at user
# grain — (2·Σi·xᵢ − (n+1)·Σx)·1e6 div (n·Σx) over ascending ranks) plus
# the top-1% and top-10% user shares in PPM (nearest-rank integer user
# counts). One keyed count + one global rank window over |users| rows
# (user-grain, never event-grain, so the window input is the small side).


def events_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VERDICT r7 fix: the rank comes from the two-phase exact global rank,
    # not a single-partition row_number window — user grain is |users| at
    # 100 TB, not "the small side"
    from cdc_postgresql_clickhouse_spark.operators.ranking import global_row_number

    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    ranked = global_row_number(
        per_user, [F.asc("x"), F.asc("user_id")], out="i"
    ).select("x", "i")
    return _concentration_agg(ranked)


def _concentration_agg(ranked: DataFrame) -> DataFrame:
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = ranked.crossJoin(F.broadcast(n))
    return j.agg(
        F.max("n").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("n_events"),
        F.expr(
            "(2 * sum(i * x) - (max(n) + 1) * sum(x)) * 1000000"
            " div (max(n) * sum(x))"
        ).cast("long").alias("gini_ppm"),
        F.expr(
            "sum(CASE WHEN i > n - (n + 99) div 100 THEN x ELSE 0 END)"
            " * 1000000 div sum(x)"
        ).cast("long").alias("top1pct_share_ppm"),
        F.expr(
            "sum(CASE WHEN i > n - (n + 9) div 10 THEN x ELSE 0 END)"
            " * 1000000 div sum(x)"
        ).cast("long").alias("top10pct_share_ppm"),
    )


_SQL_CONCENTRATION = """
WITH per_user AS (
  SELECT user_id, COUNT(*)::BIGINT AS x FROM events GROUP BY user_id
),
ranked AS (
  SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i
  FROM per_user
),
n AS (SELECT COUNT(*)::BIGINT AS n FROM ranked)
SELECT MAX(n.n)::BIGINT AS n_users,
       SUM(x)::BIGINT AS n_events,
       ((2 * SUM(i * x) - (MAX(n.n) + 1) * SUM(x)) * 1000000
        // (MAX(n.n) * SUM(x)))::BIGINT AS gini_ppm,
       (SUM(CASE WHEN i > n.n - (n.n + 99) // 100 THEN x ELSE 0 END)
        * 1000000 // SUM(x))::BIGINT AS top1pct_share_ppm,
       (SUM(CASE WHEN i > n.n - (n.n + 9) // 10 THEN x ELSE 0 END)
        * 1000000 // SUM(x))::BIGINT AS top10pct_share_ppm
FROM ranked CROSS JOIN n
"""

PENDING_QUERIES["events_user_concentration"] = events_user_concentration
PENDING_ORACLE["events_user_concentration"] = _SQL_CONCENTRATION


# --- heavy-hitter turnover — PENDING round 8+ ----------------------------------
#
# "Are the whales the same whales?" — stability of the top-K most active
# users between the first and second half of the event timeline: overlap
# count, Jaccard in PPM, and entrant/dropout counts. The question behind
# cache sizing, abuse review, and whether a heavy-hitter sketch's state
# can be carried across windows. Two keyed counts + two |users|-grain
# rank windows + a tiny set compare; K is a frozen literal so both
# engines cut identical nearest-rank tops (count desc, user_id asc
# tie-break — deterministic).

HH_TURNOVER_K = 20


def events_heavy_hitter_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VERDICT r7 fix: ranking within only 2 half-timeline groups put each
    # half's |users| rows on one task — the salted lossless prune
    # (grouped_topk) bounds the final per-group window to ≤ buckets·K rows
    from cdc_postgresql_clickhouse_spark.operators.ranking import grouped_topk

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    mid = ev.agg(F.expr("(min(us) + max(us)) div 2").cast("long").alias("mid"))
    halves = ev.crossJoin(F.broadcast(mid)).select(
        "user_id", (F.col("us") > F.col("mid")).alias("h1")
    )
    counts = halves.groupBy("h1", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    tops = grouped_topk(
        counts,
        ["h1"],
        [F.desc("x"), F.asc("user_id")],
        HH_TURNOVER_K,
        salt_col=F.col("user_id"),
        rank_out="rk",
    )
    a = tops.filter(~F.col("h1")).select(F.col("user_id").alias("u"))
    b = tops.filter(F.col("h1")).select(F.col("user_id").alias("u"))
    inter = a.join(b, "u").agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    return inter.select(
        F.lit(HH_TURNOVER_K).cast("long").alias("k"),
        "n_common",
        F.expr(f"n_common * 1000000 div (2 * {HH_TURNOVER_K} - n_common)")
        .cast("long")
        .alias("jaccard_ppm"),
        (F.lit(HH_TURNOVER_K).cast("long") - F.col("n_common")).alias("n_entrants"),
        (F.lit(HH_TURNOVER_K).cast("long") - F.col("n_common")).alias("n_dropouts"),
    )


_SQL_HH_TURNOVER = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
counts AS (
  SELECT us > mid AS h1, user_id, COUNT(*)::BIGINT AS x
  FROM ev CROSS JOIN mid GROUP BY 1, 2
),
tops AS (
  SELECT h1, user_id FROM (
    SELECT h1, user_id,
           row_number() OVER (PARTITION BY h1 ORDER BY x DESC, user_id) AS rk
    FROM counts
  ) WHERE rk <= {HH_TURNOVER_K}
),
inter AS (
  SELECT COUNT(*)::BIGINT AS n_common
  FROM tops a JOIN tops b ON a.user_id = b.user_id AND NOT a.h1 AND b.h1
)
SELECT CAST({HH_TURNOVER_K} AS BIGINT) AS k,
       n_common,
       (n_common * 1000000 // (2 * {HH_TURNOVER_K} - n_common))::BIGINT AS jaccard_ppm,
       ({HH_TURNOVER_K} - n_common)::BIGINT AS n_entrants,
       ({HH_TURNOVER_K} - n_common)::BIGINT AS n_dropouts
FROM inter
"""

PENDING_QUERIES["events_heavy_hitter_turnover"] = events_heavy_hitter_turnover
PENDING_ORACLE["events_heavy_hitter_turnover"] = _SQL_HH_TURNOVER


# --- Round-8 registration: the whole pending layer flips in ----------------
# VERDICT r7 #1: the driver's 50-row window gates which rows get CHECKED per
# round, not how many may be REGISTERED — holding locally hash-verified
# operators out of the contract understates coverage and risks rows never
# receiving a driver row. Window order lives in queries/__init__.
flip_pending(PENDING_QUERIES, PENDING_ORACLE, QUERIES, ORACLE)


# --- Weekly cohort retention matrix — round 10 -------------------------------
#
# The classic cohort triangle: users grouped by their first-activity week,
# each cohort tracked across week offsets — n_active distinct users at
# offset k over the cohort's size, in ppm. The product-analytics staple the
# funnel/streak family lacked: streaks measure CONSECUTIVE activity, the
# cohort matrix measures RETURN probability by tenure, which is what
# capacity and growth models consume.
#
# Scale shape: one map-side-combinable distinct over (user, week) — the
# activity grain — plus one per-user MIN for the cohort stamp (both partial
# aggregates), a user-keyed join between them, and a final rollup onto the
# (weeks x offsets) triangle, which is calendar-bounded (O(W^2/2) rows at
# ANY corpus size). Cohort size joins back by cohort week — a broadcast of
# the W-row cohort table. No window over unbounded partitions, no driver
# state.
#
# Determinism: weeks are integer epoch-week indices (floor(epoch) div
# 604800 — the proven cdc_op_mix_weekly device, no calendar/timezone
# semantics involved); retention is integer-ppm (div on both engines,
# non-negative numerator).

def cohort_matrix_from_activity(active: DataFrame) -> DataFrame:
    """The matrix tail over a DISTINCT (user_id, week) activity table —
    factored out because the activity grain is MERGEABLE state (set union;
    min-week per user), which is what the streaming equiv appends per
    micro-batch and distinct-merges at read time."""
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    cells = (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        F.col("week_offset").cast("long").alias("week_offset"),
        "n_cohort",
        "n_active",
        F.expr("n_active * 1000000 div n_cohort").cast("long").alias("retention_ppm"),
    )


def events_retention_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("floor(unix_timestamp(ts)) div 604800").cast("long").alias("week"),
    )
    return cohort_matrix_from_activity(ev.distinct())


_SQL_COHORT_MATRIX = """
WITH active AS (
  SELECT DISTINCT user_id,
         (CAST(FLOOR(epoch(ts)) AS BIGINT) // 604800)::BIGINT AS week
  FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM active GROUP BY user_id),
sizes AS (SELECT cohort_week, COUNT(*)::BIGINT AS n_cohort FROM cohort GROUP BY 1),
cells AS (
  SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
         COUNT(*)::BIGINT AS n_active
  FROM active a JOIN cohort c USING (user_id)
  GROUP BY 1, 2
)
SELECT cells.cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
       n_cohort, n_active,
       (n_active * 1000000 // n_cohort)::BIGINT AS retention_ppm
FROM cells JOIN sizes USING (cohort_week)
"""

QUERIES["events_retention_cohort_matrix"] = events_retention_cohort_matrix
ORACLE["events_retention_cohort_matrix"] = _SQL_COHORT_MATRIX


# --- Peak concurrent sessions — round 10 ---------------------------------------
#
# Capacity sizing's headline number: per day, the maximum number of
# simultaneously-open sessions (30-min-gap sessions, [start, end]
# inclusive). Concurrency only INCREASES at session starts, so the peak
# always occurs at a start instant: conc(t) = starts<=t - ends<t,
# evaluated at every distinct start second via running sums over the
# VALUE-GROUPED (second, n_starts, n_ends) table — unique rows per
# second, so the running sums are order-unambiguous (no intra-tie
# staircase to reason about) and the day's max is exact. Days with no
# starts (pure carry-over plateaus) are by definition not reported.
#
# Scale shape: sessionization is the audited one-shuffle user-keyed
# pipeline; the sweep table is grouped to distinct seconds before the
# global-order running sums (at 100 TB those prefix sums distribute as
# per-range totals + broadcast offsets — the two-phase rank's sibling;
# the fixture runs them as one window over the bounded distinct-second
# domain).

def events_peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = events_sessionize(spark, sf_dir).select(
        F.col("session_start_epoch").alias("s"),
        (F.col("session_start_epoch") + F.col("duration_s")).alias("e"),
    )
    starts = sess.groupBy(F.col("s").alias("es")).agg(
        F.count(F.lit(1)).cast("long").alias("s_cnt")
    )
    ends = sess.groupBy(F.col("e").alias("es")).agg(
        F.count(F.lit(1)).cast("long").alias("e_cnt")
    )
    merged = (
        starts.join(ends, "es", "full")
        .select(
            "es",
            F.coalesce("s_cnt", F.lit(0).cast("long")).alias("s_cnt"),
            F.coalesce("e_cnt", F.lit(0).cast("long")).alias("e_cnt"),
        )
    )
    w = Window.orderBy("es").rowsBetween(Window.unboundedPreceding, 0)
    swept = merged.select(
        "es", "s_cnt", "e_cnt",
        F.sum("s_cnt").over(w).alias("cum_s"),
        F.sum("e_cnt").over(w).alias("cum_e"),
    ).select(
        "es", "s_cnt",
        # active at second es = starts<=es - ends<es
        (F.col("cum_s") - F.col("cum_e") + F.col("e_cnt")).alias("conc"),
    )
    return (
        swept.filter(F.col("s_cnt") > 0)
        .groupBy(F.expr("es div 86400").cast("long").alias("day"))
        .agg(
            F.sum("s_cnt").cast("long").alias("n_sessions_started"),
            F.max("conc").cast("long").alias("peak_concurrency"),
        )
    )


_SQL_PEAK_CONC = """
WITH ev AS (
  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events
),
flagged AS (
  SELECT user_id, es,
         CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) IS NULL
                OR es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess,
         event_id
  FROM ev
),
sess_idx AS (
  SELECT user_id, es,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY es, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
),
sess AS (
  SELECT MIN(es) AS s, MAX(es) AS e
  FROM sess_idx GROUP BY user_id, session_idx
),
starts AS (SELECT s AS es, COUNT(*)::BIGINT AS s_cnt FROM sess GROUP BY s),
ends AS (SELECT e AS es, COUNT(*)::BIGINT AS e_cnt FROM sess GROUP BY e),
merged AS (
  SELECT COALESCE(st.es, en.es) AS es,
         COALESCE(st.s_cnt, 0) AS s_cnt,
         COALESCE(en.e_cnt, 0) AS e_cnt
  FROM starts st FULL JOIN ends en ON st.es = en.es
),
swept AS (
  SELECT es, s_cnt,
         SUM(s_cnt) OVER (ORDER BY es ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - SUM(e_cnt) OVER (ORDER BY es ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           + e_cnt AS conc
  FROM merged
)
SELECT (es // 86400)::BIGINT AS day,
       SUM(s_cnt)::BIGINT AS n_sessions_started,
       MAX(conc)::BIGINT AS peak_concurrency
FROM swept WHERE s_cnt > 0
GROUP BY 1
"""

QUERIES["events_peak_concurrent_sessions"] = events_peak_concurrent_sessions
ORACLE["events_peak_concurrent_sessions"] = _SQL_PEAK_CONC


# --- Robust daily-anomaly profile (median/MAD) — round 10 (session 2) ---------
#
# The robust-statistics twin of events_trend_break: per event type, the
# exact nearest-rank median of the complete daily-count series, the exact
# median absolute deviation around it, and the count of days outside
# median +/- 3xMAD (with a floor of 1 so a zero-MAD constant series only
# flags true departures). Median/MAD is the anomaly detector that
# survives the heavy-tailed traffic the mean/stddev z-score dies on.
# Both medians come from the value-grouped nearest-rank device (rank the
# bounded distinct-count domain, never the day table itself).
#
# Scale shape: (type, day) rollup -> value-grouped count table (bounded by
# distinct counts) -> two windowed cumulative passes over that bounded
# domain; the day grid join is |days| x |types|.

def events_daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 86400").alias("d"),
    )
    counts = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lim = ev.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    grid = lim.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    types = counts.select("event_type").distinct()
    # |days| x |types| bounded — checkpointed: the two median passes and
    # the final fold each read it, and without the barrier every reference
    # re-derives the corpus rollup + grid join
    series = (
        grid.crossJoin(F.broadcast(types))
        .join(counts, ["event_type", "d"], "left")
        .select("event_type", "d", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )

    def _median(df, val):
        by_val = df.groupBy("event_type", val).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        wv = Window.partitionBy("event_type").orderBy(val).rowsBetween(
            Window.unboundedPreceding, 0
        )
        wall = Window.partitionBy("event_type")
        cum = by_val.select(
            "event_type", val,
            F.sum("cnt").over(wv).alias("cum"),
            F.sum("cnt").over(wall).alias("n"),
        )
        return cum.groupBy("event_type").agg(
            F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col(val)))
            .cast("long").alias(f"med_{val}")
        )

    med = _median(series, "c")
    absdev = series.join(F.broadcast(med), "event_type").select(
        "event_type", "d", "c", "med_c",
        F.abs(F.col("c") - F.col("med_c")).alias("ad"),
    ).localCheckpoint(eager=True)
    mad = _median(absdev, "ad")
    joined = absdev.join(F.broadcast(mad), "event_type").select(
        "event_type", "c", "med_c", "ad",
        F.col("med_ad").alias("mad"),
        F.greatest(F.col("med_ad") * 3, F.lit(1).cast("long")).alias("thresh"),
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("med_c").cast("long").alias("median_daily"),
        F.max("mad").cast("long").alias("mad"),
        F.max("c").cast("long").alias("max_daily"),
        F.sum(F.when(F.col("ad") > F.col("thresh"), 1).otherwise(0))
        .cast("long").alias("n_anomalies"),
    )


_SQL_MAD = """
WITH ev AS (
  SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d FROM events
),
counts AS (SELECT event_type, d, COUNT(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
lim AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ev),
grid AS (SELECT unnest(range(lo, hi + 1)) AS d FROM lim),
types AS (SELECT DISTINCT event_type FROM counts),
series AS (
  SELECT t.event_type, g.d, COALESCE(c.c, 0)::BIGINT AS c
  FROM grid g CROSS JOIN types t
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.d = g.d
),
byv1 AS (SELECT event_type, c, COUNT(*)::BIGINT AS cnt FROM series GROUP BY 1, 2),
cum1 AS (
  SELECT event_type, c,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM byv1
),
med AS (
  SELECT event_type, MIN(CASE WHEN cum * 2 >= n THEN c END) AS med_c
  FROM cum1 GROUP BY event_type
),
absdev AS (
  SELECT s.event_type, s.c, m.med_c, ABS(s.c - m.med_c) AS ad
  FROM series s JOIN med m USING (event_type)
),
byv2 AS (SELECT event_type, ad, COUNT(*)::BIGINT AS cnt FROM absdev GROUP BY 1, 2),
cum2 AS (
  SELECT event_type, ad,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY ad
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM byv2
),
madt AS (
  SELECT event_type, MIN(CASE WHEN cum * 2 >= n THEN ad END) AS mad
  FROM cum2 GROUP BY event_type
)
SELECT a.event_type,
       COUNT(*)::BIGINT AS n_days,
       CAST(MAX(a.med_c) AS BIGINT) AS median_daily,
       CAST(MAX(m.mad) AS BIGINT) AS mad,
       CAST(MAX(a.c) AS BIGINT) AS max_daily,
       CAST(SUM(CASE WHEN a.ad > GREATEST(m.mad * 3, 1) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies
FROM absdev a JOIN madt m USING (event_type)
GROUP BY a.event_type
"""

QUERIES["events_daily_anomaly_mad"] = events_daily_anomaly_mad
ORACLE["events_daily_anomaly_mad"] = _SQL_MAD


# --- Position-weighted (U-shaped) attribution — round 10 (session 2) -----------
#
# Completes the attribution family (first/last touch are single-winner):
# the U-shaped position model credits every purchase's in-window touch
# path 40/20/40 — 400k ppm to the first touch, 400k to the last, the
# middle 200k split evenly across interior touches. Exact integer
# credits: each conversion distributes EXACTLY 1,000,000 ppm (division
# remainders go to the last touch, deterministically — 1 touch takes all,
# 2 touches split 500k/500k), and pathless purchases credit
# 'unattributed'; so total credit = n_purchases x 1e6 by construction —
# the conservation law the test pins.
#
# Scale shape: purchases join their own user's prior events once (keyed
# join + in-window range predicate; pair volume is bounded by touches
# per attribution window, not history length), one per-purchase window
# for path rank/size, one channel rollup.

def events_attribution_position_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
        "event_type",
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("pus"), F.col("eid").alias("pid")
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "us", "eid", F.col("event_type").alias("channel")
    )
    win_us = ATTR_WINDOW_S * 1_000_000
    joined = purch.join(
        touch,
        (purch.user_id == touch.user_id)
        & ((F.col("us") < F.col("pus"))
           | ((F.col("us") == F.col("pus")) & (F.col("eid") < F.col("pid"))))
        & (F.col("pus") - F.col("us") <= F.lit(win_us).cast("long")),
        "left",
    ).select("pus", "pid", "us", "eid", "channel")
    w = Window.partitionBy("pus", "pid").orderBy("us", "eid")
    wall = Window.partitionBy("pus", "pid")
    ranked = joined.select(
        "pid", "channel",
        F.row_number().over(w).alias("r"),
        F.count("channel").over(wall).alias("n"),
    )
    mid_each = F.expr("200000 div (n - 2)")
    credit = (
        F.when(F.col("channel").isNull(), F.lit(1_000_000))
        .when(F.col("n") == 1, F.lit(1_000_000))
        .when(F.col("n") == 2, F.lit(500_000))
        .when(F.col("r") == 1, F.lit(400_000))
        .when(F.col("r") == F.col("n"),
              F.lit(600_000) - mid_each * (F.col("n") - 2))
        .otherwise(mid_each)
    ).cast("long")
    credited = ranked.select(
        F.coalesce("channel", F.lit("unattributed")).alias("channel"),
        credit.alias("credit_ppm"),
    )
    cells = credited.groupBy("channel").agg(
        F.sum("credit_ppm").cast("long").alias("credit_ppm"),
        F.count(F.lit(1)).cast("long").alias("n_touch_rows"),
    )
    total = cells.agg(F.sum("credit_ppm").cast("long").alias("t"))
    return cells.crossJoin(F.broadcast(total)).select(
        "channel", "n_touch_rows", "credit_ppm",
        F.expr("credit_ppm * 1000000 div t").cast("long").alias("share_ppm"),
    )


_SQL_ATTR_POS = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id AS eid, event_type FROM events
),
purch AS (
  SELECT user_id, us AS pus, eid AS pid FROM ev WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, us, eid, event_type AS channel FROM ev
  WHERE event_type <> 'purchase'
),
joined AS (
  SELECT p.pus, p.pid, t.us, t.eid, t.channel
  FROM purch p LEFT JOIN touch t
    ON p.user_id = t.user_id
   AND (t.us < p.pus OR (t.us = p.pus AND t.eid < p.pid))
   AND p.pus - t.us <= {ATTR_WINDOW_S * 1_000_000}
),
ranked AS (
  SELECT pid, channel,
         row_number() OVER (PARTITION BY pus, pid ORDER BY us, eid) AS r,
         COUNT(channel) OVER (PARTITION BY pus, pid) AS n
  FROM joined
),
credited AS (
  SELECT COALESCE(channel, 'unattributed') AS channel,
         CAST(CASE
           WHEN channel IS NULL THEN 1000000
           WHEN n = 1 THEN 1000000
           WHEN n = 2 THEN 500000
           WHEN r = 1 THEN 400000
           WHEN r = n THEN 600000 - (200000 // (n - 2)) * (n - 2)
           ELSE 200000 // (n - 2)
         END AS BIGINT) AS credit_ppm
  FROM ranked
),
cells AS (
  SELECT channel, SUM(credit_ppm)::BIGINT AS credit_ppm,
         COUNT(*)::BIGINT AS n_touch_rows
  FROM credited GROUP BY channel
)
SELECT channel, n_touch_rows, credit_ppm,
       (credit_ppm * 1000000 // (SELECT SUM(credit_ppm) FROM cells))::BIGINT
         AS share_ppm
FROM cells
"""

QUERIES["events_attribution_position_weighted"] = events_attribution_position_weighted
ORACLE["events_attribution_position_weighted"] = _SQL_ATTR_POS


# --- Retention half-life (Theil-Sen decay fit) — round 10 (session 2) ----------
#
# The scalar the weekly retention matrix is read FOR: per cohort, fit
# ln(retention) ~ week_offset with the Theil-Sen estimator (median of
# pairwise slopes — robust to the one promotional week OLS would chase)
# and report the implied half-life ln2 / (-slope). Every y lands in
# micro-nats via ONE floor on ln(n_active / n_cohort); pairwise slopes
# use the (num - num % den) // den trunc-division device so Spark's
# truncating `div` and DuckDB's flooring `//` agree on the NEGATIVE
# numerators a decaying series produces; the median slope comes from the
# value-grouped nearest-rank device over the bounded pair set. Cohorts
# need >= 3 decay points; a non-negative median slope (no decay) reports
# a NULL half-life rather than a fabricated number.
#
# Scale shape: the audited cohort-matrix rollup, then an offsets
# self-join per cohort — pairs are bounded by (weeks tracked)^2 per
# cohort, never user-sized.

RET_MIN_POINTS = 3


def events_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_retention_cohort_matrix(spark, sf_dir).filter(
        F.col("week_offset") >= 1
    ).select(
        "cohort_week",
        F.col("week_offset").alias("x"),
        F.floor(
            F.log(F.col("n_active").cast("double") / F.col("n_cohort").cast("double"))
            * F.lit(1000000.0)
        ).cast("long").alias("y"),
    ).localCheckpoint(eager=True)
    a, b = pts.alias("a"), pts.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cohort_week") == F.col("b.cohort_week"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.cohort_week").alias("cohort_week"),
        F.expr(
            "( (b.y - a.y) * 1000 - ((b.y - a.y) * 1000) % (b.x - a.x) )"
            " div (b.x - a.x)"
        ).cast("long").alias("s"),
    )
    byv = pairs.groupBy("cohort_week", "s").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wv = Window.partitionBy("cohort_week").orderBy("s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = byv.select(
        "cohort_week", "s",
        F.sum("cnt").over(wv).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("cohort_week")).alias("n"),
    )
    med = cum.groupBy("cohort_week").agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("s")))
        .cast("long").alias("slope_milli_micro"),
    )
    npts = pts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    return (
        med.join(npts, "cohort_week")
        .filter(F.col("n_points") >= RET_MIN_POINTS)
        .select(
            "cohort_week", "n_points", "n_pairs", "slope_milli_micro",
            # halflife_weeks = ln2 / |slope_nats| with slope stored as
            # nats x 1e9 (micro-nats x 1000): milli-weeks = ln2_micro x 1e6
            # over the stored slope
            F.when(
                F.col("slope_milli_micro") < 0,
                F.expr("(693147 * 1000000) div (-slope_milli_micro)"),
            ).cast("long").alias("halflife_milli_weeks"),
        )
    )


_SQL_RET_HALFLIFE = f"""
WITH matrix AS ({_SQL_COHORT_MATRIX}),
pts AS (
  SELECT cohort_week, week_offset AS x,
         CAST(FLOOR(ln(CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS y
  FROM matrix WHERE week_offset >= 1
),
pairs AS (
  SELECT a.cohort_week,
         ((b.y - a.y) * 1000 - ((b.y - a.y) * 1000) % (b.x - a.x))
           // (b.x - a.x) AS s
  FROM pts a JOIN pts b
    ON a.cohort_week = b.cohort_week AND a.x < b.x
),
byv AS (SELECT cohort_week, s, COUNT(*)::BIGINT AS cnt FROM pairs GROUP BY 1, 2),
cum AS (
  SELECT cohort_week, s,
         SUM(cnt) OVER (PARTITION BY cohort_week ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY cohort_week) AS n
  FROM byv
),
med AS (
  SELECT cohort_week, CAST(MAX(n) AS BIGINT) AS n_pairs,
         CAST(MIN(CASE WHEN cum * 2 >= n THEN s END) AS BIGINT)
           AS slope_milli_micro
  FROM cum GROUP BY cohort_week
),
npts AS (SELECT cohort_week, COUNT(*)::BIGINT AS n_points FROM pts GROUP BY 1)
SELECT m.cohort_week, n.n_points, m.n_pairs, m.slope_milli_micro,
       CAST(CASE WHEN m.slope_milli_micro < 0
                 THEN (693147 * 1000000) // (-m.slope_milli_micro) END AS BIGINT)
         AS halflife_milli_weeks
FROM med m JOIN npts n USING (cohort_week)
WHERE n.n_points >= {RET_MIN_POINTS}
"""

QUERIES["events_retention_halflife"] = events_retention_halflife
ORACLE["events_retention_halflife"] = _SQL_RET_HALFLIFE


# --- Sample-ratio-mismatch (SRM) check — round 11 ------------------------------
#
# The A/B guardrail that runs BEFORE events_ab_power_mde's power math is
# trusted: users hash into two arms (first md5 nibble parity — the house
# engine-portable hash), and per entry week (the week of a user's FIRST
# event) the arm counts are tested against the designed 50/50 split with
# a 1-df chi-square. A week whose chi2 exceeds 3.841 (alpha = 0.05) is a
# sample-ratio mismatch — assignment or logging is broken and every
# downstream lift number for that cohort is suspect (Fabijan et al. 2019).
# chi2 lands exactly: (n_a - n_b)^2 * 1e6 div (n_a + n_b), all integers.
#
# Scale shape: one scan -> per-user min(ts) (single shuffle on user_id)
# -> per-(week, arm) count -> bounded weeks x 2 fold. No windows over the
# event grain.

def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    arm = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
        )
        - F.lit(1)
    ) % 2
    weekly = (
        first.select(
            F.date_trunc("week", F.col("first_ts")).alias("week_start"),
            arm.alias("arm"),
        )
        .groupBy("week_start")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_arm_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_arm_b"),
        )
    )
    chi2 = F.expr(
        "(n_arm_a - n_arm_b) * (n_arm_a - n_arm_b) * 1000000 div (n_arm_a + n_arm_b)"
    ).cast("long")
    return weekly.select(
        "week_start", "n_arm_a", "n_arm_b",
        chi2.alias("chi2_micro"),
        (chi2 > 3841459).cast("int").alias("srm_flag"),
    )


_SQL_SRM = """
WITH first AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
),
weekly AS (
  SELECT date_trunc('week', first_ts)::TIMESTAMP AS week_start,
         ((instr('0123456789abcdef',
                 substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2) AS arm
  FROM first
),
counts AS (
  SELECT week_start,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_arm_a,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_arm_b
  FROM weekly GROUP BY week_start
)
SELECT week_start, n_arm_a, n_arm_b,
       ((n_arm_a - n_arm_b) * (n_arm_a - n_arm_b) * 1000000
        // (n_arm_a + n_arm_b))::BIGINT AS chi2_micro,
       CASE WHEN ((n_arm_a - n_arm_b) * (n_arm_a - n_arm_b) * 1000000
                  // (n_arm_a + n_arm_b)) > 3841459 THEN 1 ELSE 0 END
         ::INTEGER AS srm_flag
FROM counts
"""

QUERIES["events_srm_check"] = events_srm_check
ORACLE["events_srm_check"] = _SQL_SRM


# --- CUPED variance reduction — round 11 ----------------------------------------
#
# The industry-standard A/B variance-reduction device (Deng et al. 2013,
# "CUPED"): per user, the PRE-period spend (first half of the time range)
# is the covariate X for the POST-period spend Y; theta = cov(X,Y)/var(X)
# is fit on the pooled population and each arm reports its raw and
# CUPED-adjusted post-period mean, y_adj = ybar_arm - theta*(xbar_arm -
# xbar). var_reduction_ppm = rho^2 is the fraction of metric variance the
# adjustment removes — the factor by which the experiment's sample-size
# requirement shrinks. Arms reuse events_srm_check's md5-nibble hash.
#
# Numerics: per-user cent sums are exact BIGINTs; the covariance moments
# ride DECIMAL(38,0)/HUGEINT (n * Sxy etc. overflow int64 past ~1e5-user
# fixtures' comfort), theta/means divide as doubles cast from those exact
# 128-bit integers (correctly-rounded in both engines), and each output
# floors ONCE to micro.
#
# Scale shape: one scan -> per-user (pre, post) cent sums (single shuffle
# on user_id) -> one 5-moment corpus fold + one per-arm fold, crossed
# against the broadcast one-row theta frame. No windows, no joins at the
# event grain.

def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    )
    lim = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).select(
        # exact-microsecond midpoint (ADVICE r11): whole-second truncation
        # here vs fractional epoch in the oracle left a ~0.5 s window where
        # an event could flip pre/post — both engines now halve the span as
        # integer micros (floor; span is non-negative so div == //).
        F.expr("timestampadd(MICROSECOND, (unix_micros(hi) - unix_micros(lo)) div 2, lo)").alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < F.col("mid"), F.col("c")).otherwise(0))
            .cast("long").alias("x"),
            F.sum(F.when(F.col("ts") >= F.col("mid"), F.col("c")).otherwise(0))
            .cast("long").alias("y"),
        )
    )
    arm = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
        )
        - F.lit(1)
    ) % 2
    # fence: pu feeds BOTH the pooled moment fold and the per-arm fold —
    # unfenced, the events scan + per-user rollup run twice
    pu = per_user.select(arm.cast("long").alias("arm"), "x", "y").localCheckpoint(
        eager=True
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    moments = pu.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
    ).select(
        "n", "sx", "sy",
        F.expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)").alias("cov_n"),
        F.expr("CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)").alias("varx_n"),
        F.expr("CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)").alias("vary_n"),
    )
    arms = pu.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("sxa"),
        F.sum("y").cast("long").alias("sya"),
    )
    j = arms.crossJoin(F.broadcast(moments))
    theta = F.col("cov_n") / F.col("varx_n")
    adj = (
        F.col("sya").cast("double") / F.col("n_users")
        - theta
        * (
            F.col("sxa").cast("double") / F.col("n_users")
            - F.col("sx").cast("double") / F.col("n")
        )
    )
    return j.select(
        "arm", "n_users",
        F.expr("sya * 1000000 div n_users").cast("long").alias("mean_post_micro"),
        F.floor(adj * F.lit(1000000.0)).cast("long").alias("adj_mean_post_micro"),
        F.floor(theta * F.lit(1000000.0)).cast("long").alias("theta_micro"),
        F.floor(
            F.col("cov_n") * F.col("cov_n") / (F.col("varx_n") * F.col("vary_n"))
            * F.lit(1000000.0)
        ).cast("long").alias("var_reduction_ppm"),
    )


_SQL_CUPED = """
WITH ev AS (
  SELECT user_id, ts, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
lim AS (
  SELECT MIN(ts) + to_microseconds((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2) AS mid
  FROM ev
),
per_user AS (
  SELECT user_id,
         SUM(CASE WHEN ts < mid THEN c ELSE 0 END)::BIGINT AS x,
         SUM(CASE WHEN ts >= mid THEN c ELSE 0 END)::BIGINT AS y
  FROM ev CROSS JOIN lim GROUP BY user_id
),
pu AS (
  SELECT ((instr('0123456789abcdef',
                 substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2)::BIGINT AS arm,
         x, y
  FROM per_user
),
moments AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
         CAST(COUNT(*)::HUGEINT * SUM(CAST(x AS HUGEINT) * x)
              - CAST(SUM(x) AS HUGEINT) * SUM(x) AS DOUBLE) AS varx_n,
         CAST(COUNT(*)::HUGEINT * SUM(CAST(x AS HUGEINT) * y)
              - CAST(SUM(x) AS HUGEINT) * SUM(y) AS DOUBLE) AS cov_n,
         CAST(COUNT(*)::HUGEINT * SUM(CAST(y AS HUGEINT) * y)
              - CAST(SUM(y) AS HUGEINT) * SUM(y) AS DOUBLE) AS vary_n
  FROM pu
),
arms AS (
  SELECT arm, COUNT(*)::BIGINT AS n_users,
         SUM(x)::BIGINT AS sxa, SUM(y)::BIGINT AS sya
  FROM pu GROUP BY arm
)
SELECT arm, n_users,
       (sya * 1000000 // n_users)::BIGINT AS mean_post_micro,
       CAST(FLOOR((CAST(sya AS DOUBLE) / n_users
             - (cov_n / varx_n)
               * (CAST(sxa AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n))
            * 1000000.0) AS BIGINT) AS adj_mean_post_micro,
       CAST(FLOOR((cov_n / varx_n) * 1000000.0) AS BIGINT) AS theta_micro,
       CAST(FLOOR(cov_n * cov_n / (varx_n * vary_n) * 1000000.0) AS BIGINT)
         AS var_reduction_ppm
FROM arms CROSS JOIN moments
"""

QUERIES["events_cuped_adjustment"] = events_cuped_adjustment
ORACLE["events_cuped_adjustment"] = _SQL_CUPED


# --- Hill tail-index estimate — round 11 ----------------------------------------
#
# The heavy-tail detector the MAD/winsorize family assumes but never
# fits: per event type, the Hill (1975) estimator of the Pareto tail
# exponent over the top HILL_K order statistics of the cent value —
# alpha = k / sum_{i<=k} ln(x_(i) / x_(k+1)). alpha < 2 means infinite
# variance (means are unstable, bootstrap CIs lie); alpha > 4 is
# effectively light-tailed. Each ln ratio floors ONCE to micro-nats and
# the fold is exact integers, so alpha_milli = k * 1e9 div sum is
# engine-exact. Ties at the k-th value break on event_id (the house
# deterministic top-k device).
#
# Scale shape: per-type top-(k+1) via one ranking window — at true scale
# this is the TakeOrderedAndProject shape per type, never a global sort;
# everything after is a k-bounded fold.

HILL_K = 200


def events_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    ).filter(F.col("c") > 0)
    w = Window.partitionBy("event_type").orderBy(F.desc("c"), F.asc("event_id"))
    ranked = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= HILL_K + 1
    )
    sized = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_top"),
        F.max(F.when(F.col("rn") == F.lit(HILL_K + 1), F.col("c"))).alias("c_ref_k"),
        F.max("rn").cast("long").alias("rn_max"),
    ).select(
        "event_type",
        (F.least(F.lit(HILL_K).cast("long"), F.col("rn_max") - 1)).alias("k_used"),
    )
    joined = ranked.join(sized, "event_type")
    ref = joined.filter(F.col("rn") == F.col("k_used") + 1).select(
        "event_type", F.col("c").alias("x_ref_cents")
    )
    lns = (
        joined.join(ref, "event_type")
        .filter(F.col("rn") <= F.col("k_used"))
        .select(
            "event_type", "k_used", "x_ref_cents",
            F.floor(
                F.log(F.col("c").cast("double") / F.col("x_ref_cents").cast("double"))
                * F.lit(1000000.0)
            ).cast("long").alias("ln_micro"),
        )
    )
    return (
        lns.groupBy("event_type", "k_used", "x_ref_cents")
        .agg(F.sum("ln_micro").cast("long").alias("sum_ln_micro"))
        .select(
            "event_type", "k_used", "x_ref_cents", "sum_ln_micro",
            F.when(
                F.col("sum_ln_micro") > 0,
                F.expr("k_used * 1000000000 div sum_ln_micro"),
            ).cast("long").alias("hill_alpha_milli"),
        )
    )


_SQL_HILL = f"""
WITH ev AS (
  SELECT event_type, event_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE FLOOR(value * 100 + 0.5) > 0
),
ranked AS (
  SELECT * FROM (
    SELECT event_type, c,
           row_number() OVER (PARTITION BY event_type ORDER BY c DESC, event_id) AS rn
    FROM ev)
  WHERE rn <= {HILL_K + 1}
),
sized AS (
  SELECT event_type,
         LEAST({HILL_K}, MAX(rn) - 1)::BIGINT AS k_used
  FROM ranked GROUP BY event_type
),
ref AS (
  SELECT r.event_type, r.c AS x_ref_cents
  FROM ranked r JOIN sized s USING (event_type)
  WHERE r.rn = s.k_used + 1
),
lns AS (
  SELECT r.event_type, s.k_used, f.x_ref_cents,
         CAST(FLOOR(ln(CAST(r.c AS DOUBLE) / CAST(f.x_ref_cents AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS ln_micro
  FROM ranked r JOIN sized s USING (event_type) JOIN ref f USING (event_type)
  WHERE r.rn <= s.k_used
)
SELECT event_type, k_used, x_ref_cents,
       SUM(ln_micro)::BIGINT AS sum_ln_micro,
       CASE WHEN SUM(ln_micro) > 0
            THEN (k_used * 1000000000 // SUM(ln_micro))::BIGINT
       END AS hill_alpha_milli
FROM lns GROUP BY event_type, k_used, x_ref_cents
"""

QUERIES["events_hill_tail_index"] = events_hill_tail_index
ORACLE["events_hill_tail_index"] = _SQL_HILL


# --- Post-stratified uplift — round 11 -------------------------------------------
#
# The third leg of the experimentation stack (events_ab_power_mde sizes
# it, events_srm_check guards it, events_cuped_adjustment regresses
# variance out): STRATIFIED uplift. Users are bucketed into pre-period
# spend quintiles (global value-grouped nearest-rank edges — the PSI
# device, never a corpus sort), and the treatment lift is computed
# WITHIN each stratum, then post-stratified into one overall uplift
# weighted by stratum population. Stratification removes the bias a raw
# mean-difference inherits when arms differ in pre-period composition,
# and the per-stratum lifts expose heterogeneous effects (did the
# treatment only move heavy spenders?). Arms and the pre/post split are
# exactly events_cuped_adjustment's, so the two reports reconcile.
# Strata missing an arm report NULL lift and drop out of the pooled
# weighting on both engines.
#
# Scale shape: per-user rollup (one shuffle on user_id) -> 4-edge
# broadcast quantile table -> (stratum, arm) fold -> bounded 5 x 2
# report. Integer micro throughout; no windows past the edge derivation
# (which windows over the VALUE-grouped pre-spend domain, not users).

UPLIFT_STRATA = 5


def events_stratified_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    )
    lim = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).select(
        # exact-microsecond midpoint — same convention as events_cuped_adjustment
        F.expr(
            "timestampadd(MICROSECOND,"
            " (unix_micros(hi) - unix_micros(lo)) div 2, lo)"
        ).alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < F.col("mid"), F.col("c")).otherwise(0))
            .cast("long").alias("x"),
            F.sum(F.when(F.col("ts") >= F.col("mid"), F.col("c")).otherwise(0))
            .cast("long").alias("y"),
        )
    )
    arm = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
        )
        - F.lit(1)
    ) % 2
    # materialization fence: pu feeds the edge derivation AND the stratum
    # fold — unfenced, the events scan + per-user rollup re-derive per
    # branch (first cut: 45 shuffles / 17 BNLJs for a 5 x 2 report)
    pu = per_user.select(arm.cast("long").alias("arm"), "x", "y").localCheckpoint(
        eager=True
    )
    byx = pu.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = byx.select(
        "x", F.sum("cnt").over(wv).alias("cum"), F.sum("cnt").over(wall).alias("n")
    )
    edges = (
        cum.select(
            F.explode(
                F.array(*[F.lit(i) for i in range(1, UPLIFT_STRATA)])
            ).alias("i"),
            "x", "cum", "n",
        )
        .groupBy("i")
        .agg(
            F.min(
                F.when(
                    F.col("cum") * UPLIFT_STRATA >= F.col("n") * F.col("i"), F.col("x")
                )
            ).alias("edge")
        )
    )
    # stratum per distinct pre-spend VALUE (bounded domain), then joined
    # back — fanning users against the 4 edges would multiply the counts
    strat_map = (
        byx.select("x")
        .crossJoin(F.broadcast(edges))
        .groupBy("x")
        .agg(
            F.sum(F.when(F.col("x") > F.col("edge"), 1).otherwise(0))
            .cast("long").alias("stratum")
        )
    )
    per_cell = (
        pu.join(F.broadcast(strat_map), "x")
        .groupBy("stratum", "arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("y").cast("long").alias("sy"),
        )
    )
    a = per_cell.filter(F.col("arm") == 0).select(
        "stratum", F.col("n_users").alias("n_a"), F.col("sy").alias("sy_a")
    )
    b = per_cell.filter(F.col("arm") == 1).select(
        "stratum", F.col("n_users").alias("n_b"), F.col("sy").alias("sy_b")
    )
    per_str = a.join(b, "stratum", "full_outer").select(
        "stratum",
        F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        F.when(F.col("n_a") > 0, F.expr("sy_a * 1000000 div n_a")).cast("long")
        .alias("mean_a_micro"),
        F.when(F.col("n_b") > 0, F.expr("sy_b * 1000000 div n_b")).cast("long")
        .alias("mean_b_micro"),
    ).withColumn(
        "lift_micro", (F.col("mean_b_micro") - F.col("mean_a_micro")).cast("long")
    ).localCheckpoint(eager=True)  # 5 rows; read by the report AND the pool
    overall = per_str.agg(
        F.expr(
            "sum(CASE WHEN lift_micro IS NOT NULL THEN (n_a + n_b) * lift_micro"
            " ELSE CAST(0 AS BIGINT) END)"
            " div greatest(CAST(1 AS BIGINT),"
            " sum(CASE WHEN lift_micro IS NOT NULL THEN n_a + n_b ELSE CAST(0 AS BIGINT) END))"
        ).cast("long").alias("uplift_micro")
    )
    return per_str.crossJoin(F.broadcast(overall)).select(
        "stratum", "n_a", "n_b", "mean_a_micro", "mean_b_micro", "lift_micro",
        "uplift_micro",
    )


_SQL_STRAT_UPLIFT = f"""
WITH ev AS (
  SELECT user_id, ts, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
lim AS (
  SELECT MIN(ts) + to_microseconds((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2) AS mid
  FROM ev
),
per_user AS (
  SELECT user_id,
         SUM(CASE WHEN ts < mid THEN c ELSE 0 END)::BIGINT AS x,
         SUM(CASE WHEN ts >= mid THEN c ELSE 0 END)::BIGINT AS y
  FROM ev CROSS JOIN lim GROUP BY user_id
),
pu AS MATERIALIZED (
  SELECT ((instr('0123456789abcdef',
                 substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2)::BIGINT AS arm,
         x, y
  FROM per_user
),
byx AS (SELECT x, COUNT(*)::BIGINT AS cnt FROM pu GROUP BY x),
cum AS (
  SELECT x,
         SUM(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER () AS n
  FROM byx
),
edges AS (
  SELECT i, MIN(CASE WHEN cum * {UPLIFT_STRATA} >= n * i THEN x END) AS edge
  FROM cum, (SELECT unnest(range(1, {UPLIFT_STRATA})) AS i)
  GROUP BY i
),
strat AS (
  SELECT arm, y,
         (SELECT COUNT(*) FROM edges e WHERE pu.x > e.edge)::BIGINT AS stratum
  FROM pu
),
per_cell AS (
  SELECT stratum, arm, COUNT(*)::BIGINT AS n_users, SUM(y)::BIGINT AS sy
  FROM strat GROUP BY 1, 2
),
per_str AS (
  SELECT COALESCE(a.stratum, b.stratum) AS stratum,
         COALESCE(a.n_users, 0)::BIGINT AS n_a,
         COALESCE(b.n_users, 0)::BIGINT AS n_b,
         CASE WHEN COALESCE(a.n_users, 0) > 0
              THEN (a.sy * 1000000 // a.n_users) END::BIGINT AS mean_a_micro,
         CASE WHEN COALESCE(b.n_users, 0) > 0
              THEN (b.sy * 1000000 // b.n_users) END::BIGINT AS mean_b_micro
  FROM (SELECT * FROM per_cell WHERE arm = 0) a
  FULL OUTER JOIN (SELECT * FROM per_cell WHERE arm = 1) b USING (stratum)
),
lifts AS (
  SELECT *, (mean_b_micro - mean_a_micro)::BIGINT AS lift_micro FROM per_str
),
overall AS (
  SELECT (SUM(CASE WHEN lift_micro IS NOT NULL THEN (n_a + n_b) * lift_micro ELSE 0 END)
          // GREATEST(1, SUM(CASE WHEN lift_micro IS NOT NULL THEN n_a + n_b ELSE 0 END)))
           ::BIGINT AS uplift_micro
  FROM lifts
)
SELECT stratum, n_a, n_b, mean_a_micro, mean_b_micro, lift_micro, uplift_micro
FROM lifts CROSS JOIN overall
"""

QUERIES["events_stratified_uplift"] = events_stratified_uplift
ORACLE["events_stratified_uplift"] = _SQL_STRAT_UPLIFT


# --- Sequential A/B peeking report — round 12 -----------------------------------
#
# The experimentation-stack row the SRM/CUPED/MDE trio doesn't cover: what
# the metric OWNER sees when they peek at a running experiment K times.
# At K evenly-spaced timeline checkpoints (exact-microsecond arithmetic,
# the CUPED midpoint convention), the cumulative per-arm moments feed a
# two-sample Welch z, and each peek is tested against the
# Bonferroni-corrected boundary z_{1 - 0.05/(2K)} — the frozen literal
# 2.807 (milli), no runtime quantile function. The report shows exactly
# why naive repeated peeking at 1.96 inflates false positives: the
# boundary column is the correction.
#
# Integer discipline: per-event cents, exact integer (n, Σc, Σc²) in a
# 128-bit decimal lane per (peek, arm); the only IEEE region is the final
# mean/variance/sqrt chain from exact integers (division and sqrt are
# correctly rounded — bit-identical across engines), floored ONCE per
# output column.
#
# Scale shape: one scan -> K-bounded fan-out against the broadcast peek
# grid -> (K x 2)-keyed moment fold. Output is K rows.

AB_PEEKS_K = 10
AB_PEEK_BOUNDARY_MILLI = 2_807  # z_{1 - 0.05/(2*10)} = 2.8070, frozen


def events_ab_sequential_peeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    arm = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
        )
        - F.lit(1)
    ) % 2
    base = ev.select(arm.cast("long").alias("arm"), "ts_us", "c")
    lim = base.agg(
        F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")
    )
    peeks = (
        spark.range(1, AB_PEEKS_K + 1)
        .select(F.col("id").alias("k"))
        .crossJoin(F.broadcast(lim))
        .select("k", F.expr(f"lo + (hi - lo) * k div {AB_PEEKS_K}").alias("peek_us"))
    )
    tagged = base.crossJoin(F.broadcast(peeks)).filter(
        F.col("ts_us") <= F.col("peek_us")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    marm = tagged.groupBy("k", "peek_us", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(dec("c") * F.col("c")).cast("decimal(38,0)").alias("s2"),
    )
    per = marm.groupBy("k", "peek_us").agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).cast("long").alias("na"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).cast("long").alias("sa"),
        F.max(F.when(F.col("arm") == 0, F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).cast("long").alias("nb"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).cast("long").alias("sb"),
        F.max(F.when(F.col("arm") == 1, F.col("s2"))).alias("sb2"),
    )
    diff = "(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))"
    var_a = ("(CAST(CAST(na AS DECIMAL(38,0)) * sa2 - CAST(sa AS DECIMAL(38,0)) * sa AS DOUBLE)"
             " / CAST(na * (na - 1) AS DOUBLE))")
    var_b = ("(CAST(CAST(nb AS DECIMAL(38,0)) * sb2 - CAST(sb AS DECIMAL(38,0)) * sb AS DOUBLE)"
             " / CAST(nb * (nb - 1) AS DOUBLE))")
    se = f"sqrt({var_a} / CAST(na AS DOUBLE) + {var_b} / CAST(nb AS DOUBLE))"
    z = f"({diff} / {se})"
    valid = f"na >= 2 AND nb >= 2 AND {se} > 0"
    return per.select(
        F.col("k").cast("long").alias("peek"),
        "peek_us", "na", "nb",
        F.expr(f"CASE WHEN na > 0 AND nb > 0 THEN CAST(FLOOR({diff} * 1000000.0) AS BIGINT) END")
        .alias("diff_micro"),
        F.expr(f"CASE WHEN {valid} THEN CAST(FLOOR({z} * 1000.0) AS BIGINT) END")
        .alias("z_milli"),
        F.expr(
            f"CASE WHEN {valid} THEN"
            f" CASE WHEN ABS(CAST(FLOOR({z} * 1000.0) AS BIGINT)) >= {AB_PEEK_BOUNDARY_MILLI}"
            f" THEN 1 ELSE 0 END END"
        ).cast("long").alias("significant"),
    )


def _sql_ab_peeks() -> str:
    diff = "(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))"
    var_a = ("(CAST(CAST(na AS HUGEINT) * sa2 - CAST(sa AS HUGEINT) * sa AS DOUBLE)"
             " / CAST(na * (na - 1) AS DOUBLE))")
    var_b = ("(CAST(CAST(nb AS HUGEINT) * sb2 - CAST(sb AS HUGEINT) * sb AS DOUBLE)"
             " / CAST(nb * (nb - 1) AS DOUBLE))")
    se = f"sqrt({var_a} / CAST(na AS DOUBLE) + {var_b} / CAST(nb AS DOUBLE))"
    z = f"({diff} / {se})"
    valid = f"na >= 2 AND nb >= 2 AND {se} > 0"
    return f"""
WITH ev AS (
  SELECT ((instr('0123456789abcdef',
                 substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2)::BIGINT AS arm,
         epoch_us(ts) AS ts_us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
lim AS (SELECT MIN(ts_us) AS lo, MAX(ts_us) AS hi FROM ev),
peeks AS (
  SELECT CAST(k AS BIGINT) AS k, lo + (hi - lo) * k // {AB_PEEKS_K} AS peek_us
  FROM (SELECT unnest(range(1, {AB_PEEKS_K + 1})) AS k) CROSS JOIN lim
),
tagged AS (
  SELECT p.k, p.peek_us, e.arm, e.c FROM ev e CROSS JOIN peeks p
  WHERE e.ts_us <= p.peek_us
),
marm AS (
  SELECT k, peek_us, arm, COUNT(*)::BIGINT AS n, SUM(c)::BIGINT AS s,
         SUM(CAST(c AS HUGEINT) * c) AS s2
  FROM tagged GROUP BY 1, 2, 3
),
per AS (
  SELECT k, peek_us,
         MAX(CASE WHEN arm = 0 THEN n END)::BIGINT AS na,
         MAX(CASE WHEN arm = 0 THEN s END)::BIGINT AS sa,
         MAX(CASE WHEN arm = 0 THEN s2 END) AS sa2,
         MAX(CASE WHEN arm = 1 THEN n END)::BIGINT AS nb,
         MAX(CASE WHEN arm = 1 THEN s END)::BIGINT AS sb,
         MAX(CASE WHEN arm = 1 THEN s2 END) AS sb2
  FROM marm GROUP BY 1, 2
)
SELECT k AS peek, peek_us, na, nb,
       CASE WHEN na > 0 AND nb > 0
            THEN CAST(FLOOR({diff} * 1000000.0) AS BIGINT) END AS diff_micro,
       CASE WHEN {valid} THEN CAST(FLOOR({z} * 1000.0) AS BIGINT) END AS z_milli,
       (CASE WHEN {valid} THEN
          CASE WHEN ABS(CAST(FLOOR({z} * 1000.0) AS BIGINT)) >= {AB_PEEK_BOUNDARY_MILLI}
          THEN 1 ELSE 0 END END)::BIGINT AS significant
FROM per
"""


QUERIES["events_ab_sequential_peeks"] = events_ab_sequential_peeks
ORACLE["events_ab_sequential_peeks"] = _sql_ab_peeks()
