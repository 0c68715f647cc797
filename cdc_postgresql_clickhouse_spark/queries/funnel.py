"""Behavioral analytics over the events stream: the ClickHouse-signature
functions a user of the reference's sink would reach for — ``windowFunnel``,
``retention``, ``sequenceMatch``, and grouped top-K (``topK``-style) — each
re-expressed as declarative DataFrame plans with DuckDB oracles.

Reference context: the reference lands CDC events in ClickHouse
(clickhouse_schemas.sql, README.md) precisely so this family of queries can
run on them; the engine must therefore offer the same surface.

Semantics (pinned, both engines):
- ``funnel_windowed`` = windowFunnel(window)(view, click, purchase):
  per user, the deepest stage reached where each stage's FIRST qualifying
  event is at-or-after the previous stage's and within ``window`` seconds of
  the first view (non-strict chaining, epoch-second resolution).
- ``retention_weekly`` = retention(): cohort by first epoch-aligned week,
  count users active again N weeks later.
- ``sequence_match_clean_purchase`` = sequenceMatch('(?1)(?!error*)(?2)'):
  first view followed by a purchase with NO tombstone/'error' event strictly
  between them.
- ``grouped_topk_event_values`` = topK(3) per group, exact, with a total
  tie-break order (count DESC, value ASC) so results are deterministic.

Scale posture: every query is window/groupBy on ``user_id`` (or the group
key) — one hash shuffle, no joins, no Python. The three chained window
passes in the funnel share one partitioning (Catalyst plans a single
Exchange; the unordered ``Window.partitionBy`` needs no sort). The
retention ``collect_set`` is bounded by weeks-per-user (observation span /
7 days), not data volume, so state per key is O(weeks) even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_postgresql_clickhouse_spark.sources.registry import load_table

FUNNEL_WINDOW_S = 86400  # windowFunnel window: 24 h from the first view
WEEK_S = 604800


def _es(col: str = "ts") -> Column:
    return F.floor(F.unix_timestamp(col)).cast("long")


def funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel analogue: per user, funnel level 0-3 for the chain
    view -> click -> purchase, each stage's first qualifying event within
    24 h of the first view and at-or-after the previous stage.

    Plan: three Window passes over the same user_id partitioning (one
    Exchange; each pass is a partition-wide conditional MIN, no sort), then
    one row per user via groupBy. Shape survives 100 TB: shuffle volume is
    the events table once, state per key is three longs."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", _es().alias("es")
    )
    w = Window.partitionBy("user_id")
    t = F.col("event_type")
    s1 = ev.withColumn("v0", F.min(F.when(t == "view", F.col("es"))).over(w))
    s2 = s1.withColumn(
        "c1",
        F.min(
            F.when(
                (t == "click")
                & (F.col("es") >= F.col("v0"))
                & (F.col("es") <= F.col("v0") + FUNNEL_WINDOW_S),
                F.col("es"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "p2",
        F.min(
            F.when(
                (t == "purchase")
                & (F.col("es") >= F.col("c1"))
                & (F.col("es") <= F.col("v0") + FUNNEL_WINDOW_S),
                F.col("es"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("v0").alias("v0"), F.max("c1").alias("c1"), F.max("p2").alias("p2")
    )
    return per_user.select(
        "user_id",
        F.when(F.col("p2").isNotNull(), F.lit(3))
        .when(F.col("c1").isNotNull(), F.lit(2))
        .when(F.col("v0").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("funnel_level"),
    )


def retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retention analogue: cohort users by their first active epoch-week,
    report how many are active again ``week_offset`` weeks later.

    One shuffle on user_id (collect_set dedups map-side; set size is bounded
    by the observation span in weeks), then a small re-agg on the
    (cohort_week, week_offset) pair."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(_es() / WEEK_S).cast("long").alias("wk")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("wk").alias("cohort_week"), F.collect_set("wk").alias("wks")
    )
    return (
        per_user.select("cohort_week", F.explode("wks").alias("wk"))
        .select("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def sequence_match_clean_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch('(?1)(?!error)(?2)') analogue: per user, did the first
    view lead to a purchase with no 'error' event strictly between them?
    Matched as 0/1 plus the two anchor timestamps (NULL when absent).

    Same single-Exchange three-pass window shape as the funnel."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", _es().alias("es")
    )
    w = Window.partitionBy("user_id")
    t = F.col("event_type")
    s1 = ev.withColumn("v0", F.min(F.when(t == "view", F.col("es"))).over(w))
    s2 = s1.withColumn(
        "p1",
        F.min(F.when((t == "purchase") & (F.col("es") >= F.col("v0")), F.col("es"))).over(w),
    )
    s3 = s2.withColumn(
        "err_between",
        F.min(
            F.when(
                (t == "error") & (F.col("es") > F.col("v0")) & (F.col("es") < F.col("p1")),
                F.col("es"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("v0").alias("first_view_es"),
        F.max("p1").alias("purchase_es"),
        F.max("err_between").alias("err_es"),
    )
    return per_user.select(
        "user_id",
        "first_view_es",
        "purchase_es",
        F.when(
            F.col("purchase_es").isNotNull() & F.col("err_es").isNull(), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("matched"),
    )


def grouped_topk_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped top-K (ClickHouse topK(3) per group): for each
    event_type, the 3 most frequent ``props.k`` values, total-ordered
    (count DESC, k ASC) so ranks are deterministic.

    Plan: partial-agg count on (event_type, k) — one shuffle — then a
    rank window over the *aggregated* rows only (distinct k per group, not
    raw events), so the sort input stays tiny no matter the event volume."""
    ev = load_table(spark, sf_dir, "events")
    return topk_from_counts(grouped_value_counts(ev))


def grouped_value_counts(ev: DataFrame) -> DataFrame:
    """(event_type, k, n) value counts — the partial the sketch is built
    from. Linear in the input multiset, so per-batch partials SUM-merge
    (used by the streaming top-k ingest)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type", "k").agg(
        F.count(F.lit(1)).alias("n")
    )


def topk_from_counts(counts: DataFrame) -> DataFrame:
    """Rank window over the (merged) count table — shared by the batch
    query and the incrementally-maintained state."""
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("k").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "k", "n", "rank")
    )


QUERIES = {
    "funnel_windowed": funnel_windowed,
    "retention_weekly": retention_weekly,
    "sequence_match_clean_purchase": sequence_match_clean_purchase,
    "grouped_topk_event_values": grouped_topk_event_values,
}

_BASE = "SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events"

ORACLE = {
    "funnel_windowed": f"""
WITH base AS ({_BASE}),
s1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN es END)
              OVER (PARTITION BY user_id) AS v0 FROM base),
s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND es >= v0
                           AND es <= v0 + {FUNNEL_WINDOW_S} THEN es END)
              OVER (PARTITION BY user_id) AS c1 FROM s1),
s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND es >= c1
                           AND es <= v0 + {FUNNEL_WINDOW_S} THEN es END)
              OVER (PARTITION BY user_id) AS p2 FROM s2)
SELECT user_id,
       CASE WHEN MAX(p2) IS NOT NULL THEN 3
            WHEN MAX(c1) IS NOT NULL THEN 2
            WHEN MAX(v0) IS NOT NULL THEN 1
            ELSE 0 END AS funnel_level
FROM s3 GROUP BY user_id
""",
    "retention_weekly": f"""
WITH wk AS (SELECT DISTINCT user_id,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) // {WEEK_S} AS wk
            FROM events),
per AS (SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort
        FROM wk)
SELECT CAST(cohort AS BIGINT) AS cohort_week,
       CAST(wk - cohort AS BIGINT) AS week_offset,
       COUNT(*) AS n_users
FROM per GROUP BY 1, 2
""",
    "sequence_match_clean_purchase": f"""
WITH base AS ({_BASE}),
s1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN es END)
              OVER (PARTITION BY user_id) AS v0 FROM base),
s2 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND es >= v0 THEN es END)
              OVER (PARTITION BY user_id) AS p1 FROM s1),
s3 AS (SELECT *, MIN(CASE WHEN event_type = 'error' AND es > v0 AND es < p1
                     THEN es END)
              OVER (PARTITION BY user_id) AS err_between FROM s2)
SELECT user_id,
       MAX(v0) AS first_view_es,
       MAX(p1) AS purchase_es,
       CASE WHEN MAX(p1) IS NOT NULL AND MAX(err_between) IS NULL
            THEN 1 ELSE 0 END AS matched
FROM s3 GROUP BY user_id
""",
    "grouped_topk_event_values": """
WITH counts AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY n DESC, k ASC) AS rank
  FROM counts
)
SELECT event_type, k, n, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 3
""",
}
