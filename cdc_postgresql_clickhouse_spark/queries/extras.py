"""Operational analytics extras: dataset version diffing and behavioral
transition counts — registered late (after the driver's 50-row correctness
window; verified by the local oracle sweep like the rest of the extension
tail).

``corpus_version_diff``: the dataset-diff primitive a data-versioning layer
needs — given two corpus snapshots, classify every doc_id as added, removed,
or modified (content hash changed). Expressed as a full outer join on the
key with md5 content comparison: one shuffle, no row data on the driver; at
100 TB both sides are bucketed by doc_id and the join co-locates. The "v2"
snapshot here is derived deterministically from the fixture (every doc_id
% 7 == 0 gets its first token dropped = modified; % 11 == 3 is dropped =
removed; ids shifted by 2_000_000 for % 13 == 5 = added) so both engines
build identical versions.

``events_transition_matrix``: first-order event-type transition counts per
(from_type, to_type) — the Markov/Sankey building block. One window (lag by
user ordered by time) + one groupBy: two shuffles on user_id then on the
pair, both map-side combined.

Reference tie-in: none (extension layer, survey §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_postgresql_clickhouse_spark.queries.dedup import (
    _SQL_MINHASH_CTES,
    _SQL_MINHASH_SELECT,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

V2_OFFSET = 2_000_000


def _v2(docs: DataFrame) -> DataFrame:
    """Deterministic second snapshot: modify %7==0, remove %11==3, add new
    ids for %13==5."""
    kept = docs.filter(F.col("doc_id") % 11 != 3)
    edited = kept.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.regexp_replace("text", "^[^ ]+ ", "")
        ).otherwise(F.col("text")),
    )
    added = docs.filter(F.col("doc_id") % 13 == 5).select(
        (F.col("doc_id") + V2_OFFSET).alias("doc_id"), "text"
    )
    return edited.select("doc_id", "text").unionByName(added)


def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = docs.select("doc_id", F.md5("text").alias("h1"))
    v2 = _v2(docs).select("doc_id", F.md5("text").alias("h2"))
    j = v1.join(v2, "doc_id", "full_outer")
    return (
        j.select(
            "doc_id",
            F.when(F.col("h1").isNull(), F.lit("added"))
            .when(F.col("h2").isNull(), F.lit("removed"))
            .when(F.col("h1") != F.col("h2"), F.lit("modified"))
            .otherwise(F.lit("unchanged"))
            .alias("change"),
        )
        .filter(F.col("change") != "unchanged")
    )


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )


def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size distribution of the near-dup components — the dedup-ops
    dashboard metric (a sudden mass in large clusters means the LSH
    thresholds drifted or a template flooded the corpus). Reads the SAME
    materialized component table as ``dedup_cluster_canonical``
    (``cluster.clusters`` — one connected-components run per corpus
    snapshot, this query adds only two vocab-sized aggregations)."""
    from cdc_postgresql_clickhouse_spark.queries.cluster import clusters

    comp = clusters(spark, sf_dir)
    per_cluster = comp.groupBy(F.col("label").alias("canonical_id")).agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return per_cluster.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


QUERIES = {
    "corpus_version_diff": corpus_version_diff,
    "events_transition_matrix": events_transition_matrix,
    "dedup_cluster_size_hist": dedup_cluster_size_hist,
}

ORACLE = {
    "dedup_cluster_size_hist": f"""
WITH RECURSIVE {_SQL_MINHASH_CTES},
edges AS ({_SQL_MINHASH_SELECT}),
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM edges
  UNION
  SELECT doc_b AS a, doc_a AS b FROM edges
),
nodes AS (SELECT DISTINCT a AS doc_id FROM bidir),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT re.doc_id, bd.b FROM reach re JOIN bidir bd ON bd.a = re.r
),
comp AS (SELECT doc_id, MIN(r) AS canonical_id FROM reach GROUP BY doc_id),
sizes AS (SELECT canonical_id, COUNT(*)::BIGINT AS cluster_size FROM comp GROUP BY canonical_id)
SELECT cluster_size, COUNT(*)::BIGINT AS n_clusters
FROM sizes GROUP BY cluster_size
""",
    "corpus_version_diff": f"""
WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
v2src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN regexp_replace(text, '^[^ ]+ ', '') ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 3
  UNION ALL
  SELECT doc_id + {V2_OFFSET} AS doc_id, text FROM documents WHERE doc_id % 13 = 5
),
v2 AS (SELECT doc_id, md5(text) AS h2 FROM v2src),
j AS (
  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id, h1, h2
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT doc_id,
       CASE WHEN h1 IS NULL THEN 'added'
            WHEN h2 IS NULL THEN 'removed'
            WHEN h1 <> h2 THEN 'modified'
            ELSE 'unchanged' END AS change
FROM j
WHERE (CASE WHEN h1 IS NULL THEN 'added'
            WHEN h2 IS NULL THEN 'removed'
            WHEN h1 <> h2 THEN 'modified'
            ELSE 'unchanged' END) <> 'unchanged'
""",
    "events_transition_matrix": """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
)
SELECT from_type, to_type, COUNT(*)::BIGINT AS n_transitions
FROM seq WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
""",
}


def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: instead of dropping non-canonical near-duplicates, give
    every document a training weight of 1/cluster_size (integer micro-units)
    so each near-dup CLUSTER contributes one document's worth of gradient —
    the down-weighting alternative to hard removal used when duplicates
    carry distributional signal. Unclustered docs weigh 1.0. Reads the SAME
    materialized component table as the other cluster queries (one CC run
    per corpus snapshot); this adds a cluster-count-sized size agg and one
    keyed join back to the corpus spine (NOT broadcast-hinted: the sized
    table has a row per clustered doc — corpus-proportional in the worst
    case — so the scale-safe plan is a hash join, with AQE free to
    broadcast when the cluster set is actually small)."""
    from cdc_postgresql_clickhouse_spark.queries.cluster import clusters
    from cdc_postgresql_clickhouse_spark.queries.dedup import _corpus

    comp = clusters(spark, sf_dir)
    sizes = comp.groupBy(F.col("label").alias("canonical_id")).agg(
        F.count(F.lit(1)).cast("long").alias("csize")
    )
    sized = comp.select("doc_id", F.col("label").alias("canonical_id")).join(
        sizes, "canonical_id"
    )
    corpus = _corpus(spark, sf_dir).select("doc_id")
    return (
        corpus.join(sized, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("csize"), F.lit(1)).cast("long").alias("cluster_size"),
            F.expr("CAST(1000000 div coalesce(csize, 1) AS BIGINT)").alias("weight_micro"),
        )
    )


QUERIES["dedup_soft_weights"] = dedup_soft_weights
ORACLE["dedup_soft_weights"] = f"""
WITH RECURSIVE {_SQL_MINHASH_CTES},
edges AS ({_SQL_MINHASH_SELECT}),
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM edges
  UNION
  SELECT doc_b AS a, doc_a AS b FROM edges
),
nodes AS (SELECT DISTINCT a AS doc_id FROM bidir),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT re.doc_id, bd.b FROM reach re JOIN bidir bd ON bd.a = re.r
),
comp AS (SELECT doc_id, MIN(r) AS canonical_id FROM reach GROUP BY doc_id),
sizes AS (SELECT canonical_id, COUNT(*)::BIGINT AS csize FROM comp GROUP BY canonical_id),
sized AS (SELECT comp.doc_id, sizes.csize FROM comp JOIN sizes USING (canonical_id))
SELECT c.doc_id,
       CAST(COALESCE(s.csize, 1) AS BIGINT) AS cluster_size,
       CAST(1000000 // COALESCE(s.csize, 1) AS BIGINT) AS weight_micro
FROM corpus c LEFT JOIN sized s ON s.doc_id = c.doc_id
"""
