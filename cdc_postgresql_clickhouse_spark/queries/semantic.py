"""Semantic (embedding-space) duplicate clustering: the composition a real
training-data pipeline runs — banded-LSH cosine near-dup PAIRS
(``embedding_cosine_neardup``) collapsed into connected components with a
canonical survivor per cluster, exactly as ``dedup_cluster_canonical`` does
for lexical MinHash pairs. "A≈B, B≈C" keeps ONE representative even when A
and C never shared an LSH bucket.

Scale shape: the edge set comes from the scale-safe banded-LSH + verify
pipeline (never O(n²)); the clustering reuses
``queries.cluster.connected_components`` — per iteration one keyed join +
map-side min-agg, lineage cut by localCheckpoint; O(log n) two-star variant
available for pathological diameters.

Oracle: the SAME near-dup edge SQL (``similarity.SQL_NEARDUP_CTES``)
embedded in a recursive-CTE reachability closure — engine-exact because
both the edges and the closure are shared definitions.

Reference tie-in: no analogue (the reference dedups on an exact business
key, ``schemas/clickhouse_schemas.sql:11``); extends the LLM-pipeline layer
(survey §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_postgresql_clickhouse_spark.queries.cluster import connected_components
from cdc_postgresql_clickhouse_spark.queries.similarity import (
    SQL_NEARDUP_CTES,
    SQL_NEARDUP_SELECT,
    embedding_cosine_neardup,
)


def embedding_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = embedding_cosine_neardup(spark, sf_dir).select("vec_a", "vec_b")
    comp = connected_components(edges, id_a="vec_a", id_b="vec_b")
    w = Window.partitionBy("canonical_id")
    return (
        comp.select(F.col("doc_id").alias("vec_id"), F.col("label").alias("canonical_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("is_canonical", F.col("vec_id") == F.col("canonical_id"))
    )


QUERIES = {"embedding_semantic_cluster": embedding_semantic_cluster}

ORACLE = {
    "embedding_semantic_cluster": f"""
WITH RECURSIVE {SQL_NEARDUP_CTES},
edges AS ({SQL_NEARDUP_SELECT}),
bidir AS (
  SELECT vec_a AS a, vec_b AS b FROM edges
  UNION
  SELECT vec_b AS a, vec_a AS b FROM edges
),
nodes AS (SELECT DISTINCT a AS vec_id FROM bidir),
reach(vec_id, r) AS (
  SELECT vec_id, vec_id FROM nodes
  UNION
  SELECT re.vec_id, bd.b FROM reach re JOIN bidir bd ON bd.a = re.r
),
comp AS (SELECT vec_id, MIN(r) AS canonical_id FROM reach GROUP BY vec_id)
SELECT vec_id, canonical_id,
       COUNT(*) OVER (PARTITION BY canonical_id) AS cluster_size,
       vec_id = canonical_id AS is_canonical
FROM comp
""",
}
