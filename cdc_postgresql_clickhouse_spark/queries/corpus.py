"""Corpus-level training-data analytics: cross-modal retrieval joins and
training-mix reports over the documents + embeddings tables.

These are the queries a data-curation pipeline runs between dedup and
training: "what's in the corpus, per source/language", "how much of each
source is duplicated", and "retrieve nearest documents WITH their metadata"
(ANN join back to the catalog — the retrieval-augmentation shape).

Scale posture: metadata joins broadcast the document catalog projection
(id + two small strings); the ANN stage is the existing bruteforce/IVF
machinery; aggregates are map-side partial with one shuffle on the group
key. Everything is builtin-only (codegen) with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.queries.dedup import _SQL_TOKENS
from cdc_postgresql_clickhouse_spark.queries.similarity import (
    ORACLE as _SIM_ORACLE,
    ann_bruteforce_topk,
)
from cdc_postgresql_clickhouse_spark.queries.text import _trunc6
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def crossmodal_doc_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval join: top-3 cosine neighbors per query vector, enriched with
    both sides' document metadata (language, source) — ANN output joined back
    to the catalog, the lookup a RAG/curation pipeline does after retrieval.

    Join direction matters at 100 TB: the ANN RESULT (queries × k rows) is
    the small side and is what broadcasts; the document catalog — billions
    of rows at scale — is only ever the probe side of a broadcast hash join
    (one map-side pass, no catalog shuffle). The ANN stage is
    ``ann_bruteforce_topk`` (the exactness baseline — swap in the IVF
    variant at scale, same join shape)."""
    ann = ann_bruteforce_topk(spark, sf_dir).filter(F.col("rank") <= 3)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    dq = docs.select(F.col("doc_id").alias("q_id"), F.col("lang").alias("q_lang"))
    dn = docs.select(
        F.col("doc_id").alias("neighbor_id"),
        F.col("lang").alias("n_lang"),
        F.col("source").alias("n_source"),
    )
    with_q = dq.join(F.broadcast(ann), "q_id")  # rows = |ann result|
    return dn.join(F.broadcast(with_q), "neighbor_id").select(
        "q_id", "neighbor_id", "cos_sim", "rank", "q_lang", "n_lang", "n_source"
    )


def corpus_mix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix report: per (source, lang) document count, whitespace
    token volume, character volume, truncated mean doc length, longest doc.
    One scan, one shuffle on the 2-column group key."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        F.length("text").cast("long").alias("n_char"),
    )
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_char").alias("total_chars"),
        _trunc6(F.sum("n_char").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.max("n_tok").alias("max_tokens"),
    )


def corpus_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source: distinct content hashes vs raw docs —
    the per-source health metric an ingestion pipeline alerts on. Content
    hash is md5 of the raw text (identical hex in both engines); the
    distinct count shuffles once on (source, hash) then folds."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
    )
    return per.select(
        "source",
        "n_docs",
        "n_unique",
        _trunc6(
            F.lit(1.0) - F.col("n_unique").cast("double") / F.col("n_docs").cast("double")
        ).alias("dup_rate"),
    )


QUERIES = {
    "crossmodal_doc_neighbors": crossmodal_doc_neighbors,
    "corpus_mix_stats": corpus_mix_stats,
    "corpus_dup_rate_by_source": corpus_dup_rate_by_source,
}

ORACLE = {
    "crossmodal_doc_neighbors": f"""
WITH ann AS ({_SIM_ORACLE["ann_bruteforce_topk"]})
SELECT a.q_id, a.neighbor_id, a.cos_sim, a.rank,
       dq.lang AS q_lang, dn.lang AS n_lang, dn.source AS n_source
FROM ann a
JOIN documents dq ON dq.doc_id = a.q_id
JOIN documents dn ON dn.doc_id = a.neighbor_id
WHERE a.rank <= 3
""",
    "corpus_mix_stats": f"""
WITH d AS (
  SELECT source, lang,
         CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tok,
         CAST(length(text) AS BIGINT) AS n_char
  FROM documents
)
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_char) AS BIGINT) AS total_chars,
       CAST(FLOOR(CAST(SUM(n_char) AS DOUBLE) / COUNT(*) * 1000000.0) AS DOUBLE) / 1000000.0 AS avg_chars,
       MAX(n_tok) AS max_tokens
FROM d GROUP BY 1, 2
""",
    "corpus_dup_rate_by_source": """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique
  FROM documents GROUP BY 1
)
SELECT source, n_docs, n_unique,
       CAST(FLOOR((1.0 - CAST(n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE)) * 1000000.0) AS DOUBLE) / 1000000.0 AS dup_rate
FROM per
""",
}


# --- token-mass concentration (Pareto curve over document length) -----------
#
# "What fraction of the corpus' character mass lives in the longest X% of
# documents" — the length-skew diagnostic that decides packing strategy and
# long-doc truncation policy for a training pipeline. SCALE-SAFE RANKING: a
# naive top-down decile needs a global row_number (single-partition sort at
# 100 TB). Instead documents collapse to the DISTINCT-LENGTH table (bounded
# by the length domain, corpus-size-independent), a window over that small
# table assigns each length its global rank interval [lo, hi], and the
# interval is intersected with each decile's rank range by pure integer
# arithmetic — docs of equal length are interchangeable, so the split is
# exact without ever ranking individual rows. Every column is BIGINT.


def corpus_length_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    lens = docs.groupBy("n_chars").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    w = Window.orderBy(F.desc("n_chars")).rowsBetween(Window.unboundedPreceding, 0)
    ranked = lens.withColumn("hi", F.sum("cnt").over(w)).withColumn(
        "lo", F.col("hi") - F.col("cnt") + 1
    )
    exploded = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "n_chars", "lo", "hi", "n", "total_chars",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("decile"),
        )
        .select(
            "n_chars", "total_chars", "decile",
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.col("hi"), F.expr("(decile + 1) * n div 10"))
                - F.greatest(F.col("lo"), F.expr("decile * n div 10 + 1"))
                + 1,
            ).alias("k"),
        )
    )
    per = exploded.groupBy("decile").agg(
        F.sum("k").cast("long").alias("n_docs"),
        F.sum(F.col("k") * F.col("n_chars")).cast("long").alias("chars"),
        F.max("total_chars").alias("_tc"),
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        "n_docs",
        "chars",
        F.sum("chars").over(wd).cast("long").alias("cum_chars"),
        F.expr("sum(chars) over (order by decile rows between unbounded preceding and current row) * 1000000 div max(_tc) over ()")
        .cast("long")
        .alias("cum_share_ppm"),
    )


QUERIES["corpus_length_pareto"] = corpus_length_pareto

ORACLE["corpus_length_pareto"] = """
WITH lens AS (
  SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars
),
tot AS (SELECT COUNT(*) AS n, SUM(n_chars) AS total_chars FROM documents),
ranked AS (
  SELECT n_chars, cnt,
         SUM(cnt) OVER (ORDER BY n_chars DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM lens
),
exploded AS (
  SELECT r.n_chars, t.total_chars, d.decile,
         GREATEST(0, LEAST(r.hi, (d.decile + 1) * t.n // 10)
                     - GREATEST(r.hi - r.cnt + 1, d.decile * t.n // 10 + 1) + 1) AS k
  FROM ranked r
  CROSS JOIN tot t
  CROSS JOIN (SELECT unnest(range(0, 10)) AS decile) d
),
per AS (
  SELECT decile, SUM(k) AS n_docs, SUM(k * n_chars) AS chars,
         MAX(total_chars) AS tc
  FROM exploded GROUP BY decile
)
SELECT decile, CAST(n_docs AS BIGINT) AS n_docs, CAST(chars AS BIGINT) AS chars,
       CAST(SUM(chars) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars,
       CAST(SUM(chars) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000
            // MAX(tc) OVER () AS BIGINT) AS cum_share_ppm
FROM per
"""
