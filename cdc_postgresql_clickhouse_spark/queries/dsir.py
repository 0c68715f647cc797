"""DSIR-style data selection: hashed n-gram importance weights (Xie et
al. 2023, "Data Selection for Language Models via Importance Resampling").

The LLM-pipeline selection knob that complements the quality gate
(``queries/quality.py``) and temperature mixing (``corpus_temperature_
mixture``): score every raw document by how target-like its hashed n-gram
profile is, keep the ones whose log likelihood ratio favors the target.

Model: unigrams + bigrams of the shared tokenizer hash into B=1024 buckets
(salted-free md5, same nibble decode the sketches use). Two bucket
distributions are estimated with add-1 smoothing — the TARGET (here the
``lang = 'en'`` slice, standing in for a curated high-quality corpus) and
the RAW pool (all documents). Each bucket's log ratio

    lambda[b] = ln( ((cnt_t[b]+1) * (R+B)) / ((cnt_r[b]+1) * (T+B)) )

is FLOOR-truncated to integer micro-units ONCE per bucket, so every
per-document score is an exact integer sum over its gram occurrences —
order-independent across partitions, bit-identical in both engines (the
products inside ln() are exact integers; one division + one ln on
identical doubles). A document is kept when its total log ratio is
positive, i.e. the target model likes it more than the raw model does.

Scale shape: the lambda table is AT MOST B=1024 rows regardless of corpus
size — it broadcasts. The corpus pays one gram explode (the same barrier
tfidf/BM25 pay), one 1024-row aggregation per distribution, and a map-side
broadcast join + per-doc integer sum. The two scalar totals ride along as
counts. At 100 TB nothing data-proportional crosses the wire except the
per-doc aggregation itself.

Reference tie-in: extension layer (SURVEY.md north star); the reference's
own scope has no selection operator — this is the training-data-pipeline
surface the assignment adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.queries.sketches import _sql_hex_int
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"
_HASH_DIGITS = 8


def _grams(toks):
    """Unigrams + adjacent bigrams (tok_i + '_' + tok_{i+1}).

    Formulated as zip_with over two slices rather than transform over an
    index sequence: ``element_at(toks, i)`` inside an index lambda
    re-evaluates the whole tokenization expression per index (lambda bodies
    sit outside codegen subexpression elimination), turning the gram build
    O(n_tokens^2) in regexp work — measured 10 s vs 1 s at sf0.1. The
    zipped form references ``toks`` a constant number of times."""
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda x, y: F.concat(x, F.lit("_"), y),
    )
    return F.concat(toks, bigrams)


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        "lang",
        F.explode(_grams(tokens(F.col("text")))).alias("g"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("g")), 1, _HASH_DIGITS), 16, 10).cast("long")
            % DSIR_BUCKETS
        ).alias("b"),
    ).persist()
    raw = hashed.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    tgt = (
        hashed.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    totals = hashed.agg(
        F.count(F.lit(1)).alias("r_tot"),
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)).alias("t_tot"),
    ).first()
    r_tot, t_tot = int(totals.r_tot), int(totals.t_tot)
    lam = raw.join(tgt, "b", "left").select(
        "b",
        F.floor(
            F.log(
                ((F.coalesce(F.col("ct"), F.lit(0)) + 1) * F.lit(r_tot + DSIR_BUCKETS))
                .cast("double")
                / ((F.col("cr") + 1) * F.lit(t_tot + DSIR_BUCKETS)).cast("double")
            )
            * F.lit(1000000.0)
        ).cast("long").alias("lm"),
    )
    per = (
        hashed.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("lm").cast("long").alias("dsir_logratio_micro"),
        )
    )
    return per.select(
        "doc_id",
        "n_grams",
        "dsir_logratio_micro",
        (F.col("dsir_logratio_micro") > 0).alias("keep"),
    )


_SQL_TOKS = (
    "list_filter(str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), "
    "t -> t <> '')"
)

_SQL_DSIR = f"""
WITH base AS (
  SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents
),
grams AS (
  SELECT doc_id, lang,
         unnest(toks || list_transform(generate_series(1, len(toks) - 1),
                                       i -> toks[i] || '_' || toks[i + 1])) AS g
  FROM base
),
hashed AS (
  SELECT doc_id, lang, {_sql_hex_int('g', _HASH_DIGITS)} % {DSIR_BUCKETS} AS b FROM grams
),
raw AS (SELECT b, COUNT(*) AS cr FROM hashed GROUP BY b),
tgt AS (SELECT b, COUNT(*) AS ct FROM hashed WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
tot AS (
  SELECT COUNT(*) AS r_tot,
         SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS t_tot
  FROM hashed
),
lam AS (
  SELECT raw.b,
         CAST(FLOOR(ln(
           CAST((COALESCE(tgt.ct, 0) + 1) * (tot.r_tot + {DSIR_BUCKETS}) AS DOUBLE)
           / CAST((raw.cr + 1) * (tot.t_tot + {DSIR_BUCKETS}) AS DOUBLE)
         ) * 1000000.0) AS BIGINT) AS lm
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot
),
per AS (
  SELECT doc_id, COUNT(*) AS n_grams, SUM(lm) AS s
  FROM hashed JOIN lam ON hashed.b = lam.b
  GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(s AS BIGINT) AS dsir_logratio_micro,
       s > 0 AS keep
FROM per
"""

QUERIES = {"corpus_dsir_weights": corpus_dsir_weights}
ORACLE = {"corpus_dsir_weights": _SQL_DSIR}
