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


# --- DSIR selection mix-shift audit — round 10 ---------------------------------
#
# The audit you run BEFORE committing to an importance-resampled corpus:
# select the top quarter of documents by DSIR log-ratio and report how the
# (source, lang) composition SHIFTS relative to the pool — selection that
# silently empties a source or a language is the classic failure mode of
# target-matched sampling (Xie et al. 2023 discuss exactly this collapse
# risk). Shares are exact integer ppm; shift = selected share - pool share
# (signed). Pool = scored documents (>= 1 gram, the weights contract).
#
# Scale shape: the per-doc weights are the audited one-explode DSIR
# pipeline; the global top-k cut uses the two-phase exact rank over
# (-logratio, doc_id) (no single-task sort); both mixes are
# (|sources| x |langs|)-bounded rollups of the same persisted join.

DSIR_SEL_QUARTER = 4  # select the top 1/4 by log-ratio


def corpus_dsir_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from cdc_postgresql_clickhouse_spark.operators.ranking import global_row_number

    w = corpus_dsir_weights(spark, sf_dir).select("doc_id", "dsir_logratio_micro")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    j = docs.join(w, "doc_id").persist(StorageLevel.MEMORY_AND_DISK)
    n = j.count()
    k = (n + DSIR_SEL_QUARTER - 1) // DSIR_SEL_QUARTER
    g = global_row_number(
        j, [(-F.col("dsir_logratio_micro")), F.col("doc_id")], out="__rn"
    )
    sel = g.filter(F.col("__rn") <= k)
    pool_mix = j.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_pool")
    )
    sel_mix = sel.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected")
    )
    return (
        pool_mix.join(sel_mix, ["source", "lang"], "left")
        .select(
            "source", "lang", "n_pool",
            F.coalesce("n_selected", F.lit(0).cast("long")).alias("n_selected"),
        )
        .select(
            "source", "lang", "n_pool", "n_selected",
            F.expr(f"n_pool * 1000000 div {n}").cast("long").alias("pool_share_ppm"),
            F.expr(f"n_selected * 1000000 div {k}").cast("long").alias("sel_share_ppm"),
            (
                F.expr(f"n_selected * 1000000 div {k}")
                - F.expr(f"n_pool * 1000000 div {n}")
            ).cast("long").alias("shift_ppm"),
        )
    )


_SQL_DSIR_MIX = f"""
WITH w AS MATERIALIZED ({_SQL_DSIR}),
j AS (
  SELECT d.source, d.lang, w.doc_id, w.dsir_logratio_micro
  FROM documents d JOIN w USING (doc_id)
),
nv AS (SELECT COUNT(*) AS n,
              (COUNT(*) + {DSIR_SEL_QUARTER - 1}) // {DSIR_SEL_QUARTER} AS k
       FROM j),
ranked AS (
  SELECT source, lang,
         row_number() OVER (ORDER BY dsir_logratio_micro DESC, doc_id) AS rn
  FROM j
),
sel_mix AS (
  SELECT source, lang, COUNT(*)::BIGINT AS n_selected
  FROM ranked CROSS JOIN nv WHERE rn <= nv.k
  GROUP BY 1, 2
),
pool_mix AS (
  SELECT source, lang, COUNT(*)::BIGINT AS n_pool FROM j GROUP BY 1, 2
)
SELECT p.source, p.lang, p.n_pool,
       COALESCE(s.n_selected, 0)::BIGINT AS n_selected,
       (p.n_pool * 1000000 // nv.n)::BIGINT AS pool_share_ppm,
       (COALESCE(s.n_selected, 0) * 1000000 // nv.k)::BIGINT AS sel_share_ppm,
       ((COALESCE(s.n_selected, 0) * 1000000 // nv.k)
        - (p.n_pool * 1000000 // nv.n))::BIGINT AS shift_ppm
FROM pool_mix p
LEFT JOIN sel_mix s ON s.source = p.source AND s.lang = p.lang
CROSS JOIN nv
"""

QUERIES["corpus_dsir_mix_shift"] = corpus_dsir_mix_shift
ORACLE["corpus_dsir_mix_shift"] = _SQL_DSIR_MIX
