"""Text-analysis operators for a training-data pipeline, with DuckDB oracles:
language-ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting.

All pure Catalyst expressions over the ``documents`` table — tokenization,
regex extraction and md5 run in whole-stage codegen; one narrow scan, no
shuffle except final small aggregations. At 100 TB these are
embarrassingly-parallel map jobs bounded by scan throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import STOPWORDS, normalized_text, tokens
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

# DuckDB twin of functions.text.tokens (keep in sync).
SQL_TOKENS = (
    "list_filter(str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), "
    "t -> t <> '')"
)
SQL_STOPWORDS = "('" + "', '".join(STOPWORDS) + "')"

LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
}


def _trunc6(col) -> F.Column:
    """FLOOR-based 6-decimal truncation — bit-identical across engines on
    identical doubles, unlike ROUND (see queries/tpch.py)."""
    return F.floor(col * F.lit(1000000.0)).cast("double") / F.lit(1000000.0)


def _n_in(toks, words) -> F.Column:
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lst, t))).cast("long")


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (letter runs, digit
    runs, single punctuation) — the standard pre-tokenizer shape."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
    bpe = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0))
    return base.select(
        "doc_id",
        F.size("toks").cast("long").alias("ws_tokens"),
        F.size(bpe).cast("long").alias("bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/uniqueness/alpha-ratio quality heuristic; the combined
    score is a deterministic affine mix of rounded ratios."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the token array once (no CSE across expressions — each
    # direct `tokens(text)` reference would re-run the regex split)
    base = docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    d = base.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        _n_in(toks, STOPWORDS).alias("n_stop"),
        F.length(F.regexp_replace(F.lower("text"), "[^a-z]", "")).cast("long").alias("n_alpha"),
        F.length("text").cast("long").alias("n_char"),
    )
    uniq_ratio = _trunc6(F.col("n_uniq").cast("double") / F.nullif(F.col("n_tok"), F.lit(0)))
    stop_ratio = _trunc6(F.col("n_stop").cast("double") / F.nullif(F.col("n_tok"), F.lit(0)))
    alpha_ratio = _trunc6(F.col("n_alpha").cast("double") / F.nullif(F.col("n_char"), F.lit(0)))
    return d.select(
        "doc_id",
        "n_tok",
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stop_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        _trunc6(0.5 * uniq_ratio + 0.2 * (1 - stop_ratio) + 0.3 * alpha_ratio).alias("quality"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID with a deterministic arg-max (priority order
    en > de > fr > es on ties)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    d = base.select(
        "doc_id",
        "lang",
        *[_n_in(toks, LANG_MARKERS[lg]).alias(f"s_{lg}") for lg in LANG_MARKERS],
    )
    g = F.greatest(*[F.col(f"s_{lg}") for lg in LANG_MARKERS])
    guessed = (
        F.when(F.col("s_en") == g, F.lit("en"))
        .when(F.col("s_de") == g, F.lit("de"))
        .when(F.col("s_fr") == g, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return d.select("doc_id", "lang", "s_en", "s_de", "s_fr", "s_es", guessed.alias("guessed_lang"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 of the normalized text (exact near-dup after
    whitespace/punct normalization), md5 of the sorted distinct token set
    (bag-of-words identity), and a Rabin-Karp-style polynomial rolling hash
    (h = h·131 + byte mod 1e9+7) over the normalized text — the incremental
    fingerprint shape used for chunk-level dedup. Pure int64 arithmetic
    (max intermediate ≈ 1.3e11), identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        tokens(F.col("text")).alias("toks"),
        normalized_text(F.col("text")).alias("ns"),
    )
    rolling = F.expr(
        "aggregate(filter(split(ns, ''), c -> c <> ''), 0L,"
        " (acc, c) -> pmod(acc * 131 + ascii(c), 1000000007L))"
    )
    return base.select(
        "doc_id",
        F.md5(F.col("ns")).alias("norm_fp"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(F.col("toks"))), " ")).alias("tokenset_fp"),
        rolling.alias("rolling_fp"),
    )


def text_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.floor(F.sum("n_chars").cast("double") / F.count(F.lit(1)) * 1e6).cast("double")
         / F.lit(1000000.0)).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing (survey north-star: multimodal columns):
    text encoded to bytes stands in for an image/audio payload; metadata
    extraction (size, content hash, deterministic fake format sniff) is the
    real Spark-side schema/partitioning pattern, the codec itself is stubbed
    (see operators/multimodal.py for the mapInPandas decode plumbing)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.octet_length(F.col("text")).cast("long")
    return docs.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.md5(blob).alias("content_md5"),
        F.when(n_bytes % 3 == 0, F.lit("png"))
        .when(n_bytes % 3 == 1, F.lit("jpeg"))
        .otherwise(F.lit("wav"))
        .alias("sniffed_format"),
    )


def _markers_sql(lg: str) -> str:
    return "len(list_filter(toks, t -> t IN ('" + "', '".join(LANG_MARKERS[lg]) + "')))::BIGINT"


QUERIES = {
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_stats_by_source": text_stats_by_source,
    "multimodal_binary_meta": multimodal_binary_meta,
}

ORACLE = {
    "text_token_count": f"""
SELECT doc_id,
  len({SQL_TOKENS})::BIGINT AS ws_tokens,
  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS bpe_tokens,
  length(text)::BIGINT AS n_chars_actual
FROM documents
""",
    "text_quality_score": f"""
WITH base AS (
  SELECT doc_id, {SQL_TOKENS} AS toks,
         length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::BIGINT AS n_alpha,
         length(text)::BIGINT AS n_char
  FROM documents
), counts AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_tok,
         len(list_distinct(toks))::BIGINT AS n_uniq,
         len(list_filter(toks, t -> t IN {SQL_STOPWORDS}))::BIGINT AS n_stop,
         n_alpha, n_char
  FROM base
), ratios AS (
  SELECT doc_id, n_tok,
         CAST(FLOOR((CAST(n_uniq AS DOUBLE) / NULLIF(n_tok, 0)) * 1000000.0) AS DOUBLE) / 1000000.0 AS uniq_ratio,
         CAST(FLOOR((CAST(n_stop AS DOUBLE) / NULLIF(n_tok, 0)) * 1000000.0) AS DOUBLE) / 1000000.0 AS stop_ratio,
         CAST(FLOOR((CAST(n_alpha AS DOUBLE) / NULLIF(n_char, 0)) * 1000000.0) AS DOUBLE) / 1000000.0 AS alpha_ratio
  FROM counts
)
SELECT doc_id, n_tok, uniq_ratio, stop_ratio, alpha_ratio,
       CAST(FLOOR((0.5 * uniq_ratio + 0.2 * (1 - stop_ratio) + 0.3 * alpha_ratio) * 1000000.0) AS DOUBLE) / 1000000.0 AS quality
FROM ratios
""",
    "text_langid": f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_markers_sql('en')} AS s_en,
         {_markers_sql('de')} AS s_de,
         {_markers_sql('fr')} AS s_fr,
         {_markers_sql('es')} AS s_es
  FROM (SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents)
)
SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
       CASE WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS guessed_lang
FROM scored
""",
    "text_fingerprint": f"""
WITH base AS (
  SELECT doc_id, {SQL_TOKENS} AS toks,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS ns
  FROM documents
)
SELECT doc_id,
  md5(ns) AS norm_fp,
  md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS tokenset_fp,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(list_filter(str_split(ns, ''), c -> c <> ''),
                     c -> CAST(ord(c) AS BIGINT))),
    (acc, c) -> (acc * 131 + c) % 1000000007) AS rolling_fp
FROM base
""",
    "text_stats_by_source": """
SELECT source, COUNT(*) AS n_docs,
       CAST(FLOOR((CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)) * 1000000.0) AS DOUBLE) / 1000000.0 AS avg_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
""",
    "multimodal_binary_meta": """
SELECT doc_id,
  octet_length(encode(text))::BIGINT AS n_bytes,
  md5(text) AS content_md5,
  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'png'
       WHEN octet_length(encode(text)) % 3 = 1 THEN 'jpeg'
       ELSE 'wav' END AS sniffed_format
FROM documents
""",
}
