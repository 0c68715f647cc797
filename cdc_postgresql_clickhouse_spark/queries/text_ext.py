"""Character-n-gram language identification — the classic trigram-profile
heuristic (Cavnar & Trenkle 1994, "N-Gram-Based Text Categorization"): score
each language by how many of its characteristic character trigrams occur in
the document's (overlapping) trigram stream, take the argmax. Complements
the word-marker ``text_langid``: character n-grams survive inflection and
partial tokens, which is why production language-ID stacks are built on
them.

Map-side only: the trigram array is built per row (transform over sequence —
the same guarded pattern as the winnowing k-grams), profile counting is an
array filter against baked literals; no explode, no shuffle. At 100 TB this
is a scan-bound map job.

The trigram profiles are small hand-baked sets of high-frequency character
trigrams per language (public knowledge); both engines count against the
same literals, so parity is by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import normalized_text
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

# High-frequency character trigrams per language (space-padded forms appear
# because the normalized text keeps single spaces between words).
TRIGRAM_PROFILES = {
    "en": ("the", "ing", "and", "ion", "ent"),
    "de": ("der", "ein", "ich", "sch", "und"),
    "fr": ("les", "ent", "des", "que", "ait"),
    "es": ("que", "los", "ado", "con", "cio"),
}

# overlapping char trigrams of the normalized text, same sequence guard as
# winnowing (Spark's sequence() descends for n < 1)
_TRIGRAMS = (
    "CASE WHEN length(ns) >= 3 THEN"
    " transform(sequence(1, length(ns) - 2), i -> substring(ns, i, 3))"
    " ELSE array() END"
)


def text_langid_chargram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.select("doc_id", "lang", normalized_text(F.col("text")).alias("ns"))
        .select("doc_id", "lang", F.expr(_TRIGRAMS).alias("tg"))
    )
    scores = base.select(
        "doc_id",
        "lang",
        F.size("tg").cast("long").alias("n_trigrams"),
        *[
            F.size(
                F.filter("tg", lambda t: t.isin(*TRIGRAM_PROFILES[lg]))
            ).cast("long").alias(f"s_{lg}")
            for lg in TRIGRAM_PROFILES
        ],
    )
    g = F.greatest(*[F.col(f"s_{lg}") for lg in TRIGRAM_PROFILES])
    guessed = (
        F.when(F.col("s_en") == g, F.lit("en"))
        .when(F.col("s_de") == g, F.lit("de"))
        .when(F.col("s_fr") == g, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return scores.select(
        "doc_id", "lang", "n_trigrams", "s_en", "s_de", "s_fr", "s_es",
        guessed.alias("guessed_lang"),
    )


def _profile_sql(lg: str) -> str:
    lits = "', '".join(TRIGRAM_PROFILES[lg])
    return f"len(list_filter(tg, t -> t IN ('{lits}')))::BIGINT"


# The redaction target class: in production this is the PII lexicon/regex
# union (emails, phone numbers, account ids); the synthetic corpus contains
# no digits, so the registered pattern targets identifier-shaped tokens
# (8+ alphanumeric chars, ~3% of tokens) to genuinely exercise the
# count/replace/rehash path — the operator shape is pattern-agnostic.
PII_PATTERN = "[a-z0-9]{8,}"
REDACTION = "<pii>"


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction transform paired with ``text_regex_policy_scan``: count the
    PII-shaped matches, replace them, and fingerprint the redacted text.
    Map-side regexp work in whole-stage codegen — a pure scan job at scale;
    the md5 lets downstream exact-dedup run on REDACTED content so documents
    differing only in their PII collapse."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower("text")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(PII_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_redactions"),
        F.md5(F.regexp_replace(low, PII_PATTERN, REDACTION)).alias("redacted_md5"),
    )


QUERIES = {
    "text_langid_chargram": text_langid_chargram,
    "text_pii_redact": text_pii_redact,
}

ORACLE = {
    "text_langid_chargram": f"""
WITH base AS (
  SELECT doc_id, lang, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS ns
  FROM documents
),
tg AS (
  SELECT doc_id, lang,
         list_transform(generate_series(1, length(ns) - 2), i -> substring(ns, i, 3)) AS tg
  FROM base
),
scored AS (
  SELECT doc_id, lang, len(tg)::BIGINT AS n_trigrams,
         {_profile_sql('en')} AS s_en,
         {_profile_sql('de')} AS s_de,
         {_profile_sql('fr')} AS s_fr,
         {_profile_sql('es')} AS s_es
  FROM tg
)
SELECT doc_id, lang, n_trigrams, s_en, s_de, s_fr, s_es,
       CASE WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS guessed_lang
FROM scored
""",
    "text_pii_redact": f"""
SELECT doc_id,
  len(regexp_extract_all(lower(text), '{PII_PATTERN}'))::BIGINT AS n_redactions,
  md5(regexp_replace(lower(text), '{PII_PATTERN}', '{REDACTION}', 'g')) AS redacted_md5
FROM documents
""",
}
