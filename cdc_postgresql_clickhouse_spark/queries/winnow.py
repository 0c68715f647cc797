"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
algorithm): select, per sliding window of w consecutive k-gram hashes, the
minimum hash — guaranteeing any shared substring of length >= k + w - 1
between two documents shares at least one selected fingerprint. The
chunk-level dedup primitive between full-document fingerprints
(``text_fingerprint``) and pairwise MinHash (``dedup_minhash_lsh``).

Entirely map-side: k-gram hashes, window minima, and the fingerprint-set
digest are nested higher-order expressions per row — no explode, no shuffle.
At 100 TB this is a scan-bound map job like the other text scores; the
selected-set digest then feeds an exact groupBy to find chunk-sharing docs.

Cross-engine determinism: the k-gram hash is the same integer polynomial
(h·131 + byte mod 1e9+7) both engines already agree on in
``text_fingerprint``; window minima and the sorted-distinct digest are
integer/string ops. Tie-handling: classic winnowing picks the RIGHTMOST
minimal hash per window; since equal hashes are the same fingerprint VALUE
and the output is the distinct value set, the tie rule cannot change the
result — only positions, which are not emitted.

Reference tie-in: the reference has no fingerprinting (its dedup is keyed
row-collapse, ``schemas/clickhouse_schemas.sql:11``); this extends the
LLM-pipeline layer (survey §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import normalized_text
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

K_GRAM = 8   # noise threshold: matches shorter than k chars are ignored
WINDOW = 4   # guarantee threshold: matches >= k + w - 1 = 11 chars are caught

_GRAM_HASH = (
    "aggregate(filter(split(substring(ns, i, {k}), ''), c -> c <> ''), 0L,"
    " (acc, c) -> pmod(acc * 131 + ascii(c), 1000000007L))"
).format(k=K_GRAM)

# grams: one polynomial hash per k-gram start position (guarded: Spark's
# sequence(1, n) DESCENDS for n < 1, unlike DuckDB's empty generate_series)
_GRAMS = (
    "CASE WHEN length(ns) >= {k} THEN"
    " transform(sequence(1, length(ns) - {k} + 1), i -> {gh})"
    " ELSE array() END"
).format(k=K_GRAM, gh=_GRAM_HASH)

# winnowing selection: min per w-window; short docs (0 < n_grams < w) keep
# their global min so every non-trivial doc has >= 1 fingerprint
_MINS = (
    "CASE WHEN size(grams) >= {w} THEN"
    " transform(sequence(1, size(grams) - {w} + 1), j -> array_min(slice(grams, j, {w})))"
    " WHEN size(grams) >= 1 THEN array(array_min(grams))"
    " ELSE array() END"
).format(w=WINDOW)


def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", normalized_text(F.col("text")).alias("ns"))
    grams = base.select("doc_id", F.expr(_GRAMS).alias("grams"))
    sel = grams.select(
        "doc_id",
        F.size("grams").cast("long").alias("n_grams"),
        F.array_sort(F.array_distinct(F.expr(_MINS))).alias("fps"),
    )
    return sel.select(
        "doc_id",
        "n_grams",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.md5(F.array_join(F.transform("fps", lambda x: x.cast("string")), ",")).alias(
            "fingerprint_set_md5"
        ),
    )


_SQL_GRAM_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(list_filter(str_split(substring(ns, i, {k}), ''), c -> c <> ''),"
    " c -> CAST(ord(c) AS BIGINT))),"
    " (acc, c) -> (acc * 131 + c) % 1000000007)"
).format(k=K_GRAM)

QUERIES = {"text_winnowing_fingerprints": text_winnowing_fingerprints}

ORACLE = {
    "text_winnowing_fingerprints": f"""
WITH base AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS ns
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(generate_series(1, length(ns) - {K_GRAM} + 1),
                        i -> {_SQL_GRAM_HASH}) AS grams
  FROM base
),
sel AS (
  SELECT doc_id, len(grams)::BIGINT AS n_grams,
         list_sort(list_distinct(
           CASE WHEN len(grams) >= {WINDOW} THEN
             list_transform(generate_series(1, len(grams) - {WINDOW} + 1),
                            j -> list_min(grams[j:j + {WINDOW} - 1]))
           WHEN len(grams) >= 1 THEN [list_min(grams)]
           ELSE [] END)) AS fps
  FROM g
)
SELECT doc_id, n_grams, len(fps)::BIGINT AS n_fingerprints,
       md5(array_to_string(list_transform(fps, x -> CAST(x AS VARCHAR)), ','))
         AS fingerprint_set_md5
FROM sel
""",
}
