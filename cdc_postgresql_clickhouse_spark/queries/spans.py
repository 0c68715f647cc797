"""Span-level deduplication: exact-substring duplicate detection (sliding
token windows, Lee et al. 2022 "Deduplicating Training Data Makes Language
Models Better" — the ExactSubstr pattern) and CCNet-style cross-document
line dedup (Wenzek et al. 2020) — the two span-granular cleaners a training
corpus pipeline runs *between* document-level dedup and chunking.

Both are pure relational algebra with DuckDB oracle twins:

- ``dedup_exact_substring``: every W-token sliding window (stride 1) is
  hashed map-side; a window hash seen in ≥2 distinct documents marks a
  duplicated span; output is per-document span-duplication stats including
  the fraction of tokens covered by any duplicated window (the quantity the
  real pipeline thresholds on to drop or trim documents). The suffix-array
  formulation of the paper is a single-machine construction; the
  sliding-window-hash join is its scale-out equivalent — the window stream
  is O(total tokens) rows and every later stage is keyed (hash groupBy,
  equi-join), never pairwise.
- ``dedup_lines``: documents are split into lines (a deterministic
  boilerplate header line keyed by doc_id % len(templates), then fixed
  8-token body lines — the fixture corpus has no newlines, so line
  structure is synthesized identically in both engines, same trick as
  ``text_pii_redact``); any line whose hash appears in ≥ LINE_DF_MIN
  distinct documents is removed (boilerplate removal); output is per-doc
  kept/removed counts plus the md5 of the cleaned text. This is CCNet's
  paragraph-hash dedup: one explode to line grain, one hash groupBy for
  document frequency, one keyed join back — no pairwise work anywhere.

Cross-engine determinism: md5 is the only hash; window/line boundaries are
integer arithmetic; coverage fractions are floor-truncated at 6 decimals
(``_cos``-style) so double noise can't flip a digit; removed-line sets are
compared via membership only (order never observed).

Scale shape at 100 TB: window/line explode is a scan→flatMap whose output is
proportional to corpus tokens; the frequency table is keyed by hash (one
shuffle); the join back to documents is keyed by hash then doc_id. Skewed
window hashes (a boilerplate span duplicated across millions of docs) stay
safe: the frequency side is pre-aggregated to one row per hash before the
join, so no bucket materializes pairwise.

Reference tie-in: no analogue in the reference (row-grain CDC,
``schemas/clickhouse_schemas.sql``); extends the LLM-pipeline layer
(survey §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.queries.dedup import _SQL_CORPUS, _SQL_TOKENS, _corpus
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

WINDOW_TOKENS = 16  # W in the ExactSubstr pattern (paper uses 50 BPE tokens)
LINE_TOKENS = 8  # synthesized body-line length for line dedup
LINE_DF_MIN = 5  # remove a line present in >= this many distinct docs

# Boilerplate header templates (synthetic web-boilerplate the line dedup is
# expected to strip; keyed by doc_id so both engines inject identically).
BOILERPLATE = (
    "subscribe to our newsletter for updates",
    "all rights reserved contact us here",
    "click here to read the full story",
    "share this page with your friends",
    "sign in to continue reading content",
    "cookie policy accept terms to proceed",
    "download our app for the best experience",
)


def dedup_exact_substring(
    spark: SparkSession, sf_dir: str, window_tokens: int = WINDOW_TOKENS
) -> DataFrame:
    """Per-document duplicated-span stats from sliding W-token window hashes.

    Plan: one map-side window explode (transform over sequence + md5 of the
    token slice — no per-window re-tokenize), one hash groupBy for the
    cross-doc frequency, one keyed join back, one doc-grain agg. Coverage =
    |union of [s, s+W) over duplicated starts| via an exists() scan per
    token — map-side, O(n_tokens x dup_starts) per doc, bounded because
    dup_starts <= n_windows.
    """
    w = window_tokens
    base = (
        _corpus(spark, sf_dir)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", "toks", F.size("toks").cast("long").alias("n_toks"))
    )
    win_expr = (
        f"CASE WHEN size(toks) >= {w} THEN"
        f" transform(sequence(1, size(toks) - {w} + 1),"
        f"           s -> struct(CAST(s AS BIGINT) AS s,"
        f"                       md5(array_join(slice(toks, s, {w}), ' ')) AS wmd5))"
        f" ELSE CAST(array() AS array<struct<s: bigint, wmd5: string>>) END"
    )
    wins = base.select("doc_id", F.explode(F.expr(win_expr)).alias("win")).select(
        "doc_id", F.col("win.s").alias("s"), F.col("win.wmd5").alias("wmd5")
    )
    wins = wins.persist()  # feeds the frequency agg AND the join back
    dup_hashes = (
        wins.groupBy("wmd5")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("wmd5")
    )
    dup_starts = (
        wins.join(dup_hashes, "wmd5")
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("dups"))
    )
    joined = base.join(dup_starts, "doc_id", "left")
    covered = F.when(
        F.col("dups").isNull(), F.lit(0).cast("long")
    ).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.col("n_toks").cast("int")),
                lambda i: F.exists(
                    F.col("dups"), lambda st: (st <= i) & (i < st + F.lit(w))
                ),
            )
        ).cast("long")
    )
    return joined.select(
        "doc_id",
        F.greatest(F.col("n_toks") - w + 1, F.lit(0)).cast("long").alias("n_windows"),
        F.coalesce(F.size("dups").cast("long"), F.lit(0).cast("long")).alias("n_dup_windows"),
        covered.alias("covered_tokens"),
        F.when(F.col("n_toks") > 0, F.floor(covered / F.col("n_toks") * F.lit(1000000.0)).cast("double") / F.lit(1000000.0))
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
    )


def _lines_expr() -> str:
    """Line array per document: boilerplate header + 8-token body slices.
    Shared string so the Spark side and tests stay literally in sync."""
    tmpl = "array(" + ", ".join(f"'{t}'" for t in BOILERPLATE) + ")"
    return (
        f"concat(array(element_at({tmpl}, CAST(pmod(doc_id, {len(BOILERPLATE)}) + 1 AS INT))),"
        f" CASE WHEN size(toks) >= 1 THEN"
        f"   transform(sequence(1, CAST(ceil(size(toks) / {LINE_TOKENS}.0) AS INT)),"
        f"             j -> array_join(slice(toks, (j - 1) * {LINE_TOKENS} + 1, {LINE_TOKENS}), ' '))"
        f" ELSE CAST(array() AS array<string>) END)"
    )


def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line dedup: drop lines whose hash appears in >=
    LINE_DF_MIN distinct docs; report per-doc kept/removed + cleaned md5.

    The original line ORDER is preserved without any collect_list ordering
    hazard: removal is computed as a per-doc *set* of removed line hashes,
    and the cleaned text is rebuilt by filtering the doc's own ordered line
    array against that set (membership only — order never round-trips
    through a shuffle).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select("doc_id", F.expr(_lines_expr()).alias("lines"))
    lines = base.select(
        "doc_id", F.explode("lines").alias("line")
    ).select("doc_id", F.md5("line").alias("lmd5")).distinct()
    removed_hashes = (
        lines.groupBy("lmd5")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= LINE_DF_MIN)
        .select("lmd5")
    )
    rm_per_doc = (
        lines.join(removed_hashes, "lmd5")
        .groupBy("doc_id")
        .agg(F.collect_set("lmd5").alias("rm"))
    )
    joined = base.join(rm_per_doc, "doc_id", "left").select(
        "doc_id",
        "lines",
        F.coalesce(F.col("rm"), F.array().cast("array<string>")).alias("rm"),
    )
    kept = F.filter(F.col("lines"), lambda l: ~F.array_contains(F.col("rm"), F.md5(l)))
    return joined.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        (F.size("lines") - F.size(kept)).cast("long").alias("n_removed"),
        F.md5(F.array_join(kept, "\n")).alias("cleaned_md5"),
    )


# --- DuckDB oracle twins ----------------------------------------------------

_W = WINDOW_TOKENS
_SQL_BOILERPLATE = "[" + ", ".join(f"'{t}'" for t in BOILERPLATE) + "]"

_SQL_EXACT_SUBSTRING = f"""
WITH corpus AS ({_SQL_CORPUS}),
base AS (
  SELECT doc_id, {_SQL_TOKENS} AS toks FROM corpus
),
stats AS (SELECT doc_id, toks, len(toks)::BIGINT AS n_toks FROM base),
winlists AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {_W}
              THEN CAST(generate_series(1, len(toks) - {_W} + 1) AS BIGINT[])
              ELSE CAST([] AS BIGINT[]) END AS ss,
         CASE WHEN len(toks) >= {_W}
              THEN list_transform(generate_series(1, len(toks) - {_W} + 1),
                                  s -> md5(array_to_string(toks[s : s + {_W} - 1], ' ')))
              ELSE CAST([] AS VARCHAR[]) END AS ws
  FROM base
),
wins AS (
  SELECT doc_id, unnest(ss) AS s, unnest(ws) AS wmd5 FROM winlists
),
dup_hashes AS (
  SELECT wmd5 FROM wins GROUP BY wmd5 HAVING COUNT(DISTINCT doc_id) >= 2
),
dup_starts AS (
  SELECT w.doc_id, list(DISTINCT w.s) AS dups
  FROM wins w JOIN dup_hashes USING (wmd5)
  GROUP BY w.doc_id
),
joined AS (
  SELECT st.doc_id, st.n_toks, d.dups,
         CASE WHEN d.dups IS NULL THEN 0
              ELSE len(list_filter(generate_series(1, st.n_toks),
                     i -> len(list_filter(d.dups, s -> s <= i AND i < s + {_W})) > 0))
         END::BIGINT AS covered
  FROM stats st LEFT JOIN dup_starts d USING (doc_id)
)
SELECT doc_id,
       GREATEST(n_toks - {_W} + 1, 0)::BIGINT AS n_windows,
       COALESCE(len(dups), 0)::BIGINT AS n_dup_windows,
       covered AS covered_tokens,
       CASE WHEN n_toks > 0
            THEN CAST(FLOOR(covered / n_toks * 1000000.0) AS DOUBLE) / 1000000.0
            ELSE 0.0 END AS dup_token_frac
FROM joined
"""

_SQL_DEDUP_LINES = f"""
WITH base AS (
  SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
),
lined AS (
  SELECT doc_id,
         [({_SQL_BOILERPLATE})[CAST(doc_id % {len(BOILERPLATE)} AS INT) + 1]] ||
         CASE WHEN len(toks) >= 1
              THEN list_transform(generate_series(1, CAST(ceil(len(toks) / {LINE_TOKENS}.0) AS BIGINT)),
                     j -> array_to_string(toks[(j - 1) * {LINE_TOKENS} + 1 : j * {LINE_TOKENS}], ' '))
              ELSE CAST([] AS VARCHAR[]) END AS lines
  FROM base
),
doc_lines AS (
  SELECT DISTINCT doc_id, md5(l) AS lmd5
  FROM (SELECT doc_id, unnest(lines) AS l FROM lined)
),
removed_hashes AS (
  SELECT lmd5 FROM doc_lines GROUP BY lmd5 HAVING COUNT(DISTINCT doc_id) >= {LINE_DF_MIN}
),
rm_per_doc AS (
  SELECT dl.doc_id, list(dl.lmd5) AS rm
  FROM doc_lines dl JOIN removed_hashes USING (lmd5)
  GROUP BY dl.doc_id
),
joined AS (
  SELECT l.doc_id, l.lines, COALESCE(r.rm, CAST([] AS VARCHAR[])) AS rm
  FROM lined l LEFT JOIN rm_per_doc r USING (doc_id)
),
cleaned AS (
  SELECT doc_id, lines,
         list_filter(lines, x -> NOT list_contains(rm, md5(x))) AS kept
  FROM joined
)
SELECT doc_id,
       len(lines)::BIGINT AS n_lines,
       (len(lines) - len(kept))::BIGINT AS n_removed,
       md5(array_to_string(kept, chr(10))) AS cleaned_md5
FROM cleaned
"""

QUERIES = {
    "dedup_exact_substring": dedup_exact_substring,
    "dedup_lines": dedup_lines,
}

ORACLE = {
    "dedup_exact_substring": _SQL_EXACT_SUBSTRING,
    "dedup_lines": _SQL_DEDUP_LINES,
}
