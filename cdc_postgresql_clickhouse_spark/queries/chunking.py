"""Document chunking for training-data preparation: split each document into
fixed-size token windows with stride overlap — the step that turns cleaned
documents into model-context-sized training rows (the upstream neighbor of
``corpus_shard_packing``, which packs the resulting pieces into shards).

Chunk starts are 1, 1+stride, 1+2·stride, … while ≤ n_tokens, so the final
chunk may be short (standard behavior — truncation would silently drop the
document tail). All chunk construction is map-side per row (transform +
slice over the token array, then one explode to rows); no shuffle at all —
at 100 TB this is a pure scan→flatMap job whose output size is
(1 + overlap) × corpus.

Cross-engine determinism: chunk boundaries are integer arithmetic; the chunk
digest is md5 over the space-joined token slice, identical in both engines.

Reference tie-in: no analogue in the reference (its unit of work is the row,
``schemas/clickhouse_schemas.sql``); extends the LLM-pipeline layer (survey
§2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 25% overlap between consecutive chunks

# (start, slice) pairs per doc; Spark's sequence() is inclusive of the stop
# like DuckDB's generate_series, and the n_tok >= 1 guard avoids its
# descending-sequence behavior on an empty doc (explode then drops the
# empty array row, matching unnest([]))
_CHUNKS = (
    "CASE WHEN size(toks) >= 1 THEN"
    " transform(sequence(1, size(toks), {stride}),"
    "           s -> struct(s AS start, slice(toks, s, {width}) AS piece))"
    " ELSE array() END"
).format(stride=CHUNK_STRIDE, width=CHUNK_TOKENS)


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    exploded = base.select("doc_id", F.posexplode(F.expr(_CHUNKS)).alias("chunk_idx", "c"))
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("c.piece").cast("long").alias("chunk_tokens"),
        F.md5(F.array_join("c.piece", " ")).alias("chunk_md5"),
    )


QUERIES = {"doc_chunking": doc_chunking}

# DuckDB: list slicing l[a:b] is 1-based inclusive, so a width-W slice at s
# is l[s : s + W - 1]; slicing past the end truncates like Spark's slice().
ORACLE = {
    "doc_chunking": f"""
WITH base AS (
  SELECT doc_id,
         list_filter(str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '') AS toks
  FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(generate_series(1, len(toks), {CHUNK_STRIDE})) AS start,
         toks
  FROM base WHERE len(toks) >= 1
)
SELECT doc_id,
       CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       len(toks[start : start + {CHUNK_TOKENS} - 1])::BIGINT AS chunk_tokens,
       md5(array_to_string(toks[start : start + {CHUNK_TOKENS} - 1], ' ')) AS chunk_md5
FROM chunks
""",
}
