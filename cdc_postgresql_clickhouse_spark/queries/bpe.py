"""Distributed BPE merge training (Sennrich et al. 2016): learn byte-pair
merges from the corpus — the tokenizer-training step of an LLM data
pipeline, and the registry's canonical ITERATIVE-MODEL-FIT pattern alongside
k-means (`operators/kmeans.py`) and connected components
(`queries/cluster.py`).

Shape per merge round (the part that scales):
- pair counting is ONE aggregation over the WORD-FREQUENCY table, not the
  corpus: a single corpus pass builds (word, freq) — vocabulary-sized — and
  every round thereafter explodes each word type's adjacent symbol pairs
  weighted by freq. Corpus size only affects the first pass; rounds cost
  O(vocab × word_length).
- the argmax pair (count desc, pair asc — the deterministic tie-break) is
  the ONLY state collected per round: O(1) model state, same contract as
  kmeans' k×dim centroids.
- applying a merge is a map-side string replace over the vocabulary table.

Cross-engine determinism: symbol sequences are space-joined strings with an
``</w>`` end-of-word marker; merges use plain (non-regex) ``replace`` on a
space-wrapped representation — leftmost non-overlapping scan in both
engines, so overlapping pairs ("a a a") resolve identically. The oracle
unrolls MERGE_ROUNDS rounds as a CTE chain whose argmax scalars cross-join
into the next round's replace — no collect anywhere in SQL, byte-identical
merge tables.

Reference tie-in: no analogue (the reference ships rows, not tokenizers);
survey §2.13 extension, north-star "token counting" grown into training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.queries.dedup import _SQL_TOKENS
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

MERGE_ROUNDS = 3
EOW = "</w>"


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_rep() -> F.Column:
    """chars joined by spaces + end-of-word marker: 'spark' -> 's p a r k </w>'."""
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != "")
    return F.concat(F.array_join(chars, " "), F.lit(" " + EOW))


def _pair_counts(rep_df: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word frequency — one explode + one
    keyed agg over the vocabulary table."""
    syms = F.split(F.col("rep"), " ")
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat_ws(" ", F.element_at(syms, i), F.element_at(syms, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        rep_df.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    spark: SparkSession, sf_dir: str, rounds: int = MERGE_ROUNDS
) -> tuple[list[tuple[str, int]], DataFrame]:
    """Learn ``rounds`` merges; returns (merge table, final vocab reps).
    Only the argmax pair is collected per round (O(1) model state)."""
    rep_df = _word_freq(spark, sf_dir).select("w", "freq", _initial_rep().alias("rep"))
    return train_from_vocab(rep_df, rounds)


def train_from_vocab(
    rep_df: DataFrame, rounds: int
) -> tuple[list[tuple[str, int]], DataFrame]:
    """Core merge loop over any (w, freq, rep) vocabulary table."""
    merges: list[tuple[str, int]] = []
    for _ in range(rounds):
        best = (
            _pair_counts(rep_df)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0].pair, int(best[0].cnt)
        merges.append((pair, cnt))
        merged = pair.replace(" ", "")
        rep_df = rep_df.select(
            "w",
            "freq",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("rep"), F.lit(" ")),
                    F.lit(f" {pair} "),
                    F.lit(f" {merged} "),
                )
            ).alias("rep"),
        )
    return merges, rep_df


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table as a DataFrame: (round, pair, merged, cnt)."""
    merges, _ = bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        [(i + 1, p, p.replace(" ", ""), c) for i, (p, c) in enumerate(merges)],
        "round long, pair string, merged string, pair_count long",
    )


def _sql_round(i: int) -> str:
    """One unrolled oracle round: pair counts over rep{i}, argmax scalar,
    cross-joined replace producing rep{i+1}. Every rep{i} is referenced
    TWICE (pairs{i} and rep{i+1}), so each round's output is AS
    MATERIALIZED — un-fenced, inlining doubles the expression tree per
    round (2^rounds plan growth), the oracle-memory blowup class of
    VERDICT r9 #1. The materialized relation is |vocab|-bounded."""
    return f"""
pairs{i} AS (
  SELECT p AS pair, SUM(freq) AS cnt FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
                 j -> syms[j] || ' ' || syms[j + 1])) AS p
    FROM (SELECT freq, str_split(rep, ' ') AS syms FROM rep{i})
  ) GROUP BY p
),
best{i} AS MATERIALIZED (
  SELECT pair, cnt FROM pairs{i} ORDER BY cnt DESC, pair ASC LIMIT 1
),
rep{i + 1} AS MATERIALIZED (
  SELECT w, freq,
         trim(replace(' ' || r.rep || ' ',
                      ' ' || b.pair || ' ',
                      ' ' || replace(b.pair, ' ', '') || ' ')) AS rep
  FROM rep{i} r CROSS JOIN best{i} b
)"""


_SQL_BPE = (
    f"""
WITH wf AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest({_SQL_TOKENS}) AS w FROM documents
  ) GROUP BY w
),
rep0 AS MATERIALIZED (
  SELECT w, freq,
         array_to_string(list_filter(str_split(w, ''), c -> c <> ''), ' ')
           || ' {EOW}' AS rep
  FROM wf
),"""
    + ",".join(_sql_round(i) for i in range(MERGE_ROUNDS))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS round, pair, replace(pair, ' ', '') AS merged, CAST(cnt AS BIGINT) AS pair_count FROM best{i}"
        for i in range(MERGE_ROUNDS)
    )
)

QUERIES = {"bpe_train_merges": bpe_train_merges}
ORACLE = {"bpe_train_merges": _SQL_BPE}


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table to every document: per-doc token count
    under the trained BPE vocabulary vs the character baseline — the
    downstream consumer of ``bpe_train_merges`` (what a shard-packing or
    context-budget step actually uses).

    The merge table is O(rounds) driver state; application is a map-side
    replace chain over each word's symbol string (no join — the merges ride
    into the expression as literals, like the LSH plane matrix). Symbol
    count = spaces + 1 on the merged representation, summed per document."""
    merges, _ = bpe_train(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    rep = F.concat(F.lit(" "), _initial_rep(), F.lit(" "))
    n_chars = F.size(F.filter(F.split(F.col("w"), ""), lambda c: c != "")) + 1  # + EOW
    for pair, _cnt in merges:
        rep = F.replace(rep, F.lit(f" {pair} "), F.lit(f" {pair.replace(' ', '')} "))
    n_sym = F.size(F.filter(F.split(F.trim(rep), " "), lambda s: s != ""))
    per_word = words.select("doc_id", n_chars.alias("nc"), n_sym.alias("ns"))
    return per_word.groupBy("doc_id").agg(
        F.sum("nc").cast("long").alias("char_tokens"),
        F.sum("ns").cast("long").alias("bpe_tokens"),
    )


QUERIES["bpe_token_count"] = bpe_token_count

_SQL_BPE_COUNT = (
    f"""
WITH wf AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest({_SQL_TOKENS}) AS w FROM documents
  ) GROUP BY w
),
rep0 AS MATERIALIZED (
  SELECT w, freq,
         array_to_string(list_filter(str_split(w, ''), c -> c <> ''), ' ')
           || ' {EOW}' AS rep
  FROM wf
),"""
    + ",".join(_sql_round(i) for i in range(MERGE_ROUNDS))
    + f""",
dw AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS w FROM documents
),
counted AS (
  SELECT d.doc_id,
         len(list_filter(str_split(r.w, ''), c -> c <> '')) + 1 AS nc,
         len(list_filter(str_split(r.rep, ' '), s -> s <> '')) AS ns
  FROM dw d JOIN rep{MERGE_ROUNDS} r ON r.w = d.w
)
SELECT doc_id,
       CAST(SUM(nc) AS BIGINT) AS char_tokens,
       CAST(SUM(ns) AS BIGINT) AS bpe_tokens
FROM counted GROUP BY doc_id
"""
)

ORACLE["bpe_token_count"] = _SQL_BPE_COUNT


# --- tokenizer fertility by source -------------------------------------------
#
# The tokenizer-quality eval every multilingual/multi-domain corpus runs
# before committing a vocabulary (fertility = subword tokens emitted per
# word; the number that prices context-window budgets per source and flags
# domains the merges under-serve). Same trained merge table and map-side
# replace-chain application as ``bpe_token_count``, rolled up per source
# with the char-baseline compression alongside. Scale shape: O(rounds)
# driver model state, one map pass over exploded words, one bounded
# (|sources|) aggregation.


def tokenizer_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = bpe_train(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
    rep = F.concat(F.lit(" "), _initial_rep(), F.lit(" "))
    n_chars = F.size(F.filter(F.split(F.col("w"), ""), lambda c: c != "")) + 1  # + EOW
    for pair, _cnt in merges:
        rep = F.replace(rep, F.lit(f" {pair} "), F.lit(f" {pair.replace(' ', '')} "))
    n_sym = F.size(F.filter(F.split(F.trim(rep), " "), lambda s: s != ""))
    per_word = words.select("source", n_chars.alias("nc"), n_sym.alias("ns"))
    return per_word.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("ns").cast("long").alias("n_bpe_tokens"),
        F.sum("nc").cast("long").alias("n_char_tokens"),
        F.expr("sum(ns) * 1000 div count(1)").cast("long").alias("fertility_milli"),
        F.expr("sum(nc) * 1000 div sum(ns)").cast("long").alias("compression_milli"),
    )


QUERIES["tokenizer_fertility_by_source"] = tokenizer_fertility_by_source

ORACLE["tokenizer_fertility_by_source"] = (
    f"""
WITH wf AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest({_SQL_TOKENS}) AS w FROM documents
  ) GROUP BY w
),
rep0 AS MATERIALIZED (
  SELECT w, freq,
         array_to_string(list_filter(str_split(w, ''), c -> c <> ''), ' ')
           || ' {EOW}' AS rep
  FROM wf
),"""
    + ",".join(_sql_round(i) for i in range(MERGE_ROUNDS))
    + f""",
sw AS (
  SELECT source, unnest({_SQL_TOKENS}) AS w FROM documents
),
counted AS (
  SELECT s.source,
         len(list_filter(str_split(r.w, ''), c -> c <> '')) + 1 AS nc,
         len(list_filter(str_split(r.rep, ' '), x -> x <> '')) AS ns
  FROM sw s JOIN rep{MERGE_ROUNDS} r ON r.w = s.w
)
SELECT source,
       COUNT(*)::BIGINT AS n_words,
       SUM(ns)::BIGINT AS n_bpe_tokens,
       SUM(nc)::BIGINT AS n_char_tokens,
       (SUM(ns) * 1000 // COUNT(*))::BIGINT AS fertility_milli,
       (SUM(nc) * 1000 // SUM(ns))::BIGINT AS compression_milli
FROM counted GROUP BY source
"""
)


# --- BPE compression curve — round 10 (session 2) ------------------------------
#
# The ROI curve of merge training: corpus token count under the learned
# vocabulary after each merge round k = 0..MERGE_ROUNDS (round 0 = the
# character baseline), as total symbols and compression vs baseline in
# ppm. This is the tokens-per-byte trade a tokenizer budget decision
# reads — each merge buys a quantifiable token reduction, and the curve's
# flattening is the signal to stop growing the vocabulary. Totals are
# evaluated on the (word, freq) VOCABULARY table (sum freq x symbols),
# never re-tokenizing the corpus; the oracle chains the same MATERIALIZED
# merge rounds as bpe_train_merges and reads each round's total off the
# corresponding rep table.
#
# Scale shape: one corpus pass builds the word-frequency table; each of
# the MERGE_ROUNDS rounds is a vocab-sized agg + argmax scalar + map-side
# replace (the audited bpe_train plan) plus one vocab-sized total.

def bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    rep_df = _word_freq(spark, sf_dir).select(
        "w", "freq", _initial_rep().alias("rep")
    )
    totals: list[tuple[int, int, int]] = []
    for k in range(MERGE_ROUNDS + 1):
        # cut the lineage each round: the total agg and the next round's
        # argmax both read rep_df, and without the barrier every round
        # re-derives tokenize + word-freq + all prior replaces (the same
        # re-derivation class fixed on the PSI / daily-MAD plans)
        rep_df = rep_df.localCheckpoint(eager=True)
        row = rep_df.agg(
            F.sum(F.col("freq") * F.size(F.split("rep", " ")))
            .cast("long").alias("t"),
            F.count(F.lit(1)).cast("long").alias("n_word_types"),
        ).collect()[0]
        totals.append((k, int(row["t"]), int(row["n_word_types"])))
        if k < MERGE_ROUNDS:
            _, rep_df = train_from_vocab(rep_df, 1)
    t0 = totals[0][1]
    return spark.createDataFrame(
        [(k, n, t, t * 1_000_000 // t0) for k, t, n in totals],
        "round long, n_word_types long, total_tokens long, compression_ppm long",
    )


def _sql_compression_curve() -> str:
    tot = ",\n".join(
        f"tot{k} AS MATERIALIZED (SELECT SUM(freq * len(str_split(rep, ' ')))::BIGINT AS t, "
        f"COUNT(*)::BIGINT AS n FROM rep{k})"
        for k in range(MERGE_ROUNDS + 1)
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS round, n AS n_word_types, t AS total_tokens, "
        f"(t * 1000000 // (SELECT t FROM tot0))::BIGINT AS compression_ppm FROM tot{k}"
        for k in range(MERGE_ROUNDS + 1)
    )
    return (
        f"""
WITH wf AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest({_SQL_TOKENS}) AS w FROM documents
  ) GROUP BY w
),
rep0 AS MATERIALIZED (
  SELECT w, freq,
         array_to_string(list_filter(str_split(w, ''), c -> c <> ''), ' ')
           || ' {EOW}' AS rep
  FROM wf
),"""
        + ",".join(_sql_round(i) for i in range(MERGE_ROUNDS))
        + ",\n" + tot + "\n" + arms
    )


QUERIES["bpe_compression_curve"] = bpe_compression_curve
ORACLE["bpe_compression_curve"] = _sql_compression_curve()
