"""SentencePiece-style UNIGRAM tokenizer: Viterbi segmentation of every
corpus word under an integer-quantized unigram piece model (Kudo 2018
"Subword Regularization"; Kudo & Richardson 2018 SentencePiece) — the
second tokenizer family next to BPE (``queries/bpe.py``), covering the
segmentation side of tokenizer training the way BPE covers merge learning.

Model (derived from the corpus itself, deterministically on both engines):
- words truncate to MAXW chars and collapse to a (word, freq) table —
  vocabulary-sized, like BPE's; corpus size only affects the one token
  pass that builds it.
- candidate pieces are ALL char n-grams (1..MAXP) of those words, weighted
  by positional occurrence × word freq; the vocab is the top VOCAB_K by
  (weight DESC, gram ASC) — a deterministic integer ranking.
- piece score = ilog2(weight) − ilog2(Z) (Z = selected-vocab total weight):
  an INTEGER quantization of log2 p(piece), exact in both engines because
  ilog2(x) = length(bin(x)) − 1 and ``bin`` renders without leading zeros
  in Spark and DuckDB alike (verified; no float log anywhere). Unknown
  single chars score OOV = −2·ilog2(Z), so every word always has a path.

Search: per-word Viterbi DP maximizing the piece-score sum with the
deterministic tie-break (higher score, then FEWER pieces, then
lexicographically smallest segmentation). The Spark side runs the DP as a
single higher-order ``aggregate`` fold over character positions — a pure
map pass over the vocabulary-sized word table, no shuffle, no UDF; the
model rides as one map literal (VOCAB_K entries, the PQ-codebook
convention). The oracle unrolls the DP as MAXW chained CTEs (the
graph-oracle device), each taking the per-word argmin of ≤MAXP candidate
extensions via a window, with AS MATERIALIZED fences so DuckDB's CTE
inlining cannot re-expand the chain combinatorially.

At 100 TB: the corpus pass is one explode + keyed agg (combiner-friendly);
everything after runs on the word table, whose size is bounded by the
vocabulary of the language, not the corpus. The driver-visible state is
the VOCAB_K-row model — the same O(model) contract as k-means/BPE/PQ.

Reference tie-in: none (the reference ships rows, not tokenizers);
survey §2.13 extension — COVERAGE.md round-6 queue item.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.queries.dedup import _SQL_TOKENS
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

MAXW = 12  # words truncate to this many chars before segmentation
MAXP = 4  # max piece length
VOCAB_K = 256  # model size


def _ilog2(x: int) -> int:
    return x.bit_length() - 1


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word table, PERSISTED: the one corpus-proportional pass —
    model training, segmentation, and the fertility join all re-read this
    vocabulary-sized barrier instead of re-exploding the corpus."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("w0"))
        .select(F.substring("w0", 1, MAXW).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def unigram_model(spark: SparkSession, sf_dir: str) -> tuple[list[tuple[str, int]], int]:
    """Train the piece model: [(gram, score)] sorted by (weight desc, gram),
    plus the OOV score. The ONLY driver-side state is this VOCAB_K-row list
    (the k-means/BPE/PQ model contract)."""
    return unigram_model_from_wf(_word_freq(spark, sf_dir))


def unigram_model_from_wf(wf: DataFrame) -> tuple[list[tuple[str, int]], int]:
    gram_frames = []
    for L in range(1, MAXP + 1):
        g = wf.filter(F.length("w") >= L).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - L + 1),
                    lambda i: F.col("w").substr(i, F.lit(L)),
                )
            ).alias("gram"),
            "freq",
        )
        gram_frames.append(g)
    grams = gram_frames[0]
    for g in gram_frames[1:]:
        grams = grams.unionByName(g)
    weighted = grams.groupBy("gram").agg(F.sum("freq").cast("long").alias("weight"))
    top = (
        weighted.orderBy(F.desc("weight"), F.asc("gram")).limit(VOCAB_K).collect()
    )  # model-sized collect: VOCAB_K rows
    z = sum(int(r.weight) for r in top)
    oov = -2 * _ilog2(z)
    vocab = [(r.gram, _ilog2(int(r.weight)) - _ilog2(z)) for r in top]
    return vocab, oov


def _vmap_sql(vocab: list[tuple[str, int]]) -> str:
    return "map(" + ", ".join(f"'{g}', {s}" for g, s in vocab) + ")"


def _viterbi_expr(oov: int) -> str:
    """The per-word DP as one higher-order aggregate fold over positions.
    acc[i+1] = best (score, n_pieces, seg) for the prefix of length i;
    candidates at position j extend acc[i] with piece w[i+1 .. j]; argmin of
    (−score, n_pieces, seg) structs encodes the tie-break exactly."""
    base = "element_at(acc, cast(i + 1 as int))"
    piece = "substr(w, cast(i + 1 as int), cast(j - i as int))"
    sc = f"coalesce(element_at(vm, {piece}), {oov})"
    cand = f"""named_struct(
        'negs', -({base}.s + {sc}),
        'np', {base}.np + 1,
        'seg', if({base}.seg = '', {piece}, concat({base}.seg, ' ', {piece})))"""
    return f"""
aggregate(
  sequence(1, length(w)),
  array(named_struct('s', cast(0 as bigint), 'np', 0, 'seg', '')),
  (acc, j) -> array_append(acc,
    (
      transform(
        array(
          aggregate(
            filter(
              transform(sequence(greatest(0, j - {MAXP}), j - 1),
                i -> if(element_at(vm, {piece}) is not null or j - i = 1,
                        {cand},
                        cast(null as struct<negs: bigint, np: int, seg: string>))),
              x -> x is not null),
            cast(null as struct<negs: bigint, np: int, seg: string>),
            (best, c) -> if(best is null or c < best, c, best)
          )
        ),
        b -> named_struct('s', -b.negs, 'np', b.np, 'seg', b.seg)
      )[0]
    )
  ),
  acc -> element_at(acc, cast(length(w) + 1 as int))
)"""


def _segmented_words(
    spark: SparkSession, sf_dir: str, wf: DataFrame | None = None
) -> DataFrame:
    """(w, freq, n_pieces, total_score, seg) for every distinct truncated
    word — the shared DP result both registered queries read. Passing a
    pre-built (persisted) word table keeps the whole query at ONE corpus
    pass."""
    if wf is None:
        wf = _word_freq(spark, sf_dir)
    vocab, oov = unigram_model_from_wf(wf)
    wf = wf.withColumn("vm", F.expr(_vmap_sql(vocab)))
    # the fold appends one best-struct per position; the finish lambda
    # un-negates the score of the full-word entry
    dp = wf.withColumn("r", F.expr(_viterbi_expr(oov)))
    return dp.select(
        F.col("w").alias("word"),
        "freq",
        F.col("r.np").cast("long").alias("n_pieces"),
        F.col("r.s").cast("long").alias("total_score"),
        F.col("r.seg").alias("seg"),
    )


def tokenizer_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _segmented_words(spark, sf_dir)


def tokenizer_unigram_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level fertility report: per source, whitespace tokens vs
    unigram pieces (fertility = pieces per token, integer PPM). The DP runs
    once on the word table; the per-source word frequencies join to it
    keyed on the word."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    sw = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w0"))
        .select("source", F.substring("w0", 1, MAXW).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # the corpus word table is a re-aggregation of the per-source one: the
    # corpus is exploded exactly once for this whole query
    wf = sw.groupBy(F.col("word").alias("w")).agg(
        F.sum("freq").cast("long").alias("freq")
    )
    seg = _segmented_words(spark, sf_dir, wf=wf).select("word", "n_pieces")
    j = sw.join(seg, "word")
    per = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
        F.sum("freq").cast("long").alias("ws_tokens"),
        F.sum(F.col("freq") * F.col("n_pieces")).cast("long").alias("unigram_pieces"),
    )
    return per.select(
        "source",
        "n_distinct_words",
        "ws_tokens",
        "unigram_pieces",
        F.expr("unigram_pieces * 1000000 div ws_tokens").cast("long").alias(
            "fertility_ppm"
        ),
    )


# --- oracle: the same model + DP, fully in SQL ------------------------------


def _sql_model() -> str:
    """CTE chain: words → w12 freq table → positional grams → top-K vocab
    with integer log2 scores → OOV constant."""
    gram_branches = " UNION ALL ".join(
        f"""
  SELECT substr(w, CAST(i AS INT), {L}) AS gram, freq
  FROM (SELECT w, freq, unnest(range(1, length(w) - {L} + 2)) AS i
        FROM w12 WHERE length(w) >= {L})"""
        for L in range(1, MAXP + 1)
    )
    return f"""
words0 AS (
  SELECT unnest({_SQL_TOKENS}) AS w0 FROM documents
),
w12 AS MATERIALIZED (
  SELECT substr(w0, 1, {MAXW}) AS w, COUNT(*)::BIGINT AS freq
  FROM words0 GROUP BY 1
),
grams AS ({gram_branches}),
weighted AS (SELECT gram, SUM(freq)::BIGINT AS weight FROM grams GROUP BY gram),
topv AS MATERIALIZED (
  SELECT gram, weight
  FROM (SELECT gram, weight,
               row_number() OVER (ORDER BY weight DESC, gram ASC) AS rn
        FROM weighted)
  WHERE rn <= {VOCAB_K}
),
zv AS (SELECT SUM(weight) AS z FROM topv),
vocab AS MATERIALIZED (
  SELECT gram,
         (length(bin(weight)) - 1) - (length(bin(z)) - 1) AS score
  FROM topv CROSS JOIN zv
),
oovv AS (SELECT -2 * (length(bin(z)) - 1) AS oov FROM zv)"""


def _sql_dp_chain() -> str:
    ctes = [
        "dp0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS s, 0 AS np, '' AS seg FROM w12)"
    ]
    for j in range(1, MAXW + 1):
        branches = []
        for i in range(max(0, j - MAXP), j):
            L = j - i
            piece = f"substr(d.w, {i + 1}, {L})"
            branches.append(f"""
  SELECT d.w,
         d.s + COALESCE(v.score, ov.oov) AS s,
         d.np + 1 AS np,
         CASE WHEN d.seg = '' THEN {piece} ELSE d.seg || ' ' || {piece} END AS seg
  FROM dp{i} d
  LEFT JOIN vocab v ON v.gram = {piece}
  CROSS JOIN oovv ov
  WHERE length(d.w) >= {j} AND (v.score IS NOT NULL OR {L} = 1)""")
        union = " UNION ALL ".join(branches)
        ctes.append(f"""dp{j} AS MATERIALIZED (
  SELECT w, s, np, seg FROM (
    SELECT *, row_number() OVER (PARTITION BY w ORDER BY s DESC, np ASC, seg ASC) AS rn
    FROM ({union})
  ) WHERE rn = 1
)""")
    finals = " UNION ALL ".join(
        f"SELECT w, s, np, seg FROM dp{j} WHERE length(w) = {j}" for j in range(1, MAXW + 1)
    )
    ctes.append(f"seg_final AS MATERIALIZED ({finals})")
    return ",\n".join(ctes)


_SQL_PREFIX = f"WITH {_sql_model()},\n{_sql_dp_chain()}"

_SQL_SEGMENT = f"""{_SQL_PREFIX}
SELECT f.w AS word, wf.freq,
       CAST(f.np AS BIGINT) AS n_pieces,
       CAST(f.s AS BIGINT) AS total_score,
       f.seg AS seg
FROM seg_final f JOIN w12 wf ON wf.w = f.w
"""

_SQL_TOKEN_COUNT = f"""{_SQL_PREFIX},
sw AS (
  SELECT source, substr(w0, 1, {MAXW}) AS word, COUNT(*)::BIGINT AS freq
  FROM (SELECT source, unnest({_SQL_TOKENS}) AS w0 FROM documents)
  GROUP BY 1, 2
),
per AS (
  SELECT s.source,
         COUNT(*)::BIGINT AS n_distinct_words,
         SUM(s.freq)::BIGINT AS ws_tokens,
         SUM(s.freq * f.np)::BIGINT AS unigram_pieces
  FROM sw s JOIN seg_final f ON f.w = s.word
  GROUP BY s.source
)
SELECT source, n_distinct_words, ws_tokens, unigram_pieces,
       CAST(unigram_pieces * 1000000 // ws_tokens AS BIGINT) AS fertility_ppm
FROM per
"""

QUERIES = {
    "tokenizer_unigram_segment": tokenizer_unigram_segment,
    "tokenizer_unigram_token_count": tokenizer_unigram_token_count,
}
ORACLE = {
    "tokenizer_unigram_segment": _SQL_SEGMENT,
    "tokenizer_unigram_token_count": _SQL_TOKEN_COUNT,
}


# --- WordPiece tokenizer (greedy longest-match-first) — PENDING round 7 -----
#
# The third tokenizer family (Wu et al. 2016, the BERT tokenizer): greedy
# longest-match segmentation against a vocabulary whose continuation
# pieces carry the ## mark — unlike unigram's global-optimum Viterbi, the
# production WordPiece INFERENCE algorithm is a deterministic greedy scan,
# which makes the oracle a chain of tick CTEs with no argmin window at
# all. Vocab derivation mirrors the unigram model's (top VOCAB_K grams by
# positional weight) but counts word-START grams and CONTINUATION grams
# as separate families, the way WordPiece's ## namespace does. Unknown
# single chars fall back to themselves (the byte-fallback convention;
# classic WordPiece would emit [UNK] for the whole word — documented
# deviation, keeps token counts total).
#
# Registered next round (the rule-2 window is full this round); until
# then tests/test_pending_parity.py holds it to the same oracle contract.


def wordpiece_model(
    spark: SparkSession, sf_dir: str, wf: DataFrame | None = None
) -> list[tuple[str, int]]:
    """[(piece, weight)] — pieces are grams or ##grams; top VOCAB_K overall
    by (weight DESC, piece ASC). Model-sized driver state."""
    if wf is None:
        wf = _word_freq(spark, sf_dir)
    frames = []
    for L in range(1, MAXP + 1):
        g = wf.filter(F.length("w") >= L).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - L + 1),
                    lambda i: F.when(i == 1, F.col("w").substr(i, F.lit(L))).otherwise(
                        F.concat(F.lit("##"), F.col("w").substr(i, F.lit(L)))
                    ),
                )
            ).alias("piece"),
            "freq",
        )
        frames.append(g)
    grams = frames[0]
    for g in frames[1:]:
        grams = grams.unionByName(g)
    weighted = grams.groupBy("piece").agg(F.sum("freq").cast("long").alias("weight"))
    top = weighted.orderBy(F.desc("weight"), F.asc("piece")).limit(VOCAB_K).collect()
    return [(r.piece, int(r.weight)) for r in top]


def _wp_greedy_expr(vocab: list[tuple[str, int]]) -> str:
    """Greedy longest-match fold: n ticks, each consuming the longest
    matching piece at the cursor (## family when cursor > 1), single-char
    fallback. acc = (pos, np, seg); a tick with pos > length(w) is a
    no-op, so n ticks always complete the word."""
    # branch for trying length L at the cursor: returns piece string or null
    def try_l(L: int) -> str:
        raw = f"substr(w, acc.pos, {L})"
        key = f"if(acc.pos = 1, {raw}, concat('##', {raw}))"
        return f"if(acc.pos + {L} - 1 <= length(w) and element_at(vm, {key}) is not null, {raw}, null)"

    pick = f"coalesce({', '.join(try_l(L) for L in range(MAXP, 0, -1))}, substr(w, acc.pos, 1))"
    return f"""
aggregate(
  sequence(1, length(w)),
  named_struct('pos', 1, 'np', 0, 'seg', ''),
  (acc, t) -> if(acc.pos > length(w), acc,
    named_struct(
      'pos', acc.pos + length({pick}),
      'np', acc.np + 1,
      'seg', if(acc.seg = '', if(acc.pos = 1, {pick}, concat('##', {pick})),
                concat(acc.seg, ' ', if(acc.pos = 1, {pick}, concat('##', {pick}))))
    )),
  acc -> acc
)"""


def tokenizer_wordpiece_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    wf = _word_freq(spark, sf_dir)
    vocab = wordpiece_model(spark, sf_dir, wf=wf)
    vm = "map(" + ", ".join(f"'{p}', {w}" for p, w in vocab) + ")"
    d = wf.withColumn("vm", F.expr(vm)).withColumn(
        "r", F.expr(_wp_greedy_expr(vocab))
    )
    return d.select(
        F.col("w").alias("word"),
        "freq",
        F.col("r.np").cast("long").alias("n_pieces"),
        F.col("r.seg").alias("seg"),
    )


def _sql_wp_model() -> str:
    branches = " UNION ALL ".join(
        f"""
  SELECT CASE WHEN i = 1 THEN substr(w, CAST(i AS INT), {L})
              ELSE '##' || substr(w, CAST(i AS INT), {L}) END AS piece, freq
  FROM (SELECT w, freq, unnest(range(1, length(w) - {L} + 2)) AS i
        FROM w12 WHERE length(w) >= {L})"""
        for L in range(1, MAXP + 1)
    )
    return f"""
words0 AS (
  SELECT unnest({_SQL_TOKENS}) AS w0 FROM documents
),
w12 AS MATERIALIZED (
  SELECT substr(w0, 1, {MAXW}) AS w, COUNT(*)::BIGINT AS freq
  FROM words0 GROUP BY 1
),
wp_grams AS ({branches}),
wp_vocab AS MATERIALIZED (
  SELECT piece FROM (
    SELECT piece, SUM(freq) AS weight,
           row_number() OVER (ORDER BY SUM(freq) DESC, piece ASC) AS rn
    FROM wp_grams GROUP BY piece
  ) WHERE rn <= {VOCAB_K}
)"""


def _sql_wp_ticks() -> str:
    """Greedy scan unrolled: tick CTEs g0..g{MAXW}, each advancing the
    cursor by the longest matching piece via 4 LEFT JOIN probes."""
    probes = "\n".join(
        f"  LEFT JOIN wp_vocab v{L} ON g.pos + {L} - 1 <= length(g.w) AND v{L}.piece = "
        f"(CASE WHEN g.pos = 1 THEN substr(g.w, g.pos, {L}) ELSE '##' || substr(g.w, g.pos, {L}) END)"
        for L in range(MAXP, 0, -1)
    )
    pick = (
        "COALESCE("
        + ", ".join(
            f"CASE WHEN v{L}.piece IS NOT NULL THEN substr(g.w, g.pos, {L}) END"
            for L in range(MAXP, 0, -1)
        )
        + ", substr(g.w, g.pos, 1))"
    )
    ctes = [
        "g0 AS MATERIALIZED (SELECT w, freq, 1 AS pos, 0 AS np, '' AS seg FROM w12)"
    ]
    for t in range(1, MAXW + 1):
        ctes.append(f"""g{t} AS MATERIALIZED (
  SELECT g.w, g.freq,
         CASE WHEN g.pos > length(g.w) THEN g.pos
              ELSE g.pos + length({pick}) END AS pos,
         CASE WHEN g.pos > length(g.w) THEN g.np ELSE g.np + 1 END AS np,
         CASE WHEN g.pos > length(g.w) THEN g.seg
              WHEN g.seg = '' THEN
                (CASE WHEN g.pos = 1 THEN {pick} ELSE '##' || {pick} END)
              ELSE g.seg || ' ' ||
                (CASE WHEN g.pos = 1 THEN {pick} ELSE '##' || {pick} END) END AS seg
  FROM g{t - 1} g
{probes}
)""")
    return ",\n".join(ctes)


_SQL_WORDPIECE = f"""WITH {_sql_wp_model()},
{_sql_wp_ticks()}
SELECT w AS word, freq, CAST(np AS BIGINT) AS n_pieces, seg
FROM g{MAXW}
"""

PENDING_QUERIES = {"tokenizer_wordpiece_segment": tokenizer_wordpiece_segment}
PENDING_ORACLE = {"tokenizer_wordpiece_segment": _SQL_WORDPIECE}


# --- Round-7 registration wave 1 ------------------------------------------
# Flip these pending rows into the driver contract: the r6 green rows freed
# window slots (rotation policy in COVERAGE.md; order in
# queries/__init__._WINDOW_FRONT). The functions above are unchanged — the
# flip only moves the (query, oracle) pair between registries.
_REGISTER_WAVE1 = (
    "tokenizer_wordpiece_segment",
)
for _n in _REGISTER_WAVE1:
    QUERIES[_n] = PENDING_QUERIES.pop(_n)
    ORACLE[_n] = PENDING_ORACLE.pop(_n)
del _n


# --- Vocabulary OOV curve — round 11 --------------------------------------------
#
# The coverage sweep the single-size fertility report
# (tokenizer_fertility_by_source) cannot show: for each candidate word-
# vocab size K in OOV_KS, the per-source share of token OCCURRENCES that
# fall outside the global top-K vocabulary (frequency desc, word asc tie
# break — the deterministic rank every tokenizer query uses). The curve
# is how a vocab budget is actually chosen: the K where the OOV mass of
# the worst source drops below the byte-fallback budget. Per (k, source):
# total token mass, OOV mass, oov_ppm.
#
# Scale shape: one scan -> global (token, cnt) rollup; ranking is a
# single window over the VOCABULARY (types, not occurrences — the
# keyness/zipf device); per-source masses join source-grain counts to the
# ranked vocab on token and fold with one conditional sum per K (the
# bounded OOV_KS grid rides as CASE arms, never a fan-out join).

OOV_KS = (64, 256, 1024)


def tokenizer_oov_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("t"))
    # fence: per_src feeds the global rank derivation AND the per-source
    # join — unfenced, the documents scan + explode run twice
    per_src = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).localCheckpoint(eager=True)
    glob = per_src.groupBy("t").agg(F.sum("cnt").cast("long").alias("gcnt"))
    ranked = glob.select(
        "t",
        F.row_number()
        .over(Window.orderBy(F.desc("gcnt"), F.asc("t")))
        .cast("long")
        .alias("rnk"),
    )
    joined = per_src.join(ranked, "t")
    folded = joined.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        *[
            F.sum(F.when(F.col("rnk") > k, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias(f"oov_{k}")
            for k in OOV_KS
        ],
    )
    arms = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("k"),
                F.col(f"oov_{k}").alias("oov_tokens"),
            )
            for k in OOV_KS
        ]
    )
    return (
        folded.select("source", "n_tokens", F.explode(arms).alias("a"))
        .select(
            F.col("a.k").alias("k"), "source", "n_tokens",
            F.col("a.oov_tokens").alias("oov_tokens"),
            F.expr("a.oov_tokens * 1000000 div n_tokens").cast("long")
            .alias("oov_ppm"),
        )
    )


def _sql_oov_curve() -> str:
    arms = ",\n         ".join(
        f"SUM(CASE WHEN rnk > {k} THEN cnt ELSE 0 END)::BIGINT AS oov_{k}"
        for k in OOV_KS
    )
    unions = " UNION ALL ".join(
        f"SELECT {k} AS k, source, n_tokens, oov_{k} AS oov_tokens FROM folded"
        for k in OOV_KS
    )
    return f"""
WITH tok AS (SELECT source, unnest({_SQL_TOKENS}) AS t FROM documents),
per_src AS MATERIALIZED (
  SELECT source, t, COUNT(*)::BIGINT AS cnt FROM tok GROUP BY 1, 2
),
ranked AS (
  SELECT t, row_number() OVER (ORDER BY SUM(cnt) DESC, t)::BIGINT AS rnk
  FROM per_src GROUP BY t
),
folded AS MATERIALIZED (
  SELECT source, SUM(cnt)::BIGINT AS n_tokens,
         {arms}
  FROM per_src JOIN ranked USING (t)
  GROUP BY source
)
SELECT CAST(k AS BIGINT) AS k, source, n_tokens, oov_tokens,
       (oov_tokens * 1000000 // n_tokens)::BIGINT AS oov_ppm
FROM ({unions})
"""


QUERIES["tokenizer_oov_curve"] = tokenizer_oov_curve
ORACLE["tokenizer_oov_curve"] = _sql_oov_curve()
