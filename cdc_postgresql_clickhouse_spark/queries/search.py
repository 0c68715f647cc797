"""Keyword retrieval: BM25 ranking (Robertson-Sparck Jones / Okapi) over
the documents table — the retrieval half of a RAG-style corpus pipeline
(ANN covers dense retrieval in ``queries/similarity.py``; this is the
sparse/lexical side).

Scale shape: ONE corpus explode builds the posting list (doc, term, tf) —
the same persisted barrier the TF-IDF and unigram-LM queries share — and
document lengths are a re-aggregation of it. The query set is tiny by
definition and broadcasts; scoring touches only postings whose term appears
in some query (a broadcast semi-join prunes the rest), and ranking is a
per-query top-k window. At 100 TB the posting list is the inverted index a
search system would shard by term; the plan is identical.

Cross-engine determinism: the same integer micro-unit device as
``text_unigram_logprob`` — each (query, term, doc) partial score (idf ×
saturated-tf, all from identical doubles) is FLOOR-truncated to micro-units
BEFORE the per-document sum, so the distributed combine runs on exact
integers and addition order can never surface. Ranking ties break on
doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.sources.registry import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

# fixed benchmark queries over the fixture vocabulary
SEARCH_QUERIES: dict[str, list[str]] = {
    "q_spark_join": ["spark", "join"],
    "q_table_scan": ["table", "scan"],
    "q_hash_merge_sort": ["hash", "merge", "sort"],
}


def build_postings(docs: DataFrame) -> DataFrame:
    """The (doc_id, term, tf) inverted-index rows for a document set — the
    unit the streaming ingest appends per micro-batch and the batch query
    builds in one pass (each doc's postings are a pure function of that doc,
    which is what makes the index incrementally maintainable)."""
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def bm25_rank(postings: DataFrame, n_docs: int, q: DataFrame | None = None) -> DataFrame:
    """Okapi BM25 top-k over an already-built postings table — shared by the
    batch query and the incrementally-maintained index
    (``streaming/postings.py``), so 'the streamed index ranks identically'
    is a statement about the INDEX, not about two scorers."""
    postings = postings.persist()
    dl = postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    avgdl = dl.agg(F.sum("dl")).first()[0] / float(n_docs)
    spark = postings.sparkSession
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    if q is None:
        q = spark.createDataFrame(
            [(qn, t) for qn, terms in SEARCH_QUERIES.items() for t in terms],
            "query string, term string",
        )
    # df join semi-filtered to the query term set and broadcast (guide
    # §3.2): matched rows can only carry query terms, so the filtered join
    # is value-identical (df still counts over the FULL postings), and the
    # workload-bounded broadcast removes the by-term re-shuffle of the
    # matched stream.
    df_q = df_t.join(F.broadcast(q.select("term")), "term", "left_semi")
    matched = (
        postings.join(F.broadcast(q), "term")
        .join(F.broadcast(df_q), "term")
        .join(dl, "doc_id")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_sat = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
    )
    part_micro = F.floor(idf * tf_sat * F.lit(1000000.0)).cast("long")
    scored = matched.select("query", "doc_id", part_micro.alias("sm"))
    per_doc = scored.groupBy("query", "doc_id").agg(
        F.sum("sm").cast("long").alias("score_micro"),
        F.count(F.lit(1)).cast("long").alias("terms_matched"),
    )
    w = Window.partitionBy("query").orderBy(F.desc("score_micro"), F.col("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query", "doc_id", "score_micro", "terms_matched", F.col("rank").cast("long").alias("rank"))
    )


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_rank(build_postings(docs), docs.count())


_SQL_TOKENS = (
    "list_filter(str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), "
    "t -> t <> '')"
)
_Q_VALUES = ", ".join(
    f"('{qn}', '{t}')" for qn, terms in SEARCH_QUERIES.items() for t in terms
)

_SQL_BM25 = f"""
WITH postings AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
  ) GROUP BY doc_id, term
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM postings GROUP BY doc_id),
nv AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
              (SELECT SUM(tf) FROM postings) AS tot),
dft AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
q(query, term) AS (VALUES {_Q_VALUES}),
matched AS (
  SELECT q.query, p.doc_id, p.tf, d.df, l.dl, nv.n, nv.tot
  FROM postings p
  JOIN q ON q.term = p.term
  JOIN dft d ON d.term = p.term
  JOIN dl l ON l.doc_id = p.doc_id
  CROSS JOIN nv
),
scored AS (
  SELECT query, doc_id,
         CAST(FLOOR(
           ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
           * ((tf * {BM25_K1 + 1.0!r}) /
              (tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * dl / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))))
           * 1000000.0) AS BIGINT) AS sm
  FROM matched
),
per_doc AS (
  SELECT query, doc_id, SUM(sm) AS score_micro, COUNT(*) AS terms_matched
  FROM scored GROUP BY query, doc_id
)
SELECT query, doc_id,
       CAST(score_micro AS BIGINT) AS score_micro,
       CAST(terms_matched AS BIGINT) AS terms_matched,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query ORDER BY score_micro DESC, doc_id) AS rank
      FROM per_doc)
WHERE rank <= {BM25_TOPK}
"""

QUERIES = {"text_bm25_search": text_bm25_search}
ORACLE = {"text_bm25_search": _SQL_BM25}


# --- hybrid retrieval: reciprocal rank fusion -------------------------------
#
# Dense + sparse hybrid retrieval (Cormack et al. 2009 RRF): fuse the exact
# cosine ANN ranking (queries/similarity.ann_bruteforce_topk — the dense
# leg) with an idf-weighted lexical overlap ranking over the SAME query
# documents (doc_id <-> vec_id is the fixture's crossmodal identity, the
# same linkage crossmodal_doc_neighbors uses). RRF score = sum over systems
# of 1/(K + rank), K=60 — computed as floor(1e6/(K+rank)) integer
# micro-units so the fusion sum is engine-exact; a doc absent from one
# system's top-k contributes 0 from that system (the standard RRF
# convention).
#
# Scale shape: each leg is an existing bounded plan (broadcast query side;
# per-query top-k windows over candidates only); fusion touches 2*k rows
# per query — a full-outer join on (query, doc) of two tiny ranked lists.
# This is the retrieval stack of a RAG pipeline as ONE driver-checked row:
# swap the dense leg for ann_ivf_topk / ann_pq_topk at scale, same fusion.

RRF_K = 60
RRF_TOPK = 5


def lexical_matched(
    spark: SparkSession, sf_dir: str, df_prune_frac: float | None = None
) -> tuple[DataFrame, int]:
    """The lexical leg's candidate join: (query doc, corpus doc) rows for
    every shared term, carrying df. Returns (matched, n_docs).

    ``df_prune_frac`` is the WAND-style hot-term bound (VERDICT r4 #8):
    with it set, query terms whose df exceeds ``frac * N`` are skipped
    BEFORE the join, so the intermediate's cardinality is bounded by
    sum(df) over the surviving (rare) terms instead of being df-proportional
    on stopword-frequency terms (a term with df = N produces |queries| x N
    rows unpruned). The prune is an approximation with a quantified cap:
    a dropped term has idf = ln(1 + (N - df + 0.5)/(df + 0.5)) <
    ln(1 + 1/frac - 1 + eps) ~ ln(1/frac) micro-units of score — at
    frac = 0.5 under 0.7 score-micro-units per term, which is why such
    terms cannot reorder an idf-weighted top-k except on near-ties. The
    REGISTERED row keeps prune off so the oracle stays exact."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    terms = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("term")
    ).persist()
    df_t = terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    q_terms = terms.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("q_id"), "term"
    )
    if df_prune_frac is not None:
        cap = int(df_prune_frac * n_docs)
        rare = df_t.filter(F.col("df") <= cap).select("term")
        q_terms = q_terms.join(rare, "term", "left_semi")
    # q_terms is NOT broadcast-hinted: the fixture's query set is a 1%%
    # slice of the corpus (doc_id %% 100 == 0), i.e. corpus-proportional —
    # a production RRF has a small fixed query set and AQE will broadcast
    # it on its own; forcing the hint here would encode the wrong plan for
    # the scaled-up shape of THIS query.
    matched = (
        terms.join(q_terms, "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .join(df_t, "term")
    )
    return matched, n_docs


def retrieval_hybrid_rrf(
    spark: SparkSession, sf_dir: str, df_prune_frac: float | None = None
) -> DataFrame:
    from cdc_postgresql_clickhouse_spark.queries.similarity import ann_bruteforce_topk
    dense = ann_bruteforce_topk(spark, sf_dir).select(
        "q_id", F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("d_rank")
    )

    matched, n_docs = lexical_matched(spark, sf_dir, df_prune_frac)
    idf_micro = F.floor(
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        )
        * F.lit(1000000.0)
    ).cast("long")
    per_doc = (
        matched.select("q_id", "doc_id", idf_micro.alias("im"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum("im").cast("long").alias("lex_micro"))
    )
    ws = Window.partitionBy("q_id").orderBy(F.desc("lex_micro"), F.col("doc_id"))
    sparse = (
        per_doc.withColumn("s_rank", F.row_number().over(ws))
        .filter(F.col("s_rank") <= RRF_TOPK)
        .select("q_id", "doc_id", "s_rank")
    )

    fused = dense.join(sparse, ["q_id", "doc_id"], "full")
    contrib = lambda r: F.when(
        r.isNotNull(), F.floor(F.lit(1000000.0) / (F.lit(RRF_K) + r))
    ).otherwise(F.lit(0))
    scored = fused.select(
        "q_id",
        "doc_id",
        (contrib(F.col("d_rank")) + contrib(F.col("s_rank"))).cast("long").alias("rrf_micro"),
        F.coalesce(F.col("d_rank"), F.lit(0)).cast("long").alias("dense_rank"),
        F.coalesce(F.col("s_rank").cast("long"), F.lit(0)).alias("sparse_rank"),
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("rrf_micro"), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= RRF_TOPK)
        .select(
            "q_id", "doc_id", "rrf_micro", "dense_rank", "sparse_rank",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _sql_rrf() -> str:
    from cdc_postgresql_clickhouse_spark.queries.similarity import ORACLE as _SIM

    dense_sql = _SIM["ann_bruteforce_topk"].strip()
    return f"""
WITH dense AS MATERIALIZED (
  SELECT q_id, neighbor_id AS doc_id, rank AS d_rank FROM ({dense_sql})
),
terms AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct({_SQL_TOKENS})) AS term FROM documents
),
nv AS (SELECT COUNT(*) AS n FROM documents),
dft AS (SELECT term, COUNT(*) AS df FROM terms GROUP BY term),
qt AS (SELECT doc_id AS q_id, term FROM terms WHERE doc_id % 100 = 0),
matched AS (
  SELECT qt.q_id, t.doc_id, d.df
  FROM terms t
  JOIN qt ON qt.term = t.term AND t.doc_id <> qt.q_id
  JOIN dft d ON d.term = t.term
),
per_doc AS (
  SELECT q_id, doc_id,
         SUM(CAST(FLOOR(ln(1.0 + (CAST(nv.n AS DOUBLE) - df + 0.5) / (df + 0.5)) * 1000000.0) AS BIGINT)) AS lex_micro
  FROM matched CROSS JOIN nv
  GROUP BY q_id, doc_id
),
sparse AS (
  SELECT q_id, doc_id, s_rank FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY lex_micro DESC, doc_id) AS s_rank
    FROM per_doc
  ) WHERE s_rank <= {RRF_TOPK}
),
fused AS (
  SELECT COALESCE(d.q_id, s.q_id) AS q_id,
         COALESCE(d.doc_id, s.doc_id) AS doc_id,
         (COALESCE(CAST(FLOOR(1000000.0 / ({RRF_K} + d.d_rank)) AS BIGINT), 0)
          + COALESCE(CAST(FLOOR(1000000.0 / ({RRF_K} + s.s_rank)) AS BIGINT), 0)) AS rrf_micro,
         COALESCE(d.d_rank, 0) AS dense_rank,
         COALESCE(s.s_rank, 0) AS sparse_rank
  FROM dense d FULL JOIN sparse s ON d.q_id = s.q_id AND d.doc_id = s.doc_id
)
SELECT q_id, doc_id,
       CAST(rrf_micro AS BIGINT) AS rrf_micro,
       CAST(dense_rank AS BIGINT) AS dense_rank,
       CAST(sparse_rank AS BIGINT) AS sparse_rank,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rrf_micro DESC, doc_id) AS rank
      FROM fused)
WHERE rank <= {RRF_TOPK}
"""


QUERIES["retrieval_hybrid_rrf"] = retrieval_hybrid_rrf
ORACLE["retrieval_hybrid_rrf"] = _sql_rrf()


# --- known-item retrieval evaluation -----------------------------------------
#
# The retrieval leg of the evaluation family: every KIE_MOD-th document
# contributes a query (its first KIE_QTOKENS distinct tokens — the
# "known-item search" protocol: the user half-remembers a document's
# opening), the relevant item IS that document, and the report aggregates
# where BM25 ranks it: hits@1, hits@top-k, and the reciprocal-rank sum in
# integer micro-units (MRR × n_queries × 1e6, floor-per-query). No human
# labels needed — the protocol manufactures exact ground truth, which is
# how retrieval stacks are smoke-evaluated before a labeled set exists.
#
# Scale shape: the query table derives from a MOD-filtered scan (pushed
# down); everything downstream is the audited BM25 plan with a broadcast
# query set; the report is a one-row aggregate of a ≤ n_queries×k table.

KIE_MOD = 50
# 20 query tokens: the fixture vocabulary is all common words (near-flat
# idf), so short queries can't separate the source doc from high-tf
# lookalikes — 6 tokens found 2/10 in top-10, 20 tokens 8/10 with 3 @1.
# Shorter docs contribute all their tokens (slice truncates).
KIE_QTOKENS = 20


# Shared materialization of the known-item ranked run: ONE BM25 run over
# the protocol's query set, read by every derived metric (hits/MRR, nDCG,
# PR@k) — the TREC evaluation shape: you produce the run file once per
# corpus snapshot, every metric scores the same run. Same memo contract as
# queries/cluster.py::clusters and text_ext.langid_predictions:
# localCheckpointed, keyed by (application, sf_dir), reset hook for
# cold-start benches; the producer row text_bm25_search keeps its own cold
# plan.
_KIE_CACHE: dict[tuple[str, str], tuple[DataFrame, int]] = {}


def reset_kie_cache() -> None:
    """Drop the shared ranked-run memo (cold-start semantics for benchmarks
    and tests), releasing its checkpoint blocks synchronously
    (``operators/memo.py``)."""
    from cdc_postgresql_clickhouse_spark.operators.memo import release

    for rel, _n in _KIE_CACHE.values():
        release(rel)
    _KIE_CACHE.clear()


def _kie_relevant_ranks(spark: SparkSession, sf_dir: str):
    """Shared known-item protocol base: (rel ranks DataFrame, n_queries),
    computed once per (application, sf_dir). Every known-item metric
    derives from this one construction so the protocol cannot drift
    between them."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _KIE_CACHE.get(key)
    if hit is not None:
        return hit
    docs = load_table(spark, sf_dir, "documents")
    q = (
        docs.filter(F.col("doc_id") % KIE_MOD == 0)
        .select(
            F.col("doc_id").cast("string").alias("query"),
            F.explode(
                F.array_distinct(F.slice(tokens(F.col("text")), 1, KIE_QTOKENS))
            ).alias("term"),
        )
    )
    ranked = bm25_rank(build_postings(docs), docs.count(), q=q)
    rel = ranked.filter(F.col("doc_id") == F.col("query").cast("long")).localCheckpoint(
        eager=True
    )
    out = (rel, q.select("query").distinct().count())
    _KIE_CACHE[key] = out
    return out


def retrieval_known_item_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    rel, n_queries = _kie_relevant_ranks(spark, sf_dir)
    agg = rel.agg(
        F.coalesce(F.sum(F.when(F.col("rank") == 1, 1)), F.lit(0)).cast("long").alias("hits_at1"),
        F.count(F.lit(1)).cast("long").alias("hits_at_topk"),
        F.coalesce(F.sum(F.expr("1000000 div rank")), F.lit(0)).cast("long").alias(
            "sum_reciprocal_rank_ppm"
        ),
    )
    return agg.select(
        F.lit(n_queries).cast("long").alias("n_queries"),
        "hits_at1",
        "hits_at_topk",
        "sum_reciprocal_rank_ppm",
    )


# Shared CTE prefix (postings -> scored -> ranked -> rel): the KIE oracle,
# the NDCG oracle, and the PR-curve oracle all compose from this one
# constant rather than re-slicing each other's SQL text (ADVICE r10: the
# former rindex/rpartition surgery silently broke on any cosmetic edit to
# the KIE final SELECT).
_SQL_KIE_CTES = f"""
WITH postings AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
  ) GROUP BY doc_id, term
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM postings GROUP BY doc_id),
nv AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
              (SELECT SUM(tf) FROM postings) AS tot),
dft AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
q AS (
  SELECT CAST(doc_id AS VARCHAR) AS query, unnest(list_distinct(t[1:{KIE_QTOKENS}])) AS term
  FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents WHERE doc_id % {KIE_MOD} = 0)
),
matched AS (
  SELECT q.query, p.doc_id, p.tf, d.df, l.dl, nv.n, nv.tot
  FROM postings p
  JOIN q ON q.term = p.term
  JOIN dft d ON d.term = p.term
  JOIN dl l ON l.doc_id = p.doc_id
  CROSS JOIN nv
),
scored AS (
  SELECT query, doc_id,
         CAST(FLOOR(
           ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
           * ((tf * {BM25_K1 + 1.0!r}) /
              (tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * dl / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))))
           * 1000000.0) AS BIGINT) AS sm
  FROM matched
),
per_doc AS (
  SELECT query, doc_id, SUM(sm) AS score_micro
  FROM scored GROUP BY query, doc_id
),
ranked AS (
  SELECT query, doc_id, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query ORDER BY score_micro DESC, doc_id) AS rank
    FROM per_doc)
  WHERE rank <= {BM25_TOPK}
),
rel AS (SELECT query, rank FROM ranked WHERE doc_id = CAST(query AS BIGINT))
"""

_SQL_KIE = f"""{_SQL_KIE_CTES}
SELECT (SELECT COUNT(DISTINCT query) FROM q) AS n_queries,
       CAST(COALESCE(SUM(CASE WHEN rank = 1 THEN 1 END), 0) AS BIGINT) AS hits_at1,
       CAST(COUNT(*) AS BIGINT) AS hits_at_topk,
       CAST(COALESCE(SUM(1000000 // rank), 0) AS BIGINT) AS sum_reciprocal_rank_ppm
FROM rel
"""

QUERIES["retrieval_known_item_eval"] = retrieval_known_item_eval
ORACLE["retrieval_known_item_eval"] = _SQL_KIE


# --- nDCG known-item evaluation — PENDING round 7 ---------------------------
#
# The graded-discount twin of the reciprocal-rank report: nDCG@10 under
# the known-item protocol (Järvelin & Kekäläinen 2002). With exactly one
# relevant item per query the ideal DCG is the rank-1 gain, so per-query
# nDCG reduces to gain(rank)/gain(1) — and the gains 1/log2(r+1) ship as
# a SHARED literal table floor(1e6/log2(r+1)) computed once in Python and
# embedded verbatim in both engines, so no runtime float log exists on
# either side.

import math as _math

NDCG_GAINS = {r: int(_math.floor(1_000_000 / _math.log2(r + 1))) for r in range(1, BM25_TOPK + 1)}


def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    rel, n_queries = _kie_relevant_ranks(spark, sf_dir)
    gain = F.create_map(
        *[F.lit(x) for kv in NDCG_GAINS.items() for x in kv]
    )
    agg = rel.agg(
        F.count(F.lit(1)).cast("long").alias("hits_at_topk"),
        F.coalesce(F.sum(F.element_at(gain, F.col("rank").cast("int"))), F.lit(0))
        .cast("long")
        .alias("ndcg_sum_ppm"),
    )
    return agg.select(
        F.lit(n_queries).cast("long").alias("n_queries"),
        "hits_at_topk",
        "ndcg_sum_ppm",
    )


def _sql_ndcg() -> str:
    gains = " ".join(f"WHEN {r} THEN {g}" for r, g in NDCG_GAINS.items())
    return f"""{_SQL_KIE_CTES}
SELECT (SELECT COUNT(DISTINCT query) FROM q) AS n_queries,
       CAST(COUNT(*) AS BIGINT) AS hits_at_topk,
       CAST(COALESCE(SUM(CASE rank {gains} END), 0) AS BIGINT) AS ndcg_sum_ppm
FROM rel
"""


PENDING_QUERIES = {"retrieval_ndcg_eval": retrieval_ndcg_eval}
PENDING_ORACLE = {"retrieval_ndcg_eval": _sql_ndcg()}


# --- Round-7 registration wave 1 ------------------------------------------
# Flip these pending rows into the driver contract: the r6 green rows freed
# window slots (rotation policy in COVERAGE.md; order in
# queries/__init__._WINDOW_FRONT). The functions above are unchanged — the
# flip only moves the (query, oracle) pair between registries.
_REGISTER_WAVE1 = (
    "retrieval_ndcg_eval",
)
for _n in _REGISTER_WAVE1:
    QUERIES[_n] = PENDING_QUERIES.pop(_n)
    ORACLE[_n] = PENDING_ORACLE.pop(_n)
del _n


# --- Dirichlet query-likelihood evaluation — round 10 ------------------------
#
# The second classical scorer next to BM25: Dirichlet-smoothed query
# likelihood (Zhai & Lafferty 2001), log P(q|d) decomposed as
#   sum_{t in q matched in d} ln(1 + tf/(mu*P(t|C)))  +  |q|*ln(mu/(dl+mu))
# with P(t|C) = cf(t)/|C|. Run under the SAME known-item protocol as
# retrieval_known_item_eval, the report answers the question a retrieval
# stack actually asks before adding a scorer: does QL find the known item,
# and how much does its top-10 overlap BM25's (rank-fusion headroom — RRF
# only helps where the lists DISAGREE)?
#
# Scale shape: the audited BM25 plan (broadcast query set pruning the
# postings scan) twice over ONE persisted postings table; candidates are
# docs matching >= 1 query term; collection stats (cf, |C|) are one
# re-aggregation of postings; everything after scoring is <= n_queries*k.
#
# Determinism: per-(q,t,d) matched parts floor to micro-units BEFORE the
# per-doc sum (the BM25 device); the dl-part is one floored micro term
# scaled by the integer |q|; ln arguments are single divisions of exact
# doubles; ranking ties break on doc_id.

QL_MU = 2000.0


def _ql_eval_tops(spark: SparkSession, sf_dir: str):
    """(q, postings, n_docs, ql_top, bm_top) — factored so the law test can
    pin the inlined BM25 partials against bm25_rank row-for-row."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.filter(F.col("doc_id") % KIE_MOD == 0).select(
        F.col("doc_id").cast("string").alias("query"),
        F.explode(
            F.array_distinct(F.slice(tokens(F.col("text")), 1, KIE_QTOKENS))
        ).alias("term"),
    )
    postings = build_postings(docs).persist()
    n_docs = docs.count()
    total = postings.agg(F.sum("tf")).first()[0]  # scalar, the avgdl device
    avgdl = float(total) / float(n_docs)
    dl = postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = postings.groupBy("term").agg(
        F.sum("tf").cast("long").alias("cf"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    qlen = q.groupBy("query").agg(F.count(F.lit(1)).cast("long").alias("qlen"))
    # ONE matched pass feeds BOTH scorers (the shared-base device from
    # ann_recall_report): postings x queries is the corpus-scale join; the
    # QL and BM25 partials are projections over the same matched rows, so
    # scoring twice costs one extra expression, not a second join tree.
    # test_r10_ops pins the inlined BM25 against bm25_rank row-for-row.
    # The per-term stats join is semi-filtered to the QUERY term set and
    # broadcast (guide §3.2): matched rows can only carry query terms, so
    # the filtered join is value-identical, and the workload-bounded
    # broadcast removes the by-term re-shuffle of the matched stream (the
    # cf/df values still come from the FULL postings aggregation).
    stats_q = stats.join(F.broadcast(q.select("term")), "term", "left_semi")
    matched = (
        postings.join(F.broadcast(q), "term")
        .join(F.broadcast(stats_q), "term")
        .join(dl, "doc_id")
    )
    ql_part = F.floor(
        F.log(
            F.lit(1.0)
            + F.col("tf").cast("double") * F.lit(float(total))
            / (F.lit(QL_MU) * F.col("cf").cast("double"))
        ) * F.lit(1000000.0)
    ).cast("long")
    bm_idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    bm_tf = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
    )
    bm_part = F.floor(bm_idf * bm_tf * F.lit(1000000.0)).cast("long")
    per_doc = matched.groupBy("query", "doc_id").agg(
        F.sum(ql_part).cast("long").alias("match_micro"),
        F.sum(bm_part).cast("long").alias("bm_micro"),
        F.min("dl").alias("dl"),
    )
    dl_part = F.floor(
        F.log(F.lit(QL_MU) / (F.col("dl").cast("double") + F.lit(QL_MU)))
        * F.lit(1000000.0)
    ).cast("long")
    scored = per_doc.join(F.broadcast(qlen), "query").select(
        "query", "doc_id", "bm_micro",
        (F.col("match_micro") + F.col("qlen") * dl_part).alias("score_micro"),
    ).persist()
    w_ql = Window.partitionBy("query").orderBy(F.desc("score_micro"), F.col("doc_id"))
    ql_top = (
        scored.withColumn("rank", F.row_number().over(w_ql))
        .filter(F.col("rank") <= BM25_TOPK)
        .persist()
    )
    w_bm = Window.partitionBy("query").orderBy(F.desc("bm_micro"), F.col("doc_id"))
    bm_top = (
        scored.withColumn("rank", F.row_number().over(w_bm))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query", "doc_id", F.col("bm_micro").alias("score_micro"), "rank")
    )
    return q, postings, n_docs, ql_top, bm_top


def retrieval_query_likelihood_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, postings, n_docs, ql_top, bm_top = _ql_eval_tops(spark, sf_dir)
    rel = ql_top.filter(F.col("doc_id") == F.col("query").cast("long"))
    a1 = rel.agg(
        F.coalesce(F.sum(F.when(F.col("rank") == 1, 1)), F.lit(0)).cast("long")
        .alias("ql_hits_at1"),
        F.count(F.lit(1)).cast("long").alias("ql_hits_at_topk"),
        F.coalesce(F.sum(F.expr("1000000 div rank")), F.lit(0)).cast("long")
        .alias("ql_sum_reciprocal_rank_ppm"),
    )
    ov = ql_top.join(
        bm_top.select("query", "doc_id"), ["query", "doc_id"]
    ).agg(F.count(F.lit(1)).cast("long").alias("overlap_total"))
    b1 = (
        rel.filter(F.col("rank") == 1)
        .join(
            bm_top.filter(
                (F.col("rank") == 1) & (F.col("doc_id") == F.col("query").cast("long"))
            ).select("query"),
            "query",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("both_at1"))
    )
    n_queries = q.select("query").distinct().count()
    return a1.join(ov).join(b1).select(
        F.lit(n_queries).cast("long").alias("n_queries"),
        "ql_hits_at1", "ql_hits_at_topk", "ql_sum_reciprocal_rank_ppm",
        "overlap_total",
        F.expr(f"overlap_total * 1000000 div {n_queries * BM25_TOPK}")
        .cast("long").alias("mean_topk_overlap_ppm"),
        "both_at1",
    )


_SQL_QL_EVAL = f"""
WITH postings AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
  ) GROUP BY doc_id, term
),
q AS MATERIALIZED (
  SELECT CAST(doc_id AS VARCHAR) AS query, unnest(list_distinct(t[1:{KIE_QTOKENS}])) AS term
  FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents WHERE doc_id % {KIE_MOD} = 0)
),
nv AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
              (SELECT SUM(tf) FROM postings) AS tot),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM postings GROUP BY doc_id),
stats AS (SELECT term, SUM(tf) AS cf, COUNT(*) AS df FROM postings GROUP BY term),
qlen AS (SELECT query, COUNT(*) AS qlen FROM q GROUP BY query),
per_doc AS MATERIALIZED (
  SELECT q.query, p.doc_id,
         SUM(CAST(FLOOR(
           ln(1.0 + CAST(p.tf AS DOUBLE) * CAST(nv.tot AS DOUBLE)
                    / ({QL_MU!r} * CAST(s.cf AS DOUBLE)))
           * 1000000.0) AS BIGINT)) AS match_micro,
         SUM(CAST(FLOOR(
           ln(1.0 + (CAST(nv.n AS DOUBLE) - s.df + 0.5) / (s.df + 0.5))
           * ((p.tf * {BM25_K1 + 1.0!r}) /
              (p.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * l.dl / (CAST(nv.tot AS DOUBLE) / CAST(nv.n AS DOUBLE)))))
           * 1000000.0) AS BIGINT)) AS bm_micro,
         MIN(l.dl) AS dl
  FROM postings p
  JOIN q ON q.term = p.term
  JOIN stats s ON s.term = p.term
  JOIN dl l ON l.doc_id = p.doc_id
  CROSS JOIN nv
  GROUP BY 1, 2
),
scored AS MATERIALIZED (
  SELECT pd.query, pd.doc_id, pd.bm_micro,
         pd.match_micro + ql.qlen * CAST(FLOOR(
           ln({QL_MU!r} / (CAST(pd.dl AS DOUBLE) + {QL_MU!r})) * 1000000.0
         ) AS BIGINT) AS score_micro
  FROM per_doc pd JOIN qlen ql ON ql.query = pd.query
),
ql_top AS MATERIALIZED (
  SELECT query, doc_id, rank FROM (
    SELECT query, doc_id,
           row_number() OVER (PARTITION BY query ORDER BY score_micro DESC, doc_id) AS rank
    FROM scored)
  WHERE rank <= {BM25_TOPK}
),
bm_top AS MATERIALIZED (
  SELECT query, doc_id, rank FROM (
    SELECT query, doc_id,
           row_number() OVER (PARTITION BY query ORDER BY bm_micro DESC, doc_id) AS rank
    FROM scored)
  WHERE rank <= {BM25_TOPK}
),
rel AS (SELECT query, rank FROM ql_top WHERE doc_id = CAST(query AS BIGINT)),
a1 AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN rank = 1 THEN 1 END), 0) AS BIGINT) AS ql_hits_at1,
         CAST(COUNT(*) AS BIGINT) AS ql_hits_at_topk,
         CAST(COALESCE(SUM(1000000 // rank), 0) AS BIGINT) AS ql_sum_reciprocal_rank_ppm
  FROM rel
),
ov AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS overlap_total
  FROM ql_top a JOIN bm_top b ON a.query = b.query AND a.doc_id = b.doc_id
),
b1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS both_at1
  FROM rel r JOIN bm_top b
    ON b.query = r.query AND b.rank = 1 AND b.doc_id = CAST(b.query AS BIGINT)
  WHERE r.rank = 1
),
nq AS (SELECT COUNT(DISTINCT query) AS n_queries FROM q)
SELECT CAST(nq.n_queries AS BIGINT) AS n_queries,
       a1.ql_hits_at1, a1.ql_hits_at_topk, a1.ql_sum_reciprocal_rank_ppm,
       ov.overlap_total,
       CAST(ov.overlap_total * 1000000 // (nq.n_queries * {BM25_TOPK}) AS BIGINT)
         AS mean_topk_overlap_ppm,
       b1.both_at1
FROM a1 CROSS JOIN ov CROSS JOIN b1 CROSS JOIN nq
"""

QUERIES["retrieval_query_likelihood_eval"] = retrieval_query_likelihood_eval
ORACLE["retrieval_query_likelihood_eval"] = _SQL_QL_EVAL


# --- Hard-negative mining — round 10 ------------------------------------------
#
# The retriever-finetuning data op (DPR/Karpukhin et al. 2020 recipe):
# for every known-item query whose positive document ranks in BM25's
# top-k, emit one training triplet per co-ranked NON-relevant document —
# (anchor query, positive, hard negative) with the score margin. BM25's
# own top-k non-relevant hits ARE the canonical hard negatives (lexically
# confusable, semantically wrong); negative margins mark negatives that
# OUTRANK the positive — the highest-value training pairs. Queries whose
# positive missed the top-k entirely produce no triplets (nothing to
# anchor the margin), and their count is recoverable from
# retrieval_known_item_eval's hits_at_topk.
#
# Scale shape: the audited BM25 plan (broadcast query set over ONE
# persisted postings table) + a per-query self-join of the <= k-row ranked
# slice — output is <= n_queries * (k-1) rows. Margins subtract exact
# integer micro scores.

def retrieval_hard_negatives_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = docs.filter(F.col("doc_id") % KIE_MOD == 0).select(
        F.col("doc_id").cast("string").alias("query"),
        F.explode(
            F.array_distinct(F.slice(tokens(F.col("text")), 1, KIE_QTOKENS))
        ).alias("term"),
    )
    ranked = bm25_rank(build_postings(docs), docs.count(), q=q).persist()
    rel = ranked.filter(F.col("doc_id") == F.col("query").cast("long")).select(
        "query",
        F.col("rank").alias("pos_rank"),
        F.col("score_micro").alias("pos_score"),
    )
    neg = ranked.filter(F.col("doc_id") != F.col("query").cast("long")).select(
        "query",
        F.col("doc_id").alias("neg_doc_id"),
        F.col("rank").alias("neg_rank"),
        F.col("score_micro").alias("neg_score"),
    )
    return rel.join(neg, "query").select(
        F.col("query").cast("long").alias("q_doc_id"),
        "pos_rank",
        "neg_doc_id",
        "neg_rank",
        (F.col("pos_score") - F.col("neg_score")).cast("long").alias("margin_micro"),
    )


_SQL_HARD_NEG = f"""
WITH postings AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
  ) GROUP BY doc_id, term
),
q AS MATERIALIZED (
  SELECT CAST(doc_id AS VARCHAR) AS query, unnest(list_distinct(t[1:{KIE_QTOKENS}])) AS term
  FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents WHERE doc_id % {KIE_MOD} = 0)
),
nv AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
              (SELECT SUM(tf) FROM postings) AS tot),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM postings GROUP BY doc_id),
dft AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
per_doc AS (
  SELECT q.query, p.doc_id,
         SUM(CAST(FLOOR(
           ln(1.0 + (CAST(nv.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * ((p.tf * {BM25_K1 + 1.0!r}) /
              (p.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * l.dl / (CAST(nv.tot AS DOUBLE) / CAST(nv.n AS DOUBLE)))))
           * 1000000.0) AS BIGINT)) AS score_micro
  FROM postings p
  JOIN q ON q.term = p.term
  JOIN dft d ON d.term = p.term
  JOIN dl l ON l.doc_id = p.doc_id
  CROSS JOIN nv
  GROUP BY 1, 2
),
ranked AS MATERIALIZED (
  SELECT query, doc_id, score_micro, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query ORDER BY score_micro DESC, doc_id) AS rank
    FROM per_doc)
  WHERE rank <= {BM25_TOPK}
),
rel AS (
  SELECT query, rank AS pos_rank, score_micro AS pos_score
  FROM ranked WHERE doc_id = CAST(query AS BIGINT)
),
neg AS (
  SELECT query, doc_id AS neg_doc_id, rank AS neg_rank, score_micro AS neg_score
  FROM ranked WHERE doc_id <> CAST(query AS BIGINT)
)
SELECT CAST(rel.query AS BIGINT) AS q_doc_id,
       CAST(pos_rank AS BIGINT) AS pos_rank,
       neg_doc_id,
       CAST(neg_rank AS BIGINT) AS neg_rank,
       CAST(pos_score - neg_score AS BIGINT) AS margin_micro
FROM rel JOIN neg ON neg.query = rel.query
"""

QUERIES["retrieval_hard_negatives_mine"] = retrieval_hard_negatives_mine
ORACLE["retrieval_hard_negatives_mine"] = _SQL_HARD_NEG


# --- Precision/recall@k curve (known-item protocol) — round 10 (session 2) -----
#
# The operating-curve view the single-point hits@1 / hits@top-k report
# (retrieval_known_item_eval) cannot give: for each cutoff k in PR_KS,
# the aggregate precision@k and recall@k over the manufactured known-item
# query set. With exactly one relevant document per query, precision@k =
# hits@k / (n_queries x k) and recall@k = hits@k / n_queries, so the
# whole curve derives from the rank of the single relevant hit — one
# BM25 pass, then a |PR_KS|-row fold (each rel-rank row contributes to
# every k >= rank via a literal-grid explode).
#
# Scale shape: identical to the audited known-item plan (MOD-filtered
# broadcast query set over the postings join); the curve fold adds one
# |hits| x |PR_KS| explode of an already-tiny table.

PR_KS = (1, 3, 5, 10)
# every cutoff must sit inside the BM25 rank cap — a larger k would report
# hits@BM25_TOPK on BOTH engines, a wrongness oracle parity cannot see
assert max(PR_KS) <= BM25_TOPK


def retrieval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    rel, n_queries = _kie_relevant_ranks(spark, sf_dir)
    rel = rel.select("rank")
    grid = rel.select(
        "rank", F.explode(F.array(*[F.lit(k) for k in PR_KS])).alias("k")
    ).filter(F.col("rank") <= F.col("k"))
    return (
        grid.groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
        .select(
            F.col("k").cast("long").alias("k"),
            F.lit(n_queries).cast("long").alias("n_queries"),
            "hits",
            F.expr(f"hits * 1000000 div (k * {n_queries})").cast("long")
            .alias("precision_ppm"),
            F.expr(f"hits * 1000000 div {n_queries}").cast("long")
            .alias("recall_ppm"),
        )
    )


def _sql_pr_curve() -> str:
    ks = ", ".join(str(k) for k in PR_KS)
    return f"""{_SQL_KIE_CTES.rstrip().rstrip(',')},
nq AS (SELECT COUNT(DISTINCT query)::BIGINT AS n_queries FROM q),
grid AS (
  SELECT k, rank FROM rel, (SELECT unnest([{ks}]) AS k)
  WHERE rank <= k
)
SELECT CAST(k AS BIGINT) AS k,
       nq.n_queries,
       COUNT(*)::BIGINT AS hits,
       (COUNT(*) * 1000000 // (k * nq.n_queries))::BIGINT AS precision_ppm,
       (COUNT(*) * 1000000 // nq.n_queries)::BIGINT AS recall_ppm
FROM grid CROSS JOIN nq
GROUP BY k, nq.n_queries
"""


QUERIES["retrieval_pr_curve"] = retrieval_pr_curve
ORACLE["retrieval_pr_curve"] = _sql_pr_curve()
