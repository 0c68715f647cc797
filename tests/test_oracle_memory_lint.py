"""Oracle memory-budget lint (VERDICT r9 #3). The driver's DuckDB harness
is UNCAPPED and shares host RAM with the Spark JVM, so a frugal oracle is a
correctness requirement, not an optimization: four r9 driver rows died with
OutOfMemoryException because their oracles cross-joined a full-corpus
shingle/gram expansion (`unnest(list_transform(...))`) against a seed grid
(`FROM sh, (SELECT unnest(range(N)))`) with zero `AS MATERIALIZED` fences —
DuckDB re-inlines an un-fenced CTE into every reference, multiplying the
expansion by the fan-out.

Two layers:
- static: no registered oracle may combine a corpus-grain list expansion
  with a seed fan-out unless the expansion CTE is MATERIALIZED-fenced;
- dynamic: the oracles that carried the r9 OOM signature must complete
  under a deliberately tiny DuckDB memory_limit with spill DISABLED — a
  true peak-memory ceiling far below what the old shapes needed (the old
  fuzzy-decontam shape exhausted multi-GB; the fences hold peak ~100x
  lower)."""

from __future__ import annotations

import os
import re
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_EXPANSION = re.compile(r"unnest\(list_transform\(")
_SEED_FANOUT = re.compile(r"FROM\s+\w+\s*,\s*\(\s*SELECT\s+unnest\(range\(", re.I)
_FENCE = re.compile(r"AS\s+MATERIALIZED", re.I)


def _violates(sql: str) -> bool:
    """True iff the SQL pairs a corpus-grain list expansion with a seed
    fan-out and carries no MATERIALIZED fence anywhere — the exact shape
    that OOMed the r9 driver harness."""
    return bool(
        _EXPANSION.search(sql)
        and _SEED_FANOUT.search(sql)
        and not _FENCE.search(sql)
    )


def test_no_oracle_carries_the_oom_signature():
    from cdc_postgresql_clickhouse_spark.queries import all_oracles

    flagged = [n for n, sql in all_oracles().items() if _violates(sql)]
    assert not flagged, (
        f"oracles pair an un-fenced unnest(list_transform(...)) expansion "
        f"with a seed fan-out — the r9 driver-OOM shape: {flagged}"
    )


def test_lint_is_red_on_the_r9_counterexample():
    """The lint must actually catch the shape it exists for: the pre-fix
    minhash fragment (12x seed cross-join over an un-fenced shingle CTE)."""
    counterexample = """
WITH corpus AS (SELECT doc_id, text FROM documents),
sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t) - 1),
          i -> t[i] || ' ' || t[i + 1])) AS shingle
  FROM (SELECT doc_id, str_split(text, ' ') AS t FROM corpus)
),
sig AS (
  SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
  FROM sh, (SELECT unnest(range(12)) AS seed)
  GROUP BY doc_id, seed
)
SELECT * FROM sig
"""
    assert _violates(counterexample)
    # and the fence is exactly what clears it
    fenced = counterexample.replace("sh AS (", "sh AS MATERIALIZED (")
    assert not _violates(fenced)


# The seven oracles named in VERDICT r9 #1 (4 err rows + 3 queued with the
# same signature), plus the whole MATERIALIZED-fenced minhash family.
_HARDENED = (
    "dedup_roi_curve",
    "dedup_cross_source_matrix",
    "corpus_decontaminate_fuzzy",
    "sketch_bloom_error_sweep",
    "corpus_decontaminate_ngram_sweep",
    "quality_dedup_bias_audit",
    "tokenizer_fertility_by_source",
    "dedup_minhash_lsh",
    "dedup_method_agreement",
    "dedup_lsh_tuning_report",
    # session-2 additions with the deepest CTE stacks (VERDICT r10 #8):
    # the lint was written against the r9 shingle/fan-out signature, so the
    # new retrieval/quality/text shapes get the same hard in-memory ceiling
    "retrieval_query_likelihood_eval",
    "retrieval_pr_curve",
    "quality_lang_bias_auc",
    "quality_langid_fleiss_kappa",
    "quality_ccnet_ppl_buckets",
    "quality_filter_cascade_report",
    "quality_length_psi",
    "text_cross_source_crossentropy",
    "text_bigram_entropy_rate",
    "similarity_mmr_rerank",
    "sketch_hll_error_sweep",
    "multimodal_phash_hamming_sweep",
)

_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", _HARDENED)
def test_hardened_oracle_runs_under_tiny_memory_cap(name):
    """Peak-memory pin: each hardened oracle completes at sf0.001 inside a
    512MB DuckDB connection with NO temp directory (spill disabled), i.e.
    a hard in-memory ceiling. The r9 shapes exhausted multi-GB."""
    from cdc_postgresql_clickhouse_spark.queries import all_oracles

    sql = all_oracles()[name]
    con = duckdb.connect()
    try:
        con.execute("SET memory_limit='512MB'")
        con.execute("SET threads=4")
        for t in (
            "documents", "embeddings", "events", "orders", "lineitem",
            "customer", "supplier", "part", "nation", "region",
        ):
            path = os.path.join(_SF_DIR, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        rows = con.execute(sql).fetchall()
        assert rows is not None
    finally:
        con.close()
