"""Unigram-tokenizer equivalence and laws: the registered Viterbi expression
tree must match a pure-Python reference implementation word-for-word on the
real corpus (model derivation included), and the segmentation must obey its
algebraic laws (pieces rejoin to the word, piece-count bounds, score sign)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.queries.tokenizer import (
    MAXP,
    MAXW,
    VOCAB_K,
    tokenizer_unigram_segment,
    tokenizer_unigram_token_count,
    unigram_model,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def _ref_model(word_freq: dict[str, int]):
    wt: Counter = Counter()
    for w, f in word_freq.items():
        for L in range(1, MAXP + 1):
            for i in range(len(w) - L + 1):
                wt[w[i : i + L]] += f
    top = sorted(wt.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]
    z = sum(v for _, v in top)
    il = lambda x: x.bit_length() - 1  # noqa: E731
    return {g: il(v) - il(z) for g, v in top}, -2 * il(z)


def _ref_viterbi(w: str, vocab: dict[str, int], oov: int):
    dp = [(0, 0, "")]
    for j in range(1, len(w) + 1):
        cands = []
        for i in range(max(0, j - MAXP), j):
            p = w[i:j]
            sc = vocab.get(p, oov if j - i == 1 else None)
            if sc is None:
                continue
            s, np_, seg = dp[i]
            cands.append((-(s + sc), np_ + 1, p if seg == "" else seg + " " + p))
        best = min(cands)
        dp.append((-best[0], best[1], best[2]))
    return dp[len(w)]


def _word_freq_py(spark, sf_dir) -> dict[str, int]:
    rows = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("w"))
        .collect()
    )
    wf: Counter = Counter()
    for r in rows:
        wf[r.w[:MAXW]] += 1
    return dict(wf)


def test_unigram_segmentation_matches_python_reference(spark, sf_dir):
    wf = _word_freq_py(spark, sf_dir)
    vocab, oov = _ref_model(wf)
    # model parity first: the Spark-derived model must be byte-identical
    sv, soov = unigram_model(spark, sf_dir)
    assert dict(sv) == vocab
    assert soov == oov
    got = {
        r.word: (r.freq, r.n_pieces, r.total_score, r.seg)
        for r in tokenizer_unigram_segment(spark, sf_dir).collect()
    }
    assert set(got) == set(wf)
    for w, f in wf.items():
        s, np_, seg = _ref_viterbi(w, vocab, oov)
        assert got[w] == (f, np_, s, seg), (w, got[w], (f, np_, s, seg))


def test_unigram_segmentation_laws(spark, sf_dir):
    out = tokenizer_unigram_segment(spark, sf_dir).toPandas()
    # pieces rejoin to the word exactly
    assert (out.seg.str.replace(" ", "", regex=False) == out.word).all()
    # piece count between ceil(len/MAXP) and len; scores non-positive
    ln = out.word.str.len()
    assert (out.n_pieces >= -(-ln // MAXP)).all()
    assert (out.n_pieces <= ln).all()
    assert (out.total_score <= 0).all()


def test_unigram_fertility_bounds(spark, sf_dir):
    tc = tokenizer_unigram_token_count(spark, sf_dir).toPandas()
    assert (tc.unigram_pieces >= tc.ws_tokens).all()
    assert (tc.unigram_pieces <= MAXW * tc.ws_tokens).all()
    assert (tc.fertility_ppm >= 1_000_000).all()
