"""BPE trainer vs a pure-Python reference implementation (the Sennrich
algorithm as published) on the classic low/lower/newest/widest vocabulary,
plus structural invariants on the fixture corpus."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.bpe import (
    EOW,
    MERGE_ROUNDS,
    _initial_rep,
    bpe_train_merges,
    train_from_vocab,
)


def _reference_bpe(vocab: dict[str, int], rounds: int):
    """Sennrich et al. 2016 reference loop, tie-break (count desc, pair asc)."""
    reps = {w: list(w) + [EOW] for w in vocab}
    merges = []
    for _ in range(rounds):
        counts: Counter = Counter()
        for w, syms in reps.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += vocab[w]
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], f"{p[0]} {p[1]}"))
        merges.append((f"{pair[0]} {pair[1]}", counts[pair]))
        for w, syms in reps.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            reps[w] = out
    return merges, reps


def test_bpe_matches_reference_on_classic_vocab(spark):
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    df = spark.createDataFrame(list(vocab.items()), "w string, freq long").select(
        "w", "freq", _initial_rep().alias("rep")
    )
    got_merges, got_reps = train_from_vocab(df, 5)
    exp_merges, exp_reps = _reference_bpe(vocab, 5)
    assert got_merges == exp_merges
    got = {r.w: r.rep.split(" ") for r in got_reps.collect()}
    assert got == exp_reps


def test_bpe_fixture_merge_table_shape(spark, sf_dir):
    out = bpe_train_merges(spark, sf_dir).orderBy("round").collect()
    assert len(out) == MERGE_ROUNDS
    assert [r.round for r in out] == list(range(1, MERGE_ROUNDS + 1))
    # counts are non-increasing round over round (a merge can only reduce or
    # tie the next best pair's weight... not strictly true in general BPE,
    # but each merged symbol's count is positive and pairs are two symbols
    for r in out:
        assert r.pair_count > 0 and " " in r.pair and r.merged == r.pair.replace(" ", "")


def test_bpe_token_count_bounds(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.bpe import bpe_token_count

    out = bpe_token_count(spark, sf_dir).cache()
    assert out.count() > 0
    # merging can only shrink: bpe_tokens <= char_tokens, and at least one
    # document must actually compress (three learned merges over a small
    # vocabulary always apply somewhere)
    assert out.filter(F.col("bpe_tokens") > F.col("char_tokens")).count() == 0
    assert out.filter(F.col("bpe_tokens") < F.col("char_tokens")).count() > 0
