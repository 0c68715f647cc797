"""Span-level dedup invariants: exact-substring windows find the planted
near-duplicates with near-total coverage, untouched documents report zero,
and line dedup strips exactly the synthesized boilerplate while preserving
body order."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.dedup import DERIVED_OFFSET, NEARDUP_IDS
from cdc_postgresql_clickhouse_spark.queries.spans import (
    BOILERPLATE,
    LINE_DF_MIN,
    WINDOW_TOKENS,
    dedup_exact_substring,
    dedup_lines,
)


def test_exact_substring_flags_planted_neardups(spark, sf_dir):
    out = dedup_exact_substring(spark, sf_dir)
    planted = out.filter(F.col("doc_id") >= DERIVED_OFFSET)
    n_planted = planted.count()
    assert n_planted > 0
    # every derived doc is the original minus its first token: all of its
    # windows also occur in the original, so dup coverage is total wherever
    # the doc is long enough to have windows at all
    full = planted.filter(F.col("n_windows") > 0)
    assert full.filter(F.col("n_dup_windows") != F.col("n_windows")).count() == 0
    assert full.filter(F.col("dup_token_frac") < 1.0).count() == 0


def test_exact_substring_zero_for_unique_docs(spark, sf_dir):
    out = dedup_exact_substring(spark, sf_dir)
    # the fixture corpus contains whole-document exact duplicates of its own
    # (that's what dedup_exact finds), so *some* unplanted docs legitimately
    # report full coverage — but the corpus is mostly unique, so the typical
    # doc must report zero duplicated windows
    clean = out.filter(
        (F.col("doc_id") >= NEARDUP_IDS) & (F.col("doc_id") < DERIVED_OFFSET)
    )
    total = clean.count()
    zero = clean.filter(F.col("n_dup_windows") == 0).count()
    assert zero > total * 0.5, f"{zero}/{total} docs with no duplicated span"
    # originals of planted near-dups are always flagged
    originals = out.filter(F.col("doc_id") < NEARDUP_IDS).filter(F.col("n_windows") > 0)
    assert originals.filter(F.col("n_dup_windows") == 0).count() == 0


def test_exact_substring_short_doc_has_no_windows(spark):
    from cdc_postgresql_clickhouse_spark.queries import spans

    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, " ".join(f"w{i}" for i in range(WINDOW_TOKENS)))],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("tiny_docs")
    # reuse the window expression shape through the public query by pointing
    # the corpus at a temp dir is heavier than needed; assert the boundary
    # arithmetic directly: a doc of exactly W tokens has 1 window
    from cdc_postgresql_clickhouse_spark.functions.text import tokens

    n = (
        df.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.greatest(F.size("toks") - WINDOW_TOKENS + 1, F.lit(0)).alias("nw"))
        .orderBy("doc_id")
        .collect()
    )
    assert [r.nw for r in n] == [0, 1]


def test_line_dedup_removes_boilerplate_keeps_body(spark, sf_dir):
    out = dedup_lines(spark, sf_dir)
    # every doc got exactly one boilerplate header; each of the 7 templates
    # lands in ~n/7 docs >> LINE_DF_MIN at every sf, so every doc removes
    # at least its header
    assert out.filter(F.col("n_removed") < 1).count() == 0
    # and no doc loses everything: body lines of the word-soup corpus are
    # (almost surely) unique — cleaned text is non-empty for docs with >= 2
    # lines, i.e. n_removed < n_lines
    assert out.filter(F.col("n_removed") >= F.col("n_lines")).count() == 0


def test_line_dedup_cleaned_text_is_order_preserving(spark, sf_dir):
    # recompute one doc's cleaned text by hand and compare the md5
    from cdc_postgresql_clickhouse_spark.functions.text import tokens as tok_col
    from cdc_postgresql_clickhouse_spark.queries.spans import LINE_TOKENS
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    import hashlib

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    row = docs.filter(F.col("doc_id") == 3).select(
        "doc_id", tok_col(F.col("text")).alias("toks")
    ).collect()[0]
    toks = row.toks
    lines = [BOILERPLATE[3 % len(BOILERPLATE)]] + [
        " ".join(toks[i : i + LINE_TOKENS]) for i in range(0, len(toks), LINE_TOKENS)
    ]
    got = dedup_lines(spark, sf_dir).filter(F.col("doc_id") == 3).collect()[0]
    assert got.n_lines == len(lines)
    # header is removed (appears in ~n/7 docs >= LINE_DF_MIN); assume body
    # unique for this doc unless counts say otherwise
    if got.n_removed == 1:
        cleaned = "\n".join(lines[1:])
        assert got.cleaned_md5 == hashlib.md5(cleaned.encode()).hexdigest()


def test_line_df_min_threshold_is_positive():
    assert LINE_DF_MIN >= 2 and len(BOILERPLATE) >= 2


def test_html_strip_recovers_original_text(spark, sf_dir):
    """Stripping the synthesized markup must leave exactly the human-visible
    text: the <title> text plus the lowered original body — scripts,
    comments and tags leave no residue and word spacing is preserved."""
    import hashlib

    from cdc_postgresql_clickhouse_spark.queries.text_ext import text_html_strip
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20).collect()
    got = {
        r.doc_id: (r.n_tags, r.title, r.cleaned_md5)
        for r in text_html_strip(spark, sf_dir).collect()
    }
    for d in docs:
        n_tags, title, md5 = got[d.doc_id]
        assert n_tags >= 8  # html, head, title x2, script..., body, p x2, comment...
        assert title == f"doc {d.doc_id}"
        visible = f"doc {d.doc_id} {d.text.lower()}"
        assert md5 == hashlib.md5(visible.encode()).hexdigest()


def test_exact_substring_window_parameterization_monotone(spark, sf_dir):
    """The W knob (COVERAGE round-5 queue): a W-token duplicated window
    contains two (W-1)-token duplicated windows, so shrinking W can only
    grow (never shrink) each document's duplicated-token coverage — pin the
    monotonicity at W = 8 / 16 / 32 on the fixture, and that the planted
    near-dups are still fully covered at the larger window."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.dedup import DERIVED_OFFSET
    from cdc_postgresql_clickhouse_spark.queries.spans import dedup_exact_substring

    cov = {}
    for w in (8, 16, 32):
        cov[w] = {
            r.doc_id: r.dup_token_frac
            for r in dedup_exact_substring(spark, sf_dir, window_tokens=w).collect()
        }
    docs = set(cov[8]) & set(cov[16]) & set(cov[32])
    assert docs
    for d in docs:
        assert cov[8][d] >= cov[16][d] >= cov[32][d], (d, cov[8][d], cov[16][d], cov[32][d])
    # planted near-dups: the shared suffix is the whole derived doc, so any
    # derived doc with >= 32 tokens is still (near-)fully covered at W=32
    derived_covered = [
        v for k, v in cov[32].items() if k >= DERIVED_OFFSET and v > 0
    ]
    assert derived_covered and max(derived_covered) > 0.9
