"""Portable text primitives, defined once for Spark and mirrored in DuckDB SQL.

Every helper here has an *exactly equivalent* SQL formulation used by the
oracle twins in ``queries/``; determinism across engines is the design
constraint (md5 for hashing — identical hex in Spark and DuckDB; pure integer
arithmetic for derived hash values; no engine-specific hash functions).

All of it is built-in Catalyst expressions — no Python UDFs — so tokenization
and hashing run inside whole-stage codegen at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"

# Stopword list shared with the oracle SQL (keep in sync with queries/text.py).
STOPWORDS = ("the", "a", "or", "and", "of")


def tokens(col: Column | str) -> Column:
    """Normalized word tokens: lowercase, non-alphanumeric → space, split,
    drop empties. DuckDB twin:
    ``list_filter(str_split_regex(trim(regexp_replace(lower(x),
    '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> '')``
    """
    c = F.col(col) if isinstance(col, str) else col
    raw = F.split(F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " ")), " ")
    return F.filter(raw, lambda t: t != "")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as space-joined strings; empty array when the
    document has fewer than ``n`` tokens. 1-based element_at, guarded so the
    sequence is never descending. DuckDB twin:
    ``list_filter(list_transform(range(1, len(t)-(n-2)),
    i -> t[i] || ' ' || ... || t[i+n-1]), s -> s IS NOT NULL)``
    """
    parts = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])  # noqa: E731
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), parts),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(col: Column, n: int = 4) -> Column:
    """Character n-grams of an (already normalized) string; empty array if
    shorter than ``n``. DuckDB twin:
    ``list_transform(range(1, len(s)-(n-2)), i -> s[i:i+n-1])`` (or substr)."""
    c = col
    return F.when(
        F.length(c) >= n,
        F.transform(F.sequence(F.lit(1), F.length(c) - (n - 1)), lambda i: F.substring(c, i, n)),
    ).otherwise(F.array().cast("array<string>"))


def normalized_text(col: Column | str) -> Column:
    """Lowercased, punctuation collapsed to single spaces, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def hex_nibble(ch: Column) -> Column:
    """Value 0..15 of one lowercase hex character — portable via string
    position: ``instr('0123456789abcdef', ch) - 1`` in both engines."""
    return F.instr(F.lit(HEX_DIGITS), ch) - F.lit(1)
