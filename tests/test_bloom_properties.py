"""Algebraic properties of the Bloom construction (suite/quality.py),
model-checked in pure Python against the same md5 double-hash family —
no Spark in the loop, so hypothesis can explore freely.

1. Zero false negatives for ANY key set (the Bloom guarantee).
2. OR-mergeability: the filter of A ∪ B equals the bitwise OR of the
   filters of A and B — the property that makes the dim-side build a
   map-side-combining groupBy (partial filters over row slices merge
   by bit_or, which is exactly what Spark's partial aggregation does).
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from validation_database_spark.suite.quality import BLOOM_K, BLOOM_M

WORD = 63  # bits packed per signed-64 word (matches the engine)


def _positions(key: int):
    h = hashlib.md5(str(key).encode()).hexdigest()
    h1, h2 = int(h[:15], 16), int(h[16:31], 16)
    return [(h1 + i * h2) % BLOOM_M for i in range(BLOOM_K)]


def _build(keys):
    words: dict[int, int] = {}
    for k in set(keys):
        for p in _positions(k):
            words[p // WORD] = words.get(p // WORD, 0) | (1 << (p % WORD))
    return words


def _test(words, key: int) -> bool:
    return all(
        words.get(p // WORD, 0) & (1 << (p % WORD)) for p in _positions(key)
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9), max_size=50))
def test_no_false_negatives(keys):
    f = _build(keys)
    assert all(_test(f, k) for k in keys)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), max_size=30),
    st.lists(st.integers(min_value=0, max_value=10**9), max_size=30),
)
def test_or_mergeability(a, b):
    fa, fb, fu = _build(a), _build(b), _build(a + b)
    merged = {w: fa.get(w, 0) | fb.get(w, 0) for w in set(fa) | set(fb)}
    assert merged == fu
