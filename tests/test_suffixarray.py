"""Suffix-array LRS kernel: independent-reference property tests
(the second-derivation-path rule)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from extractors_metadata_spark.operators.suffixarray import (
    _lrs_of,
    _suffix_array,
)


def _brute_lrs(t: str) -> int:
    """Definitional LRS: longest length l such that some substring of
    length l occurs at >= 2 (possibly overlapping) positions."""
    n = len(t)
    for length in range(n - 1, 0, -1):
        seen = set()
        for i in range(n - length + 1):
            sub = t[i : i + length]
            if sub in seen:
                return length
            seen.add(sub)
    return 0


def _kernel_lrs(t: str) -> int:
    s = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if len(s) < 2:
        return 0
    return _lrs_of(_suffix_array(s), s)


def test_suffix_array_is_sorted_order():
    t = "banana"
    s = np.frombuffer(t.encode(), dtype=np.uint8)
    rank = _suffix_array(s)
    suffixes = sorted(t[i:] for i in range(len(t)))
    for i in range(len(t)):
        assert suffixes[rank[i]] == t[i:]


def test_known_cases():
    assert _kernel_lrs("banana") == 3  # "ana" (overlapping)
    assert _kernel_lrs("aaaa") == 3  # "aaa"
    assert _kernel_lrs("abcd") == 0
    assert _kernel_lrs("abab") == 2
    assert _kernel_lrs("a") == 0
    assert _kernel_lrs("") == 0


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abc", max_size=40))
def test_property_matches_definition(t):
    assert _kernel_lrs(t) == _brute_lrs(t)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="ab ", min_size=41, max_size=120))
def test_property_longer_strings(t):
    assert _kernel_lrs(t) == _brute_lrs(t)


def test_period_known():
    from extractors_metadata_spark.operators.suffixarray import _border_len

    def period(t):
        s = np.frombuffer(t.encode(), dtype=np.uint8)
        return len(s) - _border_len(s) if len(s) else 0

    assert period("abcabcab") == 3
    assert period("aaaa") == 1
    assert period("abcd") == 4
    assert period("ab") == 2


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab", min_size=1, max_size=60))
def test_period_matches_definition(t):
    from extractors_metadata_spark.operators.suffixarray import _border_len

    s = np.frombuffer(t.encode(), dtype=np.uint8)
    got = len(s) - _border_len(s)
    n = len(t)
    want = min(p for p in range(1, n + 1) if t[: n - p] == t[p:])
    assert got == want


def _brute_bwt_runs(t: str) -> int:
    n = len(t)
    if n == 0:
        return 0
    order = sorted(range(n), key=lambda i: t[i:])
    bwt = [t[i - 1] if i > 0 else "\x00" for i in order]
    return 1 + sum(1 for a, b in zip(bwt, bwt[1:]) if a != b)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc", min_size=1, max_size=60))
def test_bwt_runs_matches_definition(t):
    from extractors_metadata_spark.operators.suffixarray import (
        _suffix_array,
    )

    s = np.frombuffer(t.encode(), dtype=np.uint8)
    rank = _suffix_array(s)
    n = len(s)
    sa = np.zeros(n, dtype=np.int64)
    sa[rank] = np.arange(n)
    bwt = np.where(sa > 0, s[sa - 1].astype(np.int64), -1)
    got = 1 + int(np.count_nonzero(bwt[1:] != bwt[:-1]))
    assert got == _brute_bwt_runs(t)
