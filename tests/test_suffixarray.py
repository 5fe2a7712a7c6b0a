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
