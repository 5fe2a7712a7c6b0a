"""Aho-Corasick automaton: independent-reference property tests.

The CLAUDE.md lesson (Soundex X digit-class): a shared-table oracle cannot
catch a wrong kernel both sides consume — the automaton needs a SECOND
derivation path.  Reference here: the definitional all-occurrence count
``sum(text.startswith(p, i) for i)``, reimplemented inline (not the
kernel's code path).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from extractors_metadata_spark.operators.ahocorasick import (
    _has_border,
    build_automaton,
)


def _walk_counts(goto: np.ndarray, out_mat: np.ndarray, text: str):
    """Test-local reimplementation of the scan walk (visits @ out_mat)."""
    visits = np.zeros(out_mat.shape[0], dtype=np.int64)
    s = 0
    for ch in text.encode("utf-8"):
        s = goto[s, ch]
        visits[s] += 1
    return visits @ out_mat


def _brute_counts(patterns, text):
    """Definitional ALL-occurrence count (overlapping included)."""
    return np.array(
        [
            sum(1 for i in range(len(text)) if text.startswith(p, i))
            for p in patterns
        ],
        dtype=np.int64,
    )


def test_border_detector():
    assert _has_border("window")  # w...w
    assert _has_border("aa")
    assert _has_border("abcab")
    assert not _has_border("spark")
    assert not _has_border("merge join")
    assert not _has_border("ab")


def test_borderless_enforced():
    with pytest.raises(ValueError, match="border"):
        build_automaton(["spark", "window"])


def test_registered_patterns_are_borderless():
    from oracles.shared import AHO_PATTERNS

    goto, out = build_automaton(AHO_PATTERNS)  # must not raise
    # sanity on a crafted line: every pattern embedded once
    text = " x ".join(AHO_PATTERNS)
    counts = _walk_counts(goto, out, text)
    assert (counts >= 1).all()
    np.testing.assert_array_equal(counts, _brute_counts(AHO_PATTERNS, text))


def test_counts_all_overlapping_occurrences():
    # overlap-capable patterns: the automaton must count ALL occurrences
    goto, out = build_automaton(["aa", "aba"], require_borderless=False)
    counts = _walk_counts(goto, out, "aaaa ababa")
    np.testing.assert_array_equal(counts, _brute_counts(["aa", "aba"], "aaaa ababa"))
    assert counts[0] == 3  # aaaa -> 3 overlapping 'aa'
    assert counts[1] == 2  # ababa -> 2 overlapping 'aba'


def test_nested_and_shared_prefix_patterns():
    pats = ["ab", "abc", "bc", "c"]
    goto, out = build_automaton(pats, require_borderless=False)
    for text in ["abcabc", "aabbcc", "abc", "", "xyz"]:
        np.testing.assert_array_equal(
            _walk_counts(goto, out, text), _brute_counts(pats, text)
        )


@settings(max_examples=200, deadline=None)
@given(
    text=st.text(alphabet="abc ", max_size=120),
    pats=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=4),
        min_size=1,
        max_size=6,
        unique=True,
    ),
)
def test_property_matches_definition(text, pats):
    goto, out = build_automaton(pats, require_borderless=False)
    np.testing.assert_array_equal(
        _walk_counts(goto, out, text), _brute_counts(pats, text)
    )
