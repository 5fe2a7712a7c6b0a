"""Gale-Shapley: independent stability verification (no blocking pair)
— the second-derivation-path rule: stability is checked from the
DEFINITION, not by replaying the algorithm."""

from __future__ import annotations

import numpy as np
import pytest

from extractors_metadata_spark.operators.matching import gale_shapley


def _check_stable(matrix_rows, assign):
    """assert no blocking pair under (count DESC, name ASC) orders."""
    c = {(s, l): v for s, l, v in matrix_rows}
    sources = sorted({s for s, _, _ in matrix_rows})
    langs = sorted({l for _, l, _ in matrix_rows})
    s_pref = {
        s: {l: i for i, l in enumerate(
            sorted(langs, key=lambda l: (-c[(s, l)], l)))}
        for s in sources
    }
    l_pref = {
        l: {s: i for i, s in enumerate(
            sorted(sources, key=lambda s: (-c[(s, l)], s)))}
        for l in langs
    }
    holder = {l: s for s, l in assign.items()}
    assert len(assign) == min(len(sources), len(langs))
    for s in sources:
        for l in langs:
            if assign.get(s) == l:
                continue
            s_prefers = s_pref[s][l] < s_pref[s][assign[s]]
            h = holder.get(l)
            l_prefers = h is None or l_pref[l][s] < l_pref[l][h]
            assert not (s_prefers and l_prefers), (
                f"blocking pair ({s}, {l})"
            )


@pytest.mark.parametrize("seed", [0, 5])
def test_stability_random_matrices(spark, seed):
    rng = np.random.RandomState(seed)
    sources = [f"s{i}" for i in range(5)]
    langs = [f"l{i}" for i in range(5)]
    rows = [
        (s, l, int(rng.randint(0, 30)))
        for s in sources
        for l in langs
    ]
    m = spark.createDataFrame(rows, "source string, lang string, c long")
    out = gale_shapley(m, rounds=25).collect()
    assign = {r["source"]: r["lang"] for r in out}
    _check_stable(rows, assign)
    # pref_rank consistency: assigned lang is at that 1-based position
    c = {(s, l, ): v for s, l, v in rows}
    for r in out:
        order = sorted(langs, key=lambda l: (-c[(r["source"], l)], l))
        assert order[r["pref_rank"] - 1] == r["lang"]
