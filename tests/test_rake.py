"""RAKE keyword extraction (operators/rake.rake_keywords)."""

from __future__ import annotations

import re
from collections import Counter


def _py_rake(text, stop, top_k=3):
    """Independent replay of the scoring rules."""
    import numpy as np

    toks = re.findall(r"[a-z0-9]+|[^a-z0-9\s]", text.lower())
    phrases, run = [], []
    for t in toks:
        if re.fullmatch(r"[a-z0-9]+", t) and t not in stop:
            run.append(t)
        else:
            if run:
                phrases.append(run)
            run = []
    if run:
        phrases.append(run)
    freq, deg = Counter(), Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    wfp = {w: int(np.rint(1e9 * deg[w] / freq[w])) for w in freq}
    scored = {" ".join(p): sum(wfp[w] for w in p) for p in phrases}
    ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(i + 1, ph, sc) for i, (ph, sc) in enumerate(ranked[:top_k])]


def _run(spark, docs, top_k=3):
    from extractors_metadata_spark.operators.rake import rake_keywords

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = rake_keywords(df, top_k=top_k)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["phrase"], r["score_fp"])
        )
    return {k: sorted(v) for k, v in got.items()}


def test_matches_independent_replay(spark):
    from extractors_metadata_spark.operators.rake import RAKE_STOPWORDS

    stop = frozenset(RAKE_STOPWORDS)
    docs = [
        (1, "Compatibility of systems of linear constraints over the "
            "set of natural numbers. Criteria of compatibility."),
        (2, "deep learning, deep networks; the deep deep sea"),
        (3, "the of and to is"),          # all stopwords -> no phrases
        (4, "alpha. beta! alpha? beta,"),  # tie scores -> phrase asc
    ]
    got = _run(spark, docs)
    for did, text in docs:
        expect = sorted(_py_rake(text, stop))
        if expect:
            assert got[did] == expect, did
        else:
            assert did not in got


def test_collocation_outranks_frequency(spark):
    # "hash join" always together (deg credit 2 each) beats lone "scan"
    # repeated more often (deg == freq -> score 1e9 per word).
    docs = [(1, "hash join. scan. scan. scan. hash join")]
    got = _run(spark, docs, top_k=1)
    assert got[1][0][1] == "hash join"
    # each of hash/join: freq 2, deg 4 -> 2e9; phrase = 4e9
    assert got[1][0][2] == 4_000_000_000


def test_null_and_empty_text(spark):
    docs = [(1, None), (2, ""), (3, "   ")]
    got = _run(spark, docs)
    assert got == {}
