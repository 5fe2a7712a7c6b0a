from __future__ import annotations

import math

from extractors_metadata_spark.operators.dsir import dsir_select


def _py_ref(rows, target_lang, buckets, k):
    """Independent Python-int/float replay of the DSIR score."""
    from extractors_metadata_spark.functions.vhash import M31, MIX_C1, MIX_C2, P31

    def poly(s):
        h = 0
        for c in s:
            h = (h * 131 + ord(c)) % P31
        return h

    def mix31(z):
        z ^= z >> 16
        z = (z * MIX_C1) % M31
        z ^= z >> 13
        z = (z * MIX_C2) % M31
        return z ^ (z >> 16)

    toks = []
    for doc_id, lang, text in rows:
        for t in text.strip().lower().split():
            if t:
                toks.append((doc_id, lang == target_lang, mix31(poly("dsir:" + t)) % buckets))
    rb, tb = {}, {}
    for _, is_t, b in toks:
        rb[b] = rb.get(b, 0) + 1
        if is_t:
            tb[b] = tb.get(b, 0) + 1
    tt = sum(tb.values())
    rr = sum(rb.values())

    def fp(num, den):
        v = math.log(num / den) * 1e9
        f = math.floor(v)
        r = v - f
        if r > 0.5 or (r == 0.5 and (f + 1) % 2 == 0):
            f += 1
        return f

    w = {b: fp(tb.get(b, 0) + 1, tt + buckets) - fp(rb[b] + 1, rr + buckets) for b in rb}
    sc = {}
    ntk = {}
    for doc_id, _, b in toks:
        sc[doc_id] = sc.get(doc_id, 0) + w[b]
        ntk[doc_id] = ntk.get(doc_id, 0) + 1
    ranked = sorted(sc, key=lambda d: (-sc[d], d))[:k]
    return {d: (sc[d], ntk[d]) for d in ranked}


def test_matches_python_replay_and_ranks_targets_first(spark):
    rows = []
    for i in range(30):
        if i % 3 == 0:
            rows.append((i, "en", "alpha beta gamma delta alpha beta"))
        elif i % 3 == 1:
            rows.append((i, "de", "zug bahn strasse zug bahn"))
        else:
            rows.append((i, "fr", "alpha zug mixed beta bahn"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["score_fp"], r["n_tokens"])
        for r in dsir_select(df, buckets=32, k=12).collect()
    }
    ref = _py_ref(rows, "en", 32, 12)
    assert got == ref
    # the en-vocabulary docs must outrank the de-vocabulary docs
    en_docs = {i for i in range(30) if i % 3 == 0}
    assert en_docs <= set(got)


def test_topk_tiebreak_by_doc_id(spark):
    # identical texts -> identical scores; the k cut must take low doc_ids
    rows = [(i, "en" if i < 2 else "de", "same same text") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = sorted(r["doc_id"] for r in dsir_select(df, buckets=16, k=4).collect())
    assert got == [0, 1, 2, 3]


def test_partitioning_invariance(spark):
    rows = [
        (i, ["en", "de", "fr"][i % 3], f"tok{i % 7} tok{i % 5} tok{i % 11} filler")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = {(r["doc_id"], r["score_fp"]) for r in dsir_select(df.coalesce(1), k=20).collect()}
    b = {(r["doc_id"], r["score_fp"]) for r in dsir_select(df.repartition(16), k=20).collect()}
    assert a == b
