"""Hand-computed goldens for the line-level web-cleaning suite
(operators/weblines.py): deterministic segmentation + probe augmentation,
the C4 first-match line rules + document gate, and host-level boilerplate
detection."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_doc_lines_segmentation_and_probes(spark):
    """doc 0 (L=8): 10 tokens -> lines of 8 and 2; line 0 takes ALL THREE
    injection probes (0*k + 0 == 0 mod every modulus) and no terminal dot
    (0 % 5 == 0); line 1 gets only the dot."""
    from extractors_metadata_spark.operators.weblines import doc_lines

    text = " ".join(f"w{i}" for i in range(1, 11))
    out = {
        r["line_idx"]: r["txt"]
        for r in doc_lines(_docs(spark, [(0, text, "a")])).collect()
    }
    assert out[0] == (
        "w1 w2 w3 w4 w5 w6 w7 w8 javascript required { lorem ipsum dolor"
    )
    assert out[1] == "w9 w10."


def test_c4_filter_hand_golden(spark):
    """doc 0: both kill flags + 0 kept lines; doc 1 (L=9, 30 tokens):
    3 full kept lines + 1 too-short line -> doc_keep."""
    from extractors_metadata_spark.operators.weblines import c4_line_filter

    rows = [
        (0, " ".join(f"w{i}" for i in range(1, 11)), "a"),
        (1, " ".join(f"v{i}" for i in range(1, 31)), "a"),
    ]
    out = {r["doc_id"]: r.asDict() for r in c4_line_filter(_docs(spark, rows)).collect()}
    d0 = out[0]
    assert (d0["n_lines"], d0["n_kept"], d0["n_no_punct"], d0["n_too_short"]) == (
        2, 0, 1, 1,
    )
    assert d0["has_brace"] and d0["has_lorem"] and not d0["doc_keep"]
    # doc 1: lines 0-2 are 9 words + '.', line 3 is 3 words + '.'
    # ((1 + i) % 5 != 0 for i in 0..3); no probe moduli hit
    d1 = out[1]
    assert (d1["n_lines"], d1["n_kept"], d1["n_too_short"]) == (4, 3, 1)
    assert (
        not d1["has_brace"] and not d1["has_lorem"] and d1["doc_keep"]
    )


def test_boilerplate_header_detection(spark):
    """Even docs carry the per-host nav header: 2 of 4 docs on host 'a'
    (50% >= 20%) -> exactly those docs report one boilerplate line;
    natural lines are all distinct and never flag."""
    from extractors_metadata_spark.operators.weblines import boilerplate_lines

    rows = [
        (i, " ".join(f"d{i}t{j}" for j in range(1, 13)), "a") for i in range(4)
    ]
    out = {
        r["doc_id"]: (r["n_lines"], r["n_boiler"])
        for r in boilerplate_lines(_docs(spark, rows)).collect()
    }
    # L = 8 + i%5: doc0 8 -> 2 lines +header; doc1 9 -> 2; doc2 10 -> 2
    # +header; doc3 11 -> 2
    assert out[0] == (3, 1)
    assert out[1] == (2, 0)
    assert out[2] == (3, 1)
    assert out[3] == (2, 0)
