"""Hand goldens for the surface-statistics screens
(operators/textscreen.py): pure-integer Flesch-Kincaid banding and the
encoding/mojibake triage."""

from __future__ import annotations


def test_readability_hand_golden(spark):
    """12 alternating aa/bb words, doc 0 (L=8): W=12, S=2, Y=6 ->
    fk_num = 39*144 + 1180*6*2 - 1559*2*12 = -17640, den 24, grade
    -7.35 -> 'basic'. All-integer path verified against hand arithmetic."""
    from extractors_metadata_spark.operators.textscreen import readability_stats

    df = spark.createDataFrame(
        [(0, "aa bb aa bb aa bb aa bb aa bb aa bb")], "doc_id long, text string"
    )
    r = readability_stats(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (12, 2, 6)
    assert (r["fk_num"], r["fk_den"]) == (-17640, 24)
    assert r["grade_band"] == "basic"


def test_readability_band_cutpoints(spark):
    """A vowel-dense long-sentence doc lands in 'advanced': single token
    repeated -> W=16, L=9 (doc 1) -> S=2; 'education' has 4 vowel groups
    (e, u, a, io) -> Y=64; num = 39*256 + 1180*64*2 - 1559*2*16 = 111136;
    den = 32; grade ~34.7."""
    from extractors_metadata_spark.operators.textscreen import readability_stats

    df = spark.createDataFrame(
        [(1, " ".join(["education"] * 16))], "doc_id long, text string"
    )
    r = readability_stats(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (16, 2, 64)
    assert r["fk_num"] == 39 * 256 + 1180 * 64 * 2 - 1559 * 2 * 16
    assert r["grade_band"] == "advanced"


def test_encoding_scan_probes_and_clean(spark):
    """doc 0 hits all three probe moduli -> 3 mojibake signatures, one
    replacement char, one control char; doc 1 is clean."""
    from extractors_metadata_spark.operators.textscreen import encoding_scan

    df = spark.createDataFrame(
        [(0, "plain words"), (1, "clean text")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in encoding_scan(df).collect()}
    assert (
        out[0]["n_mojibake"],
        out[0]["n_replacement"],
        out[0]["n_control"],
        out[0]["encoding_ok"],
    ) == (3, 1, 1, False)
    assert out[1] == {
        "doc_id": 1,
        "n_mojibake": 0,
        "n_replacement": 0,
        "n_control": 0,
        "encoding_ok": True,
    }
