"""Frozen phonetic + checksum kernels (functions/phonetic.py,
operators/checksum.py).

Pins the published NARA Soundex vectors and Luhn test numbers — these are
EXTERNAL goldens (not replays of the implementation), so the rule tables
themselves are what is under test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from extractors_metadata_spark.functions.phonetic import soundex
from extractors_metadata_spark.operators.checksum import luhn_sum, luhn_valid

# the NARA / Wikipedia published vectors, incl. the h/w collapse rules
SOUNDEX_VECTORS = [
    ("Robert", "R163"),
    ("Rupert", "R163"),
    ("Ashcraft", "A261"),   # s,c separated by h code ONCE
    ("Ashcroft", "A261"),
    ("Tymczak", "T522"),    # c,z adjacent same class code once
    ("Pfister", "P236"),    # first-letter duplicate drops
    ("Honeyman", "H555"),
    ("Wright", "W623"),     # initial W: following r-code SURVIVES
    ("Euler", "E460"),
    ("Gauss", "G200"),
    ("Hilbert", "H416"),
    ("Knuth", "K530"),
    ("Lloyd", "L300"),
    ("Lukasiewicz", "L222"),
    ("", ""),
    ("123", ""),
]


def test_soundex_published_vectors(spark):
    df = spark.createDataFrame(SOUNDEX_VECTORS, "name string, want string")
    bad = df.select(
        "name", "want", soundex(F.col("name")).alias("got")
    ).filter(F.col("got") != F.col("want")).collect()
    assert bad == [], [(r["name"], r["want"], r["got"]) for r in bad]


def test_soundex_case_and_noise_invariant(spark):
    df = spark.createDataFrame(
        [("ROBERT",), ("robert",), ("Ro-bert!",)], "name string"
    )
    got = {r[0] for r in df.select(soundex(F.col("name"))).collect()}
    assert got == {"R163"}


def test_luhn_published_numbers(spark):
    rows = [
        ("79927398713", 1),  # the canonical valid example
        ("79927398710", 0),
        ("79927398714", 0),
        ("49927398716", 1),
        ("18", 1),           # payload 1 -> doubled 2 -> check 8
        ("4539578763621486", 1),
    ]
    df = spark.createDataFrame(rows, "num string, want int")
    bad = df.select(
        "num", "want", luhn_valid("num").alias("got")
    ).filter(F.col("got") != F.col("want")).collect()
    assert bad == [], [(r["num"], r["want"], r["got"]) for r in bad]


def test_luhn_sum_hand_case(spark):
    # "18": from the right, 8 undoubled + 1 doubled (2) = 10
    df = spark.createDataFrame([("18",)], "num string")
    assert df.select(luhn_sum("num").alias("s")).collect()[0]["s"] == 10


def test_adler32_matches_zlib(spark):
    import zlib

    from extractors_metadata_spark.operators.checksum import adler32

    vals = ["Wikipedia", "a", "", "hello/world/123", "x" * 200]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["ck"]
        for r in df.select("s", adler32("s").alias("ck")).collect()
    }
    for v in vals:
        assert got[v] == zlib.adler32(v.encode("ascii")), v
