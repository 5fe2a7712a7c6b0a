"""Frozen text normalization (functions/textnorm.py).

Contract: the Spark chain equals a Python `re` reference implementation of
the same frozen rules on adversarial inputs (the patterns live in the
Java==RE2==Python-re common subset), idempotence, and plan purity.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from extractors_metadata_spark.functions.textnorm import NORM_RULES, normalize_text


def _py_norm(s: str) -> str:
    for pat, rep in NORM_RULES:
        s = re.sub(pat, rep, s)
    return s


NASTY = [
    "",
    "   ",
    "\n\n\n\n\n",
    "plain text stays",
    "a  b\tc\t\td",
    "\r\nwin\r\nlines\rmac\r",
    "  lead and trail  ",
    "x\x00y\x01z\x1f\x7fq",
    "keep\ttab collapse \t mix",
    "line  \n  edge\n\n\n\nstack\n\n\n",
    " \n \t \n mixed outer \n\t\n ",
    "a\nb\n\nc\n\n\nd\n\n\n\ne",
    "ends with newline\n",
    "\ttab start",
    "unicode café — stays intact",
]


def test_matches_python_reference_on_adversarial_inputs(spark):
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(NASTY)), "t": NASTY}))
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_text(F.col("t")).alias("n")).collect()
    }
    for i, s in enumerate(NASTY):
        assert got[i] == _py_norm(s), (i, repr(s), repr(got[i]), repr(_py_norm(s)))


def test_idempotent(spark):
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(NASTY)), "t": NASTY}))
    once = df.select("i", normalize_text(F.col("t")).alias("n"))
    twice = once.select("i", normalize_text(F.col("n")).alias("n2"))
    rows = once.join(twice, "i").collect()
    assert all(r["n"] == r["n2"] for r in rows)


def test_structure_preserved(spark):
    s = "Para one, Case KEPT.\n\nPara two: punct! (kept)\n\nlist:\n- a\n- b"
    df = spark.createDataFrame(pd.DataFrame({"t": [s]}))
    out = df.select(normalize_text(F.col("t")).alias("n")).collect()[0]["n"]
    assert out == s  # already-normal text is a fixed point


def test_pure_codegen_no_shuffle(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": NASTY}))
    plan = (
        df.select(normalize_text(F.col("t")).alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
