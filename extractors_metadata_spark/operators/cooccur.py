"""Word co-occurrence + PMI — collocation mining over the corpus.

Engine-added corpus analytics (the vocabulary/tf-idf suite widened to pair
statistics): for every pair of words that appear in the same document,
count co-occurrences and score pointwise mutual information

    pmi(a, b) = ln( (c_ab * N) / (c_a * c_b) )

— the standard collocation / phrase-mining / embedding-prep signal.

Scale design (10^12 docs, 10^8-word vocab):
- presence rows are the DISTINCT (word, doc) pairs (the collapsed postings
  frame — one row per posting, never per token);
- the df BAND (``min_df <= df <= max_df``) is applied BEFORE the pair
  fan-out, and it is the scale contract: max_df caps a word's fan-out rows
  AND kills stopword pairs (which would otherwise dominate: the hottest
  pair is bounded by max_df co-occurrences), min_df drops the long tail
  that cannot reach ``min_pair``. After banding, the word-keyed df join
  CANNOT skew (every group <= max_df rows by construction);
- pairs come from the doc-keyed self-join of the banded presence frame
  (word_a < word_b) — per-doc fan-out is quadratic in the doc's BANDED
  vocabulary, the quantity the band bounds; the (a, b) count aggregate
  partial-combines map-side;
- PMI's ln runs in one Arrow pass and is emitted as 1e-9 fixed point
  (np.rint == round_even) — integer numerator/denominator stay exact
  int64 (< 2^53), the single division is correctly rounded in both
  engines, and the fixed-point margin absorbs NumPy-vs-libm ln ulp drift
  (the bm25 recipe; CLAUDE.md).

Reference analog: none (the reference computes no corpus statistics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index_build import doc_postings


def _pmi_fp_udf():
    @F.pandas_udf("long")
    def _pmi_fp(
        cab: pd.Series, ca: pd.Series, cb: pd.Series, n: pd.Series
    ) -> pd.Series:
        num = cab.to_numpy(np.int64) * n.to_numpy(np.int64)
        den = ca.to_numpy(np.int64) * cb.to_numpy(np.int64)
        return pd.Series(np.rint(np.log(num / den) * 1e9).astype(np.int64))

    return _pmi_fp


def pmi_pairs(
    docs: DataFrame,
    min_df: int = 1,
    max_df: int | None = None,
    min_pair: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(word_a, word_b, c_ab, c_a, c_b, pmi_fp) for banded word pairs with
    at least ``min_pair`` co-occurrences; word_a < word_b lexically."""
    pres = doc_postings(docs, text_col, id_col).select("word", "doc_id")
    n_docs = docs.select(id_col).distinct().count()
    wdf = pres.groupBy("word").agg(F.count(F.lit(1)).alias("df_docs"))
    if max_df is not None:
        wdf = wdf.filter(F.col("df_docs") <= max_df)
    wdf = wdf.filter(F.col("df_docs") >= min_df)
    band = pres.join(wdf, "word")
    a = band.select(
        F.col("word").alias("word_a"), F.col("df_docs").alias("c_a"), "doc_id"
    )
    b = band.select(
        F.col("word").alias("word_b"), F.col("df_docs").alias("c_b"), "doc_id"
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("word_a") < F.col("word_b"))
        .groupBy("word_a", "word_b", "c_a", "c_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_pair)
    )
    return pairs.select(
        "word_a",
        "word_b",
        "c_ab",
        "c_a",
        "c_b",
        _pmi_fp_udf()(
            F.col("c_ab"), F.col("c_a"), F.col("c_b"), F.lit(n_docs).cast("long")
        ).alias("pmi_fp"),
    )
