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


def _g2_fp_udf():
    @F.pandas_udf("long")
    def _g2_fp(
        k11: pd.Series, c1: pd.Series, c2: pd.Series, n: pd.Series
    ) -> pd.Series:
        # Dunning's G2 over the 2x2 bigram contingency table, each cell
        # term k * ln((k/row) * (N/col)) formed FACTOR-WISE (the
        # source_divergence rule: every factor a correctly-rounded
        # division of exact int64 counts), fixed-pointed PER TERM at
        # 1e6 half-even (np.rint == round_even) then summed as ints —
        # scale deliberately 1e6 not 1e9: the k * ln(...) product
        # amplifies ln's 1-ulp drift by k (the idw lesson), so the
        # margin holds to ~1e9 total bigrams (err ~ N*|ln|*2^-52*1e6
        # < 0.5), documented envelope.
        a = k11.to_numpy(np.int64)
        r1 = c1.to_numpy(np.int64)
        cc = c2.to_numpy(np.int64)
        m = n.to_numpy(np.int64)
        k12 = r1 - a
        k21 = cc - a
        k22 = m - r1 - cc + a

        def term(k, r, c):
            k = k.astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.rint(k * np.log((k / r) * (m / c)) * 1e6)
            return np.where(k > 0, t, 0.0)

        s = (
            term(a, r1, cc)
            + term(k12, r1, m - cc)
            + term(k21, m - r1, cc)
            + term(k22, m - r1, m - cc)
        )
        return pd.Series((2.0 * s).astype(np.int64))

    return _g2_fp


def dunning_g2(
    docs: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dunning log-likelihood (G2) collocation scoring over ADJACENT word
    bigrams (Dunning 1993) -> (w1, w2, k11, c1, c2, g2_fp): the
    significance-weighted upgrade of raw PMI (pmi_pairs scores unordered
    doc co-occurrence; G2 scores ORDERED adjacency against the
    independence null, robust at low counts — the collocation extractor
    corpus linguists actually rank by).

    Cells: k11 = c(w1 w2); row 1 = c1 = c(w1 *); col 1 = c2 = c(* w2);
    N = total bigrams; G2 = 2 * sum k_ij ln(k_ij N / (row_i col_j)),
    0-cells contribute 0.  Emitted as the per-term 1e6 half-even fixed
    point summed exactly (the mutual_info discipline).

    Plan: ONE token-position explode -> bigram-keyed hash agg (the only
    data-sized exchange; map-side combine); marginals RE-AGGREGATE the
    collapsed bigram frame; the w1/w2 marginal joins are word-keyed
    (AQE handles the transient stopword skew); one Arrow pass for the
    four terms.  fixed-point envelope ~1e9 bigrams (see _g2_fp_udf)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    wd = docs.select(F.col(id_col), toks.alias("tk")).filter(F.size("tk") >= 2)
    idx = F.sequence(F.lit(1), F.size("tk") - 1)
    bg = wd.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("tk", i).alias("w1"),
                    F.element_at("tk", i + F.lit(1)).alias("w2"),
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2").filter(
        (F.length("w1") > 0) & (F.length("w2") > 0)
    )
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("k11"))
    r1 = big.groupBy("w1").agg(F.sum("k11").alias("c1"))
    c2 = big.groupBy("w2").agg(F.sum("k11").alias("c2"))
    n = big.agg(F.sum("k11").alias("n"))
    return (
        big.join(r1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
        .filter(F.col("k11") >= min_count)
        .select(
            "w1", "w2", "k11", "c1", "c2",
            _g2_fp_udf()(
                F.col("k11"), F.col("c1"), F.col("c2"), F.col("n")
            ).alias("g2_fp"),
        )
    )
