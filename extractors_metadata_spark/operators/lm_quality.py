"""n-gram language-model quality scoring — the CCNet-style perplexity filter.

Engine-added LLM-data-pipeline capability: the classic webtext curation
signal (CCNet, Wenzek et al. 2020; GPT-3 data work) scores every candidate
document by its perplexity under a small LM trained on a trusted slice, and
keeps the low-perplexity (fluent) tail.  This operator is that filter with
the LM itself trained in-engine: an add-k smoothed bigram model

    p(w2 | w1) = (c(w1, w2) + k) / (c(w1) + k * V)

fit on the training split, scoring each held-out document with its exact
bigram count, OOV-bigram count, and total log-probability, from which the
consumer derives mean NLL / perplexity (a ratio of the emitted exact ints).

Splits are deterministic (doc_id parity — the ``ab_test`` arm precedent), so
the whole operator is replayable cross-engine.

Float discipline (CLAUDE.md): each bigram's ln((c12+k)/(c1+kV)) is computed
from EXACT int64 numerator/denominator (< 2^53, so the int->double casts and
the single division are correctly rounded in every engine), emitted as
half-even 1e-9 fixed point per TERM (np.rint == DuckDB round_even; the rint
margin absorbs NumPy-SIMD-vs-libm ln ulp drift — the bm25 recipe), and only
then summed — int64 sums are order-independent, double sums are not (the
psi_drift / mutual_info recipe).

Scale design (10^12 docs):
- bigrams are extracted ARRAY-SIDE (filter -> slice/zip inside codegen):
  the explode emits only (doc_id, w1, w2) — narrow, never the text, and
  costs zero shuffle;
- the bigram count is (w1, w2)-keyed with map-side combine — a stopword's
  mass spreads over its successors, so the worst group is far smaller than
  the word's own frequency;
- context counts c(w1) re-aggregate the ALREADY-COLLAPSED bigram frame
  (sum of c12 per w1 — never a second pass over the data);
- V rides as a broadcast 1-row aggregate (no separate driver action);
- scoring is two LEFT equi-joins against count dims that are one row per
  key (no fan-out; broadcastable when the vocab fits, shuffle+AQE
  otherwise) + ONE Arrow pass for the fixed-point term, then a doc-keyed
  int-sum aggregate with map-side combine.

Reference analog: none (the reference computes no corpus statistics); this
completes the quality-scoring suite (quality_score, curation_filter, bm25)
with the model-based fluency signal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lm_term_fp_udf():
    @F.pandas_udf("long")
    def _term_fp(c12: pd.Series, c1: pd.Series, v: pd.Series) -> pd.Series:
        # exact int64 -> double casts; one correctly-rounded division; rint
        # margin absorbs ln ulp drift (bm25 recipe).  add-k with k=1.
        num = (c12.to_numpy(np.int64) + 1).astype(np.float64)
        den = (c1.to_numpy(np.int64) + v.to_numpy(np.int64)).astype(np.float64)
        return pd.Series(np.rint(np.log(num / den) * 1e9).astype(np.int64))

    return _term_fp


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, w1, w2) for every adjacent token pair — the frozen
    tokenization (casefold -> whitespace split -> drop empties), pairing
    done array-side so the narrow explode is the first row-expanding op."""
    arr = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    docs = docs.select(F.col(id_col).alias("doc_id"), arr.alias("arr"))
    n = F.size("arr")
    pairs = F.transform(
        F.slice("arr", 1, F.greatest(n - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at("arr", i + F.lit(2)).alias("w2")
        ),
    )
    return docs.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )


def ngram_lm_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score odd-doc_id documents under an add-1 bigram LM trained on the
    even-doc_id split.  Returns one row per scored document with >= 1
    bigram: (doc_id, n_bigrams, oov_bigrams, logprob_fp) where logprob_fp
    is the exact int64 sum of per-bigram 1e-9 fixed-point ln p(w2|w1)
    (negative; mean NLL = -logprob_fp / (1e9 * n_bigrams), perplexity =
    exp of that — consumer-side ratios of exact ints).  oov_bigrams counts
    pairs never seen in training (the backoff-mass diagnostic)."""
    big = _doc_bigrams(docs, text_col, id_col)
    train = big.filter(F.col("doc_id") % 2 == 0)
    score = big.filter(F.col("doc_id") % 2 == 1)

    c12 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # vocab size = distinct TOKENS of the train split (w2 catches each
    # doc's final token; w1 catches the first) — broadcast 1-row dim.
    vocab = (
        train.select(F.col("w1").alias("tok"))
        .unionByName(train.select(F.col("w2").alias("tok")))
        .agg(F.countDistinct("tok").alias("vsz"))
    )

    terms = (
        score.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.when(F.col("c12").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("oov"),
            _lm_term_fp_udf()(
                F.coalesce(F.col("c12"), F.lit(0)).cast("long"),
                F.coalesce(F.col("c1"), F.lit(0)).cast("long"),
                F.col("vsz").cast("long"),
            ).alias("term_fp"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("oov").alias("oov_bigrams"),
        F.sum("term_fp").alias("logprob_fp"),
    )


def kneser_ney_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 200,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram statistics — the state-of-the-art
    count-based LM smoother (Kneser & Ney 1995; Chen & Goodman 1999) —
    as EXACT integers, top-``k`` bigrams by count (ties on (w1, w2)).

    For discount D = 3/4 the interpolated probability

        P(w2|w1) = max(c - D, 0)/c(w1.) + D . N1+(w1.)/c(w1.)
                                            . N1+(.w2)/N1+(..)

    is the single rational p_num/p_den with

        p_num = max(4c - 3, 0) . N1+(..) + 3 . N1+(w1.) . N1+(.w2)
        p_den = 4 . c(w1.) . N1+(..)

    — the continuation counts (HOW MANY contexts a word follows, not
    how often) are what distinguishes KN from the add-1/Good-Turing
    family, and every term is an int64 product of counts, so the DuckDB
    oracle replays it exactly (the pack_sequences emit-integers rule).
    int64 envelope (the source_divergence discipline): the products
    4*c*N1+(..) and 3*N1+(w.)*N1+(.w) must stay < 2^63 — safe while
    max bigram count x distinct-bigram count < ~2.3e18 (any single
    corpus shard; at 10^12-doc scale compute per shard and merge the
    marginals, which are sums).

    Plan: one bigram-keyed hash agg, then three SMALL re-aggs of that
    frame (history, continuation, type total — each strictly smaller
    than the bigram frame), two hash joins back + one 1-row broadcast.
    Scale shape: the only corpus-sized exchange is the first agg; at
    100 TB the bigram frame is the working set and everything else is
    its marginals."""
    bg = _doc_bigrams(docs, text_col, id_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    hist = c12.groupBy("w1").agg(
        F.sum("c").alias("hist_count"),
        F.count("*").alias("follow_types"),
    )
    prec = c12.groupBy("w2").agg(F.count("*").alias("prec_types"))
    types = c12.agg(F.count("*").alias("bigram_types"))
    return (
        c12.join(hist, "w1")
        .join(prec, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("c"),
            F.col("hist_count").cast("long").alias("hist_count"),
            F.col("follow_types").cast("long").alias("follow_types"),
            F.col("prec_types").cast("long").alias("prec_types"),
            F.col("bigram_types").cast("long").alias("bigram_types"),
            (
                F.greatest(F.col("c") * 4 - 3, F.lit(0))
                * F.col("bigram_types")
                + F.lit(3) * F.col("follow_types") * F.col("prec_types")
            ).cast("long").alias("p_num"),
            (F.lit(4) * F.col("hist_count") * F.col("bigram_types"))
            .cast("long")
            .alias("p_den"),
        )
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(k)
    )


def ccnet_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing -> (doc_id, lang, n_bigrams,
    nll_milli, bucket): rank every scored document within its language by
    LM perplexity and split into head / middle / tail tertiles — the
    published CommonCrawl curation recipe (Wenzek et al.): 'head' is the
    cleanest third a pretraining mix samples preferentially.

    The ranking key is the exact-integer mean NLL in milli-nats per
    bigram, ``(-logprob_fp) * 1000 div (n_bigrams * 1e9)`` — a pure int64
    floor division of the fixed-point LM output, so ordering (and every
    bucket edge) is bit-identical in any engine; key ties break on
    doc_id. Tertile edges are the integer rule 3r <= n / 3r <= 2n.

    Plan: ngram_lm_score (one postings-shaped pass) + a lang join + one
    per-lang window — the window partitions on the corpus's natural
    shard key, so at 100 TB each language ranks independently."""
    scores = ngram_lm_score(docs, text_col, id_col)
    lang = docs.select(
        F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
    )
    j = scores.join(lang, "doc_id").withColumn(
        "nll_milli",
        F.expr("((0 - logprob_fp) * 1000) div (n_bigrams * 1000000000)"),
    )
    wo = Window.partitionBy("lang").orderBy(
        F.col("nll_milli").asc(), F.col("doc_id").asc()
    )
    wp = Window.partitionBy("lang")
    ranked = j.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "nll_milli",
        F.row_number().over(wo).alias("r"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "nll_milli",
        F.when(F.col("r") * 3 <= F.col("n"), "head")
        .when(F.col("r") * 3 <= 2 * F.col("n"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
