"""BM25 ranked retrieval over the engine's inverted index.

The query side of the index_build suite: given a small query table
(query_id, word), score documents with Okapi BM25 and return the top-k per
query — the retrieval/RAG primitive a webtext corpus engine serves.

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    s(t, d)     = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    bm25(q, d)  = sum_t s(t, d)

Scale design (10^12 docs, thousands of queries):
- postings are (word, doc)-keyed (``index_build.doc_postings`` — stopword
  skew cannot form at the aggregate);
- the QUERY TERMS are the tiny dim: corpus-wide df is computed once, then
  filtered to the query vocabulary by a broadcast join, and that
  (term, df, idf-inputs) frame — |distinct query terms| rows — broadcasts
  into the postings scan, so only candidate postings (sum of df over query
  terms) ever leave the scan;
- doc lengths join the CANDIDATE frame on doc_id (one shuffle of the
  candidate set — the classic scatter-gather; the corpus-sized doclen frame
  is never broadcast);
- one (query_id, doc_id)-keyed aggregate sums per-term scores, one window
  takes top-k over the per-query candidate lists.

Exactness design (the engine's cross-engine float rule): ln and the rational
BM25 chain are evaluated in ONE Arrow pass with NumPy, every input
(tf, df, dl, N) is an exact integer and avgdl an identical-path double, and
the per-(term, doc) score is HALF-EVEN rounded to 1e-9 fixed point
(np.rint == round_even) BEFORE the sum — so the aggregate is
order-independent int64 arithmetic and ranking/ties (score_fp desc, doc_id
asc) are deterministic in both engines.  NumPy's SIMD log drifts ~1 ulp
from DuckDB's libm ln on some inputs (measured in weighted_order_sample);
here the fixed-point rounding absorbs it with ~9 orders of margin — a
1-ulp score wobble is ~3e-7 fixed-point units vs the 0.5 rounding
threshold, so score_fp only diverges if a score sits within ~1e-6 of a
half-integer AND the engines' ln disagree there.

Reference analog: none (the reference computes no corpus statistics) —
this widens vocabulary/tf-idf/inverted_index to the serving-side ranker.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .index_build import doc_postings


def _score_fp_udf(k1: float, b: float):
    @F.pandas_udf("long")
    def score_fp(
        tf: pd.Series, df: pd.Series, dl: pd.Series, n_docs: pd.Series, avgdl: pd.Series
    ) -> pd.Series:
        tf_ = tf.to_numpy(np.float64)
        df_ = df.to_numpy(np.float64)
        dl_ = dl.to_numpy(np.float64)
        n_ = n_docs.to_numpy(np.float64)
        ad = avgdl.to_numpy(np.float64)
        # literal arithmetic order mirrored in the DuckDB oracle — do not
        # refactor (log1p, fused constants, etc. are NOT bit-equal)
        idf = np.log(1.0 + (((n_ - df_) + 0.5) / (df_ + 0.5)))
        denom = tf_ + (k1 * ((1.0 - b) + (b * (dl_ / ad))))
        score = idf * ((tf_ * (k1 + 1.0)) / denom)
        return pd.Series(np.rint(score * 1e9).astype(np.int64))

    return score_fp


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 -> (query_id, doc_id,
    score_fp, rank); ``score_fp`` is the exact 1e-9 fixed-point score sum.

    ``queries``: (query_id, word) pairs — terms must be unique per query
    (a repeated term would double-count; the distinct() here makes that a
    contract, not a silent bug). Frozen tokenization (casefold ->
    whitespace split) keeps scores consistent with the index/corpus suite.
    """
    from .pip_knn import _cache_scoped

    # postings feeds the doclen aggregate, the corpus df aggregate and the
    # candidate scan; doclen feeds the scalar stats collect and the
    # candidate join — persist both or the tokenize+explode+aggregate
    # replays per consumer (measured r6).
    # project BEFORE the persist: BM25 needs only tf — caching the full
    # doc_postings frame materializes the positions collect_list/sort for
    # nothing, and the persist blocks Catalyst from pruning it (r6)
    # ``postings``: optional precomputed (word, doc_id, n_hits) frame so
    # ensemble callers (hybrid_rrf) tokenize the corpus once.
    if postings is None:
        postings = _cache_scoped(
            "bm25_postings",
            doc_postings(docs, text_col, id_col).select(
                "word", "doc_id", "n_hits"
            ),
        )
    # corpus scalars: exact ints -> one tiny collect (bounded, 1 row)
    doclen = _cache_scoped(
        "bm25_doclen",
        postings.groupBy("doc_id").agg(F.sum("n_hits").alias("dl")),
    )
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
    ).collect()[0]
    n_docs = int(stats.n_docs)
    avgdl = float(stats.total_tokens) / float(n_docs)

    terms = queries.select("query_id", "word").distinct()
    # corpus-wide df, filtered to the query vocabulary (broadcast the tiny
    # term set INTO the vocab-sized df aggregate, then broadcast the result)
    wdf = postings.groupBy("word").agg(F.count(F.lit(1)).alias("df_docs"))
    term_df = wdf.join(
        F.broadcast(terms.select("word").distinct()), "word"
    )
    # (query_id, word, df_docs) — still query-dim sized; ONE broadcast join
    # against the postings scan emits only candidate postings
    qterms = terms.join(term_df, "word")
    cand = postings.join(F.broadcast(qterms), "word")
    scored = cand.join(doclen, "doc_id").select(
        "query_id",
        "doc_id",
        _score_fp_udf(k1, b)(
            F.col("n_hits").cast("double"),
            F.col("df_docs").cast("double"),
            F.col("dl").cast("double"),
            F.lit(float(n_docs)),
            F.lit(avgdl),
        ).alias("s_fp"),
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.sum("s_fp").alias("score_fp")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_fp", F.col("rank").cast("int").alias("rank"))
    )


# NDCG position discounts 1/log2(pos+1) as COMPILE-TIME 1e-9 fixed-point
# literals (positions 1..50): the transcendental never runs at query time,
# so both engines consume identical integer constants.
_NDCG_W = [int(round(1e9 / math.log2(p + 1))) for p in range(1, 51)]


def retrieval_eval(ranked: DataFrame, labels: DataFrame, k: int = 10) -> DataFrame:
    """Ranked-retrieval quality metrics per query -> (query_id, dcg_fp,
    idcg_fp, first_rel, n_rel) — the evaluation half of the retrieval
    suite (bm25_topk/rrf_fusion produce `ranked`; this scores it).

    ``ranked``: (query_id, doc_id, rank) with rank 1-based <= ``k``;
    ``labels``: (query_id, doc_id, rel) graded relevance (missing pairs
    are rel 0).  Emitted as EXACT sufficient statistics (the
    mann_kendall rule): dcg_fp / idcg_fp are int64 sums of
    gain * discount where gain = 2^rel - 1 (exact via the pow-cast
    idiom) and the discounts are the compile-time _NDCG_W literals —
    NDCG@k = dcg_fp / idcg_fp and MRR = 1 / first_rel stay
    consumer-side.  The IDEAL ordering re-ranks the RETRIEVED set by
    (gain desc, doc_id) — equal gains are interchangeable in DCG, so
    the tie-break cannot change idcg_fp, but freezing it keeps the
    row_number replay deterministic.  first_rel = smallest rank with
    positive gain, 0 when none (no relevant document retrieved).

    Scale shape: one left join against the (broadcastable) label table,
    two bounded per-query windows over <= k rows each, one query-keyed
    aggregate — evaluation cost is O(queries x k), independent of
    corpus size.
    """
    from pyspark.sql import Window

    w_arr = F.array(*[F.lit(w) for w in _NDCG_W[: int(k)]])
    j = (
        ranked.select("query_id", "doc_id", "rank")
        .join(labels, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "doc_id",
            "rank",
            (
                F.pow(F.lit(2.0), F.coalesce(F.col("rel"), F.lit(0))).cast("long")
                - 1
            ).alias("gain"),
        )
    )
    ipos = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("gain"), F.asc("doc_id"))
    )
    scored = j.select(
        "query_id",
        "rank",
        "gain",
        (F.col("gain") * F.element_at(w_arr, F.col("rank"))).alias("_d"),
        (F.col("gain") * F.element_at(w_arr, ipos)).alias("_i"),
    )
    return scored.groupBy("query_id").agg(
        F.sum("_d").alias("dcg_fp"),
        F.sum("_i").alias("idcg_fp"),
        F.coalesce(
            F.min(F.when(F.col("gain") > 0, F.col("rank"))), F.lit(0)
        ).alias("first_rel"),
        F.sum((F.col("gain") > 0).cast("long")).alias("n_rel"),
    )


def _ql_term_fp_udf(mu: float):
    @F.pandas_udf("long")
    def term_fp(
        tf: pd.Series, cf: pd.Series, dl: pd.Series, c_total: pd.Series
    ) -> pd.Series:
        tf_ = tf.to_numpy(np.float64)
        cf_ = cf.to_numpy(np.float64)
        dl_ = dl.to_numpy(np.float64)
        c_ = c_total.to_numpy(np.float64)
        # literal arithmetic order mirrored in the DuckDB oracle — do not
        # refactor; per-term 1e9 fixed point absorbs np.log-vs-libm ulp
        # drift (the bm25 rule)
        score = np.log((tf_ + (mu * (cf_ / c_))) / (dl_ + mu))
        return pd.Series(np.rint(score * 1e9).astype(np.int64))

    return term_fp


def ql_dirichlet_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    mu: float = 2000.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by query-likelihood with Dirichlet
    smoothing -> (query_id, doc_id, score_fp, rank) — the other classical
    probabilistic ranking function beside BM25 (Zhai & Lafferty):

        score(q, d) = sum_t ln((tf_td + mu * cf_t / |C|) / (dl_d + mu))

    over ALL query terms (missing terms contribute the background prior,
    which is what makes Dirichlet a proper language model — unlike BM25,
    absent terms still penalize long docs less). Candidates are docs with
    >= 1 query-term hit (no-hit docs differ only through their
    background-vs-length tradeoff and are out of scope by convention);
    for each candidate the full query vocabulary is expanded back in via
    a left join so zero-tf terms score exactly.

    Per-term scores are 1e9 fixed-point int64 (np.rint == round_even),
    summed as integers — order-free under any partitioning. Plan: the
    postings scan joins the broadcast query vocabulary once; candidate
    expansion is (candidates x query terms), both broadcast-sized; the
    collection stats are a 1-row cross join. Query terms must be unique
    per query (same contract as bm25_topk).
    """
    from .pip_knn import _cache_scoped

    # postings feeds doclen, cf and the hits scan; doclen feeds the scalar
    # collect and the score join — persist both (the bm25_topk rule, r6)
    # ``postings`` (word, doc_id, n_hits) skips the build for ensembles.
    if postings is None:
        postings = _cache_scoped(
            "ql_postings",
            doc_postings(docs, text_col, id_col).select(
                "word", "doc_id", F.col("n_hits").alias("tf")
            ),
        )
    else:
        postings = postings.select(
            "word", "doc_id", F.col("n_hits").alias("tf")
        )
    doclen = _cache_scoped(
        "ql_doclen", postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    )
    c_total = doclen.agg(F.sum("dl").alias("c")).collect()[0].c
    terms = queries.select("query_id", "word").distinct()
    # collection frequency, restricted to the query vocabulary before the
    # aggregate ships anywhere (broadcast the tiny term set into the scan)
    cf = (
        postings.join(F.broadcast(terms.select("word").distinct()), "word")
        .groupBy("word")
        .agg(F.sum("tf").alias("cf"))
    )
    hits = postings.join(F.broadcast(terms), "word").select(
        "query_id", "doc_id", "word", "tf"
    )
    cand = hits.select("query_id", "doc_id").distinct()
    expanded = (
        cand.join(terms, "query_id")
        .join(hits.select("query_id", "doc_id", "word", "tf"),
              ["query_id", "doc_id", "word"], "left")
        .select(
            "query_id",
            "doc_id",
            "word",
            F.coalesce("tf", F.lit(0)).alias("tf"),
        )
    )
    scored = (
        expanded.join(F.broadcast(cf), "word")
        .join(doclen, "doc_id")
        .select(
            "query_id",
            "doc_id",
            _ql_term_fp_udf(mu)(
                F.col("tf").cast("double"),
                F.col("cf").cast("double"),
                F.col("dl").cast("double"),
                F.lit(float(c_total)),
            ).alias("t_fp"),
        )
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.sum("t_fp").alias("score_fp")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "score_fp", F.col("rank").cast("int").alias("rank")
        )
    )


def hybrid_rrf(
    docs: DataFrame,
    queries: DataFrame,
    k_each: int = 20,
    k_out: int = 10,
    c: float = 60.0,
) -> DataFrame:
    """Two-ranker sparse ensemble -> (query_id, doc_id, r_bm25, r_ql,
    fused, hybrid_rank): BM25 and query-likelihood-Dirichlet top-k lists
    fused by reciprocal-rank fusion — the production serving pattern
    where two cheap rankers beat either alone (RRF needs only RANKS, so
    the two scoring scales never have to be calibrated).

    fused = sum over lists present of 1/(c + rank); a doc missing from
    one list contributes 0 from it (full outer fusion). Ranks are exact
    ints, so fused is an identical-path double of exact ints (bit-equal
    cross-engine — the rrf_fusion precedent); the output order is decided
    on (fused desc, doc_id) and emitted with integer ranks.

    Plan: the two rankers share the postings scan lineage; fusion is one
    (query, doc)-keyed full outer join of two k-bounded lists + one
    query-keyed window — all frames query-dimension sized.
    """
    from .pip_knn import _cache_scoped

    # ONE tokenize+postings build serves both rankers (r6): the corpus
    # scan + explode + (word, doc) aggregate dominated and ran twice
    # (once per ranker's own cache)
    shared = _cache_scoped(
        "hybrid_postings",
        doc_postings(docs, text_col="text", id_col="doc_id").select(
            "word", "doc_id", "n_hits"
        ),
    )
    b = bm25_topk(docs, queries, k=k_each, postings=shared).select(
        "query_id", "doc_id", F.col("rank").alias("r_bm25")
    )
    q = ql_dirichlet_topk(docs, queries, k=k_each, postings=shared).select(
        "query_id", "doc_id", F.col("rank").alias("r_ql")
    )
    j = b.join(q, ["query_id", "doc_id"], "full_outer")
    fused = (
        F.coalesce(
            F.lit(1.0) / (F.lit(c) + F.col("r_bm25").cast("double")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(c) + F.col("r_ql").cast("double")), F.lit(0.0)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        fused.desc(), F.col("doc_id").asc()
    )
    return (
        j.select(
            "query_id",
            "doc_id",
            F.coalesce("r_bm25", F.lit(0)).cast("int").alias("r_bm25"),
            F.coalesce("r_ql", F.lit(0)).cast("int").alias("r_ql"),
            fused.alias("fused"),
            F.row_number().over(w).cast("int").alias("hybrid_rank"),
        )
        .filter(F.col("hybrid_rank") <= k_out)
    )


def rbo_overlap(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 10,
    p_num: int = 9,
    p_den: int = 10,
) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    top-``k`` rankings per query, as EXACT integers — the top-weighted
    ranking-similarity measure for comparing retrieval strategies
    (here: does idf weighting actually change what users see?).

    Truncated form: RBO_k = (1-p) * sum_{d=1..k} p^(d-1) * |A_d ^ B_d| / d
    with persistence p = p_num/p_den. Every term is rational, so the sum
    scales to an exact integer by S = lcm(1..k) * p_den^k: a doc ranked
    ra in A and rb in B is inside both prefixes for every d >=
    max(ra, rb), so its total contribution is the coefficient SUFFIX SUM
    from max(ra, rb) — per matched doc ONE literal lookup, no depth
    fan-out. rbo_num / den = RBO_k (den emitted; full agreement gives
    1 - p^k by truncation, documented).

    Scale shape: one (query, doc) equi-join between two k-bounded
    ranking frames + one query-keyed aggregate — cost O(queries * k),
    corpus-size independent. int64 envelope: S < 2^63 needs
    lcm(1..k) * p_den^k < 9.2e18 (k=10, p=9/10: 2.52e13 — wide margin).
    """
    lcm = 1
    for d in range(1, k + 1):
        lcm = lcm * d // math.gcd(lcm, d)
    coef = [
        (p_den - p_num) * (lcm // d) * (p_num ** (d - 1)) * (p_den ** (k - d))
        for d in range(1, k + 1)
    ]
    den = lcm * p_den ** k
    suf = [sum(coef[m:]) for m in range(k)]  # suf[m-1] = sum_{d=m..k} coef_d

    a = rank_a.select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("_ra")
    ).filter(F.col("_ra") <= k)
    b = rank_b.select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("_rb")
    ).filter(F.col("_rb") <= k)
    m = F.greatest(F.col("_ra"), F.col("_rb"))
    contrib = F.element_at(
        F.array(*[F.lit(s).cast("long") for s in suf]), m
    )
    pairs = a.join(b, ["query_id", "doc_id"]).select(
        "query_id", contrib.alias("_c")
    )
    per_q = pairs.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap"),
        F.sum("_c").alias("rbo_num"),
    )
    qdim = rank_a.select("query_id").distinct()
    return qdim.join(per_q, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
        F.coalesce(F.col("rbo_num"), F.lit(0).cast("long")).alias("rbo_num"),
        F.lit(den).cast("long").alias("den"),
    )
