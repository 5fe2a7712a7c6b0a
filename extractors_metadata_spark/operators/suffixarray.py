"""Per-document suffix array + longest repeated substring (LRS).

Engine-added webtext capability: the LRS is the sharpest intra-document
repetition signal — boilerplate loops, template echo, copy-paste spans —
the character-level complement of repetition_stats' n-gram ratios and
exact_substr's CROSS-document duplicate spans.  Gopher's repetition rules
threshold on exactly this family.

Kernel: the classic prefix-doubling suffix array (Manber-Myers 1990) —
rank by first 2^k chars, extend with the rank at offset 2^k, re-rank;
after ceil(log2(L)) stages the ranks are the full suffix order (all
suffixes distinct — different lengths — so the order is unique and no
tie-break policy exists to drift).  LCPs of ADJACENT suffixes via Kasai
et al. 2001's O(n) walk; LRS = max adjacent LCP (a classical identity:
any repeated substring is a common prefix of two suffixes, and the max
over all pairs is attained by suffix-order neighbors).  Texts truncate
to ``max_len`` BYTES (ASCII corpus; keeps the oracle's unrolled stage
count a literal) — truncation is part of the operator contract, stated
in the output's n_used.

One Arrow pass, zero shuffle: per-doc NumPy doubling (argsort/lexsort are
vectorized; the only python-level loop is over docs and Kasai's O(n)
walk).  Embarrassingly parallel over documents — the 100 TB shape.

Oracle twin: the SAME doubling recurrence unrolls as 8 generated CTE
stages (dense_rank per stage — the anti-diagonal/DTW discipline applied
to string indexing), then adjacent-pair LCP via the shared lcp_expr SQL
text (max_pow=256) — drift-impossible by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix order of the uint8 array s via prefix doubling; returns
    rank[i] in 0..n-1 (unique)."""
    n = len(s)
    rank = s.astype(np.int64)
    k = 1
    while k < n:
        r2 = np.full(n, -1, dtype=np.int64)
        r2[: n - k] = rank[k:]
        order = np.lexsort((r2, rank))
        key_r = rank[order]
        key_2 = r2[order]
        new = np.zeros(n, dtype=np.int64)
        bump = np.ones(n, dtype=np.int64)
        bump[0] = 0
        if n > 1:
            same = (key_r[1:] == key_r[:-1]) & (key_2[1:] == key_2[:-1])
            bump[1:] = (~same).astype(np.int64)
        dense = np.cumsum(bump)
        new[order] = dense
        rank = new
        k *= 2
    return rank


def _lrs_of(rank: np.ndarray, s: np.ndarray) -> int:
    """Max adjacent-suffix LCP (Kasai's walk)."""
    n = len(s)
    if n < 2:
        return 0
    sa = np.zeros(n, dtype=np.int64)
    sa[rank] = np.arange(n)
    best = 0
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = int(sa[r - 1])
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            if h > best:
                best = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return best


def suffix_lrs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 256,
) -> DataFrame:
    """Per document: (id, n_used, lrs_len) — n_used = truncated length,
    lrs_len = longest repeated substring length within the truncated
    prefix. Null/empty-safe."""

    @pandas_udf("struct<n_used: long, lrs_len: long>")
    def _f(texts: pd.Series) -> pd.DataFrame:
        n_out = np.zeros(len(texts), dtype=np.int64)
        l_out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if t is None or not isinstance(t, str) or not t:
                continue
            s = np.frombuffer(
                t.encode("utf-8")[: int(max_len)], dtype=np.uint8
            )
            n_out[i] = len(s)
            if len(s) >= 2:
                l_out[i] = _lrs_of(_suffix_array(s), s)
        return pd.DataFrame({"n_used": n_out, "lrs_len": l_out})

    res = df.select(F.col(id_col), _f(F.col(text_col)).alias("_r"))
    return res.select(
        id_col,
        F.col("_r.n_used").alias("n_used"),
        F.col("_r.lrs_len").alias("lrs_len"),
    )
