"""Aho-Corasick multi-pattern scan — the single-pass completion of the
blocklist stage.

``blocklist_hits`` (operators/blocklist.py) counts K phrases as K literal
codegen expressions — the right plan for a broadcast-sized blocklist, but
each extra phrase adds a full replace() pass over the text.  Its docstring
names the documented path past codegen limits: "one Aho-Corasick Arrow pass
over mapInPandas".  This module IS that path: a real Aho-Corasick automaton
(Aho & Corasick 1975, the classic goto/fail/output construction) built
driver-side over the pattern set and run over every document in ONE Arrow
pass — cost O(total chars + matches), INDEPENDENT of K.  At web scale
(thousands of blocklist phrases x TBs of text) this is the difference
between one scan and thousands.

Reference analog: none (the reference gates on metadata presence only);
this completes the engine's trust-and-safety surface the way pip_bigdim
completed pip_contains — same semantics, the no-broadcast/no-per-pattern
regime.

Exactness / oracle twin: the kernel counts ALL occurrences (overlapping
included — the automaton's output function fires on every match).  The SQL
twin counts via the replace-length identity, which is NON-overlapping
leftmost counting.  The two agree exactly iff no pattern can overlap
itself, i.e. every pattern is BORDERLESS (no proper prefix == suffix):
a borderless string's occurrences can never overlap (an overlap of length
L would exhibit a border of length L).  ``build_automaton`` verifies this
when ``require_borderless=True`` (the default for oracle-checked call
sites) so count parity is enforced by construction, not by hope.
Cross-pattern containment/overlap is irrelevant — per-pattern counts are
independent.

Kernel shape: the state walk is inherently sequential per document (each
transition depends on the previous state), so the per-char step is a tight
Python loop over a dense int32 goto table; everything around it is
vectorized — the visited-state histogram uses ``np.add.at`` and per-pattern
counts collapse to ONE integer matmul ``visit_counts @ out_matrix`` (counts
of patterns ending at-or-below each state via fail-chain closure,
precomputed once driver-side).  Null-safe (pandas UDFs see full batches
even under F.when — CLAUDE.md).  Scale: embarrassingly parallel over
documents, zero shuffle, one Arrow pass; the automaton (states x alphabet
int32) is closure-captured and broadcast with the task binary — for
state counts beyond executor memory the documented path is sharding the
pattern set (counts are per-pattern independent, so shards union).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _has_border(p: str) -> bool:
    """True iff p has a proper border (prefix == suffix, 0 < len < |p|)."""
    # KMP failure of the last position
    n = len(p)
    fail = [0] * n
    k = 0
    for i in range(1, n):
        while k and p[i] != p[k]:
            k = fail[k - 1]
        if p[i] == p[k]:
            k += 1
        fail[i] = k
    return fail[-1] > 0


def build_automaton(
    patterns: Sequence[str], require_borderless: bool = True
):
    """Build the dense goto/fail/output tables.

    Returns (goto: int32[states, 256], out_matrix: int64[states, K],
    char_map: identity over bytes — patterns and text are matched as
    UTF-8 bytes).  ``out_matrix[s, j]`` = how many times pattern j ends
    at state s INCLUDING via the fail chain (the closure), so a document
    walk only needs the visited-state histogram.
    """
    if not patterns:
        raise ValueError("build_automaton: empty pattern list")
    if any(not p for p in patterns):
        # ADVICE r5: '' would hit fail[-1] (IndexError) in _has_border and
        # divide-by-zero in the oracle's // plen — reject it cleanly
        raise ValueError("build_automaton: empty-string pattern")
    if len(set(patterns)) != len(patterns):
        raise ValueError("build_automaton: duplicate patterns")
    if require_borderless:
        bad = [p for p in patterns if _has_border(p)]
        if bad:
            raise ValueError(
                f"patterns with self-border (overlap-capable, oracle "
                f"parity would break): {bad!r}"
            )
    pats = [p.encode("utf-8") for p in patterns]
    # trie
    goto_d: list[dict[int, int]] = [{}]
    out_end: list[list[int]] = [[]]
    for j, p in enumerate(pats):
        s = 0
        for ch in p:
            nxt = goto_d[s].get(ch)
            if nxt is None:
                nxt = len(goto_d)
                goto_d[s][ch] = nxt
                goto_d.append({})
                out_end.append([])
            s = nxt
        out_end[s].append(j)
    n_states = len(goto_d)
    k = len(pats)
    # BFS fail links + dense goto (the classic conversion to a DFA)
    fail = np.zeros(n_states, dtype=np.int32)
    goto = np.zeros((n_states, 256), dtype=np.int32)
    out_mat = np.zeros((n_states, k), dtype=np.int64)
    for s, js in enumerate(out_end):
        for j in js:
            out_mat[s, j] = 1
    from collections import deque

    q = deque()
    for ch, nxt in goto_d[0].items():
        goto[0, ch] = nxt
        q.append(nxt)
    while q:
        s = q.popleft()
        out_mat[s] += out_mat[fail[s]]
        for ch in range(256):
            nxt = goto_d[s].get(ch)
            if nxt is not None:
                fail[nxt] = goto[fail[s], ch]
                goto[s, ch] = nxt
                q.append(nxt)
            else:
                goto[s, ch] = goto[fail[s], ch]
    return goto, out_mat


def _scan_udf(goto: np.ndarray, out_mat: np.ndarray):
    n_states, k = out_mat.shape

    @pandas_udf(
        "struct<total_hits: long, distinct_hits: long, top_pid: long>"
    )
    def _f(texts: pd.Series) -> pd.DataFrame:
        n = len(texts)
        tot = np.zeros(n, dtype=np.int64)
        dis = np.zeros(n, dtype=np.int64)
        top = np.full(n, -1, dtype=np.int64)
        g = goto
        for i, t in enumerate(texts):
            if t is None or not isinstance(t, str) or not t:
                continue
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            visits = np.zeros(n_states, dtype=np.int64)
            s = 0
            for ch in data:  # sequential by nature; table lookup per char
                s = g[s, ch]
                visits[s] += 1
            counts = visits @ out_mat  # one exact integer matmul
            total = int(counts.sum())
            if total > 0:
                tot[i] = total
                dis[i] = int((counts > 0).sum())
                top[i] = int(np.argmax(counts))  # ties -> min pid
        return pd.DataFrame(
            {"total_hits": tot, "distinct_hits": dis, "top_pid": top}
        )

    return _f


def aho_scan(
    df: DataFrame,
    patterns: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document multi-pattern scan -> (id, total_hits, distinct_hits,
    top_pid): total occurrences over all patterns, number of distinct
    patterns hit, and the most frequent pattern index (ties -> smallest
    index; -1 when nothing matches).  One Arrow pass, no shuffle."""
    goto, out_mat = build_automaton(patterns)
    res = df.select(
        F.col(id_col),
        _scan_udf(goto, out_mat)(F.col(text_col)).alias("_r"),
    )
    return res.select(
        id_col,
        F.col("_r.total_hits").alias("total_hits"),
        F.col("_r.distinct_hits").alias("distinct_hits"),
        F.col("_r.top_pid").alias("top_pid"),
    )
