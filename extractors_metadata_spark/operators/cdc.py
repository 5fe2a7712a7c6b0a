"""Content-defined chunking (CDC) — rolling-hash chunk boundaries for
sub-document dedup, the LBFS/rsync/storage-dedup classic: a boundary falls
wherever the gram hash satisfies ``fp % modulus == 0``, so chunk edges are
CONTENT-anchored — inserting or deleting bytes shifts only the chunks that
contain the edit, and every untouched chunk keeps its hash (the property
fixed-size chunking — operators/chunking.py — fundamentally lacks).

STATELESS variant: no min/max chunk-size clamps. Production CDC clamps
chunk sizes, which makes each boundary depend on the previous one — an
inherently sequential scan no exact cross-engine oracle can replay. Dropping
the clamps keeps the boundary set a pure per-position predicate (fully
parallel, exactly replayable) while preserving the translation-local dedup
property; expected chunk length is simply ``modulus`` and the size tail is
geometric (documented, not hidden).

Exact cross-engine design: boundaries from mix31(poly131(char k-gram))
(mix31 mandatory — the modulus test is a decision on the hash VALUE,
CLAUDE.md bias rule); chunk identity is the 62-bit vhash poly_fingerprint
(poly131 * 2^31 + poly137) of the chunk text — all replayable int64
arithmetic on ASCII-normalized input.

Scale design: normalization + prefix cap in codegen; boundary discovery is
one Arrow pass per batch (the winnow concatenated-bytes rolling hash);
chunks explode to narrow (start, len) spans and the chunk hash runs as a
JVM fold over the span substring (~L/modulus folds per doc); the dedup
rollup is one map-side-combining groupBy(chunk_fp).

Reference analog: none; completes the dedup suite (exact, fingerprint,
minhash, simhash, winnowing, line, exact-substring) with the storage-layer
chunk granularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.vhash import P31, poly_fingerprint
from .winnow import _mix31_np

K_GRAM = 7
MODULUS = 64
PREFIX_CHARS = 1024
_LEN_PACK = 2048  # > PREFIX_CHARS: packed span = start * 2048 + len


def _span_kernel(k: int, modulus: int):
    """array<long> of packed (start, len) chunk spans per ASCII document."""

    @pandas_udf("array<long>")
    def _f(text: pd.Series) -> pd.Series:
        bufs = [t.encode("ascii", "ignore") for t in text.fillna("")]
        lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
        out: list[list[int]] = [[] for _ in bufs]
        if lens.sum() == 0:
            return pd.Series(out)
        cat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)))
        n = cat.shape[0]
        n_g = n - k + 1
        cut_doc = np.array([], dtype=np.int64)
        cut_pos = np.array([], dtype=np.int64)
        if n_g > 0:
            h = np.zeros(n_g, dtype=np.int64)
            for j in range(k):
                h = (h * 131 + cat[j : j + n_g]) % P31
            fp = _mix31_np(h)
            doc_of = np.searchsorted(offs, np.arange(n_g), side="right") - 1
            gram_ok = np.arange(n_g) + k <= offs[doc_of + 1]
            is_cut = (fp % modulus == 0) & gram_ok
            cut_doc = doc_of[is_cut]
            # cut point = end of the boundary gram, in-doc coordinates
            cut_pos = np.flatnonzero(is_cut) + k - offs[cut_doc]
        for d in range(len(bufs)):
            ln = int(lens[d])
            if ln == 0:
                continue
            cuts = sorted(int(p) for p in cut_pos[cut_doc == d] if p < ln)
            starts = [0] + cuts
            ends = cuts + [ln]
            out[d] = [s * _LEN_PACK + (e - s) for s, e in zip(starts, ends) if e > s]
        return pd.Series(out)

    return _f


def cdc_chunks(
    df: DataFrame,
    k: int = K_GRAM,
    modulus: int = MODULUS,
    prefix_chars: int = PREFIX_CHARS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, start, len, chunk_fp): content-defined chunks of
    the ASCII-normalized ``prefix_chars`` prefix; chunk_fp is the 62-bit
    vhash poly fingerprint of the chunk text."""
    norm = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), "[^ -~]", ""),
        1,
        prefix_chars,
    )
    spans = df.select(
        F.col(id_col).alias("doc_id"), norm.alias("_s")
    ).select(
        "doc_id",
        "_s",
        F.explode(_span_kernel(k, modulus)(F.col("_s"))).alias("_packed"),
    ).select(
        "doc_id",
        "_s",
        F.expr(f"_packed div {_LEN_PACK}").alias("start"),
        F.expr(f"_packed % {_LEN_PACK}").alias("len"),
    )
    chunk = F.expr("substring(_s, start + 1, len)")
    # deterministic: starts are distinct within a doc by construction
    w = F.row_number().over(Window.partitionBy("doc_id").orderBy("start"))
    return spans.select(
        "doc_id",
        w.alias("chunk_idx"),
        "start",
        "len",
        poly_fingerprint(chunk).alias("chunk_fp"),
    )


def cdc_dedup_stats(
    df: DataFrame,
    min_copies: int = 2,
    **kwargs,
) -> DataFrame:
    """(chunk_fp, chunk_len, n_copies, n_docs): chunks stored more than once
    — the dedup-ratio rollup a content-addressed store would dedupe on."""
    ch = cdc_chunks(df, **kwargs)
    return (
        ch.groupBy("chunk_fp")
        .agg(
            F.min("len").alias("chunk_len"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_copies") >= min_copies)
    )
