"""TextRank extractive summarization — PageRank over chunk graphs.

TextRank (Mihalcea & Tarau 2004; the graph-based extractive summarizer)
ranks a document's text units by running PageRank on their similarity
graph and keeps the top units as the summary.  Here the units are the
engine's token-window chunks (operators/chunking.chunk_documents) and
similarity is SHARED DISTINCT TOKENS >= ``min_shared`` (the unweighted
thresholded variant — symmetric, so each qualifying pair contributes
both directed edges).  Every document's graph is a disjoint component
of ONE global graph (node id = doc_id * 64 + chunk_idx), so a single
run of the proven integer fixed-point linkgraph.pagerank ranks the
whole corpus at once — per-doc iteration never happens; the corpus
dimension rides the existing partition-invariant machinery.

Exactness: chunk ids pack below 64 (chunk_idx >= 64 raises — a 64+
window document is out of the summarizer's contract, not silently
truncated); pagerank is int64 micro-units with floor division (bit-
identical under any partitioning); the summary cut is a per-doc
row_number over the frozen (rank desc, chunk_idx asc) order.

Scale shape: tokens explode once per chunk (DISTINCT — the similarity
is set-shaped); the pair join is DOC-LOCAL (keyed by (doc_id, tok), so
fan-out is bounded by per-doc chunk count squared — bounded by the
chunk contract, never corpus-sized); pagerank's 5 rounds are the
k_core-mold bounded iterations; the cut is a bounded per-doc window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .linkgraph import pagerank

_PACK = 64


def textrank_chunks(
    chunks: DataFrame,
    iterations: int = 5,
    min_shared: int = 2,
    top_k: int = 2,
) -> DataFrame:
    """Top-``top_k`` summary chunks per document -> (doc_id, chunk_idx,
    rank, pos).  ``chunks``: (doc_id, chunk_idx, chunk_text) from
    chunk_documents; token sharing counted on the same space-split
    words the chunker emits."""
    from .iterhelp import coalesced_small_shuffles
    from .pip_knn import _cache_scoped

    # the whole construction runs under the coalesced scope so the chunk
    # explode / distinct / pair-join reduce stages size to the (narrow)
    # data instead of the caller's Python-UDF-tuned width; the nested
    # pagerank scope save/restores the same keys — harmless (r6)
    with coalesced_small_shuffles(chunks.sparkSession):
        # chunks feeds the packing guard (an eager action), the token
        # explode and the node dim — persist or the chunker replays per
        # consumer (r6)
        chunks = _cache_scoped("textrank_chunks", chunks)
        over = chunks.filter(F.col("chunk_idx") >= _PACK)
        if over.limit(1).count() > 0:
            raise ValueError(
                f"textrank_chunks: chunk_idx >= {_PACK} breaks node packing "
                "(re-chunk with larger windows)"
            )
        toks = chunks.select(
            "doc_id",
            "chunk_idx",
            F.explode(F.split(F.col("chunk_text"), " ")).alias("tok"),
        ).distinct()
        a = toks.select("doc_id", F.col("chunk_idx").alias("ca"), "tok")
        b = toks.select("doc_id", F.col("chunk_idx").alias("cb"), "tok")
        pairs = (
            a.join(b, ["doc_id", "tok"])
            .filter(F.col("ca") < F.col("cb"))
            .groupBy("doc_id", "ca", "cb")
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(F.col("shared") >= int(min_shared))
        )
        pa = F.col("doc_id") * _PACK + F.col("ca")
        pb = F.col("doc_id") * _PACK + F.col("cb")
        edges = pairs.select(pa.alias("src"), pb.alias("dst")).unionByName(
            pairs.select(pb.alias("src"), pa.alias("dst"))
        )
        nodes = chunks.select(
            (F.col("doc_id") * _PACK + F.col("chunk_idx")).alias("node")
        )
        pr = pagerank(edges, nodes, iterations=iterations)

    from pyspark.sql import Window

    unpacked = pr.select(
        F.expr(f"node div {_PACK}").alias("doc_id"),
        (F.col("node") % _PACK).cast("int").alias("chunk_idx"),
        "rank",
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("rank"), F.asc("chunk_idx"))
    return (
        unpacked.select(
            "doc_id", "chunk_idx", "rank", F.row_number().over(w).alias("pos")
        )
        .filter(F.col("pos") <= int(top_k))
    )
