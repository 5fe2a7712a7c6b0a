"""Deterministic random-walk corpus sampling over a link graph.

DeepWalk / node2vec pipelines train on a corpus of short random walks:
each walk is a "sentence" whose tokens are node ids, fed to the same
skip-gram machinery as text. This operator materializes that corpus —
one fixed-length walk per node — as the training-data op a graph-aware
curation pipeline runs over the crawl's link graph (reference analog:
terraref/extractors-metadata's terra_geostreams.py walks stream -> sensor
-> datapoint relations; this generalizes the traversal to a corpus).

The walk is HASH-GUIDED rather than RNG-driven: at step t from node cur,
the successor is

    argmin over out-edges (cur -> dst) of
        ( mix31((cur * 131 + t * 7 + dst * 13) mod 2^31), dst )

i.e. a deterministic uniform draw keyed by (position, step, candidate)
through the repo's verifiable mix31 finalizer (functions/vhash.py — a
linear key alone would bias toward small ids; the finalizer avalanches
it), with dst as the total-order tie-break. Every walk is therefore a
pure function of the graph — bit-identical under any partitioning, and
replayable literally in SQL (the driver-oracle requirement that a
`rand()`-seeded walk could never meet). Changing the step multiplier
re-seeds the corpus.

Scale shape: the frontier is |V| rows re-keyed by `cur` once per step —
one shuffle join against src-keyed edges plus one map-side-combining
min_by per step, `length` a bounded literal. No per-node neighbor lists
are ever collected; hub nodes fan out edge-parallel and collapse in the
partial aggregate. Lineage depth is O(length), bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from extractors_metadata_spark.functions.vhash import M31, mix31


def random_walks(
    edges: DataFrame, nodes: DataFrame, length: int = 4
) -> DataFrame:
    """One deterministic ``length``-step walk per node.

    ``edges``: (src, dst) long columns, every node with outdeg >= 1 (the
    event_link_graph contract — the ring guarantees it). ``nodes``: a
    (node,) frame of walk starts.

    Returns (walk_id, step, node): walk_id = start node, step 0..length,
    exact int64, partitioning-invariant.
    """
    start = nodes.select(
        F.col("node").alias("walk_id"),
        F.lit(0).cast("long").alias("step"),
        F.col("node").cast("long").alias("node"),
    )
    out = start
    cur = nodes.select(
        F.col("node").alias("walk_id"), F.col("node").alias("cur")
    )
    for t in range(1, length + 1):
        cand = cur.join(edges, cur["cur"] == edges["src"], "inner")
        key = mix31(
            (F.col("cur") * 131 + F.lit(t) * 7 + F.col("dst") * 13)
            % F.lit(M31)
        )
        nxt = (
            cand.select(
                "walk_id", F.col("dst"), key.alias("hkey")
            )
            .groupBy("walk_id")
            .agg(
                F.min_by(
                    F.col("dst"), F.struct(F.col("hkey"), F.col("dst"))
                ).alias("cur")
            )
        )
        out = out.unionByName(
            nxt.select(
                "walk_id",
                F.lit(t).cast("long").alias("step"),
                F.col("cur").cast("long").alias("node"),
            )
        )
        cur = nxt
    return out
