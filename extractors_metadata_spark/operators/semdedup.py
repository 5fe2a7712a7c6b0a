"""SemDeDup — semantic deduplication via embedding clustering (Abbas et al.
2023): k-means the embedding table, then inside each cluster mark near-
duplicate pairs by cosine similarity and keep one representative. The
LLM-curation primitive for MEANING-level duplicates that no lexical family
(minhash / simhash / winnowing / CDC) can see — paraphrases, translations,
re-renders.

Exact cross-engine design — no float ever crosses a decision:

- clusters come from the exact-integer Lloyd rounds (operators/kmeans.py,
  bit-identical under any partitioning, fully SQL-replayable);
- pair vectors quantize ONCE to int64 at SCALE 500 (|x| <= 1 precondition
  -> |u| <= 500), so dot and squared norms are exact int64 sums;
- the cosine threshold tau = p/100 is decided as PURE INTEGERS:
      cos(a,b) >= p/100  <=>  dot > 0  AND  10000*dot^2 >= p^2 * na * nb
  with every product provably < 2^63 at this scale (dot <= 64*500^2 =
  1.6e7 -> 10000*dot^2 <= 2.6e18; na*nb <= 2.6e14 -> p^2*na*nb <= 2.5e18);
- the keep rule is greedy-by-id (a vector is a duplicate iff some LOWER-id
  vector in its cluster clears tau) — deterministic and anti-join-shaped,
  NOT the transitive closure (SemDeDup's own per-cluster "keep one random"
  is order-dependent; greedy-by-id is the replayable analog).

Scale design: the pair join is CLUSTER-LOCAL — k is chosen ~ n/target so
cluster sizes stay bounded (the paper's own scaling lever), and the join
carries only (vec_id, cluster, u, n2) narrow rows; norms are computed once
per vector before the join; the dup flag is one distinct + left anti shape.

Reference analog: none; completes the dedup suite at the semantic layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SD_SCALE = 500.0  # |x| <= 1 -> |u| <= 500: every threshold product < 2^63


def _quant(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    u = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.bround(x * SD_SCALE, 0).cast("long"),
    )
    return df.select(F.col(id_col).alias("vec_id"), u.alias("u")).withColumn(
        "n2",
        F.aggregate(
            F.transform("u", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )


def semdedup(
    spark: SparkSession,
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    tau_pct: int = 99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, cluster, is_dup): k-means assignment plus the greedy-by-id
    semantic-duplicate flag at cosine >= tau_pct/100 within the cluster."""
    if not 0 < tau_pct < 100:
        raise ValueError("tau_pct must be an integer percent in (0, 100)")
    from .kmeans import kmeans_assign

    asg = kmeans_assign(spark, df, k=k, iters=iters,
                        vec_col=vec_col, id_col=id_col).select(
        "vec_id", "cluster"
    )
    q = _quant(df, vec_col, id_col)
    narrow = asg.join(q, "vec_id")
    a = narrow.select(
        F.col("vec_id").alias("id_a"), "cluster",
        F.col("u").alias("ua"), F.col("n2").alias("na"),
    )
    b = narrow.select(
        F.col("vec_id").alias("id_b"), F.col("cluster").alias("cluster_b"),
        F.col("u").alias("ub"), F.col("n2").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("ua", "ub", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dup_ids = (
        a.join(
            b,
            (F.col("cluster") == F.col("cluster_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("dot", dot)
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(10_000) * F.col("dot") * F.col("dot")
                >= F.lit(tau_pct * tau_pct) * F.col("na") * F.col("nb")
            )
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_d", F.lit(1))
    )
    return asg.join(dup_ids, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.coalesce(F.col("_d"), F.lit(0)).cast("int").alias("is_dup"),
    )
