"""Sparse cosine similarity over shingle term-frequency vectors.

The weighted cousin of ``dedup.ngram_jaccard_pairs``: documents as sparse
tf vectors in word-shingle space, pair similarity = cosine of the exact
integer vectors.  Jaccard sees set overlap; tf-cosine sees *repetition
structure* too (boilerplate with different emphasis separates) — the
index-based all-pairs similarity primitive (Bayardo et al.'s shape) on the
engine's frozen tokenization.

Exactness: dot products and squared norms are exact int64 aggregates;
cosine = dot / sqrt(double(na2) * double(nb2)) needs only IEEE sqrt /
divide / multiply — all CORRECTLY ROUNDED per IEEE 754 in every engine (no
libm variance, unlike ln — CLAUDE.md), so the half-even 1e-9 fixed point
``sim_fp`` is bit-identical cross-engine with NO Arrow pass: the whole
operator is JVM codegen.

Scale design (the ngram_jaccard discipline):
- the shingle df BAND (``max_df``) is applied before candidate generation:
  a ubiquitous shingle fans out df^2 join rows while carrying no
  discrimination; after banding the worst shingle costs max_df^2 — the
  hard-bound rule every candidate generator in this engine follows.
  Banding also DEFINES the vector space (dot and norms use banded
  shingles consistently, so the cap never skews a reported score);
- candidate fan-out is a shingle-keyed self-join of the narrow
  (doc, shingle, tf) frame; the (a, b) dot aggregate partial-combines
  map-side; norms join back by doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_tf(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", w: int = 3
) -> DataFrame:
    """(doc_id, shingle, tf) — w-word shingle multiset counts, JVM-side
    (the ``dedup.word_shingles`` expression without the distinct)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, w)))
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def shingle_cosine_pairs(
    df: DataFrame,
    w: int = 3,
    max_df: int | None = 50,
    min_sim_fp: int = 200_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, dot, na2, nb2, sim_fp) for pairs with cosine >=
    ``min_sim_fp`` / 1e9; id_a < id_b."""
    from .pip_knn import _cache_scoped

    # the shingle explode + tf aggregate is consumed by the df band, the
    # norms aggregate and BOTH sides of the candidate self-join — without a
    # persist the whole tokenization replays per consumer (measured r6).
    tf = _cache_scoped("shingle_tf_raw", shingle_tf(df, text_col, id_col, w))
    if max_df is not None:
        sdf = tf.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        tf = _cache_scoped(
            "shingle_tf_banded",
            tf.join(
                sdf.filter(F.col("_df") <= max_df).select("shingle"),
                "shingle",
                "left_semi",
            ),
        )
    norms = tf.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("n2"))
    a = tf.select(F.col("doc_id").alias("id_a"), "shingle", F.col("tf").alias("tf_a"))
    b = tf.select(F.col("doc_id").alias("id_b"), "shingle", F.col("tf").alias("tf_b"))
    dots = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("n2").alias("nb2"))
    sim_fp = F.bround(
        F.col("dot").cast("double")
        / F.sqrt(F.col("na2").cast("double") * F.col("nb2").cast("double"))
        * 1000000000.0,
        0,
    ).cast("long")
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("sim_fp", sim_fp)
        .filter(F.col("sim_fp") >= min_sim_fp)
        .select("id_a", "id_b", "dot", "na2", "nb2", "sim_fp")
    )
