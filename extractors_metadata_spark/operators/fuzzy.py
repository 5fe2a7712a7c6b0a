"""Fuzzy vocabulary pairing: edit-distance typo mining with blocking.

Corpus-cleaning primitive: crawl text is full of OCR/typo variants
('batch' ~ 'bacth') that exact dedup and tf statistics treat as distinct
words.  This op surfaces candidate variant pairs: distinct corpus words
within Levenshtein distance ``max_dist``, with document frequencies so the
consumer can pick the canonical form (high-df spelling wins).

Scale design — BLOCKING, the classic fuzzy-join discipline:
- the word dim comes from the corpus vocabulary (one aggregate over the
  collapsed postings frame), optionally df-banded;
- the quadratic pair space is cut by a BLOCKING join: candidates must
  share first character AND have lengths within ``max_dist`` (both are
  necessary conditions only in the blocking sense — a true variant pair
  violating first-char blocking ['cat'~'bat'] is out of scope by
  contract, stated here, not silently). Lengths within max_dist IS
  necessary (|len_a - len_b| <= lev(a, b)); the self-join keys on
  (first_char) with the length band as a join predicate, so the worst
  block is |words starting with c|^2, not |V|^2;
- Levenshtein runs JVM-side (F.levenshtein == DuckDB levenshtein — the
  textbook DP, integer-exact cross-engine) on the surviving pairs only.

Output pairs order word_a < word_b; exact ints throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index_build import doc_postings


def typo_pairs(
    docs: DataFrame,
    max_dist: int = 2,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(word_a, word_b, dist, df_a, df_b) for distinct vocabulary words
    within ``max_dist`` edits, first-char-blocked."""
    vocab = (
        doc_postings(docs, text_col, id_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("df_docs"))
        .filter(F.col("df_docs") >= min_df)
        .select(
            "word",
            "df_docs",
            F.substring("word", 1, 1).alias("blk"),
            F.length("word").alias("ln"),
        )
    )
    a = vocab.select(
        F.col("word").alias("word_a"), F.col("df_docs").alias("df_a"),
        "blk", F.col("ln").alias("ln_a"),
    )
    b = vocab.select(
        F.col("word").alias("word_b"), F.col("df_docs").alias("df_b"),
        "blk", F.col("ln").alias("ln_b"),
    )
    cand = a.join(b, "blk").filter(
        (F.col("word_a") < F.col("word_b"))
        & (F.abs(F.col("ln_a") - F.col("ln_b")) <= max_dist)
    )
    return (
        cand.withColumn("dist", F.levenshtein("word_a", "word_b"))
        .filter(F.col("dist") <= max_dist)
        .select("word_a", "word_b", F.col("dist").cast("int").alias("dist"), "df_a", "df_b")
    )
