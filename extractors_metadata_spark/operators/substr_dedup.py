"""Exact-substring duplication coverage — the ExactSubstr dedup statistic.

Engine-added LLM-data-pipeline capability: Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better") deduplicate at the SUBSTRING
level — any token span appearing twice anywhere in the corpus is a
duplicate, catching boilerplate and quotations that document-level MinHash
misses.  This operator computes the per-document duplicated-span profile
for fixed-length token windows:

    (doc_id, n_tokens, dup_windows, dup_token_cov)

``dup_windows``: how many of the document's length-``window`` token windows
occur >= 2 times corpus-wide (including self-repeats); ``dup_token_cov``:
how many distinct TOKEN POSITIONS those windows cover (the fraction
dup_token_cov / n_tokens is the removable-duplicate mass).  Every doc with
>= window tokens gets a row (zeros are visible — the curation_filter
logging rule).

Coverage is the union of fixed-length intervals [pos, pos+window-1] —
computed with the islands discipline (interval_union): sorted duplicate
positions split where the gap exceeds ``window``, each island covering
(last - first + window) tokens.  No quadratic interval logic.

Scale design (10^12 docs):
- windows are built ARRAY-SIDE (slice/concat inside codegen) so the narrow
  (doc, pos, window-key) explode is the first row-expanding op;
- the window count is key-grouped with map-side combine (a boilerplate
  window's rows collapse per partition before the shuffle); the count-dim
  join back is 1:1 per window row;
- the islands pass rides ONE doc-keyed Exchange (lag + running sum + the
  (doc, island) rollup — the hotspot_persist shape);
- window keys here are the literal token strings (what makes the oracle an
  exact replay); at 100 TB swap the key for xxhash64(wkey) — identical
  plan, narrow shuffle, collision-rate 2^-64 per pair.

Reference analog: none; completes the dedup suite (exact, MinHash, SimHash,
n-gram Jaccard, prefix-filter, incremental) with the substring level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_substr_coverage(
    docs: DataFrame,
    window: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, dup_windows, dup_token_cov) for every document
    with at least ``window`` tokens (frozen tokenization)."""
    arr = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), arr.alias("arr")
    ).withColumn("n", F.size("arr")).filter(F.col("n") >= window)
    # sequence(1, 0) would DESCEND (the repetition_stats guard) — the
    # n >= window filter above makes the bound positive
    wins = base.select(
        "doc_id",
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - window + 1),
                lambda i: F.struct(
                    (i - 1).alias("pos"),
                    F.concat_ws(" ", F.slice("arr", i, window)).alias("wkey"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", "n", "w.pos", "w.wkey")
    cnt = wins.groupBy("wkey").agg(F.count(F.lit(1)).alias("c"))
    dup = (
        wins.join(cnt, "wkey")
        .filter(F.col("c") >= 2)
        .select("doc_id", "pos")
    )
    wnd = Window.partitionBy("doc_id").orderBy("pos")
    cum = wnd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = (
        dup.withColumn(
            "brk",
            F.when(
                F.col("pos") - F.lag("pos", 1).over(wnd) > window, F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("isl", F.sum("brk").over(cum))
    )
    seg = isl.groupBy("doc_id", "isl").agg(
        (F.max("pos") - F.min("pos") + window).alias("cov"),
        F.count(F.lit(1)).alias("nw"),
    )
    per_doc = seg.groupBy("doc_id").agg(
        F.sum("cov").alias("dup_token_cov"),
        F.sum("nw").alias("dup_windows"),
    )
    return (
        base.select("doc_id", F.col("n").cast("long").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_windows"), F.lit(0)).alias("dup_windows"),
            F.coalesce(F.col("dup_token_cov"), F.lit(0)).alias("dup_token_cov"),
        )
    )
