"""Corpus-wide line/paragraph-level exact deduplication (CCNet-style).

Engine-added capability (task mandate: operations a large-scale training-data
pipeline needs): web corpora repeat LINES far more than whole documents —
navigation chrome, cookie banners, boilerplate footers appear on millions of
pages whose documents are otherwise unique. The standard remedy (CCNet,
RefinedWeb, Gopher's "remove duplicated lines across the corpus") keeps only
the FIRST occurrence of each distinct line corpus-wide and rebuilds every
document from its surviving lines. This is the sub-document twin of
``operators/dedup.dedup_exact`` (whole-doc) and ``minhash_lsh_dedup``
(near-dup): those drop documents; this cleans inside them.

Scale design (100 TB):
- The fan-out is NARROW: only (id, pos, line) flows into the shuffles — the
  document payload never rides the explode (CLAUDE.md fan-out rule).
- First-occurrence = ONE map-side-combining aggregate keyed by the line
  (``min(struct(id, pos))`` — partial min shrinks hot boilerplate lines on
  the map side, so a line occurring 10^8 times contributes ONE row per map
  partition to the shuffle, not 10^8). A window (row_number over line) would
  sort every occurrence of the hottest line in one reducer — the skew trap
  the aggregate avoids; the oracle uses the window form as the independent
  replay.
- The keep-flag join back is equi-keyed on the same line key, co-partitioned
  with the aggregate's output; the winner side carries exactly one row per
  distinct line.
- Reassembly is one aggregate keyed by ``id_col`` (hash-uniform).
  Plan: explode -> Exchange(line) x2 (agg + join) -> Exchange(id) — three
  hash shuffles, no global sort, nothing collected to the driver.

Determinism contract (driver oracle): ties are impossible — (id, pos) is
unique — and min(struct) orders lexicographically by (id, pos) exactly like
the oracle's ``row_number() OVER (PARTITION BY line ORDER BY doc_id, pos)``.
All arithmetic is exact integers / exact strings: full-oracle checkable.

Reference analog: none — the reference (terraref/extractors-metadata)
processes one message's metadata at a time and has no corpus-wide state;
this is the engine widening its per-document cleaning
(``plans/cleaner.py``) to cross-document scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_word_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 8,
) -> DataFrame:
    """(id, text) -> exploded (id, pos, line): fixed ``words_per_line``-word
    chunks of the whitespace token stream.

    Real crawls split on ``\\n``; the synthetic corpus is single-line, so the
    chunker is the deterministic stand-in BOTH engines replay (Spark
    ``slice``/DuckDB list slicing clamp the final partial chunk identically).
    Pure JVM codegen — split/sequence/slice/array_join, no Python.
    """
    words = F.split(F.col(text_col), " ")
    n_lines = F.expr(f"(size(split({text_col}, ' ')) + {words_per_line - 1}) div {words_per_line}")
    lines = F.transform(
        F.sequence(F.lit(0), (n_lines - 1).cast("int")),
        lambda i: F.array_join(
            F.slice(words, i * words_per_line + 1, words_per_line), " "
        ),
    )
    return df.select(F.col(id_col), F.posexplode(lines).alias("pos", "line"))


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 8,
) -> DataFrame:
    """Corpus-wide first-occurrence line dedup; returns one row per input
    document: (id, n_lines, n_kept, clean_text).

    A line occurrence survives iff it is the corpus-wide FIRST occurrence of
    that exact line (min (id, pos)); every later occurrence is removed from
    its document. Documents whose every line is boilerplate come back with
    ``n_kept = 0`` and ``clean_text = ''`` (they are reported, not silently
    dropped — the caller's curation filter decides their fate).
    """
    lines = split_word_lines(docs, id_col, text_col, words_per_line)
    # map-side-combining min: the hot-boilerplate-safe form of row_number=1
    winners = lines.groupBy("line").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first_occ")
    )
    flagged = lines.join(winners, "line").withColumn(
        "keep",
        (F.col(id_col) == F.col(f"first_occ.{id_col}"))
        & (F.col("pos") == F.col("first_occ.pos")),
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("keep"), F.struct("pos", "line")))
                ),
                lambda s: s["line"],
            ),
            " ",
        ).alias("clean_text"),
    )
