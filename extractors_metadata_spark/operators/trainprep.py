"""End-to-end training-corpus preparation: the composed curation plan.

Engine-added capability: the training-data twin of the flagship spatial
pipeline (``plans/pipeline.py``) — one call that takes raw crawled docs to
model-ready context windows, composed entirely from the engine's verified
operators so Catalyst plans the WHOLE chain as one job:

    line_dedup (corpus-wide boilerplate removal, 3 narrow shuffles)
      -> keep gate (n_kept > 0: fully-boilerplate docs drop HERE, logged
         by count, never silently inside an operator)
      -> size gate (cleaned docs under ``min_tokens`` are training noise)
      -> chunk_documents (zero-shuffle sliding context windows)

Composition is the point: each stage is individually full-oracle-checked
(`line_dedup`, `chunk_documents` driver queries), and the composed plan is
ALSO oracle-checked end-to-end (`training_prep` driver query chains the
same SQL stages), so operator contracts survive composition — the property
a user relies on when they build their own variants.

Scale: no new shuffles beyond line_dedup's three; the gates are narrow
filters on already-computed aggregates; chunking is row-local codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .chunking import chunk_documents
from .linededup import line_dedup


def prep_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 8,
    min_tokens: int = 8,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Raw docs -> deduped, gated, chunked context windows:
    (id, chunk_idx, n_tokens, chunk_text)."""
    cleaned = line_dedup(docs, id_col, text_col, words_per_line)
    survivors = cleaned.filter(
        (F.col("n_kept") > 0)
        & (F.size(F.split(F.col("clean_text"), " ")) >= min_tokens)
    ).select(F.col(id_col), F.col("clean_text").alias(text_col))
    return chunk_documents(
        survivors, id_col, text_col, chunk_tokens, overlap
    )
