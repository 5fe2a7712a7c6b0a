"""Corpus placement arithmetic: proportional budget apportionment and
rendezvous shard routing.

Two pure-integer allocation operators a corpus-scale pipeline runs
around its storage and sampling layers:

- ``token_apportion``: split a fixed token budget across sources in
  exact proportion using Hamilton's largest-remainder method — the
  apportionment rule whose outputs sum to the budget EXACTLY (floor
  quotas + one extra token-block to the largest remainders). This is
  the integer-exact answer to "sample 1M tokens at the corpus mix"
  that naive per-source rounding gets wrong (off-by-k totals).
- ``hrw_shards``: highest-random-weight (rendezvous) hashing of every
  document onto N shards, emitted at N and N+1 simultaneously so the
  minimal-movement property — only ~1/(N+1) of keys move when a shard
  is added — is measurable from the output instead of taken on faith.
  HRW is the routing rule that keeps the snapshot layer's per-shard
  queues stable across fleet resizes (consistent hashing without the
  ring).

Everything is int64 arithmetic over the replayable hash family /
token counts; no float exists anywhere in either operator.

Scale notes: apportionment aggregates to a source-dimension frame
(the global window ranks ~dozens of rows); HRW is one 9x literal
fan-out + one map-side-combining aggregate per document — both ride
the document scan. int64 envelope: budget * per-source tokens must
stay under 2^63 (document the bound when budgets reach 10^12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import token_count
from ..functions.vhash import mix31, poly_hash


def token_apportion(
    df: DataFrame,
    budget: int = 1_000_000,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Hamilton largest-remainder apportionment of ``budget`` tokens
    across sources -> (source, n_tokens, base, rem_num, rk, quota).

    base_i = floor(B * n_i / N); the B - sum(base) leftover units go one
    each to the sources with the largest remainder numerators
    (rem_num_i = B * n_i - base_i * N; ties break on source name).
    sum(quota) == B exactly — the apportionment invariant.
    """
    per_src = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens")
    )
    tot = per_src.agg(F.sum("n_tokens").alias("n_total"))
    based = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(f"({int(budget)} * n_tokens) div n_total").alias("base"),
        (F.lit(int(budget)) * F.col("n_tokens")).alias("_bn"),
        "n_total",
    ).select(
        "source",
        "n_tokens",
        "base",
        (F.col("_bn") - F.col("base") * F.col("n_total")).alias("rem_num"),
    )
    leftover = based.agg(
        (F.lit(int(budget)) - F.sum("base")).alias("l")
    )
    w = Window.orderBy(F.col("rem_num").desc(), F.col("source").asc())
    ranked = based.withColumn("rk", F.row_number().over(w).cast("int"))
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "source",
        "n_tokens",
        "base",
        "rem_num",
        "rk",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("l"), F.lit(1)).otherwise(F.lit(0))
        ).alias("quota"),
    )


def hrw_shards(
    df: DataFrame, n_shards: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Rendezvous (HRW) shard routing -> (doc_id, shard8, shard9, moved)
    at ``n_shards`` and ``n_shards + 1``.

    Each key's shard is the argmax over shards of
    mix31(poly('hrw:' || s || ':' || key)). The argmax is decided by ONE
    integer max over the packed value h * 16 + s (shards < 16), so the
    tie rule (larger shard id on an exact hash tie) is explicit and both
    engines replay it without any argmax construct. ``moved`` flags keys
    whose shard changes when shard n_shards joins — the consistent-
    hashing guarantee says ~1/(n_shards+1) of them.
    """
    n = int(n_shards)
    if n + 1 > 16:
        raise ValueError("hrw_shards packs shard ids into 4 bits (< 16)")
    mh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(f"sequence(0, {n})")).alias("s"),
    ).select(
        "doc_id",
        "s",
        mix31(
            poly_hash(
                F.concat(
                    F.lit("hrw:"),
                    F.col("s").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            )
        ).alias("h"),
    )
    packed = F.col("h") * 16 + F.col("s")
    agg = mh.groupBy("doc_id").agg(
        (F.max(F.when(F.col("s") < n, packed)) % 16).cast("int").alias("shard8"),
        (F.max(packed) % 16).cast("int").alias("shard9"),
    )
    return agg.select(
        "doc_id",
        "shard8",
        "shard9",
        (F.col("shard8") != F.col("shard9")).alias("moved"),
    )
