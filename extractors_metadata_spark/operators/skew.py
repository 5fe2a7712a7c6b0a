"""Explicit skew handling: hot-cell salting + range repartitioning on cell ID.

The Maricopa-style workload is pathologically skewed by construction: ~97% of
documents land in a handful of cells around one field
(``/root/reference/sensorposition/error_estimation.py:9-16``), the rest scatter
worldwide. The north rule demands the mitigation be explicit (AQE skew-join
stays on as the backstop):

- ``cell_salt(n)``: deterministic per-row salt in [0, n) derived from the point
  id, appended to the shuffle/grouping key so one hot cell spreads over n
  reducers;
- ``replicate_salted(dim, n)``: the matching explode on the (broadcast-sized)
  dim side so equi-joins on (cell, salt) stay correct;
- ``repartition_by_cell(df, n)``: range-repartition on (cell, salt) before
  shuffle-heavy refine stages so partitions are balanced even when cell
  frequencies aren't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cell_salt(id_col: str | Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) (xxhash64 of the row id)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.xxhash64(col), F.lit(n_salts)).cast("int")


def with_salt(df: DataFrame, id_col: str, n_salts: int, salt_col: str = "salt") -> DataFrame:
    return df.withColumn(salt_col, cell_salt(id_col, n_salts))


def replicate_salted(dim: DataFrame, n_salts: int, salt_col: str = "salt") -> DataFrame:
    """Explode the dim side across all salt values (join key becomes (key, salt))."""
    return dim.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(salt_col)
    )


def salted_distinct_count(
    df: DataFrame,
    key_cols: list[str],
    val_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per key, skew-safe: salt by hash(value) so one hot
    key's distinct set splits across n_salts reducers, then sum the partial
    distinct counts (each value lands in exactly one salt -> partials add up
    exactly). This is the pattern for aggs that partial aggregation cannot
    collapse (plain count() needs no salting — map-side combine already wins).
    """
    salted = df.withColumn(
        "_vsalt", F.pmod(F.xxhash64(F.col(val_col)), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_vsalt").agg(
        F.countDistinct(val_col).alias("_part")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_part").alias(out_col))


def top_k_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tie_col: str,
    k: int,
    ascending: bool = True,
    n_salts: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """EXACT top-k rows per key, skew-safe (two-phase salted re-rank).

    A plain ``row_number`` window sorts each key inside ONE reducer — a hot
    key with 10^9 rows (one domain owning a crawl shard) serializes and
    spills there. Phase 1 ranks within ``(key, hash(tie) % n_salts)`` groups
    and keeps each group's local top-k, so the hot key's sort spreads over
    ``n_salts`` reducers; phase 2 re-ranks the <= k*n_salts survivors per key
    — a bounded partition regardless of input skew. Exactness: every global
    top-k row is its salt-group's local top-k (the global order restricted to
    a subset preserves rank bounds), so phase 1 never drops a winner.

    Determinism contract (driver oracle): total order is
    ``(order_col asc|desc, tie_col asc)`` with ``tie_col`` unique per key;
    the result equals the single-window ranking exactly (pinned in tests).
    """
    oc = F.col(order_col) if ascending else F.col(order_col).desc()
    order = [oc, F.col(tie_col)]
    local = Window.partitionBy(*key_cols, "_tksalt").orderBy(*order)
    final = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn(
            "_tksalt", F.pmod(F.xxhash64(F.col(tie_col)), F.lit(n_salts)).cast("int")
        )
        .withColumn("_lrank", F.row_number().over(local))
        .filter(F.col("_lrank") <= k)
        .withColumn(rank_col, F.row_number().over(final))
        .filter(F.col(rank_col) <= k)
        .drop("_tksalt", "_lrank")
    )


def domain_cap(
    df: DataFrame,
    key_col: str = "domain",
    id_col: str = "doc_id",
    k: int = 5,
    n_salts: int = 16,
) -> DataFrame:
    """Per-domain document quota — the standard crawl-curation cap (no single
    domain may dominate the corpus). Keeps the k rows per domain with the
    SMALLEST verifiable-hash priority (``functions/vhash`` poly family — a
    deterministic uniform shuffle both engines replay exactly), via the
    skew-safe ``top_k_per_key``. Adds ``priority`` and ``rank``.
    """
    from ..functions.vhash import poly_hash

    prioritized = df.withColumn("priority", poly_hash(F.col(id_col).cast("string")))
    return top_k_per_key(
        prioritized, [key_col], "priority", id_col, k, n_salts=n_salts
    )


def repartition_by_cell(
    df: DataFrame, cell_col: str = "cell_r9", n_salts: int = 8,
    id_col: str = "url", num_partitions: int | None = None,
) -> DataFrame:
    """Range-repartition on (cell, salt): keeps cell locality for downstream
    per-cell work while splitting hot cells across n_salts partitions."""
    salted = df.withColumn("_salt", cell_salt(id_col, n_salts))
    if num_partitions:
        out = salted.repartitionByRange(num_partitions, F.col(cell_col), F.col("_salt"))
    else:
        out = salted.repartitionByRange(F.col(cell_col), F.col("_salt"))
    return out.drop("_salt")
