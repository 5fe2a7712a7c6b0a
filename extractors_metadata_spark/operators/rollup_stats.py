"""Multi-level aggregation: ROLLUP / CUBE / grouping-sets rollups.

§2.4 widening: the reporting shape every warehouse serves — per-(a, b)
detail plus per-a subtotals plus a grand total in ONE pass.  Spark's
``rollup``/``cube`` plan this as a single aggregate with an expanded
grouping-set projection (rows replicate once per matching set, partial
aggregation still combines map-side), not as N separate scans — which is
exactly the property worth pinning at 100 TB: one shuffle, N levels.

Exactness: counts + exact distincts + per-row half-even fixed-point value
sums (F.bround == round_even at 0 decimals — the zonal_stats pairing);
``grouping_id`` disambiguates a real NULL dim value from a subtotal row
(Spark's bit order over the listed dims == DuckDB ``GROUPING(dims...)``).

Reference analog: the reference has single-level counts only (A2/A5);
this is the engine-added multi-level rollup over the same aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_stats(
    df: DataFrame,
    dims: list[str],
    value_col: str = "value",
    user_col: str = "user_id",
    cube: bool = False,
) -> DataFrame:
    """(dims..., gid, n_events, n_users, value_sum_u) at every rollup (or
    cube) level of ``dims``."""
    g = df.cube(*dims) if cube else df.rollup(*dims)
    return g.agg(
        F.grouping_id(*dims).cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(user_col).alias("n_users"),
        F.sum(
            F.bround(F.col(value_col) * 1000000.0, 0).cast("long")
        ).alias("value_sum_u"),
    )
