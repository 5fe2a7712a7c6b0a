"""CUSUM change detection on per-key value streams — without recursion.

The classic one-sided CUSUM statistic
    s_t = max(0, s_{t-1} + (x_t - mu - k))
looks inherently sequential (a data-dependent fold Spark would need a UDF
for and DuckDB's struct folds cannot replay — CLAUDE.md), but it has a
closed WINDOW form: with drifts d_i = x_i - mu - k and prefix sums
P_t = sum_{i<=t} d_i,

    s_t = P_t - min(0, min_{j<=t} P_j)

— a running sum minus a running minimum, both plain window aggregates.
That turns change detection into ONE key-partitioned Exchange of pure
codegen, and makes it EXACTLY replayable.

Exactness: drifts are per-row half-even 1e-6 fixed point (mu itself is
the exact fixed-point mean via half-even integer division), so P_t, the
running min and s_t are exact int64 under the frozen (ts, id) order.
Output per key: n, mu_u, max_cusum_u, n_over (rows with s_t > h), and the
first crossing's exact microsecond timestamp (NULL if never) — the
no-reset detection variant (alarm-and-reset is a monitoring-loop policy,
not an operator semantic).

Scale: two key-partitioned window passes over the same sort (Catalyst
shares the Exchange) + one aggregate; the per-key stats (mu) ride a
broadcast join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_detect(
    df: DataFrame,
    k_u: int = 200_000,
    h_u: int = 2_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(key, n, mu_u, max_cusum_u, n_over, first_over_us). ``k_u``/``h_u``
    are the slack and threshold in 1e-6 value units."""
    v_u = F.bround(F.col(value_col) * 1000000.0, 0).cast("long")
    base = df.select(
        F.col(key_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        v_u.alias("_v"),
    )
    stats = base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum("_v").alias("_s")
    )
    mu = F.expr(
        "CASE WHEN 2 * pmod(_s, n) > n "
        "OR (2 * pmod(_s, n) = n AND ((_s - pmod(_s, n)) div n) % 2 = 1) "
        "THEN (_s - pmod(_s, n)) div n + 1 "
        "ELSE (_s - pmod(_s, n)) div n END"
    )
    stats = stats.select(key_col, "n", mu.alias("mu_u"))
    w = Window.partitionBy(key_col).orderBy("us", id_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    j = base.join(F.broadcast(stats), key_col).withColumn(
        "_d", F.col("_v") - F.col("mu_u") - F.lit(int(k_u))
    )
    j = j.withColumn("_p", F.sum("_d").over(run)).withColumn(
        "_s_t",
        F.col("_p") - F.least(F.lit(0).cast("long"), F.min("_p").over(run)),
    )
    return j.groupBy(key_col, "n", "mu_u").agg(
        F.max("_s_t").alias("max_cusum_u"),
        F.sum((F.col("_s_t") > F.lit(int(h_u))).cast("long")).alias("n_over"),
        F.min(F.when(F.col("_s_t") > F.lit(int(h_u)), F.col("us"))).alias(
            "first_over_us"
        ),
    )
