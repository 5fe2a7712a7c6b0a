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


def sprt_constants(
    p0: float, p1: float, alpha: float, beta: float
) -> tuple[int, int, int, int]:
    """The SPRT's per-event LLR increments and decision thresholds as
    COMPILE-TIME 1e9 fixed-point integers — computed once here and
    consumed by BOTH the Spark operator and the SQL oracle generator
    (single source, the two sides cannot drift)."""
    import math

    return (
        int(round(math.log(p1 / p0) * 1e9)),
        int(round(math.log((1.0 - p1) / (1.0 - p0)) * 1e9)),
        int(round(math.log((1.0 - beta) / alpha) * 1e9)),
        int(round(math.log(beta / (1.0 - alpha)) * 1e9)),
    )


def sprt_test(
    events: DataFrame,
    success_type: str = "purchase",
    p0: float = 0.10,
    p1: float = 0.20,
    alpha: float = 0.05,
    beta: float = 0.05,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Wald's sequential probability ratio test per key -> (key,
    n_events, n_success, n_at_decision, llr_at_decision_fp, decision).

    The classical early-stopping A/B machinery: walk the Bernoulli
    log-likelihood ratio event by event and stop the FIRST time it
    crosses ln((1-beta)/alpha) (accept H1: rate >= p1) or
    ln(beta/(1-alpha)) (accept H0: rate <= p0); 'continue' if the stream
    ends in between.

    EXACT ARITHMETIC: the per-event increments ln(p1/p0) and
    ln((1-p1)/(1-p0)) are COMPILE-TIME 1e9 fixed-point integer constants
    (the _NDCG_W trick — the transcendental never runs at query time),
    so the walk is an int64 running sum and the thresholds integer
    compares; both engines replay it literally. One per-key window pass
    + one conditional aggregate; keys are the natural shard.
    """
    inc1, inc0, up, lo = sprt_constants(p0, p1, alpha, beta)

    base = events.select(
        F.col(key_col).alias("key"),
        *[F.col(c) for c in order_cols],
        (F.col(type_col) == success_type).cast("long").alias("x"),
    )
    seqw = Window.partitionBy("key").orderBy(*[F.col(c) for c in order_cols])
    w = seqw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    walked = base.select(
        "key",
        "x",
        F.row_number().over(seqw).alias("seq"),
        F.sum(F.col("x") * inc1 + (1 - F.col("x")) * inc0).over(w).alias("llr"),
    )
    flagged = walked.select(
        "key",
        "x",
        "seq",
        "llr",
        F.when((F.col("llr") >= up) | (F.col("llr") <= lo), F.col("seq")).alias(
            "hit_seq"
        ),
    )
    agg = flagged.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("x").alias("n_success"),
        F.min("hit_seq").alias("first_hit"),
    )
    # llr at the decision point (or at stream end when no crossing)
    dec_llr = flagged.select(
        F.col("key").alias("k2"), F.col("seq").alias("s2"), F.col("llr").alias("llr_hit")
    )
    out = agg.join(
        dec_llr,
        (F.col("key") == F.col("k2"))
        & (F.coalesce(F.col("first_hit"), F.col("n_events")) == F.col("s2")),
        "left",
    )
    return out.select(
        F.col("key").alias(key_col),
        "n_events",
        "n_success",
        F.coalesce(F.col("first_hit"), F.col("n_events")).alias("n_at_decision"),
        F.col("llr_hit").alias("llr_at_decision_fp"),
        F.when(F.col("first_hit").isNull(), "continue")
        .when(F.col("llr_hit") >= up, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
    )
