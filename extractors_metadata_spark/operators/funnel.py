"""Event funnel analysis + Markov transition counts.

Product-analytics primitives over the event stream (§2.4/2.5 widening):

``funnel_steps`` — per-user ordered funnel progression (view -> click ->
signup -> purchase): t_k = the earliest step-k event STRICTLY after the
user reached step k-1.  Strict progression makes the fold and the
min-chain formulations provably equivalent (an event at exactly t_{k-1}
is ineligible, so ordering ties cannot diverge), which is what the oracle
checks: Spark runs a ONE-SHUFFLE per-user sorted fold (JVM higher-order
``F.aggregate`` over sort_array — pure codegen state machine, no UDF);
DuckDB replays it as k unrolled min-chain CTEs (list_reduce struct-state
folds are broken there — CLAUDE.md).  Per-user event lists are collected
per group (bounded by a user's event count — the sessionization memory
contract).

``event_transitions`` — (prev_type, type) bigram counts over each user's
(ts, id)-ordered stream: the Markov transition matrix of the product.
One user-keyed Exchange for the lag, one map-side-combining count.

Exactness: µs integers end-to-end; nullable step times are exact µs
(< 2^53, so the compare harness's float64 round-trip is lossless).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "signup", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, t1_us..tk_us, steps_completed) — strict-progression funnel."""
    k = len(steps)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    rel = df.filter(F.col(type_col).isin(*steps)).select(
        F.col(user_col), us.alias("us"), F.col(type_col).alias("ty")
    )
    arr = rel.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct("us", "ty"))).alias("evs")
    )
    init = F.struct(
        *[F.lit(None).cast("long").alias(f"t{i + 1}") for i in range(k)]
    )

    def merge(acc: Column, e: Column) -> Column:
        outs = []
        for i, s in enumerate(steps):
            t = acc[f"t{i + 1}"]
            cond = t.isNull() & (e["ty"] == s)
            if i > 0:
                prev = acc[f"t{i}"]
                cond = cond & prev.isNotNull() & (e["us"] > prev)
            outs.append(F.when(cond, e["us"]).otherwise(t).alias(f"t{i + 1}"))
        return F.struct(*outs)

    st = arr.select(
        user_col, F.aggregate("evs", init, merge).alias("st")
    )
    # t_k set implies t_{k-1} set, so the first non-null from the top wins
    expr = None
    for i in range(k, 0, -1):
        c = F.col(f"st.t{i}").isNotNull()
        expr = F.when(c, F.lit(i)) if expr is None else expr.when(c, F.lit(i))
    done: Column = expr.otherwise(F.lit(0))
    cols = [F.col(f"st.t{i + 1}").alias(f"t{i + 1}_us") for i in range(k)]
    return st.select(user_col, *cols, done.cast("int").alias("steps_completed"))


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(prev_type, type, n) — per-user ordered bigram transition counts."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    s = df.select(user_col, ts_col, id_col, F.col(type_col).alias("ty")).withColumn(
        "prev_ty", F.lag("ty").over(w)
    )
    return (
        s.filter(F.col("prev_ty").isNotNull())
        .groupBy(F.col("prev_ty").alias("prev_type"), F.col("ty").alias("type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
