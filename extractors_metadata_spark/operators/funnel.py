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


_SHAPLEY_CHANNELS = ("click", "signup", "view")  # bits 1, 2, 4


def shapley_attribution(
    events: DataFrame,
    channels: tuple[str, ...] = _SHAPLEY_CHANNELS,
) -> DataFrame:
    """Shapley-value channel attribution (the game-theoretic upgrade of
    first/last-touch — Shapley 1953 applied to conversion journeys) ->
    one row per channel: (channel, shapley_x6, n_conversions, v_empty).

    Characteristic function: v(T) = converting users whose pre-first-
    purchase touched-channel SET is contained in T — the standard
    coalition read ("how many conversions survive if only T existed").
    With |C| = 3 the Shapley weights |T|!(2-|T|)!/3! have denominator 6,
    so shapley_x6 = sum over T not containing c of w(|T|) in {2,1,2}
    times (v(T+c) - v(T)) is an EXACT integer; the invariant
    sum_c shapley_x6 = 6*(v(C) - v(empty)) is checkable from the output
    (v_empty = direct conversions that touched no channel).

    Plan: one purchase argmin + one touch aggregate over the data (the
    only data-sized exchanges), then everything runs on the 8-row mask
    frame: subset sums and weight algebra are generated-dim joins. At
    more channels the mask frame is 2^|C| — the standard practical cap
    (|C| <= ~10) long before int64 matters."""
    ch_bit = {c: 1 << i for i, c in enumerate(channels)}
    full = (1 << len(channels)) - 1
    first_p = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.min(F.struct("ts", "event_id")).alias("fp"),
        )
        .select("user_id", F.col("fp.ts").alias("pts"),
                F.col("fp.event_id").alias("pid"))
    )
    bit = F.create_map(
        *[x for c, b in ch_bit.items() for x in (F.lit(c), F.lit(b))]
    )[F.col("event_type")]
    touches = (
        events.join(first_p, "user_id")
        .filter(
            F.col("event_type").isin(*channels)
            & (
                (F.col("ts") < F.col("pts"))
                | ((F.col("ts") == F.col("pts"))
                   & (F.col("event_id") < F.col("pid")))
            )
        )
        .select("user_id", bit.alias("b"))
        .distinct()
    )
    masks = (
        first_p.join(
            touches.groupBy("user_id").agg(F.sum("b").alias("m")),
            "user_id",
            "left",
        )
        .select(F.coalesce(F.col("m"), F.lit(0)).alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = events.sparkSession
    subsets = spark.range(full + 1).select(F.col("id").alias("t"))
    v = (
        subsets.join(
            F.broadcast(masks),
            (F.col("m").bitwiseAND(F.col("t")) == F.col("m")),
            "left",
        )
        .groupBy("t")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("v"))
    )
    n_conv = first_p.count()
    weights = {0: 2, 1: 1, 2: 2}  # |T|!(2-|T|)!, denominator 3! = 6
    pop = (
        (F.col("t") % 2)
        + (F.expr("t div 2") % 2)
        + (F.expr("t div 4") % 2)
    )
    rows = []
    for c, b in ch_bit.items():
        wt = (
            F.when(pop == 0, weights[0])
            .when(pop == 1, weights[1])
            .otherwise(weights[2])
        )
        vt = v.select(F.col("t"), F.col("v"), wt.alias("w"))
        wo = vt.filter(F.col("t").bitwiseAND(F.lit(b)) == 0).select(
            F.col("t").alias("t0"), F.col("v").alias("v0"), F.col("w")
        )
        wi = v.select((F.col("t")).alias("t1"), F.col("v").alias("v1"))
        phi = (
            wo.join(F.broadcast(wi), wo.t0 + F.lit(b) == wi.t1)
            .agg(
                F.sum(F.col("w") * (F.col("v1") - F.col("v0")))
                .cast("long")
                .alias("shapley_x6")
            )
            .select(F.lit(c).alias("channel"), "shapley_x6")
        )
        rows.append(phi)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    v_empty = v.filter(F.col("t") == 0).select(
        F.col("v").alias("v_empty")
    )
    return out.crossJoin(F.broadcast(v_empty)).select(
        "channel",
        "shapley_x6",
        F.lit(n_conv).cast("long").alias("n_conversions"),
        F.col("v_empty").cast("long").alias("v_empty"),
    )
