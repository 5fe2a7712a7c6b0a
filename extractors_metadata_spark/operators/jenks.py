"""Jenks natural-breaks classification of the occupancy surface.

Jenks (1967) optimal data classification is THE choropleth classifier —
every cartographic stack (ArcGIS, QGIS, d3) ships it; a tile server
rendering the engine's density surfaces needs exactly these class
breaks. It is the 1-D k-segmentation DP: split the sorted value
multiset into k contiguous classes minimizing total within-class SSE.

Exactness contract (the frozen rule): the class cost is the 2^-20
fixed-point SSE

    cost(j, i] = K . sum(v^2) - (K . sum(v)^2) div len,   K = 2^20

— one floor division of nonneg ints per (j, i) pair, identical in both
engines (for nonneg operands Spark ``div`` == DuckDB ``//``), and the
DP sums/compares these integers only. Argmin ties break to the SMALLER
previous break index via the packed key (F * 1024 + j; n < 1024 by
construction). The 2^-20 quantization IS the semantics: both engines
minimize the same quantized objective, so the breaks replay exactly.

Scale shape: the value frame is the zero-filled 864-cell lattice —
bounded by the grid, never by data (for unbounded domains pre-bucket
first; Jenks on raw 10^12 values is not a thing anyone does). The cost
frame is O(n^2) = 750k rows; each of the k DP stages is one join + one
keyed min on it (eager, lineage-truncated), and the backtrack is k
1-row joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_K = 1 << 20
_TIE = 1024  # > max n; packs the argmin index under the cost key


def jenks_breaks(
    events: DataFrame,
    k: int = 5,
    n_rows: int = 54,
    n_cols: int = 16,
) -> DataFrame:
    """-> one row per class: (cls, start_idx, end_idx, lo_value,
    hi_value, n_in_class, total_cost_fp). Classes are 1-based and cover
    the sorted value sequence contiguously: class t holds sorted
    positions (start_idx, end_idx]."""
    n = n_rows * n_cols
    spark = events.sparkSession
    cnts = (
        events.select(
            F.expr("((event_id % 1000) * 108 + 54) div 2000").alias("r"),
            F.expr("((event_id % 640) * 50 + 25) div 2000").alias("c"),
        )
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lat = (
        spark.range(n_rows)
        .select(F.col("id").alias("r"))
        .crossJoin(spark.range(n_cols).select(F.col("id").alias("c")))
    )
    vals = (
        lat.join(cnts, ["r", "c"], "left")
        .select(
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("v")
        )
        .withColumn(
            "i", F.row_number().over(Window.orderBy("v"))
        )
    )
    wcum = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    pref = vals.select(
        "i",
        "v",
        F.sum("v").over(wcum).alias("p"),
        F.sum(F.col("v") * F.col("v")).over(wcum).alias("pp"),
    ).localCheckpoint(eager=True)
    zero = spark.range(1).select(
        F.lit(0).alias("i"), F.lit(0).cast("long").alias("v"),
        F.lit(0).cast("long").alias("p"), F.lit(0).cast("long").alias("pp"),
    )
    prefz = pref.unionByName(zero)
    a = prefz.select(
        F.col("i").alias("j"), F.col("p").alias("pj"), F.col("pp").alias("ppj")
    )
    b = pref.select("i", "p", "pp")
    cost = (
        a.join(b, F.col("j") < F.col("i"))
        .select(
            "j",
            "i",
            (
                F.lit(_K) * (F.col("pp") - F.col("ppj"))
                - F.expr(
                    f"({_K} * (p - pj) * (p - pj)) div (i - j)"
                )
            ).cast("long").alias("cst"),
        )
        .localCheckpoint(eager=True)
    )
    # DP stage 1: one class over (0, i]
    f = cost.filter(F.col("j") == 0).select(
        "i", F.col("cst").alias("fv"), F.lit(0).alias("bk")
    ).localCheckpoint(eager=True)
    stages = [f]
    for _ in range(2, k + 1):
        prev = stages[-1].select(
            F.col("i").alias("j"), F.col("fv").alias("fp")
        )
        nxt = (
            cost.join(prev, "j")
            .groupBy("i")
            .agg(
                F.min(
                    (F.col("fp") + F.col("cst")) * _TIE + F.col("j")
                ).alias("key")
            )
            .select(
                "i",
                F.expr(f"key div {_TIE}").alias("fv"),
                (F.col("key") % _TIE).alias("bk"),
            )
            .localCheckpoint(eager=True)
        )
        stages.append(nxt)
    # backtrack: breaks b_k = n, b_{t-1} = bk_t(b_t)
    breaks = [n]
    for t in range(k, 0, -1):
        st = stages[t - 1]
        row = st.filter(F.col("i") == breaks[-1]).select("bk").collect()
        breaks.append(int(row[0]["bk"]))
    breaks.reverse()  # [0, b1, ..., b_{k-1}, n]
    total = (
        stages[-1].filter(F.col("i") == n).select("fv").collect()[0]["fv"]
    )
    bounds = [
        (t + 1, breaks[t], breaks[t + 1]) for t in range(k)
    ]
    bdf = spark.createDataFrame(
        bounds, "cls long, start_idx long, end_idx long"
    )
    lo = pref.select((F.col("i") - 1).alias("start_idx"),
                     F.col("v").alias("lo_value"))
    hi = pref.select(F.col("i").alias("end_idx"),
                     F.col("v").alias("hi_value"))
    return (
        bdf.join(F.broadcast(lo), "start_idx")
        .join(F.broadcast(hi), "end_idx")
        .select(
            "cls",
            "start_idx",
            "end_idx",
            "lo_value",
            "hi_value",
            (F.col("end_idx") - F.col("start_idx")).alias("n_in_class"),
            F.lit(int(total)).cast("long").alias("total_cost_fp"),
        )
    )
