"""Scan-leg segmentation: split a point trajectory at direction reversals.

The reference's gantry sweeps a field in boustrophedon passes — every
position record belongs to a "leg" (one pass of the scanner), but the
reference never reconstructs them (it handles one observation at a time,
``/root/reference/sensorposition/terra_sensorposition.py:51-58``).  At
corpus scale the same primitive segments any per-user movement stream
(crawler traces, vehicle tracks, sensor sweeps) into maximal runs of
consistent heading:

- each consecutive STEP (prev point -> point, ordered by (ts, id) within
  the user — the engine's frozen sessionization tie-break) gets a
  direction code: dominant axis + sign (0=E, 1=W, 2=N, 3=S), an exact
  comparison on exact double deltas;
- a leg is a maximal run of equal-code steps; ``leg_id`` is the running
  count of code changes (lag + cumulative sum);
- per-leg rollup: step count, path length, start/end time, the code.

Scale design: the lag window and the change-flag cumulative sum ride ONE
user-keyed Exchange (the ``sessions.py`` contract).  Step length uses
the engine's frozen equirectangular NumPy kernel (one Arrow pass; JVM
trig is not bit-stable against the oracle — CLAUDE.md), and the Arrow
node drops the child's partitioning info, so the (user, leg) rollup
re-shuffles — but its PARTIAL aggregate runs map-side first, so that
second Exchange moves only collapsed per-leg rows (≤ legs/partition,
not steps; plan-shape pinned: partial agg strictly below the exchange).
Distances are rounded to EXACT INTEGER centimeters before summing, so
per-leg length is an order-independent int64 sum, bit-identical under
any partitioning (the ``sq_topk``/``pagerank`` determinism rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .radius_join import _pair_dist_udf


def scan_legs(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(user, leg_id, dir_code, n_steps, length_cm, t_start, t_end) —
    one row per maximal constant-heading run.  Single-point users emit
    nothing (a leg is a run of steps, and they have none)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    s = (
        df.select(user_col, ts_col, id_col, lat_col, lon_col)
        .withColumn("_plat", F.lag(lat_col).over(w))
        .withColumn("_plon", F.lag(lon_col).over(w))
        .withColumn("_pts", F.lag(ts_col).over(w))
    )
    dx = F.col(lon_col) - F.col("_plon")
    dy = F.col(lat_col) - F.col("_plat")
    code = F.when(
        F.abs(dx) >= F.abs(dy),
        F.when(dx >= 0, F.lit(0)).otherwise(F.lit(1)),
    ).otherwise(F.when(dy >= 0, F.lit(2)).otherwise(F.lit(3)))
    steps = s.filter(F.col("_plat").isNotNull()).withColumn("_code", code)
    brk = (
        F.lag("_code").over(w).isNull()
        | (F.col("_code") != F.lag("_code").over(w))
    ).cast("long")
    steps = steps.withColumn(
        "_leg",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # anchored at the PREVIOUS (earlier) point's latitude — the frozen
    # equirect pairing the radius/knn oracles already prove cross-engine
    dist_cm = F.round(
        _pair_dist_udf()("_plat", "_plon", lat_col, lon_col) * 100.0, 0
    ).cast("long")
    steps = steps.withColumn("_dcm", dist_cm)
    return steps.groupBy(
        F.col(user_col), F.col("_leg").alias("leg_id")
    ).agg(
        F.min("_code").alias("dir_code"),
        F.count(F.lit(1)).alias("n_steps"),
        F.sum("_dcm").alias("length_cm"),
        F.min("_pts").alias("t_start"),
        F.max(ts_col).alias("t_end"),
    )
