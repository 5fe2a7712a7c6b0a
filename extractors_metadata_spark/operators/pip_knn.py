"""Point-in-polygon and kNN spatial joins via cell-candidate pruning.

Replaces the reference's O(points x polygons) full scan
(``/root/reference/sensorposition/plotid_by_latlon.py:51-77``) with:

pip_join (J1):
  1. polygon dim -> covering cells at the join resolution (driver, tiny dim)
     -> exploded (cell, poly_idx) DataFrame, **broadcast**;
  2. points get their cell via one Arrow-batched kernel pass;
  3. broadcast-hash equi-join on cell = candidate pruning (no shuffle of the
     big side — the physical plan is scan -> project -> BroadcastHashJoin);
  4. exact vectorized ray-cast refine against broadcast prepared geometry;
  5. boundary = contains (Touches semantics, ``plotid_by_latlon.py:57``);
     overlap tie-break = min plot_id (engine-frozen determinism rule).

knn_join (J2):
  1. points fan out to their cell's k-ring (ring radius chosen from the dim's
     geometry so the ring reaches at least one covering cell when any polygon
     is within reach);
  2. broadcast equi-join on ring cell -> candidates;
  3. exact distance re-rank: Window.partitionBy(point).orderBy(dist, plot_id)
     row_number() <= k (the reference's running argmin, ``:63-68``, with a
     deterministic tie-break);
  4. points whose ring finds no candidate fall back to a broadcast
     nested-loop pass against the full dim (totality guarantee — the
     reference full-scans always; we only pay that for stragglers).

At 100 TB the points side never shuffles in either operator: both joins are
broadcast-side-replicated, and the refine/re-rank is partition-local except the
per-point window, which shuffles only the (small) candidate fan-out keyed by
point id — AQE + optional salting (operators/skew.py) spread hot cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, pandas_udf

from ..functions import hexgrid
from ..functions.spark_udfs import h3_udf
from .geometry import PreparedPolygons, ring_array

DEFAULT_RES = 12  # hex size ~9.4 m — matched to plot-scale polygons


def choose_res(prep: PreparedPolygons, lo: int = 7, hi: int = 12) -> int:
    """Finest res in [lo, hi] whose hex size >= half the median polygon extent
    (keeps covering lists small while pruning hard)."""
    with np.errstate(invalid="ignore"):
        ext_x = np.nanmax(prep.x1, axis=1) - np.nanmin(prep.x1, axis=1)
        ext_y = np.nanmax(prep.y1, axis=1) - np.nanmin(prep.y1, axis=1)
    # rough degrees->meters at the dim's median latitude
    lat0 = float(np.nanmedian(prep.y1))
    mx = np.nanmedian(ext_x) * 111320.0 * np.cos(np.radians(lat0))
    my = np.nanmedian(ext_y) * 111320.0
    diag = float(np.hypot(mx, my))
    for res in range(hi, lo - 1, -1):
        if float(hexgrid.res_size_m(res)) >= diag / 2.0:
            return res
    return lo


def _poly_cells_df(spark, plots_pdf: pd.DataFrame, res: int) -> DataFrame:
    """(cell, poly_idx) covering table for the dim; driver-built, broadcast."""
    rows = []
    for idx, ring in enumerate(plots_pdf["ring"]):
        for c in hexgrid.polyfill(ring_array(ring), res).tolist():
            rows.append((int(c), idx))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "poly_idx"]))


def _prepare(spark, plots: DataFrame | pd.DataFrame):
    plots_pdf = plots.toPandas() if isinstance(plots, DataFrame) else plots
    prep = PreparedPolygons.from_pandas(plots_pdf)
    bc = spark.sparkContext.broadcast(prep)
    return plots_pdf, prep, bc


def _contains_udf(bc):
    @pandas_udf("boolean")
    def _f(poly_idx: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        prep: PreparedPolygons = bc.value
        return pd.Series(
            prep.contains(
                poly_idx.to_numpy(np.int64),
                lon.to_numpy(np.float64),
                lat.to_numpy(np.float64),
            )
        )

    return _f


def _distance_udf(bc):
    @pandas_udf("double")
    def _f(poly_idx: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        prep: PreparedPolygons = bc.value
        return pd.Series(
            prep.distance_m(
                poly_idx.to_numpy(np.int64),
                lon.to_numpy(np.float64),
                lat.to_numpy(np.float64),
            )
        )

    return _f


def pip_join(
    spark,
    points: DataFrame,
    plots: DataFrame | pd.DataFrame,
    point_id: str = "url",
    lat_col: str = "centroid_lat",
    lon_col: str = "centroid_lon",
    res: int | None = None,
) -> DataFrame:
    """Containment join: one output row per point that lies in (or on the
    boundary of) some polygon, with ``plot_id`` = min matching id.

    ``point_id`` must uniquely key ``points`` (duplicate ids collapse to one
    row in the boundary-dedup window). Output: points' columns + ``plot_id``.
    """
    plots_pdf, prep, bc = _prepare(spark, plots)
    if res is None:
        res = choose_res(prep)
    poly_cells = _poly_cells_df(spark, plots_pdf, res)
    ids_df = spark.createDataFrame(
        pd.DataFrame({"poly_idx": range(len(prep.plot_ids)), "plot_id": prep.plot_ids})
    )

    pts = points.withColumn("_cell", h3_udf(res)(lat_col, lon_col))
    cand = pts.join(broadcast(poly_cells), pts["_cell"] == poly_cells["cell"], "inner")
    hits = cand.filter(_contains_udf(bc)("poly_idx", lon_col, lat_col)).join(
        broadcast(ids_df), "poly_idx"
    )
    # overlap/boundary determinism: min plot_id per point (window keyed by the
    # point id — the only shuffle in the operator, sized ~1 row per matched point)
    w = Window.partitionBy(point_id).orderBy("plot_id")
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*points.columns, "plot_id")
    )


def knn_join(
    spark,
    points: DataFrame,
    plots: DataFrame | pd.DataFrame,
    k: int = 1,
    point_id: str = "url",
    lat_col: str = "centroid_lat",
    lon_col: str = "centroid_lon",
    res: int | None = None,
    ring: int = 2,
) -> DataFrame:
    """k nearest polygons per point (distance 0 if containing), re-ranked
    exactly; falls back to a broadcast full-dim pass for points whose k-ring
    finds fewer than k candidates. Output: points' columns + plot_id + dist_m
    + knn_rank."""
    plots_pdf, prep, bc = _prepare(spark, plots)
    if res is None:
        res = choose_res(prep)
    poly_cells = _poly_cells_df(spark, plots_pdf, res)
    ids_df = spark.createDataFrame(
        pd.DataFrame({"poly_idx": range(len(prep.plot_ids)), "plot_id": prep.plot_ids})
    )
    n_polys = len(prep.plot_ids)

    # k-ring fan-out entirely JVM-side: the packed ID is linear in (q, r), so a
    # ring neighbor is cell + dq*2^29 + dr — explode a literal delta array.
    deltas = [
        (dq << 29) + dr
        for dq in range(-ring, ring + 1)
        for dr in range(-ring, ring + 1)
        if abs(dq + dr) <= ring
    ]
    delta_arr = F.array(*[F.lit(d) for d in deltas])
    pts = points.withColumn("_cell", h3_udf(res)(lat_col, lon_col))
    cand = (
        pts.select("*", F.explode(delta_arr).alias("_d"))
        .withColumn("cell", F.col("_cell") + F.col("_d"))
        .join(broadcast(poly_cells), "cell")
        .dropDuplicates([point_id, "poly_idx"])
        .drop("cell", "_cell", "_d")
    )

    dist = _distance_udf(bc)
    ranked = cand.withColumn("dist_m", dist("poly_idx", lon_col, lat_col))

    w = Window.partitionBy(point_id).orderBy(F.col("dist_m").asc(), F.col("poly_idx").asc())
    near = (
        ranked.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .join(broadcast(ids_df), "poly_idx")
        .select(*points.columns, "plot_id", "dist_m", "knn_rank")
    )

    # totality fallback: points with < k ring candidates re-rank vs full dim.
    # (left_anti on points that produced >= k survivors)
    enough = near.groupBy(point_id).agg(F.count("*").alias("_n")).filter(F.col("_n") >= min(k, n_polys))
    missing = points.join(enough.select(point_id), point_id, "left_anti")
    all_idx = spark.createDataFrame(pd.DataFrame({"poly_idx": range(n_polys)}))
    fb = (
        missing.crossJoin(broadcast(all_idx))
        .withColumn("dist_m", dist("poly_idx", lon_col, lat_col))
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .join(broadcast(ids_df), "poly_idx")
        .select(*points.columns, "plot_id", "dist_m", "knn_rank")
    )
    covered = near.join(enough.select(point_id), point_id, "left_semi")
    return covered.unionByName(fb)


def resolve_plots(
    spark,
    points: DataFrame,
    plots: DataFrame | pd.DataFrame,
    point_id: str = "url",
    lat_col: str = "centroid_lat",
    lon_col: str = "centroid_lon",
    res: int | None = None,
) -> DataFrame:
    """The reference's full lookup semantics (``plotid_by_latlon.py:51-77``):
    containment first ('contains'), else nearest polygon ('nearest').

    Output: points' columns + plot_id + matched_via.
    """
    inside = pip_join(spark, points, plots, point_id, lat_col, lon_col, res).withColumn(
        "matched_via", F.lit("contains")
    )
    rest = points.join(inside.select(point_id), point_id, "left_anti")
    nearest = (
        knn_join(spark, rest, plots, 1, point_id, lat_col, lon_col, res)
        .drop("dist_m", "knn_rank")
        .withColumn("matched_via", F.lit("nearest"))
    )
    return inside.unionByName(nearest)
