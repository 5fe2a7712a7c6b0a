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
from ..functions.hexgrid import MIN_RES
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


def _ensure_parallel(spark, df: DataFrame) -> DataFrame:
    """The ring fan-out multiplies work per input row ~10-200x, so a probe
    frame arriving in fewer partitions than cores (e.g. one small parquet
    file) would serialize the whole operator. Repartition ONLY when starved —
    on a well-partitioned 100 TB input this is a no-op."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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
        valid = poly_idx.notna().to_numpy()
        out = np.full(len(poly_idx), np.nan)
        if valid.any():
            idx = poly_idx.to_numpy(dtype="float64")[valid].astype(np.int64)
            out[valid] = prep.distance_m(
                idx, lon.to_numpy(np.float64)[valid], lat.to_numpy(np.float64)[valid]
            )
        return pd.Series(out)

    return _f


def _contains_dist_udf(bc):
    """Fused exact refine: one Arrow pass computes (contains, dist_m) per
    candidate pair; null poly_idx (no candidate) -> (false, +inf)."""

    @pandas_udf("contains boolean, dist_m double")
    def _f(poly_idx: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        prep: PreparedPolygons = bc.value
        valid = poly_idx.notna().to_numpy()
        out_c = np.zeros(len(poly_idx), dtype=bool)
        out_d = np.full(len(poly_idx), np.inf)
        if valid.any():
            idx = poly_idx.to_numpy(dtype="float64")[valid].astype(np.int64)
            lo = lon.to_numpy(np.float64)[valid]
            la = lat.to_numpy(np.float64)[valid]
            d = prep.distance_m(idx, lo, la)
            out_c[valid] = d == 0.0
            out_d[valid] = d
        return pd.DataFrame({"contains": out_c, "dist_m": out_d})

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

    pts = _ensure_parallel(spark, points).withColumn("_cell", h3_udf(res)(lat_col, lon_col))
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
        # reach = ring radius x hex pitch; widen the ring (cheap: the fan-out is
        # integer deltas joined to a broadcast) rather than coarsening the res
        # (expensive: coarser cells multiply candidates per cell).
    poly_cells = _poly_cells_df(spark, plots_pdf, res)
    ids_df = spark.createDataFrame(
        pd.DataFrame({"poly_idx": range(len(prep.plot_ids)), "plot_id": prep.plot_ids})
    )
    n_polys = len(prep.plot_ids)

    # k-ring fan-out entirely JVM-side: the packed ID is linear in (q, r), so a
    # ring neighbor is cell + dq*2^29 + dr — explode a literal delta array.
    # INNER broadcast join: the (large) fan-out of ring misses dies inside
    # whole-stage codegen without ever shuffling; only hits flow on. Narrow
    # (id, lat, lon) columns throughout; payload joins back at the end.
    deltas = [
        (dq << 29) + dr
        for dq in range(-ring, ring + 1)
        for dr in range(-ring, ring + 1)
        if abs(dq + dr) <= ring
    ]
    delta_arr = F.array(*[F.lit(d) for d in deltas])
    narrow = _ensure_parallel(spark, points.select(point_id, lat_col, lon_col))
    pts = narrow.withColumn("_cell", h3_udf(res)(lat_col, lon_col))
    dist = _distance_udf(bc)
    hits = (
        pts.select(point_id, lat_col, lon_col, F.explode(delta_arr).alias("_d"), "_cell")
        .withColumn("cell", F.col("_cell") + F.col("_d"))
        .join(broadcast(poly_cells), "cell")
        .join(broadcast(ids_df), "poly_idx")
    )

    if k == 1:
        # k=1 (the reference's case): no dedup, no window — duplicates collapse
        # inside a map-side-combining min_by; the only shuffle carries one
        # pre-aggregated row per point.
        scored = hits.withColumn("dist_m", dist("poly_idx", lon_col, lat_col))
        best1 = scored.groupBy(point_id).agg(
            F.min_by(
                F.struct(F.col("plot_id"), F.col("dist_m")),
                F.struct(F.col("dist_m"), F.col("plot_id")),
            ).alias("b")
        )
        near1 = best1.select(
            point_id,
            F.col("b.plot_id").alias("plot_id"),
            F.col("b.dist_m").alias("dist_m"),
            F.lit(1).alias("knn_rank"),
        )
        none_ids = narrow.select(point_id).join(
            best1.select(point_id), point_id, "left_anti"
        )
        all_idx1 = spark.createDataFrame(pd.DataFrame({"poly_idx": range(n_polys)}))
        fb1 = (
            narrow.join(none_ids, point_id, "left_semi")
            .crossJoin(broadcast(all_idx1))
            .join(broadcast(ids_df), "poly_idx")
            .withColumn("dist_m", dist("poly_idx", lon_col, lat_col))
            .groupBy(point_id)
            .agg(
                F.min_by(
                    F.struct(F.col("plot_id"), F.col("dist_m")),
                    F.struct(F.col("dist_m"), F.col("plot_id")),
                ).alias("b")
            )
            .select(
                point_id,
                F.col("b.plot_id").alias("plot_id"),
                F.col("b.dist_m").alias("dist_m"),
                F.lit(1).alias("knn_rank"),
            )
        )
        return points.join(near1.unionByName(fb1), point_id).select(
            *points.columns, "plot_id", "dist_m", "knn_rank"
        )

    cand = (
        hits.groupBy(point_id, "poly_idx")
        .agg(
            F.first(lat_col).alias(lat_col),
            F.first(lon_col).alias(lon_col),
            F.first("plot_id").alias("plot_id"),
        )
    )
    ranked = cand.withColumn("dist_m", dist("poly_idx", lon_col, lat_col))

    # one window pass ranks candidates AND counts them, so exactness routing
    # (fewer than k in-ring candidates -> full broadcast re-rank) costs no
    # extra scan. tie-break on distance -> min plot_id (engine-frozen; the
    # reference's first-scanned order is not reproducible, plotid_by_latlon.py:63-68).
    w = Window.partitionBy(point_id).orderBy(F.col("dist_m").asc(), F.col("plot_id").asc())
    wc = Window.partitionBy(point_id)
    ranked = ranked.withColumn("knn_rank", F.row_number().over(w)).withColumn(
        "_n_cand", F.count("plot_id").over(wc)
    )

    near = ranked.filter(
        (F.col("_n_cand") >= min(k, n_polys)) & (F.col("knn_rank") <= k)
    ).select(point_id, "plot_id", "dist_m", "knn_rank")

    # fallback set = points with SOME but < k candidates (from the window) plus
    # points with NO candidate at all (anti-join against candidate ids).
    few_ids = ranked.filter(
        (F.col("_n_cand") < min(k, n_polys)) & (F.col("knn_rank") == 1)
    ).select(point_id)
    none_ids = narrow.select(point_id).join(
        cand.select(point_id).distinct(), point_id, "left_anti"
    )
    all_idx = spark.createDataFrame(pd.DataFrame({"poly_idx": range(n_polys)}))
    fb = (
        narrow.join(few_ids.unionByName(none_ids), point_id, "left_semi")
        .crossJoin(broadcast(all_idx))
        .join(broadcast(ids_df), "poly_idx")
        .withColumn("dist_m", dist("poly_idx", lon_col, lat_col))
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(point_id, "plot_id", "dist_m", "knn_rank")
    )
    out = near.unionByName(fb)
    return points.join(out, point_id).select(
        *points.columns, "plot_id", "dist_m", "knn_rank"
    )


def resolve_plots(
    spark,
    points: DataFrame,
    plots: DataFrame | pd.DataFrame,
    point_id: str = "url",
    lat_col: str = "centroid_lat",
    lon_col: str = "centroid_lon",
    res: int | None = None,
    ring: int = 1,
    cell_col: str | None = None,
) -> DataFrame:
    """The reference's full lookup semantics (``plotid_by_latlon.py:51-77``):
    containment first ('contains'), else nearest polygon ('nearest'); ties on
    either break to min plot_id (engine-frozen determinism rule).

    FUSED single-pass plan (the 100 TB shape — the points side is scanned once):
      1. ring fan-out (JVM integer deltas) LEFT-joined to the broadcast
         (cell, poly) covering table — null candidate marks 'nothing nearby';
      2. one Arrow pass computes (contains, dist) per candidate pair;
      3. map-side-combining ``min_by`` picks the best candidate per point
         (ordering struct: has-candidate, !contains, dist, plot_id) — a single
         shuffle of pre-aggregated rows, no window sort;
      4. the (rare) no-candidate points re-rank against the full broadcast dim.

    Output: points' columns + plot_id + matched_via.
    """
    plots_pdf, prep, bc = _prepare(spark, plots)
    if res is None:
        res = choose_res(prep)
    poly_cells = _poly_cells_df(spark, plots_pdf, res)
    ids_df = spark.createDataFrame(
        pd.DataFrame({"poly_idx": range(len(prep.plot_ids)), "plot_id": prep.plot_ids})
    )
    cd = _contains_dist_udf(bc)

    deltas = [
        (dq << 29) + dr
        for dq in range(-ring, ring + 1)
        for dr in range(-ring, ring + 1)
        if abs(dq + dr) <= ring
    ]
    delta_arr = F.array(*[F.lit(d) for d in deltas])

    from pyspark import StorageLevel

    # NARROW-FIRST: only (id, lat, lon) flows through the ring fan-out, the
    # refine kernel, and the aggregation — the wide payload (footprint strings,
    # metadata) is joined back once at the end. At 100 TB this is the
    # difference between shuffling ids and shuffling documents.
    # ``cell_col``: a precomputed cell ID at exactly ``res`` (e.g. the fused
    # footprint stage's cell_r12) skips the re-encode pass entirely.
    if cell_col is not None:
        narrow = _ensure_parallel(
            spark, points.select(point_id, lat_col, lon_col, F.col(cell_col).alias("_cell"))
        )
        pts = narrow
        narrow = narrow.drop("_cell")
    else:
        narrow = _ensure_parallel(spark, points.select(point_id, lat_col, lon_col))
        pts = narrow.withColumn("_cell", h3_udf(res)(lat_col, lon_col))
    cand = (
        pts.select("*", F.explode(delta_arr).alias("_d"))
        .withColumn("cell", F.col("_cell") + F.col("_d"))
        .join(broadcast(poly_cells), "cell", "left")
        .join(broadcast(ids_df), "poly_idx", "left")
        .withColumn("cd", cd("poly_idx", lon_col, lat_col))
    )

    ord_key = F.struct(
        F.col("plot_id").isNull().cast("int").alias("no_cand"),
        (~F.col("cd.contains")).cast("int").alias("not_contains"),
        F.col("cd.dist_m").alias("dist"),
        F.coalesce(F.col("plot_id"), F.lit("")).alias("pid"),
    )
    val = F.struct(
        F.col("plot_id").alias("plot_id"), F.col("cd.contains").alias("contains")
    )
    # group key = point id only; partial map-side min_by collapses the ring
    # fan-out before the (single) shuffle.
    best = (
        cand.groupBy(point_id, lat_col, lon_col)
        .agg(F.min_by(val, ord_key).alias("best"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # read by both branches below
    )

    def _emit(df):
        return df.select(
            point_id,
            F.col("best.plot_id").alias("plot_id"),
            F.when(F.col("best.contains"), "contains")
            .otherwise("nearest")
            .alias("matched_via"),
        )

    resolved_n = _emit(best.filter(F.col("best.plot_id").isNotNull()))

    # totality fallback: no covering cell within the ring -> broadcast full dim
    missing = best.filter(F.col("best.plot_id").isNull()).select(point_id, lat_col, lon_col)
    all_polys = spark.createDataFrame(
        pd.DataFrame({"poly_idx": range(len(prep.plot_ids)), "plot_id": prep.plot_ids})
    )
    fb_ord = F.struct(
        (~F.col("cd.contains")).cast("int").alias("not_contains"),
        F.col("cd.dist_m").alias("dist"),
        F.col("plot_id").alias("pid"),
    )
    fb = _emit(
        missing.crossJoin(broadcast(all_polys))
        .withColumn("cd", cd("poly_idx", lon_col, lat_col))
        .groupBy(point_id)
        .agg(F.min_by(val, fb_ord).alias("best"))
    )
    return points.join(resolved_n.unionByName(fb), point_id)
