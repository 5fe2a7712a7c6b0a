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
  1. the polygon dim's covering cells are DILATED by the ring radius on the
     driver (the k-ring fan-out lives in the broadcast dim — the points side
     stays one row per point and each (point, poly) candidate is unique);
  2. broadcast equi-join on the point's single cell -> candidates;
  3. exact distance re-rank: Window.partitionBy(point).orderBy(dist, plot_id)
     row_number() <= k (the reference's running argmin, ``:63-68``, with a
     deterministic tie-break);
  4. points whose ring finds no candidate — or whose k-th candidate is beyond
     the ring's guaranteed reach (``_ring_reach_m``) — fall back to a
     broadcast nested-loop pass against the full dim (totality + exactness;
     the reference full-scans always; we only pay that for stragglers).

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


_poly_cells_memo: dict = {}


def _dim_fingerprint(plots_pdf: pd.DataFrame) -> int:
    """Content hash of the polygon dim (ids + ring coords) for the covering-
    table memo — the dim is tiny by contract (broadcastable), so hashing it
    is microseconds against the ~1-2 s covering/dilation/prune build."""
    coords = np.concatenate([ring_array(r).ravel() for r in plots_pdf["ring"]])
    return hash((tuple(plots_pdf["plot_id"]), coords.tobytes()))


def _poly_cells_df(
    spark,
    plots_pdf: pd.DataFrame,
    res: int,
    ring: int = 0,
    prep: "PreparedPolygons | None" = None,
    keep_k: int = 1,
    plot_ids: "list | None" = None,
) -> DataFrame:
    """(cell, poly_idx) covering table for the dim; driver-built, broadcast.

    ``ring`` > 0 DILATES the covering: each polygon also claims every cell
    within grid distance ``ring`` of a covering cell. A point's cell is in the
    dilated set iff the point's k-ring intersects the raw covering — i.e. dim
    dilation is the join-side dual of a probe-side ring fan-out, but the
    probe side stays ONE row per point (no 3k^2+3k+1x explode, no duplicate
    (point, poly) candidates, one distance evaluation per pair).

    When ``prep`` is given, the dilated table is then PRUNED per cell with
    exact distance intervals: for any point in a cell (true-meter radius
    r <= s/cos(lat) around the center), its distance to polygon p lies in
    [d_p - r, d_p + r] where d_p = distance(center, p). A polygon whose lower
    bound exceeds the cell's ``keep_k``-th smallest upper bound can never be
    among the k nearest for ANY point in the cell (strictly — ties survive),
    so it is dropped at build time. This turns the executor-side candidate
    list from "every polygon within ring reach" (hundreds, for dense dims)
    into the handful whose distance intervals overlap the winners' — the
    distance kernel then runs on ~k-ish pairs per point instead of O(density).

    Size grows as |covering| x ring^2 before pruning — fine for broadcastable
    dims; for huge dims at small ring keep the dilation small.

    ``plot_ids``: when given, a ``plot_id`` column rides in the broadcast
    table so callers skip a second broadcast join against an ids dim.

    The (cells, idx) arrays are MEMOIZED per (dim content, res, ring, keep_k):
    the build (~1-2 s of driver NumPy for ring-dilated dims) runs once per
    process for a frozen dim; only the cheap createDataFrame repeats, so the
    memo stays valid across Spark session restarts.
    """
    key = (_dim_fingerprint(plots_pdf), res, ring, keep_k)
    hit = _poly_cells_memo.get(key)
    if hit is not None:
        cells, idx = hit
    else:
        cells_per_poly = []
        for ring_geom in plots_pdf["ring"]:
            cells = hexgrid.polyfill(ring_array(ring_geom), res)
            if ring > 0:
                _, dilated = hexgrid.kring_batch(cells, ring)
                cells = np.unique(dilated)
            cells_per_poly.append(cells)
        idx = np.repeat(
            np.arange(len(cells_per_poly), dtype=np.int64),
            [len(c) for c in cells_per_poly],
        )
        cells = np.concatenate(cells_per_poly) if cells_per_poly else np.array([], dtype=np.int64)

        if ring > 0 and prep is not None and len(cells):
            lat, lon = hexgrid.cell_center(cells)
            s = float(hexgrid.res_size_m(res))
            # r6 two-phase prune: the exact interval prune below evaluates
            # point-to-ring distance over (pairs x max_edges) temporaries —
            # at ring 21 that is ~1.3M pairs and dominated the whole query
            # as driver wall. Phase 1 prunes with (pairs,)-sized
            # center/circumradius bounds (valid in distance_m's per-point
            # equirect metric: R_ub uses coslat=1, an overestimate of the
            # x-extent, so lb_c <= d <= ub_c always); phase 2 then runs the
            # exact rule on the survivors. The survivor kth-ub can only be
            # >= the all-pairs kth-ub, so the final kept set is a SUPERSET
            # of the single-phase one — extra candidates are scored and
            # lose, query outputs identical (soundness unchanged).
            from ..functions.geodesy import R_MEAN

            deg = np.pi / 180.0 * R_MEAN
            vx, vy = prep.x1, prep.y1  # (P, K) ring vertices, NaN-padded
            ccx = np.nanmean(vx, axis=1)
            ccy = np.nanmean(vy, axis=1)
            r_poly = np.sqrt(
                np.nanmax(
                    ((vx - ccx[:, None]) * deg) ** 2
                    + ((vy - ccy[:, None]) * deg) ** 2,
                    axis=1,
                )
            )
            coslat_c = np.cos(np.radians(lat))
            d_c = np.sqrt(
                ((ccx[idx] - lon) * coslat_c * deg) ** 2
                + ((ccy[idx] - lat) * deg) ** 2
            )
            r_true_c = s / coslat_c * 1.0001
            lb_c = d_c - r_poly[idx] - r_true_c
            ub_c = d_c + r_poly[idx] + r_true_c
            order_c = np.lexsort((ub_c, cells))
            cc_s = cells[order_c]
            starts_c = np.flatnonzero(np.r_[True, cc_s[1:] != cc_s[:-1]])
            counts_c = np.diff(np.r_[starts_c, len(cc_s)])
            kth_pos_c = starts_c + np.minimum(keep_k, counts_c) - 1
            kth_ub_c = np.repeat(ub_c[order_c][kth_pos_c], counts_c)
            pre = order_c[lb_c[order_c] <= kth_ub_c]
            cells, idx, lat, lon = cells[pre], idx[pre], lat[pre], lon[pre]
            d = prep.distance_m(idx, lon, lat)
            # conservative true-m cell radius; the 1.0001 slack absorbs the
            # cos(lat)/metric drift between the cell-center latitude (used for d
            # and r_true here) and the probe point's latitude (which defines
            # distance_m's metric) — the dual of _ring_reach_m's 0.99 guard
            r_true = s / np.cos(np.radians(lat)) * 1.0001
            lb = d - r_true
            ub = d + r_true
            order = np.lexsort((ub, cells))  # sort by cell, then ub
            c_s, lb_s, ub_s, idx_s = cells[order], lb[order], ub[order], idx[order]
            starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
            counts = np.diff(np.r_[starts, len(c_s)])
            # per cell: the keep_k-th smallest ub (last row if fewer than keep_k)
            kth_pos = starts + np.minimum(keep_k, counts) - 1
            kth_ub = np.repeat(ub_s[kth_pos], counts)
            keep = lb_s <= kth_ub
            cells, idx = c_s[keep], idx_s[keep]
        if len(_poly_cells_memo) > 32:  # bound driver memory across many dims
            _poly_cells_memo.clear()
        _poly_cells_memo[key] = (cells, idx)

    cols = {"cell": cells, "poly_idx": idx}
    if plot_ids is not None:
        cols["plot_id"] = np.asarray(plot_ids, dtype=object)[idx]
    return spark.createDataFrame(pd.DataFrame(cols))


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


_live_caches: dict[str, DataFrame] = {}


def _cache_scoped(name: str, df: DataFrame) -> DataFrame:
    """persist(MEMORY_AND_DISK) with per-operator scope: the PREVIOUS
    invocation's cache is unpersisted on the next call, so repeated operator
    invocations in one session never accumulate storage (ADVICE r1). A
    still-lazy result frame from an earlier call stays correct — it just
    recomputes without the cache. (localCheckpoint would self-GC, but its
    RDD-conversion path costs ~10s on pandas-UDF plans here — measured.)

    SINGLE-JOB-AT-A-TIME assumption: the registry is module-global, so two
    CONCURRENT invocations of the same operator in one session would thrash
    each other's storage (correct results, silent recompute). Serialize
    same-operator jobs, or pass the pipeline-level ``caches`` list
    (plans/pipeline._resolved) for deterministic caller-owned release."""
    from pyspark import StorageLevel

    prev = _live_caches.pop(name, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _live_caches[name] = out
    return out


def _ring_reach_m(ring: int, res: int, lat_col: str) -> F.Column:
    """True-meter reach GUARANTEE of a k-ring candidate search (per point).

    Soundness bound for treating in-ring candidates as exact: any polygon
    whose covering cells all lie outside the point's ring-``ring`` neighborhood
    is at least this far away, so an in-ring candidate at distance <= reach is
    provably the true nearest (no out-of-ring polygon can beat it).

    Derivation (projected Lambert-CEA space, hex circumradius s at ``res``):
    a point lies within s of its cell center; every polygon point lies within
    s of some covering-cell center (``hexgrid.polyfill`` covers containing
    cells); hex centers at grid distance g are >= 1.5*g*s apart (triangular
    lattice, tight at g even). A polygon outside the ring has g >= ring+1, so
    its projected distance is >= 1.5*(ring+1)*s - 2s. Projected distance
    >= true equirectangular meters * cos(lat) (x is inflated by 1/cos(lat),
    y compressed by cos(lat)), giving the true-meter bound below; 0.99 absorbs
    the cos(lat) drift between point and polygon over sub-km scales.
    """
    s = float(hexgrid.res_size_m(res))
    factor = max(1.5 * (ring + 1) - 2.0, 0.0) * s * 0.99
    return F.lit(factor) * F.cos(F.radians(F.col(lat_col)))


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
    row in the boundary-dedup aggregation). Output: points' columns + ``plot_id``.
    """
    plots_pdf, prep, bc = _prepare(spark, plots)
    if res is None:
        # containment has no ring-reach tradeoff, so the covering can go one
        # res finer than the kNN default: at sub-polygon cell size each cell
        # is claimed by ~4 polys instead of ~26 (measured at the 864-plot dim:
        # 26 -> 5 candidates/point, pip_join 3.0 s -> 2.1 s at sf0.1)
        res = choose_res(prep, hi=14)
    # plot_id rides in the broadcast covering table — no second ids join
    poly_cells = _poly_cells_df(spark, plots_pdf, res, plot_ids=prep.plot_ids)

    # NARROW-FIRST: only (id, lat, lon) flows through the cell join and the
    # refine kernel; the wide payload joins back once at the end, so the
    # dedup shuffle carries 2 small columns, not documents.
    narrow = _ensure_parallel(spark, points.select(point_id, lat_col, lon_col))
    pts = narrow.withColumn("_cell", h3_udf(res)(lat_col, lon_col))
    cand = pts.join(broadcast(poly_cells), pts["_cell"] == poly_cells["cell"], "inner")
    hits = cand.filter(_contains_udf(bc)("poly_idx", lon_col, lat_col))
    # overlap/boundary determinism: min plot_id per point — a map-side-
    # combining aggregate over (point_id, plot_id) only (no window sort; the
    # single shuffle carries one pre-aggregated narrow row per matched point)
    if set(points.columns) == {point_id, lat_col, lon_col}:
        # already-narrow caller: lat/lon ride as grouping keys — no join-back
        best = hits.groupBy(point_id, lat_col, lon_col).agg(
            F.min("plot_id").alias("plot_id")
        )
        return best.select(*points.columns, "plot_id")
    best = hits.groupBy(point_id).agg(F.min("plot_id").alias("plot_id"))
    return points.join(best, point_id).select(*points.columns, "plot_id")


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
        # reach = ring radius x hex pitch; widen the ring (cheap: the dilation
        # lives in the broadcast dim) rather than coarsening the res
        # (expensive: coarser cells multiply candidates per cell).
    # ring dilation + interval pruning on the DIM side: the probe stays one
    # row per point, each (point, poly) candidate appears exactly once, and
    # only polys that can win top-k for some point in the cell survive.
    # plot_id rides in the broadcast table (no second ids join on the hot path).
    poly_cells = _poly_cells_df(
        spark, plots_pdf, res, ring=ring, prep=prep, keep_k=k, plot_ids=prep.plot_ids
    )
    ids_df = spark.createDataFrame(
        pd.DataFrame({"poly_idx": range(len(prep.plot_ids)), "plot_id": prep.plot_ids})
    )
    n_polys = len(prep.plot_ids)

    # Narrow (id, lat, lon) columns throughout; payload joins back at the end.
    # INNER broadcast join: ring misses die inside whole-stage codegen without
    # ever shuffling; only hits flow on.
    narrow = _ensure_parallel(spark, points.select(point_id, lat_col, lon_col))
    # already-narrow caller: every branch below carries (id, lat, lon), so the
    # final payload join-back is skipped entirely
    points_is_narrow = set(points.columns) == {point_id, lat_col, lon_col}
    pts = narrow.withColumn("cell", h3_udf(res)(lat_col, lon_col))
    dist = _distance_udf(bc)
    hits = pts.join(broadcast(poly_cells), "cell")

    reach = _ring_reach_m(ring, res, lat_col)

    if k == 1:
        # k=1 (the reference's case): no dedup, no window — duplicates collapse
        # inside a map-side-combining min_by; the only shuffle carries one
        # pre-aggregated row per point.
        scored = hits.withColumn("dist_m", dist("poly_idx", lon_col, lat_col))
        # scoped persist: three consumers below (near, far-routing, anti-join)
        # must not re-run the candidate join + Arrow distance pass; the cached
        # frame is one narrow row per point.
        best1 = _cache_scoped(
            "knn_best1",
            scored.groupBy(point_id, lat_col, lon_col).agg(
                F.min_by(
                    F.struct(F.col("plot_id"), F.col("dist_m")),
                    F.struct(F.col("dist_m"), F.col("plot_id")),
                ).alias("b")
            ),
        )
        # exactness guard: an in-ring best farther than the ring's guaranteed
        # reach could be beaten by a polygon whose covering cells sit just
        # outside the ring — route those points to the exact broadcast pass.
        near1 = best1.filter(F.col("b.dist_m") <= reach).select(
            point_id,
            lat_col,
            lon_col,
            F.col("b.plot_id").alias("plot_id"),
            F.col("b.dist_m").alias("dist_m"),
            F.lit(1).alias("knn_rank"),
        )
        far_ids = best1.filter(F.col("b.dist_m") > reach).select(point_id)
        none_ids = narrow.select(point_id).join(
            best1.select(point_id), point_id, "left_anti"
        ).unionByName(far_ids)
        all_idx1 = spark.createDataFrame(pd.DataFrame({"poly_idx": range(n_polys)}))
        fb1 = (
            narrow.join(none_ids, point_id, "left_semi")
            .crossJoin(broadcast(all_idx1))
            .join(broadcast(ids_df), "poly_idx")
            .withColumn("dist_m", dist("poly_idx", lon_col, lat_col))
            .groupBy(point_id, lat_col, lon_col)
            .agg(
                F.min_by(
                    F.struct(F.col("plot_id"), F.col("dist_m")),
                    F.struct(F.col("dist_m"), F.col("plot_id")),
                ).alias("b")
            )
            .select(
                point_id,
                lat_col,
                lon_col,
                F.col("b.plot_id").alias("plot_id"),
                F.col("b.dist_m").alias("dist_m"),
                F.lit(1).alias("knn_rank"),
            )
        )
        out1 = near1.unionByName(fb1)
        if points_is_narrow:
            return out1.select(*points.columns, "plot_id", "dist_m", "knn_rank")
        return points.join(out1.drop(lat_col, lon_col), point_id).select(
            *points.columns, "plot_id", "dist_m", "knn_rank"
        )

    # (point, poly) candidates are already unique (the dilated covering is
    # distinct per cell and each point has one cell) — no dedup shuffle needed
    ranked = hits.withColumn("dist_m", dist("poly_idx", lon_col, lat_col))

    # one window pass ranks candidates AND counts them, so exactness routing
    # (fewer than k in-ring candidates -> full broadcast re-rank) costs no
    # extra scan. tie-break on distance -> min plot_id (engine-frozen; the
    # reference's first-scanned order is not reproducible, plotid_by_latlon.py:63-68).
    w = Window.partitionBy(point_id).orderBy(F.col("dist_m").asc(), F.col("plot_id").asc())
    wc = Window.partitionBy(point_id)
    ranked = (
        ranked.withColumn("knn_rank", F.row_number().over(w))
        .withColumn("_n_cand", F.count("plot_id").over(wc))
        # distance of the k-th in-ring candidate: the exactness bound below
        # compares it against the ring's guaranteed reach
        .withColumn(
            "_dk", F.max(F.when(F.col("knn_rank") <= k, F.col("dist_m"))).over(wc)
        )
    )
    # cached once: near, few_ids, and the none_ids anti-join all read this
    # frame — without it each branch re-runs the candidate join + UDF
    ranked = _cache_scoped("knn_ranked", ranked)

    near = ranked.filter(
        (F.col("_n_cand") >= min(k, n_polys))
        & (F.col("_dk") <= reach)
        & (F.col("knn_rank") <= k)
    ).select(point_id, lat_col, lon_col, "plot_id", "dist_m", "knn_rank")

    # fallback set = points with SOME but < k candidates, plus points whose
    # k-th candidate is beyond the ring's guaranteed reach (an out-of-ring
    # polygon could be nearer), plus points with NO candidate at all.
    few_ids = ranked.filter(
        ((F.col("_n_cand") < min(k, n_polys)) | (F.col("_dk") > reach))
        & (F.col("knn_rank") == 1)
    ).select(point_id)
    none_ids = narrow.select(point_id).join(
        ranked.select(point_id).distinct(), point_id, "left_anti"
    )
    all_idx = spark.createDataFrame(pd.DataFrame({"poly_idx": range(n_polys)}))
    fb = (
        narrow.join(few_ids.unionByName(none_ids), point_id, "left_semi")
        .crossJoin(broadcast(all_idx))
        .join(broadcast(ids_df), "poly_idx")
        .withColumn("dist_m", dist("poly_idx", lon_col, lat_col))
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(point_id, lat_col, lon_col, "plot_id", "dist_m", "knn_rank")
    )
    out = near.unionByName(fb)
    if points_is_narrow:
        return out.select(*points.columns, "plot_id", "dist_m", "knn_rank")
    return points.join(out.drop(lat_col, lon_col), point_id).select(
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
      1. one row per point LEFT-joined to the broadcast ring-DILATED
         (cell, poly) covering table — null candidate marks 'nothing nearby'
         (the ring fan-out lives in the dim, so the big side never explodes);
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
    # ring dilation + interval pruning on the DIM side (see _poly_cells_df):
    # probe stays one row per point, candidates are unique (point, poly) pairs;
    # plot_id rides in the broadcast table (no second ids join).
    poly_cells = _poly_cells_df(
        spark, plots_pdf, res, ring=ring, prep=prep, keep_k=1, plot_ids=prep.plot_ids
    )
    cd = _contains_dist_udf(bc)

    # NARROW-FIRST: only (id, lat, lon) flows through the candidate join, the
    # refine kernel, and the aggregation — the wide payload (footprint strings,
    # metadata) is joined back once at the end. At 100 TB this is the
    # difference between shuffling ids and shuffling documents.
    # ``cell_col``: a precomputed cell ID at exactly ``res`` (e.g. the fused
    # footprint stage's cell_r13) skips the re-encode pass entirely.
    if cell_col is not None:
        pts = _ensure_parallel(
            spark, points.select(point_id, lat_col, lon_col, F.col(cell_col).alias("cell"))
        )
        narrow = pts.drop("cell")
    else:
        narrow = _ensure_parallel(spark, points.select(point_id, lat_col, lon_col))
        pts = narrow.withColumn("cell", h3_udf(res)(lat_col, lon_col))
    cand = pts.join(broadcast(poly_cells), "cell", "left").withColumn(
        "cd", cd("poly_idx", lon_col, lat_col)
    )

    ord_key = F.struct(
        F.col("plot_id").isNull().cast("int").alias("no_cand"),
        (~F.col("cd.contains")).cast("int").alias("not_contains"),
        F.col("cd.dist_m").alias("dist"),
        F.coalesce(F.col("plot_id"), F.lit("")).alias("pid"),
    )
    val = F.struct(
        F.col("plot_id").alias("plot_id"),
        F.col("cd.contains").alias("contains"),
        F.col("cd.dist_m").alias("dist_m"),
    )
    # group key = point id only; partial map-side min_by collapses the
    # candidate fan-out before the (single) shuffle. Scoped persist: both
    # branches below read the cache; the previous invocation's cache is
    # released on the next call (no cross-invocation accumulation).
    best = _cache_scoped(
        "resolve_best",
        cand.groupBy(point_id, lat_col, lon_col).agg(F.min_by(val, ord_key).alias("best")),
    )

    def _emit(df):
        return df.select(
            point_id,
            lat_col,
            lon_col,
            F.col("best.plot_id").alias("plot_id"),
            F.when(F.col("best.contains"), "contains")
            .otherwise("nearest")
            .alias("matched_via"),
        )

    # exactness guard (same bound as knn_join): a non-contained nearest match
    # farther than the ring's guaranteed reach could be beaten by a polygon
    # covered just outside the ring -> exact broadcast re-rank for those.
    reach = _ring_reach_m(ring, res, lat_col)
    ok = F.col("best.plot_id").isNotNull() & (
        F.col("best.contains") | (F.col("best.dist_m") <= reach)
    )
    resolved_n = _emit(best.filter(ok))

    # totality + exactness fallback: no covering cell within the ring, or the
    # in-ring nearest is beyond the soundness bound -> broadcast full dim
    missing = best.filter(~ok).select(point_id, lat_col, lon_col)
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
        .groupBy(point_id, lat_col, lon_col)
        .agg(F.min_by(val, fb_ord).alias("best"))
    )
    out = resolved_n.unionByName(fb)
    base_cols = {point_id, lat_col, lon_col} | ({cell_col} if cell_col else set())
    if set(points.columns) == base_cols:
        # already-narrow caller: no payload to join back
        if cell_col:
            return points.select(point_id, cell_col).join(
                out, point_id
            ).select(*points.columns, "plot_id", "matched_via")
        return out.select(*points.columns, "plot_id", "matched_via")
    return points.join(out.drop(lat_col, lon_col), point_id)
