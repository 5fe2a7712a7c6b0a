"""Convex polygon intersection area — the spatial-overlay operator.

True polygon x polygon overlay (the step past bbox_overlap's rectangle
test): for each candidate pair of CONVEX quads P, Q compute their
intersection polygon and its area.  Classic result: the vertices of a
convex intersection are exactly (a) P's vertices inside Q, (b) Q's
vertices inside P, (c) edge-pair intersection points — a FIXED-SIZE
candidate set (8 + 16 for quads), so the whole overlay is a bounded
explode + window, NO iterative clipping loop and NO UDF: every step is
whole-stage-codegen arithmetic.

Exactness design (cross-engine identical, not just close):
- inside tests and segment parameters are identical-path IEEE doubles
  (cross products, one division) — both engines make the SAME keep/drop
  decision on every candidate, even at boundaries;
- the ring ORDER comes from the pseudoangle — a RATIONAL monotone
  substitute for atan2 (p = 1 - dx/(|dx|+|dy|) on the upper half,
  3 + dx/(|dx|+|dy|) below) — no transcendental, no libm drift; ties
  break by (dx, dy);
- the sort anchor is the candidate centroid in 1e-12-deg integer fixed
  point (order-free int sums + half-even division — any interior point
  works for a convex ring, so the integer centroid is exact AND anchor-
  stable);
- the shoelace runs on CENTERED coordinates (translation-invariant, so
  the 1e2-magnitude absolute lon/lat cancellation never happens) with
  per-term half-even 1e-18 fixed point before the order-free int sum —
  emitted as ``area2_fp`` (twice the area in 1e-18 deg^2 units).

Scale: input is the candidate PAIR frame (produced upstream by the
bbox_overlap join — never all-pairs); per pair the fan-out is a constant
24 candidate rows; one pair-keyed aggregate + one pair-keyed window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

C_SCALE = 1e12  # centroid fixed point (1e-12 deg)
A_SCALE = 1e18  # shoelace term fixed point (1e-18 deg^2)


def _pt(arr_x: str, arr_y: str, i) -> tuple[Column, Column]:
    """quad vertex i (wrapped mod 4; int or Column index, 1-based arrays)."""
    ix = (i % 4) + 1
    return F.element_at(F.col(arr_x), ix), F.element_at(F.col(arr_y), ix)


def _inside(px: Column, py: Column, qx: str, qy: str) -> Column:
    """point in CCW convex quad (boundary inclusive): all edge crosses >= 0."""
    conds = []
    for j in range(4):
        x0, y0 = _pt(qx, qy, j)
        x1, y1 = _pt(qx, qy, j + 1)
        conds.append((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0) >= 0)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def convex_intersection_area(
    pairs: DataFrame, id_cols: list[str]
) -> DataFrame:
    """``pairs``: id_cols + ax/ay/bx/by (array<double> of 4 CCW quad
    vertices; x = lon, y = lat).  Returns (id_cols..., n_vertices,
    area2_fp) for pairs whose intersection has >= 3 vertices."""
    ids = [F.col(c) for c in id_cols]
    idx4 = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")

    def vertices_in(ax, ay, bx, by):
        d = pairs.select(*ids, "ax", "ay", "bx", "by", idx4)
        px, py = _pt(ax, ay, F.col("i"))
        return d.filter(_inside(px, py, bx, by)).select(
            *ids, px.alias("x"), py.alias("y")
        )

    va = vertices_in("ax", "ay", "bx", "by")
    vb = vertices_in("bx", "by", "ax", "ay")

    ij = pairs.select(
        *ids, "ax", "ay", "bx", "by",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("ij"),
    ).select(
        *ids, "ax", "ay", "bx", "by",
        (F.col("ij") % 4).alias("i"), (F.col("ij") / 4).cast("int").alias("j"),
    )
    p0x, p0y = _pt("ax", "ay", F.col("i"))
    p1x, p1y = _pt("ax", "ay", F.col("i") + 1)
    q0x, q0y = _pt("bx", "by", F.col("j"))
    q1x, q1y = _pt("bx", "by", F.col("j") + 1)
    d1x, d1y = p1x - p0x, p1y - p0y
    d2x, d2y = q1x - q0x, q1y - q0y
    den = d1x * d2y - d1y * d2x
    tnum = (q0x - p0x) * d2y - (q0y - p0y) * d2x
    unum = (q0x - p0x) * d1y - (q0y - p0y) * d1x
    t = tnum / den
    u = unum / den
    inter = ij.filter(
        (den != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    ).select(*ids, (p0x + t * d1x).alias("x"), (p0y + t * d1y).alias("y"))

    cand = va.unionByName(vb).unionByName(inter)
    # integer centroid anchor: order-free fixed-point sums + half-even div
    agg = cand.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.bround(F.col("x") * C_SCALE, 0).cast("long")).alias("_sx"),
        F.sum(F.bround(F.col("y") * C_SCALE, 0).cast("long")).alias("_sy"),
    ).filter(F.col("n_vertices") >= 3)

    def he(a: str, n: str) -> Column:
        return F.expr(
            f"CASE WHEN 2 * pmod({a}, {n}) > {n} "
            f"OR (2 * pmod({a}, {n}) = {n} AND (({a} - pmod({a}, {n})) div {n}) % 2 = 1) "
            f"THEN ({a} - pmod({a}, {n})) div {n} + 1 "
            f"ELSE ({a} - pmod({a}, {n})) div {n} END"
        )

    anchored = agg.select(
        *id_cols, "n_vertices",
        (he("_sx", "n_vertices").cast("double") / F.lit(C_SCALE)).alias("_cx"),
        (he("_sy", "n_vertices").cast("double") / F.lit(C_SCALE)).alias("_cy"),
    )
    cc = cand.join(anchored, id_cols).select(
        *id_cols, "n_vertices",
        (F.col("x") - F.col("_cx")).alias("dx"),
        (F.col("y") - F.col("_cy")).alias("dy"),
    )
    ln = F.abs(F.col("dx")) + F.abs(F.col("dy"))
    pang = (
        F.when(ln == 0, F.lit(-1.0))
        .when(F.col("dy") >= 0, F.lit(1.0) - F.col("dx") / ln)
        .otherwise(F.lit(3.0) + F.col("dx") / ln)
    )
    ring = cc.withColumn("p", pang).groupBy(*id_cols, "n_vertices").agg(
        F.sort_array(F.collect_list(F.struct("p", "dx", "dy"))).alias("ring")
    )
    n = F.size("ring")
    terms = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.bround(
            (
                F.element_at("ring", i + 1)["dx"]
                * F.element_at("ring", (i + 1) % n + 1)["dy"]
                - F.element_at("ring", (i + 1) % n + 1)["dx"]
                * F.element_at("ring", i + 1)["dy"]
            )
            * F.lit(A_SCALE),
            0,
        ).cast("long"),
    )
    area2 = F.aggregate(terms, F.lit(0).cast("long"), lambda a, b: a + b)
    return ring.select(*id_cols, "n_vertices", area2.alias("area2_fp"))
