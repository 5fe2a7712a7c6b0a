"""Convex polygon intersection area — the spatial-overlay operator.

True polygon x polygon overlay (the step past bbox_overlap's rectangle
test): for each candidate pair of CONVEX quads P, Q compute their
intersection polygon and its area.  Classic result: the vertices of a
convex intersection are exactly (a) P's vertices inside Q, (b) Q's
vertices inside P, (c) edge-pair intersection points — a FIXED-SIZE
candidate set (8 + 16 for quads), so the whole overlay is pure PER-ROW
array arithmetic: candidates are built with array higher-order functions
(transform/filter over literal index sequences), the centroid anchor is
an exact array fold, the ring order is one sort_array, and the shoelace
is an array aggregate — NO explode, NO union, NO groupBy, NO join, ZERO
exchanges (r6: the previous explode + 3-way union + aggregate + self-join
+ second aggregate shape shuffled the 24x candidate fan-out three times
for what is row-local math; same IEEE/fixed-point expressions, same
output bits).

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
bbox_overlap join — never all-pairs; one row per pair, ``id_cols``
identify the row); per pair the fan-out is a constant 24 candidate
ARRAY entries, and the whole operator is whole-stage-codegen projection
work — it scales with the scan, full stop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

C_SCALE = 1e12  # centroid fixed point (1e-12 deg)
A_SCALE = 1e18  # shoelace term fixed point (1e-18 deg^2)


def _pt(arr_x, arr_y, i) -> tuple[Column, Column]:
    """quad vertex i (wrapped mod 4; int or Column index, 1-based arrays)."""
    ax = F.col(arr_x) if isinstance(arr_x, str) else arr_x
    ay = F.col(arr_y) if isinstance(arr_y, str) else arr_y
    ix = (i % 4) + 1
    return F.element_at(ax, ix), F.element_at(ay, ix)


def _inside(px: Column, py: Column, qx, qy) -> Column:
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


def _he(a: str, n: str) -> Column:
    """half-even integer division a/n on long columns (exact)."""
    return F.expr(
        f"CASE WHEN 2 * pmod({a}, {n}) > {n} "
        f"OR (2 * pmod({a}, {n}) = {n} AND (({a} - pmod({a}, {n})) div {n}) % 2 = 1) "
        f"THEN ({a} - pmod({a}, {n})) div {n} + 1 "
        f"ELSE ({a} - pmod({a}, {n})) div {n} END"
    )


def convex_intersection_area(
    pairs: DataFrame, id_cols: list[str]
) -> DataFrame:
    """``pairs``: id_cols + ax/ay/bx/by (array<double> of 4 CCW quad
    vertices; x = lon, y = lat; one pair per row — ``id_cols`` identify
    the row).  Returns (id_cols..., n_vertices, area2_fp) for pairs whose
    intersection has >= 3 vertices."""
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
    # ONE pair-keyed exchange (r6): the centroid anchor comes from WINDOW
    # aggregates over the same hash partitioning the final ring collect
    # needs, so the pre-r6 shape's aggregate + join-back-to-cand (which
    # recomputed the whole candidate union a second time and shuffled it
    # twice more) disappears. Window sums of longs == group sums of longs
    # (exact int, order-free), so every emitted value is bit-identical.
    # (A fully-inlined zero-shuffle array variant was measured 26x SLOWER
    # here: higher-order-function lambdas evaluate interpreted, and the
    # 24-way expanded expressions dwarf the one bounded exchange.)
    from pyspark.sql import Window

    w = Window.partitionBy(*id_cols)
    cc = (
        cand.withColumn("n_vertices", F.count(F.lit(1)).over(w))
        .withColumn(
            "_sx", F.sum(F.bround(F.col("x") * C_SCALE, 0).cast("long")).over(w)
        )
        .withColumn(
            "_sy", F.sum(F.bround(F.col("y") * C_SCALE, 0).cast("long")).over(w)
        )
        .filter(F.col("n_vertices") >= 3)
        .withColumn(
            "_cx", _he("_sx", "n_vertices").cast("double") / F.lit(C_SCALE)
        )
        .withColumn(
            "_cy", _he("_sy", "n_vertices").cast("double") / F.lit(C_SCALE)
        )
        .select(
            *id_cols, "n_vertices",
            (F.col("x") - F.col("_cx")).alias("dx"),
            (F.col("y") - F.col("_cy")).alias("dy"),
        )
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
