"""Symmetric Hausdorff track-pair join — near-duplicate trajectory detection.

The Hausdorff distance max(h(A,B), h(B,A)) with h(A,B) = max_{a in A}
min_{b in B} d(a, b) is the standard "are these two tracks the same
route" measure (map-conflation, GPS-trace dedup, fleet-route clustering).
This operator finds all user pairs whose SYMMETRIC Hausdorff distance is
<= r, exactly, without an all-pairs scan:

CANDIDATE COMPLETENESS (the radius_pairs discipline): if the symmetric
Hausdorff of (A, B) is <= r then EVERY point of A has a point of B
within r; with blocking cells of side S = r a distance-r pair differs by
at most 1 cell index per axis, so A and B co-occupy some 3x3 cell
neighborhood.  Pairing users on a one-ring-dilated DISTINCT cell frame
therefore has exact recall for the <= r output — the dilation happens on
the tiny per-user cell set, never on the point table (pip_knn's
dilate-the-dim rule).

EXACTNESS: inputs are nonnegative integer quantized coordinates (the
registry uses micro-degrees via the round_even pairing with a nonneg
shift); d2 = (ax-bx)^2 + (ay-by)^2 is exact int64 (safe for coordinate
spans < ~2e9 units), and the min/max lattice is integer-only — the
DuckDB oracle replays it as a BRUTE-FORCE all-pairs join, which doubles
as the proof that the ring blocking loses no pair.

SCALE SHAPE: candidates are cell-local (bucket-keyed self-join of the
distinct (user, cell) frame); the exact verify is PAIR-SCOPED — one
shuffle join fanning candidate pairs by track A, one by track B, then
the both-directions point-min computed in a SINGLE aggregation chain:
each (a, b) point match explodes into its two directed roles (x2, a
literal array — collapsed immediately by the map-side-combining min),
one (pair, dir, point) min, one (pair) max-pivot.  No persist, no
recompute of the big join, per-pair work O(|A| * |B|) with track sizes
bounded by upstream dedup/caps.

Reference analog: none (the reference handles one dataset at a time);
this widens the trajectory suite (scan_legs, track_crossings,
resample_track) with the pairwise similarity primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hausdorff_pairs(
    pts: DataFrame,
    r: int,
    user_col: str = "user_id",
    x_col: str = "qx",
    y_col: str = "qy",
) -> DataFrame:
    """All user pairs (u_a < u_b) with symmetric Hausdorff distance
    <= ``r`` (integer coordinate units) -> (u_a, u_b, h_ab2, h_ba2, hd2)
    where h_ab2/h_ba2 are the SQUARED directed distances and
    hd2 = max(h_ab2, h_ba2) <= r*r.  ``pts`` columns: ``user_col`` plus
    NONNEGATIVE integer ``x_col``/``y_col`` (duplicate points collapse —
    Hausdorff is a set distance)."""
    u, x, y = F.col(user_col), F.col(x_col), F.col(y_col)
    p = (
        pts.select(u.alias("u"), x.alias("x").cast("long"), y.alias("y").cast("long"))
        .distinct()
    )

    cells = p.select(
        "u",
        F.expr(f"x div {int(r)}").alias("cx"),
        F.expr(f"y div {int(r)}").alias("cy"),
    ).distinct()
    ring = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    dil = cells.select(
        F.col("u").alias("u_a"), F.explode(ring).alias("o"), "cx", "cy"
    ).select(
        "u_a",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    ).distinct()
    cand = (
        dil.join(
            cells.select(F.col("u").alias("u_b"), "cx", "cy"), ["cx", "cy"]
        )
        .filter(F.col("u_a") < F.col("u_b"))
        .select("u_a", "u_b")
        .distinct()
    )

    a = p.select(F.col("u").alias("u_a"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = p.select(F.col("u").alias("u_b"), F.col("x").alias("bx"), F.col("y").alias("by"))
    d = (
        cand.join(a, "u_a")
        .join(b, "u_b")
        .select(
            "u_a",
            "u_b",
            "ax",
            "ay",
            "bx",
            "by",
            (
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            ).alias("d2"),
        )
    )
    roles = F.array(
        F.struct(
            F.lit(0).alias("dir"), F.col("ax").alias("kx"), F.col("ay").alias("ky")
        ),
        F.struct(
            F.lit(1).alias("dir"), F.col("bx").alias("kx"), F.col("by").alias("ky")
        ),
    )
    mins = (
        d.select("u_a", "u_b", "d2", F.explode(roles).alias("k"))
        .groupBy("u_a", "u_b", "k.dir", "k.kx", "k.ky")
        .agg(F.min("d2").alias("dmin"))
    )
    h = mins.groupBy("u_a", "u_b").agg(
        F.max(F.when(F.col("dir") == 0, F.col("dmin"))).alias("h_ab2"),
        F.max(F.when(F.col("dir") == 1, F.col("dmin"))).alias("h_ba2"),
    )
    return h.select(
        "u_a",
        "u_b",
        "h_ab2",
        "h_ba2",
        F.greatest("h_ab2", "h_ba2").alias("hd2"),
    ).filter(F.col("hd2") <= int(r) * int(r))
