"""Viterbi HMM map-matching: snap noisy point tracks to the plot grid.

The classical map-matching formulation (Newson & Krumm, ACM GIS 2009):
hidden states are road elements — here the reference's plot-grid cells
(``/root/reference/plotid_by_latlon.py:79-82`` resolves positions to the
same grid one point at a time; this operator decodes the WHOLE track
jointly, which is what makes HMM matching robust to GPS noise where the
per-point nearest cell zig-zags). Emission cost = Manhattan distance
from the observation to the candidate cell centroid; transition cost =
Manhattan distance between consecutive candidate centroids (the
"routes should be short and contiguous" prior). Viterbi decodes the
min-total-cost state sequence.

Exactness contract: the observation position is derived from event_id by
PURE INTEGER arithmetic in half-milli-cell units — the grid's 54 x 16
cells become a 108000 x 32000 integer lattice where the synthetic
position ((e % 1000) + 0.5) / 1000 * 54 cells is EXACTLY
(e % 1000) * 108 + 54 half-milli-cells (and the pass axis
(e % 640) * 50 + 25) — so emissions, transitions, the DP, and the
tie-broken backtrack are all int64 and the DuckDB oracle replays the
recurrence bit-for-bit as unrolled CTE stages (no float exists anywhere
in the operator).

Bounds ARE the semantics: tracks are the FIRST ``t_len`` points by
(ts, event_id) and users with fewer points are excluded by definition
(fixed-length decode); candidate states per observation are the 3x3
cell neighborhood clamped to the grid (<= 9), so each forward stage
joins <= 9 x 9 state pairs per user — never |grid|^2.

Tie-break rule (the repo-wide discipline): the decoded path takes, at
each backtrack step, the minimum (cost, state_row, state_col) tuple —
encoded on both engines as min(cost * 1_000_000 + r * 1000 + c).

Scale shape: observations shuffle ONCE on user_id (window + groupBy);
the DP is one Arrow batch per user partition, O(t_len * 81) integer
work per track, zero shuffle inside the kernel; the state frame never
materializes beyond the per-user candidate sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

T_LEN = 12
MAX_USERS = 40
N_ROWS = 54
N_COLS = 16
CELL = 2000  # half-milli-cells per grid cell
_KEY = 1_000_000


def observations(
    events: DataFrame,
    t_len: int = T_LEN,
    max_users: int = MAX_USERS,
) -> DataFrame:
    """(u, t, py, px): the first ``t_len`` observations per user in
    half-milli-cell integer units, users below ``max_users`` with a full
    track. py/px come from event_id by exact integer arithmetic — the
    one place the synthetic position formula is integerized."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events.filter(F.col("user_id") < max_users)
        .select(
            "user_id",
            "ts",
            "event_id",
            ((F.col("event_id") % 1000) * 108 + 54).alias("py"),
            ((F.col("event_id") % 640) * 50 + 25).alias("px"),
        )
        .withColumn("_s", F.row_number().over(w))
        .filter(F.col("_s") <= t_len)
    )
    full = (
        seq.groupBy("user_id")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") == t_len)
        .select("user_id")
    )
    return seq.join(F.broadcast(full), "user_id").select(
        F.col("user_id").alias("u"),
        (F.col("_s") - 1).alias("t"),
        F.col("py").cast("long").alias("py"),
        F.col("px").cast("long").alias("px"),
    )


def _cands(py: int, px: int):
    """3x3 candidate cells around the containing cell, grid-clamped."""
    row, col = py // CELL, px // CELL
    out = []
    for r in range(max(row - 1, 0), min(row + 1, N_ROWS - 1) + 1):
        for c in range(max(col - 1, 0), min(col + 1, N_COLS - 1) + 1):
            e = abs(py - (r * CELL + CELL // 2)) + abs(
                px - (c * CELL + CELL // 2)
            )
            out.append((r, c, e))
    return out


def _viterbi_udf():
    @F.pandas_udf(
        "struct<rs: array<long>, cs: array<long>, total_cost: long>"
    )
    def viterbi(pys: pd.Series, pxs: pd.Series) -> pd.DataFrame:
        rs_out, cs_out, cost_out = [], [], []
        for py_arr, px_arr in zip(pys, pxs):
            py = np.asarray(py_arr, np.int64)
            px = np.asarray(px_arr, np.int64)
            n = len(py)
            cands = [_cands(int(py[t]), int(px[t])) for t in range(n)]
            # forward: V[t][(r, c)] = min total cost ending at (r, c)
            v = [{(r, c): e for r, c, e in cands[0]}]
            for t in range(1, n):
                cur = {}
                for r, c, e in cands[t]:
                    best = min(
                        pv + CELL * (abs(pr - r) + abs(pc - c))
                        for (pr, pc), pv in v[t - 1].items()
                    )
                    cur[(r, c)] = e + best
                v.append(cur)
            # decode: min (cost, r, c) at the end, then argmin back
            key = min(
                vv * _KEY + r * 1000 + c for (r, c), vv in v[n - 1].items()
            )
            total = key // _KEY
            path = [(int((key % _KEY) // 1000), int(key % 1000))]
            for t in range(n - 1, 0, -1):
                r, c = path[-1]
                k = min(
                    (pv + CELL * (abs(pr - r) + abs(pc - c))) * _KEY
                    + pr * 1000
                    + pc
                    for (pr, pc), pv in v[t - 1].items()
                )
                path.append((int((k % _KEY) // 1000), int(k % 1000)))
            path.reverse()
            rs_out.append([p[0] for p in path])
            cs_out.append([p[1] for p in path])
            cost_out.append(int(total))
        return pd.DataFrame(
            {"rs": rs_out, "cs": cs_out, "total_cost": cost_out}
        )

    return viterbi


def viterbi_match(
    events: DataFrame,
    t_len: int = T_LEN,
    max_users: int = MAX_USERS,
) -> DataFrame:
    """HMM map-matching over per-user tracks -> one row per (user, step):
    (user_id, t, obs_r, obs_c, state_r, state_c, total_cost). obs_r/c is
    the raw per-point containing cell (the zig-zag baseline); state_r/c
    is the jointly-decoded Viterbi cell; total_cost is the decoded
    track's cost (constant per user)."""
    obs = observations(events, t_len, max_users)
    tracks = (
        obs.groupBy("u")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("t", "py", "px"))
            ).alias("pts")
        )
        .select(
            "u",
            F.expr("transform(pts, p -> p.py)").alias("pys"),
            F.expr("transform(pts, p -> p.px)").alias("pxs"),
        )
    )
    dec = tracks.select(
        "u", _viterbi_udf()(F.col("pys"), F.col("pxs")).alias("d")
    ).select(
        "u",
        F.col("d.total_cost").alias("total_cost"),
        F.posexplode(
            F.arrays_zip(
                F.col("d.rs").alias("rs"), F.col("d.cs").alias("cs")
            )
        ).alias("t", "st"),
    )
    return (
        obs.join(
            dec.select(
                "u",
                "t",
                F.col("st.rs").alias("state_r"),
                F.col("st.cs").alias("state_c"),
                "total_cost",
            ),
            ["u", "t"],
        )
        .select(
            F.col("u").alias("user_id"),
            F.col("t").cast("long").alias("t"),
            F.expr("py div 2000").alias("obs_r"),
            F.expr("px div 2000").alias("obs_c"),
            F.col("state_r").cast("long").alias("state_r"),
            F.col("state_c").cast("long").alias("state_c"),
            F.col("total_cost").cast("long").alias("total_cost"),
        )
    )
