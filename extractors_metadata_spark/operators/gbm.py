"""Gradient-boosted depth-1 trees (stumps) with EXACT integer arithmetic.

Engine-added capability (the linearfit.py mandate: lightweight supervised
fits a curation pipeline runs cluster-side): boosting with squared loss
over two integer features — the additive-model step up from ridge_fit's
single linear solve and perceptron_fit's single separator.  Squared-loss
boosting's round structure is exactly replayable because every quantity
is a rational of integer sums:

- prediction f carries a 1e6 FIXED POINT (int64; |f| <= ~6e8 here);
- residual r_i = y_i * 1e6 - f_i is an exact int64;
- a stump candidate's gain (variance reduction, parent term dropped —
  constant across candidates) is (S_L^2/n_L + S_R^2/n_R); candidates are
  compared on ``gain_div = (S_L^2 n_R + S_R^2 n_L) div (n_L n_R 1e6)``
  — ONE truncating division of exact DECIMAL(38,0)/HUGEINT products
  (both engines truncate toward zero; the ridge_fit pairing), ties
  broken by candidate index, so selection is bit-deterministic;
- leaf updates v = S div (2 n) (learning rate 1/2 folded into the
  truncating division — exact both engines).

DECIMAL(38,0) envelope: S ~ n * 6e8 -> S^2 n ~ 2e31 at sf0.1 (n=5e3)
and ~2e33 at n=5e5 — safe under 1e38 to ~n=1e6 docs per fitted group;
beyond that rescale the fixed point (document at call site).

Scale shape: each round is ONE full-scan aggregate computing every
candidate's (n_L, S_L, n_R, S_R) as conditional sums in a single
codegen projection (no fan-out, no shuffle beyond the 1-row agg), a
1-row collect (the bounded stats-frame rule), and a literal-expression
prediction update.  Rounds are a bounded literal.  The feature frame is
persisted once.

Oracle twin: rounds unroll as generated CTE stages — candidate aggs as
CASE sums over a VALUES dim, best pick via row_number, next-round f via
the 1-row best CTE (see oracles._gbm_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def gbm_stumps(
    df: DataFrame,
    candidates: list[tuple[int, int]],
    rounds: int = 3,
) -> DataFrame:
    """Fit ``rounds`` stumps on (x1, x2, y); candidates = [(feat, thr)]
    with feat in {1, 2}.  Returns the model table: one row per round
    (rnd, cand, feat, thr, gain_div, v_l, v_r) — all exact int64."""
    feats = df.select(
        F.col("x1").cast("long"),
        F.col("x2").cast("long"),
        F.col("y").cast("long"),
    ).persist()
    base = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    ).collect()[0]
    f_expr = F.lit(int((base["sy"] * 1000000) // base["n"] if base["sy"] >= 0
                       else -((-base["sy"] * 1000000) // base["n"])))
    # trunc-toward-zero global mean fp (sy >= 0 for counts/lengths here,
    # but keep the sign-split so the operator stays general)
    model_rows = []
    for rnd in range(int(rounds)):
        r = (F.col("y") * 1000000 - f_expr).alias("r")
        aggs = []
        for cid, (feat, thr) in enumerate(candidates):
            cond = (F.col(f"x{feat}") <= F.lit(int(thr)))
            aggs.append(
                F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
                .cast("long").alias(f"nl{cid}")
            )
            aggs.append(
                F.sum(F.when(cond, F.col("r")).otherwise(F.lit(0)))
                .cast("long").alias(f"sl{cid}")
            )
        stats = feats.select("x1", "x2", r).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("r").cast("long").alias("s"),
            *aggs,
        ).collect()[0]
        n_tot, s_tot = stats["n"], stats["s"]
        best = None
        for cid, (feat, thr) in enumerate(candidates):
            nl, sl = stats[f"nl{cid}"], stats[f"sl{cid}"]
            nr, sr = n_tot - nl, s_tot - sl
            if nl == 0 or nr == 0:
                continue
            num = sl * sl * nr + sr * sr * nl  # python ints: exact
            den = nl * nr * 1000000
            gain_div = num // den  # num, den >= 0: floor == trunc
            key = (-gain_div, cid)
            if best is None or key < best[0]:
                vl = _trunc_div(sl, 2 * nl)
                vr = _trunc_div(sr, 2 * nr)
                best = (key, cid, feat, thr, gain_div, vl, vr)
        if best is None:
            break
        _, cid, feat, thr, gain_div, vl, vr = best
        model_rows.append((rnd, cid, feat, thr, gain_div, vl, vr))
        f_expr = f_expr + F.when(
            F.col(f"x{feat}") <= F.lit(int(thr)), F.lit(int(vl))
        ).otherwise(F.lit(int(vr)))
    feats.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(
        model_rows,
        "rnd long, cand long, feat long, thr long, gain_div long, "
        "v_l long, v_r long",
    )


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero division (Spark decimal `div` / DuckDB
    HUGEINT `//` semantics) for python ints, which floor."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q
