"""Kaplan-Meier survival estimation — the right-censored life table.

THE retention/churn estimator (Kaplan & Meier 1958): given per-subject
durations with a right-censoring flag (subject still alive when the
observation window closed), estimate S(t) = P(survive past t) as the
product-limit  S(t) = prod_{t' <= t} (1 - d_t'/n_t').  Every analytics
stack ships this (user retention curves, session-length survival,
hardware failure); it is the canonical statistic that CANNOT be computed
by naive averaging because censored subjects carry partial information.

Exactness discipline: the life table (t, n_risk, d, c) is pure counting
— exact int64.  The survival curve is emitted in LOG space as the exact
integer sum of per-step 1e9 half-even fixed points of ln((n-d)/n)
(np.rint == DuckDB round_even; per-term fixed point BEFORE the
order-free int sum — the mutual_info discipline; |ln| <= ~30 keeps the
ulp drift ~1e-7 of one fixed-point unit).  S(t) = exp(ln_s_fp / 1e9)
consumer-side.  The degenerate absorbing step d == n (everyone at risk
dies, S -> 0, ln -> -inf) is flagged with an integer ``absorbed``
column instead of emitting an infinity — both engines evaluate the same
CASE, and the output stays hashable.

Scale shape: ONE subject-keyed aggregate produces the per-duration
table (the only data-sized exchange); everything after runs on the
DISTINCT-DURATION frame, which is dimension-sized (bounded by the
observation window in bins), so the unpartitioned ordered windows that
give n_risk / the running log-sum are windows over a tiny dim — never
over subjects.

Reference analog: none — the reference keeps no longitudinal state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ln_ratio_fp_udf():
    @F.pandas_udf("long")
    def _ln_ratio_fp(num: pd.Series, den: pd.Series) -> pd.Series:
        # rint(ln(num/den) * 1e9): one correctly-rounded int64/int64
        # division, ln drift absorbed by the 1e9 half-even margin
        n = num.to_numpy(np.int64)
        d = den.to_numpy(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.rint(np.log(n / d) * 1e9)
        return pd.Series(np.where(n > 0, t, 0.0).astype(np.int64))

    return _ln_ratio_fp


def kaplan_meier(
    subjects: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
) -> DataFrame:
    """Product-limit life table -> one row per distinct duration t:
    (t, n_risk, d, c, term_fp, ln_s_fp, absorbed).

    ``subjects``: one row per subject with an int64 duration and an
    int64 0/1 ``observed`` flag (1 = the event happened at t; 0 = right-
    censored at t).  d = events at t, c = censorings at t, n_risk =
    subjects with duration >= t; term_fp = rint(ln((n-d)/n) * 1e9) (0
    when d = 0 or d = n); ln_s_fp = running sum of term_fp (ln S(t) in
    1e9 fixed point); absorbed = 1 from the first step where d = n
    (S(t) = 0 beyond — the log is a flag, not a value, there)."""
    tab = subjects.groupBy(F.col(duration_col).cast("long").alias("t")).agg(
        F.sum(F.col(observed_col).cast("long")).alias("d"),
        F.sum(F.lit(1) - F.col(observed_col).cast("long")).alias("c"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    rk = tab.withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(w_desc))
    tm = rk.select(
        "t", "n_risk", "d", "c",
        F.when(
            (F.col("d") == 0) | (F.col("d") == F.col("n_risk")), F.lit(0)
        )
        .otherwise(
            _ln_ratio_fp_udf()(F.col("n_risk") - F.col("d"), F.col("n_risk"))
        )
        .cast("long")
        .alias("term_fp"),
        F.when(F.col("d") == F.col("n_risk"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_abs0"),
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return tm.select(
        "t", "n_risk", "d", "c", "term_fp",
        F.sum("term_fp").over(w_asc).cast("long").alias("ln_s_fp"),
        F.max("_abs0").over(w_asc).cast("long").alias("absorbed"),
    )


def user_lifetimes(
    events: DataFrame,
    id_col: str = "user_id",
    bin_col: str = "day",
) -> DataFrame:
    """Per-subject (id, duration, observed) from an event log: duration =
    last bin - first bin; right-censored (observed = 0) iff the subject
    was still active in the log's GLOBAL last bin.  One subject-keyed
    aggregate + one broadcast 1-row max join."""
    life = events.groupBy(id_col).agg(
        F.min(bin_col).alias("_lo"), F.max(bin_col).alias("_hi")
    )
    gmax = events.agg(F.max(bin_col).alias("_gmax"))
    return life.crossJoin(F.broadcast(gmax)).select(
        F.col(id_col),
        (F.col("_hi") - F.col("_lo")).cast("long").alias("duration"),
        F.when(F.col("_hi") == F.col("_gmax"), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("observed"),
    )
