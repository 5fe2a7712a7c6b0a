"""CUSUM via the prefix-minimum identity (operators/cusum.py)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from extractors_metadata_spark.operators.cusum import cusum_detect

T0 = dt.datetime(2024, 1, 1)


def _events(spark, vals, user=1):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [user] * len(vals),
                "event_id": range(len(vals)),
                "ts": [T0 + dt.timedelta(minutes=i) for i in range(len(vals))],
                "value": vals,
            }
        )
    )


def _seq_cusum(vals, k_u, h_u):
    """Direct sequential recursion s_t = max(0, s + d_t) — the definition
    the window identity must reproduce."""
    v_u = [round(v * 1e6) for v in vals]
    n = len(v_u)
    s_sum = sum(v_u)
    q, r = divmod(s_sum, n)
    mu = q + (1 if (2 * r > n or (2 * r == n and q % 2 == 1)) else 0)
    s = 0
    mx, n_over, first = 0, 0, None
    for i, v in enumerate(v_u):
        s = max(0, s + (v - mu - k_u))
        mx = max(mx, s)
        if s > h_u:
            n_over += 1
            if first is None:
                first = i
    return mu, mx, n_over, first


def test_identity_matches_sequential_recursion(spark):
    # drift upward in the second half -> a detectable change
    vals = [10.0, 9.5, 10.2, 10.1, 9.9, 13.0, 13.4, 13.2, 13.8, 13.1]
    k_u, h_u = 200_000, 2_000_000
    out = cusum_detect(_events(spark, vals), k_u=k_u, h_u=h_u).collect()[0]
    mu, mx, n_over, first = _seq_cusum(vals, k_u, h_u)
    assert out.mu_u == mu
    assert out.max_cusum_u == mx
    assert out.n_over == n_over
    base = int(T0.timestamp()) * 1_000_000
    want_first = None if first is None else base + first * 60 * 1_000_000
    assert out.first_over_us == want_first
    assert n_over > 0  # the change actually alarms


def test_stable_stream_never_alarms(spark):
    vals = [10.0, 10.1, 9.9, 10.0, 10.05, 9.95] * 3
    out = cusum_detect(_events(spark, vals)).collect()[0]
    assert out.n_over == 0 and out.first_over_us is None
    mu, mx, n_over, first = _seq_cusum(vals, 200_000, 2_000_000)
    assert out.max_cusum_u == mx
