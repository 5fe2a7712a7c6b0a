"""Mann-Kendall per-key trend (operators/trend.mann_kendall)."""

from __future__ import annotations


def _py_mk(series):
    """Independent Python replay: S + tie-corrected var numerator."""
    n = len(series)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            d = series[j] - series[i]
            s += (d > 0) - (d < 0)
    from collections import Counter

    ties = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(series).values()
    )
    return s, n * (n - 1) * (2 * n + 5) - ties


def _run(spark, rows, lo, hi):
    from extractors_metadata_spark.operators.trend import mann_kendall

    counts = spark.createDataFrame(rows, "k long, bin long, n long")
    out = mann_kendall(
        counts, ["k"], bin_col="bin", n_col="n", bin_lo=lo, bin_hi=hi
    )
    return {r["k"]: (r["n_bins"], r["s_stat"], r["var18"]) for r in out.collect()}


def test_monotone_up_and_down(spark):
    rows = [(1, b, b + 1) for b in range(5)] + [(2, b, 9 - b) for b in range(5)]
    got = _run(spark, rows, 0, 4)
    assert got[1] == (5, *(_py_mk([1, 2, 3, 4, 5])[0],) + (_py_mk([1, 2, 3, 4, 5])[1],))
    assert got[1][1] == 10 and got[2][1] == -10
    # no ties: var18 = n(n-1)(2n+5) = 5*4*15 = 300
    assert got[1][2] == 300 and got[2][2] == 300


def test_zero_fill_and_ties(spark):
    # key 3 observed only in bins 1 and 3 over range 0..4 -> series
    # [0, 2, 0, 2, 0]: zeros are REAL values, creating tie groups.
    rows = [(3, 1, 2), (3, 3, 2)]
    got = _run(spark, rows, 0, 4)
    s, var18 = _py_mk([0, 2, 0, 2, 0])
    assert got[3] == (5, s, var18)
    # tie groups: three 0s and two 2s -> 3*2*11 + 2*1*9 = 84; 300-84=216
    assert var18 == 216


def test_derived_range_matches_explicit(spark):
    rows = [(7, 2, 5), (7, 4, 1), (7, 6, 3)]
    got_auto = _run(spark, rows, None, None)
    got_explicit = _run(spark, rows, 2, 6)
    assert got_auto == got_explicit
    assert got_auto[7] == (5, *_py_mk([5, 0, 1, 0, 3]))


def test_constant_series_all_ties(spark):
    rows = [(9, b, 4) for b in range(4)]
    got = _run(spark, rows, 0, 3)
    # S = 0; one tie group of 4 -> var18 = 4*3*13 - 4*3*13 = 0
    assert got[9] == (4, 0, 0)
