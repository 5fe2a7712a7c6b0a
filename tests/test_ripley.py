from __future__ import annotations

import pytest

from extractors_metadata_spark.operators.ripley import ripley_k


def _run(spark, rows, radii):
    df = spark.createDataFrame(rows, "user_id long, event_id long, qx long, qy long")
    return {
        (r["user_id"], r["r"]): (r["n_points"], r["n_pairs"])
        for r in ripley_k(df, radii).collect()
    }


def test_counts_per_radius(spark):
    # user 1: points at 0, 3, 10 on a line -> pairs d = 3, 7, 10
    rows = [(1, 1, 0, 0), (1, 2, 3, 0), (1, 3, 10, 0)]
    got = _run(spark, rows, (5, 8, 12))
    assert got[(1, 5)] == (3, 1)
    assert got[(1, 8)] == (3, 2)
    assert got[(1, 12)] == (3, 3)


def test_boundary_inclusive_and_diagonal(spark):
    # d2 = 25 at r = 5 is INSIDE (<=); diagonal (3,4) has d = 5 exactly
    rows = [(1, 1, 0, 0), (1, 2, 3, 4)]
    got = _run(spark, rows, (4, 5))
    assert got[(1, 4)] == (2, 0)
    assert got[(1, 5)] == (2, 1)


def test_single_point_key_emits_zero(spark):
    rows = [(1, 1, 0, 0), (2, 2, 100, 100)]
    got = _run(spark, rows, (10,))
    assert got[(1, 10)] == (1, 0)
    assert got[(2, 10)] == (1, 0)


def test_keys_do_not_mix(spark):
    # same coordinates under two keys: pairs stay key-local
    rows = [(1, 1, 0, 0), (2, 2, 1, 0), (1, 3, 2, 0)]
    got = _run(spark, rows, (5,))
    assert got[(1, 5)] == (2, 1)
    assert got[(2, 5)] == (1, 0)


def test_bad_radii_raise(spark):
    df = spark.createDataFrame([(1, 1, 0, 0)], "user_id long, event_id long, qx long, qy long")
    with pytest.raises(ValueError):
        ripley_k(df, ())
    with pytest.raises(ValueError):
        ripley_k(df, (0, 5))
