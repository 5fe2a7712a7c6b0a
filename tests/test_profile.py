"""Table statistics profiling (operators/profile.py)."""

from __future__ import annotations

import pandas as pd


def _profile(spark, exact=True):
    from extractors_metadata_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [
            (1, "en", None),
            (2, "en", 10),
            (3, None, 20),
            (4, "fr", 20),
        ],
        "id long, lang string, n long",
    )
    out = profile_table(df, exact_distinct=exact)
    return {r["column"]: r for r in out.collect()}


def test_profile_exact_counts_and_minmax(spark):
    p = _profile(spark)
    assert p["id"]["n_rows"] == 4 and p["id"]["n_null"] == 0
    assert p["id"]["n_distinct"] == 4
    assert p["id"]["min_s"] == "1" and p["id"]["max_s"] == "4"
    assert p["lang"]["n_null"] == 1 and p["lang"]["n_distinct"] == 2
    assert p["lang"]["min_s"] == "en" and p["lang"]["max_s"] == "fr"
    assert p["n"]["n_null"] == 1 and p["n"]["n_distinct"] == 2
    # typed min/max: numeric ordering, not lexical ("10" < "2" lexically)
    assert p["n"]["min_s"] == "10" and p["n"]["max_s"] == "20"


def test_profile_approx_path_is_sane(spark):
    p = _profile(spark, exact=False)
    # HLL++ at default precision is exact at tiny cardinalities
    assert p["id"]["n_distinct"] == 4 and p["lang"]["n_distinct"] == 2


def test_profile_is_single_scan(spark):
    """The melt must feed every column's row from ONE aggregate — a
    per-column unionByName would replan the full-table scan N times."""
    from extractors_metadata_spark.operators.profile import profile_table

    df = spark.createDataFrame(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}))
    plan = profile_table(df)._sc._jvm.PythonSQLUtils.explainString(
        profile_table(df)._jdf.queryExecution(), "formatted"
    )
    assert "Union" not in plan
