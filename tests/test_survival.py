"""Kaplan-Meier hand goldens (the textbook 6-subject example)."""

import math


def test_kaplan_meier_textbook_table(spark):
    """Durations (observed): 1+, 2, 2, 3+, 4, 4+  (+ = censored).
    t=2: n=5, d=2 -> S=3/5; t=4: n=2, d=1 -> S=3/10."""
    from extractors_metadata_spark.operators.survival import kaplan_meier

    rows = [(1, 0), (2, 1), (2, 1), (3, 0), (4, 1), (4, 0)]
    df = spark.createDataFrame(rows, "duration long, observed long")
    out = {r["t"]: r for r in kaplan_meier(df).collect()}
    assert (out[2]["n_risk"], out[2]["d"], out[2]["c"]) == (5, 2, 0)
    assert (out[4]["n_risk"], out[4]["d"], out[4]["c"]) == (2, 1, 1)
    assert out[1]["term_fp"] == 0  # censoring-only step
    # ln S(2) = ln(3/5); ln S(4) = ln(3/5) + ln(1/2)
    assert out[2]["ln_s_fp"] == round(math.log(3 / 5) * 1e9)
    assert out[4]["ln_s_fp"] == (
        round(math.log(3 / 5) * 1e9) + round(math.log(1 / 2) * 1e9)
    )
    assert all(r["absorbed"] == 0 for r in out.values())


def test_kaplan_meier_absorbing_step(spark):
    """Everyone dies at t=5 -> d = n_risk: the step is flagged, the log
    term stays 0, and absorbed sticks for later rows (none here)."""
    from extractors_metadata_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame([(5, 1), (5, 1)], "duration long, observed long")
    r = kaplan_meier(df).collect()[0]
    assert (r["n_risk"], r["d"], r["term_fp"], r["absorbed"]) == (2, 2, 0, 1)


def test_user_lifetimes_censoring_rule(spark):
    from extractors_metadata_spark.operators.survival import user_lifetimes

    rows = [("a", 10), ("a", 12), ("b", 10), ("b", 15), ("c", 15)]
    df = spark.createDataFrame(rows, "subj string, day long")
    out = {r["subj"]: (r["duration"], r["observed"])
           for r in user_lifetimes(df, "subj", "day").collect()}
    assert out["a"] == (2, 1)   # ended before the global max day 15
    assert out["b"] == (5, 0)   # active on the last day -> censored
    assert out["c"] == (0, 0)
