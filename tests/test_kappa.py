"""Cohen's kappa (operators/assoc.cohens_kappa): the textbook 2x2 hand
case and the asymmetric-label-set marginal rule."""

from __future__ import annotations


def _kappa(spark, cells):
    from extractors_metadata_spark.operators.assoc import cohens_kappa

    conf = spark.createDataFrame(
        cells, "true_label string, pred_label string, n long"
    )
    return cohens_kappa(conf).collect()[0]


def test_kappa_textbook_2x2(spark):
    """N=100, agree 70, marginals rows (50,50) x cols (60,40) ->
    chance 5000, kappa = 2000/5000 = 0.4."""
    r = _kappa(
        spark,
        [("a", "a", 40), ("a", "b", 10), ("b", "b", 30), ("b", "a", 20)],
    )
    assert (r["n_total"], r["n_agree"], r["chance_num"]) == (100, 70, 5000)
    assert (r["kappa_num"], r["kappa_den"]) == (2000, 5000)


def test_kappa_label_only_on_one_axis(spark):
    """A predicted-only label ('c') contributes col marginal 10 but row
    marginal 0 -> zero chance product (the full-outer coalesce rule)."""
    r = _kappa(
        spark,
        [
            ("a", "a", 40), ("a", "b", 10),
            ("b", "b", 30), ("b", "a", 20), ("b", "c", 10),
        ],
    )
    assert (r["n_total"], r["n_agree"], r["chance_num"]) == (110, 70, 5400)
    assert (r["kappa_num"], r["kappa_den"]) == (2300, 6700)
