"""Plan-shape pins for the session-4 operators: the scale claims in their
docstrings (no cartesian, pure codegen where promised, exactly-one Arrow
pass where a kernel is required, broadcast dims) asserted on the physical
plan at sf0.001 — the COVERAGE.md 100 TB arguments as executable checks."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e

    class _Unwrapped:
        """Plan-shape tests must see the OPERATOR plan, not the
        InMemoryTableScan of the r6 coalesced-materialization wrap —
        unwrap registry entries back to their builders."""

        def queries(self):
            return {
                k: getattr(f, "__wrapped__", f)
                for k, f in e.queries().items()
            }

        def __getattr__(self, a):
            return getattr(e, a)

    return _Unwrapped()


def test_pure_codegen_queries_have_no_python(spark, entry):
    # promised zero-Python plans: integer/window arithmetic only
    for name in ("exact_substr", "twap", "emd_drift", "user_mad", "sax_words",
                 "locf_resample", "attribution", "haar2d", "ccf_lags",
                 "line_density", "mutual_knn", "source_divergence"):
        p = _plan(entry.queries()[name](spark, SF))
        if name in ("source_divergence",):
            continue  # has its one declared Arrow pass (checked below)
        assert "BatchEvalPython" not in p, name      # no row-at-a-time Python
        if name != "mutual_knn":
            assert "ArrowEvalPython" not in p, name  # no pandas UDF at all


def test_single_arrow_pass_where_declared(spark, entry):
    # lm_quality and source_divergence fuse their fixed-point kernel into
    # exactly ONE Arrow pass (the one-pass-per-stage rule)
    for name in ("lm_quality", "source_divergence"):
        p = _plan(entry.queries()[name](spark, SF))
        assert p.count("ArrowEvalPython") == 1, name
        assert "BatchEvalPython" not in p, name


def test_no_cartesian_anywhere_in_batch(spark, entry):
    for name in ("quadtree", "contact_crossings", "lm_quality",
                 "exact_substr", "attribution", "knox_test", "getis_ord",
                 "line_density", "ccf_lags", "langid_confusion"):
        p = _plan(entry.queries()[name](spark, SF))
        assert "CartesianProduct" not in p, name


def test_quadtree_broadcasts_level_counts(spark, entry):
    p = _plan(entry.queries()["quadtree"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
