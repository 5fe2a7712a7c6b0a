"""Eval-set n-gram decontamination (operators/decontam.py)."""

from __future__ import annotations


def _run(spark, train_rows, eval_rows, n, broadcast_eval=True):
    from extractors_metadata_spark.operators.decontam import decontaminate

    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    out = decontaminate(train, ev, n=n, broadcast_eval=broadcast_eval)
    return {r["doc_id"]: r for r in out.collect()}


def test_decontaminate_flags_shared_ngrams(spark):
    train = [
        (1, "a b c d e f"),       # contains eval gram "b c d"
        (2, "x y z w v u"),       # clean
        (3, "q b c d b c d r"),   # two positions hit "b c d"
    ]
    ev = [(100, "m n b c d k")]
    out = _run(spark, train, ev, n=3)
    assert out[1]["contaminated"] == 1 and out[1]["n_hits"] == 1
    assert out[2]["contaminated"] == 0 and out[2]["n_hits"] == 0
    assert out[3]["contaminated"] == 1 and out[3]["n_hits"] == 2
    # n_grams = words - n + 1
    assert out[1]["n_grams"] == 4 and out[3]["n_grams"] == 6


def test_decontaminate_short_docs_yield_no_grams(spark):
    train = [(1, "a b"), (2, "a b c")]
    ev = [(9, "a b c")]
    out = _run(spark, train, ev, n=3)
    assert out[1]["n_grams"] == 0 and out[1]["contaminated"] == 0
    assert out[2]["n_grams"] == 1 and out[2]["contaminated"] == 1


def test_decontaminate_broadcast_and_shuffle_paths_agree(spark):
    train = [(i, f"w{i} a b c d w{i + 1} e f") for i in range(20)]
    ev = [(99, "a b c d")]
    a = _run(spark, train, ev, n=4, broadcast_eval=True)
    b = _run(spark, train, ev, n=4, broadcast_eval=False)
    assert {k: tuple(v) for k, v in a.items()} == {
        k: tuple(v) for k, v in b.items()
    }
    assert all(v["contaminated"] == 1 for v in a.values())
