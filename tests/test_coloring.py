"""greedy_coloring: definitional checks on real data — a PROPER
coloring (no monochromatic edge) within the Welsh-Powell bound."""

from __future__ import annotations


def test_coloring_is_proper_and_bounded(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    rows = E.queries()["greedy_coloring"](spark, sf).collect()
    color = {r["node"]: r["color"] for r in rows}
    deg = {r["node"]: r["deg"] for r in rows}
    assert len(color) == 24
    from extractors_metadata_spark.operators.linkgraph import (
        zipf_link_graph,
    )
    from pyspark.sql import functions as F

    g = zipf_link_graph(E._t(spark, sf, "events"))
    edges = (
        g.filter(
            (F.col("src") != F.col("dst"))
            & (F.col("src") < 24)
            & (F.col("dst") < 24)
        )
        .select("src", "dst")
        .collect()
    )
    assert edges, "induced subgraph unexpectedly empty"
    for e in edges:
        assert color[e["src"]] != color[e["dst"]], (e, color)
    maxdeg = max(deg.values())
    assert max(color.values()) <= maxdeg  # Welsh-Powell: <= maxdeg + 1
