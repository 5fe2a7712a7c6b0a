"""Hand goldens for crawl_schedule: per-host priority queues, politeness
spacing, and the one-worker-per-host pin."""

from __future__ import annotations


def test_crawl_schedule_queues_and_politeness(spark):
    from extractors_metadata_spark.plans.links import crawl_schedule

    # host a: url u1 referenced by 2 pages, u2 by 1 -> u1 fetches first;
    # host b: one url
    rows = [
        ("https://p.example/1", "https://a.example/u1"),
        ("https://p.example/2", "https://a.example/u1"),
        ("https://p.example/1", "https://a.example/u2"),
        ("https://p.example/2", "https://b.example/v"),
    ]
    ol = spark.createDataFrame(rows, "src_url string, dst_url string")
    out = {r["url"]: r.asDict() for r in crawl_schedule(ol).collect()}
    u1, u2, v = (
        out["https://a.example/u1"],
        out["https://a.example/u2"],
        out["https://b.example/v"],
    )
    assert (u1["n_inlinks"], u1["fetch_rank"], u1["fetch_time_ms"]) == (2, 1, 0)
    assert (u2["n_inlinks"], u2["fetch_rank"], u2["fetch_time_ms"]) == (1, 2, 1000)
    assert (v["fetch_rank"], v["fetch_time_ms"]) == (1, 0)
    # politeness invariant: same host -> same worker; workers in range
    assert u1["worker"] == u2["worker"]
    assert all(0 <= r["worker"] < 8 for r in out.values())
