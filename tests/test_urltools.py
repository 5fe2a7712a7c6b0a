"""URL canonicalization (functions/urltools.py) + url_dedup operator.

Pins the frozen rule set the driver oracle replays: fragment drop,
scheme/host lowercasing, www + default-port strip, tracking-param removal,
bytewise param sort, trailing-slash strip, registrable-domain-lite."""

from __future__ import annotations

from pyspark.sql import functions as F

from extractors_metadata_spark.functions.urltools import (
    canonicalize_url,
    registrable_domain,
    url_host,
)
from extractors_metadata_spark.operators.dedup import url_dedup


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]


def test_canonicalize_rules(spark):
    got = _canon(
        spark,
        [
            # case, www, default port, tracking params, sort, trailing slash, fragment
            "HTTPS://WWW.Example.COM:443/a/b/?utm_source=feed&x=2&b=1#frag",
            "http://example.com:80/path/7",
            "https://example.org/?z=1&a=2&utm_campaign=x",
            "http://Example.net/a//b?fbclid=1&q=3",
            "https://example.com/9/",
            # non-default port survives; path case survives; bare host -> /
            "https://example.com:8443/A/B",
            "http://example.com",
        ],
    )
    assert got == [
        "https://example.com/a/b?b=1&x=2",
        "http://example.com/path/7",
        "https://example.org/?a=2&z=1",
        "http://example.net/a//b?q=3",
        "https://example.com/9",
        "https://example.com:8443/A/B",
        "http://example.com/",
    ]


def test_canonical_is_idempotent(spark):
    urls = [
        "HTTPS://WWW.Example.COM:443/a/b/?utm_source=feed&x=2&b=1#frag",
        "http://example.com",
        "https://sub.example.co.uk/p/1/?gclid=abc",
    ]
    once = _canon(spark, urls)
    assert _canon(spark, once) == once


def test_registrable_domain(spark):
    df = spark.createDataFrame(
        [("sub.site.co.uk",), ("site.com",), ("a.b.site.org",), ("localhost",)],
        "h string",
    )
    got = [r["d"] for r in df.select(registrable_domain(F.col("h")).alias("d")).collect()]
    assert got == ["site.co.uk", "site.com", "site.org", "localhost"]


def test_url_dedup_survivor_flag(spark):
    df = spark.createDataFrame(
        [
            (1, "http://WWW.Example.com:80/a/"),
            (2, "http://example.com/a"),  # same canonical -> loser
            (3, "http://example.com/b"),
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in url_dedup(df).collect()}
    assert rows[1]["keep"] is True and rows[2]["keep"] is False
    assert rows[1]["url_canonical"] == rows[2]["url_canonical"] == "http://example.com/a"
    assert rows[3]["keep"] is True
    assert rows[1]["domain"] == "example.com"


def test_url_host_strips_port_by_scheme(spark):
    df = spark.createDataFrame(
        [("http://h.com:443/x",), ("https://h.com:80/x",)], "url string"
    )
    got = [r["h"] for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    # :443 is NOT http's default, :80 is not https' -> both survive
    assert got == ["h.com:443", "h.com:80"]
