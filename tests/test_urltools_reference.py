"""Cross-implementation check for functions/urltools.canonicalize_url.

An INDEPENDENT Python reference (urllib.parse, no regexes shared with the
engine) applies the same frozen rule set to a seeded random corpus of
well-formed messy URLs; the Spark JVM-regex implementation must agree
byte-for-byte on every row, and canonicalization must be idempotent.
"""

from __future__ import annotations

import random
from urllib.parse import urlsplit

from pyspark.sql import functions as F

from extractors_metadata_spark.functions.urltools import canonicalize_url

_TRACKING = ("utm_", "fbclid=", "gclid=")


def _reference_canonical(url: str) -> str:
    """The frozen rule set via urllib.parse (independent of the regex path)."""
    parts = urlsplit(url)  # drops nothing by itself; fragment via .fragment
    scheme = parts.scheme.lower()
    host = parts.netloc.lower()
    if host.startswith("www."):
        host = host[4:]
    default = ":80" if scheme == "http" else ":443"
    if host.endswith(default):
        host = host[: -len(default)]
    path = parts.path
    if path.endswith("/"):
        path = path[:-1]
    if path == "":
        path = "/"
    params = [
        p
        for p in parts.query.split("&")
        if p != "" and not any(p.startswith(t) for t in _TRACKING)
    ]
    q = "&".join(sorted(params))
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


def _random_urls(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    urls = []
    for _ in range(n):
        scheme = rng.choice(["http", "https", "HTTP", "HTTPS", "Http"])
        www = rng.choice(["", "www.", "WWW.", "WwW."])
        host = rng.choice(
            ["example.com", "Sub.Example.CO.uk", "a.B.site.ORG", "x-y.net"]
        )
        port = rng.choice(["", ":80", ":443", ":8080"])
        depth = rng.randint(0, 3)
        path = "".join(f"/p{rng.randint(0, 9)}" for _ in range(depth))
        path += rng.choice(["", "/"])
        n_params = rng.randint(0, 4)
        params = [
            rng.choice(
                [
                    f"a={rng.randint(0, 9)}",
                    f"z={rng.randint(0, 9)}",
                    f"utm_source=s{rng.randint(0, 9)}",
                    "fbclid=xyz",
                    "gclid=1",
                    f"b{rng.randint(0, 9)}=2",
                ]
            )
            for _ in range(n_params)
        ]
        query = "?" + "&".join(params) if params else ""
        frag = rng.choice(["", "#frag", "#x/y?z"])
        urls.append(f"{scheme}://{www}{host}{port}{path}{query}{frag}")
    return urls


def test_spark_matches_urllib_reference_on_messy_corpus(spark):
    urls = _random_urls(300)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    want = [_reference_canonical(u) for u in urls]
    mismatches = [
        (u, g, w) for u, g, w in zip(urls, got, want) if g != w
    ]
    assert mismatches == []
    # idempotence over the whole corpus
    df2 = spark.createDataFrame([(c,) for c in got], "url string")
    again = [
        r["c"]
        for r in df2.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert again == got
