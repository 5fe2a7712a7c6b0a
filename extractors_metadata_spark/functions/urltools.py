"""URL canonicalization for web-corpus pipelines.

Engine-added capability: URL-level dedup is the first pass of every crawl
curation pipeline (before any content hash touches the 100 TB payload), and
it needs a frozen canonical form so the same resource fetched as
``HTTP://WWW.Site.COM:80/a/?utm_source=x`` and ``http://site.com/a`` keys to
one group.

Canonical form (frozen rule set, applied in order):
  1. drop the fragment (``#...``);
  2. lowercase the scheme and the authority (never the path/query);
  3. drop a leading ``www.`` label and the scheme's default port
     (``:80`` for http, ``:443`` for https);
  4. drop tracking query parameters (``utm_*``, ``fbclid=``, ``gclid=``) and
     empty params, then sort the survivors bytewise and rejoin with ``&``;
  5. strip ONE trailing slash from the path (``/a/b/`` == ``/a/b``), with
     bare ``/`` (or empty) canonicalizing to ``/``.

Everything is built from JVM regex/array expressions — whole-stage codegen,
zero shuffle, no Python in the path — and every regex is shared Java==RE2
syntax (same discipline as the frozen pii_counts classes), so a DuckDB
oracle replays the pipeline exactly. Scale: canonicalization is a narrow
projection; the dedup keyed on the canonical string is one hash-uniform
shuffle (billions of URLs, no hot key).

Reference analog: none — the reference (terraref/extractors-metadata) keys
file URLs verbatim (terra_mdcleaner's URL lists are passed through); this is
the engine widening that to crawl-scale key hygiene.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shared Java==RE2 patterns (no lookaround, no backrefs)
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# query = first '?' BEFORE any '#' (RFC 3986): the lazy [^#]*? prefix keeps a
# '?' that only appears inside the fragment from being read as a query
_QUERY_RE = r"^[^#]*?\?([^#]*)"

_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def url_scheme(url: Column) -> Column:
    """Lowercased scheme ('' when the value is not an absolute URL)."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Canonical host: lowercased authority, leading ``www.`` and the
    scheme's default port removed."""
    hostport = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    # constant pattern per branch (mirrors the oracle's CASE — and DuckDB
    # plans constant regexes better than computed ones)
    host = F.when(
        url_scheme(url) == "http", F.regexp_replace(hostport, ":80$", "")
    ).otherwise(F.regexp_replace(hostport, ":443$", ""))
    return F.regexp_replace(host, r"^www\.", "")


def url_query_canonical(url: Column) -> Column:
    """Query string with tracking/empty params dropped and the rest sorted
    bytewise ('' when nothing survives)."""
    raw = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.split(raw, "&")
    kept = F.filter(
        params,
        lambda p: (p != "")
        & ~p.startswith(_TRACKING_PREFIXES[0])
        & ~p.startswith(_TRACKING_PREFIXES[1])
        & ~p.startswith(_TRACKING_PREFIXES[2]),
    )
    return F.array_join(F.array_sort(kept), "&")


def url_path_canonical(url: Column) -> Column:
    """Path with ONE trailing slash stripped; empty/bare-slash -> '/'."""
    path = F.regexp_extract(url, _PATH_RE, 1)
    stripped = F.regexp_replace(path, r"/$", "")
    return F.when(stripped == "", F.lit("/")).otherwise(stripped)


def canonicalize_url(url: Column) -> Column:
    """The full canonical form (module docstring rules 1-5)."""
    q = url_query_canonical(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_path_canonical(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def registrable_domain(host: Column) -> Column:
    """Public-suffix-lite registrable domain of a canonical host: the last
    two labels, or the last three when the second-level label is a common
    country-code second-level ('co', 'com', 'net', 'org', 'ac', 'gov',
    'edu' — e.g. ``sub.site.co.uk`` -> ``site.co.uk``).

    A frozen heuristic, NOT the full public-suffix list (which is versioned
    data, not logic); swap in a broadcast PSL table where exactness matters.
    """
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # F.get is 0-based and NULL (not an ANSI error) out of bounds, so
    # single-label hosts are safe; the when() guards keep slice() starts >= 1.
    second_level = F.get(labels, n - 2)
    take3 = (n >= 3) & second_level.isin("co", "com", "net", "org", "ac", "gov", "edu")
    tail = F.when(take3, F.slice(labels, n - 2, 3)).otherwise(
        F.when(n >= 2, F.slice(labels, n - 1, 2)).otherwise(labels)
    )
    return F.array_join(tail, ".")
