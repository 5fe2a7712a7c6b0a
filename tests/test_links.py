from __future__ import annotations

from extractors_metadata_spark.plans.links import extract_outlinks, host_graph


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode("utf-8"))) for u, h in rows],
        "url string, html binary",
    )


def test_document_order_positions(spark):
    html = (
        '<html><a href="https://a.example/1">x</a>'
        '<p><a href="https://b.example/2">y</a></p>'
        '<a href="https://a.example/3">z</a></html>'
    )
    df = _pages(spark, [("https://s.example/p", html)])
    got = sorted(
        (r["pos"], r["dst_url"]) for r in extract_outlinks(df).collect()
    )
    assert got == [
        (1, "https://a.example/1"),
        (2, "https://b.example/2"),
        (3, "https://a.example/3"),
    ]


def test_no_anchor_pages_emit_nothing(spark):
    df = _pages(spark, [("https://s.example/p", "<html><body>none</body></html>")])
    assert extract_outlinks(df).count() == 0


def test_malformed_anchors_skipped(spark):
    # single quotes / missing quotes don't match the frozen double-quote regex
    html = "<a href='https://a.example/1'>x</a><a href=https://b.example/2>y</a>"
    df = _pages(spark, [("https://s.example/p", html)])
    assert extract_outlinks(df).count() == 0


def test_host_graph_rollup(spark):
    rows = [
        (
            "https://s1.example/p1",
            '<a href="https://a.example/x">.</a><a href="https://a.example/y">.</a>'
            '<a href="https://b.example/z">.</a>',
        ),
        ("https://s2.example/p2", '<a href="https://a.example/q">.</a>'),
    ]
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(extract_outlinks(_pages(spark, rows))).collect()
    }
    assert got == {
        ("s1.example", "a.example"): 2,
        ("s1.example", "b.example"): 1,
        ("s2.example", "a.example"): 1,
    }


def test_robots_longest_match_and_allow_tie(spark):
    from extractors_metadata_spark.plans.links import robots_filter

    rules = [("/a", True), ("/a/b", False), ("/a/b/c", True), ("/x", False)]
    pages = spark.createDataFrame(
        [("https://h.example/a/z",), ("https://h.example/a/b/z",),
         ("https://h.example/a/b/c/z",), ("https://h.example/x",),
         ("https://h.example/unmatched",)],
        "url string",
    )
    got = {r["path"]: (r["rule_score"], r["crawlable"])
           for r in robots_filter(pages, rules).collect()}
    assert got["/a/z"] == (2 * 2 + 1, True)
    assert got["/a/b/z"] == (4 * 2 + 0, False)      # longer deny wins
    assert got["/a/b/c/z"] == (6 * 2 + 1, True)     # longest re-allow wins
    assert got["/x"] == (2 * 2 + 0, False)
    assert got["/unmatched"] == (-1, True)          # no rule -> crawlable
    # equal-length Allow beats Disallow: score parity decides
    tie = robots_filter(
        spark.createDataFrame([("https://h.example/t1",)], "url string"),
        [("/t", False), ("/t", True)],
    ).collect()[0]
    assert tie["crawlable"] is True


def test_bowtie_classes_hand_graph(spark):
    """Cycle 1->2->3->1 (core, seed = node 1: degree 3 ties with node 3,
    smaller id wins), 0->1 (in), 3->4 (out), 5->6 (disconnected from
    the seed side: 5 reaches nothing toward 1 and 1 never reaches 5/6;
    6 likewise)."""
    from extractors_metadata_spark.operators.linkgraph import (
        bowtie_classes,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (0, 1), (3, 4), (5, 6)],
        "src long, dst long",
    )
    out = {r["cls"]: r["n_nodes"] for r in bowtie_classes(edges).collect()}
    assert out == {"core": 3, "in": 1, "out": 1, "disconnected": 2}


def test_simrank_hand_values(spark):
    """Co-cited sinks: 0->1, 0->2 gives S(1,2) = 0.8 immediately; the
    two-hop chain 1->3, 2->4 propagates S(3,4) = 0.8 * S(1,2) = 0.64
    (in fixed point, MASS = 1e12). Pairs with no common ancestry stay
    absent."""
    from extractors_metadata_spark.operators.linkgraph import simrank

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 4), (9, 5)], "src long, dst long"
    )
    out = {(r["a"], r["b"]): r["simrank_fp"] for r in simrank(edges).collect()}
    assert out[(1, 2)] == 800_000_000_000
    assert out[(3, 4)] == 640_000_000_000
    assert (1, 5) not in out and (3, 5) not in out


def test_anchor_text_index_topk_and_ties(spark):
    """Target /t gets anchors: 'best' x2, 'apple' x1, 'zebra' x1 ->
    rank1 = best(2), then the tie breaks lexically: apple, zebra; k=2
    cuts zebra. A second target keeps its own window."""
    from extractors_metadata_spark.plans.links import anchor_text_index

    def page(url, anchors):
        html = "".join(
            f'<a href="{d}">{t}</a>' for d, t in anchors
        ).encode()
        return (url, html)

    rows = [
        page("p1", [("/t", "best"), ("/t", "apple")]),
        page("p2", [("/t", "best"), ("/t", "zebra"), ("/u", "only")]),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {
        (r["dst_url"], r["rnk"]): (r["text"], r["n"])
        for r in anchor_text_index(df, k=2).collect()
    }
    assert out[("/t", 1)] == ("best", 2)
    assert out[("/t", 2)] == ("apple", 1)
    assert ("/t", 3) not in out
    assert out[("/u", 1)] == ("only", 1)


def test_redirect_resolve_chains_loops_tails(spark):
    """0 is terminal; 1->2->0 resolves canonically; {3,4} is a 2-cycle
    (loop, canonical member 3 for both); 5 redirects INTO the cycle and
    is a loop page too."""
    from extractors_metadata_spark.plans.links import resolve_redirects

    rd = spark.createDataFrame(
        [(0, 0), (1, 2), (2, 0), (3, 4), (4, 3), (5, 3)],
        "v long, t long",
    )
    out = {
        r["url_id"]: (r["resolved_id"], r["status"])
        for r in resolve_redirects(rd, rounds=6).collect()
    }
    assert out[0] == (0, "canonical")
    assert out[1] == (0, "canonical") and out[2] == (0, "canonical")
    assert out[3] == (3, "loop") and out[4] == (3, "loop")
    assert out[5] == (3, "loop")


def test_anf_registers_monotone_and_stationary(spark):
    """Chain 0->1->2 with n_groups=16 (grp == node): the sink's sketch
    never changes (ball = {2} at every hop); upstream sketches grow
    monotonically (register max never decreases) and node 0's hop-2
    state equals its hop-3 state (ball saturated at {0,1,2})."""
    from extractors_metadata_spark.operators.linkgraph import (
        anf_registers,
    )

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    rows = anf_registers(edges, hops=3, p=6, n_groups=16).collect()
    st = {}
    for r in rows:
        st.setdefault((r["hop"], r["grp"]), {})[r["bucket"]] = r["max_rho"]
    # sink stationary
    assert st[(1, 2)] == st[(2, 2)] == st[(3, 2)]
    # monotone growth for node 0
    for b, v in st[(1, 0)].items():
        assert st[(2, 0)].get(b, 0) >= v
    # saturation: hop 2 == hop 3 for every group
    for g in (0, 1, 2):
        assert st[(2, g)] == st[(3, g)]
    # hop-2 ball of node 0 is the union of all three singletons: its
    # register set contains every bucket present in the sink's sketch
    for b, v in st[(1, 2)].items():
        assert st[(2, 0)].get(b, 0) >= v
