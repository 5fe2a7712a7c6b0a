from __future__ import annotations

import itertools

from extractors_metadata_spark.operators.hausdorff import hausdorff_pairs


def _brute(tracks: dict[int, set[tuple[int, int]]], r: int):
    out = {}
    for ua, ub in itertools.combinations(sorted(tracks), 2):
        A, B = tracks[ua], tracks[ub]
        d2 = lambda a, b: (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
        h_ab = max(min(d2(a, b) for b in B) for a in A)
        h_ba = max(min(d2(a, b) for a in A) for b in B)
        hd2 = max(h_ab, h_ba)
        if hd2 <= r * r:
            out[(ua, ub)] = (h_ab, h_ba, hd2)
    return out


def _run(spark, tracks: dict[int, set[tuple[int, int]]], r: int, parts=1):
    rows = [(u, x, y) for u, ps in tracks.items() for (x, y) in ps]
    df = spark.createDataFrame(rows, "user_id long, qx long, qy long")
    if parts > 1:
        df = df.repartition(parts)
    got = hausdorff_pairs(df, r=r)
    return {
        (x["u_a"], x["u_b"]): (x["h_ab2"], x["h_ba2"], x["hd2"])
        for x in got.collect()
    }


def _synth_tracks(n_users: int, n_pts: int, span: int):
    # deterministic pseudo-random integer tracks
    tracks = {}
    for u in range(n_users):
        pts = set()
        s = u * 2654435761 % 2**32
        for i in range(n_pts):
            s = (s * 6364136223846793005 + 1442695040888963407) % 2**64
            pts.add(((s >> 20) % span + 1000, (s >> 40) % span + 1000))
        tracks[u] = pts
    return tracks


def test_matches_brute_force(spark):
    tracks = _synth_tracks(12, 15, 400)
    r = 220
    assert _run(spark, tracks, r) == _brute(tracks, r)


def test_threshold_boundary_exact(spark):
    # two tracks at exactly distance r: hd2 == r*r must SURVIVE (<=)
    tracks = {1: {(1000, 1000)}, 2: {(1000, 1100)}}
    got = _run(spark, tracks, 100)
    assert got == {(1, 2): (10000, 10000, 10000)}
    # one unit beyond: dropped
    assert _run(spark, {1: {(1000, 1000)}, 2: {(1000, 1101)}}, 100) == {}


def test_cell_straddling_pair_found(spark):
    # points in different blocking cells but within r: the one-ring
    # dilation must still pair them (completeness of the blocking)
    r = 100
    tracks = {1: {(199, 500)}, 2: {(201, 500)}}  # cells 1 and 2, dist 2
    assert _run(spark, tracks, r) == {(1, 2): (4, 4, 4)}


def test_duplicate_points_collapse(spark):
    # Hausdorff is a set distance: duplicated points change nothing
    t1 = {1: {(10, 10), (20, 20)}, 2: {(12, 10)}}
    rows = [(1, 10, 10), (1, 10, 10), (1, 20, 20), (2, 12, 10), (2, 12, 10)]
    df = spark.createDataFrame(rows, "user_id long, qx long, qy long")
    got = {
        (x["u_a"], x["u_b"]): (x["h_ab2"], x["h_ba2"], x["hd2"])
        for x in hausdorff_pairs(df, r=100).collect()
    }
    assert got == _brute(t1, 100)


def test_asymmetric_directed_distances(spark):
    # B is a superset route: h(B,A) small, h(A,B) can be large
    A = {(0 + 1000, 1000), (10 + 1000, 1000)}
    B = {(0 + 1000, 1000), (10 + 1000, 1000), (60 + 1000, 1000)}
    got = _run(spark, {1: A, 2: B}, 100)
    assert got[(1, 2)] == (0, 2500, 2500)  # far B point drives h_ba only


def test_partitioning_invariance(spark):
    tracks = _synth_tracks(10, 12, 300)
    r = 200
    assert _run(spark, tracks, r, parts=1) == _run(spark, tracks, r, parts=16)
