"""Hand goldens for Viterbi map-matching: the stationary decode, the
HMM denoising signature (zig-zag observations decode to ONE cell), and
the fixed-length exclusion rule.

Event ids are CRT-constructed so the half-milli-cell positions land
where the hand DP wants them: e = 14092 -> py 9990 (cell 4, offset
1990 — near the cell-5 boundary), e = 14093 -> py 10098 (cell 5,
offset 98); both keep px in col 0 (625 / 675)."""

from __future__ import annotations

import datetime as dt


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (u, e, dt.datetime(2016, 5, 1, 0, 0, i))
            for i, (u, e) in enumerate(rows)
        ],
        "user_id long, event_id long, ts timestamp",
    )


def _run(spark, rows, t_len=12):
    from extractors_metadata_spark.operators.mapmatch import viterbi_match

    out = viterbi_match(_events(spark, rows), t_len=t_len).collect()
    return {
        (r["user_id"], r["t"]): (
            r["obs_r"], r["obs_c"], r["state_r"], r["state_c"],
            r["total_cost"],
        )
        for r in out
    }


def test_stationary_track_decodes_in_place(spark):
    """12 identical observations at (9990, 625): containing cell (4, 0)
    wins every step (row em 990 < 1010, col em 375), zero transitions.
    Hand total = 12 * (990 + 375) = 16380."""
    rows = [(0, 14092)] * 12
    out = _run(spark, rows)
    assert len(out) == 12
    for t in range(12):
        assert out[(0, t)] == (4, 0, 4, 0, 16380)


def test_zigzag_denoises_to_single_cell(spark):
    """Observations alternate across the cell-4/5 boundary (py 9990 /
    10098), so the per-point cells zig-zag 4,5,4,5,... — but any row
    transition costs 2000 while mismatched emissions cost only ~1000,
    so Viterbi holds ONE row. Hand DP: stay-5 = 6*1010 + 6*902 = 11472
    beats stay-4 = 6*990 + 6*1098 = 12528 and every switching path
    (best single switch 13452); col stays 0 (6*375 + 6*325 = 4200).
    Total = 15672, state = (5, 0) at EVERY step including the six whose
    raw cell is 4 — the denoising the per-point resolve cannot do."""
    rows = [(7, 14092 + (i % 2)) for i in range(12)]
    out = _run(spark, rows)
    assert len(out) == 12
    for t in range(12):
        obs_r = 4 + (t % 2)
        assert out[(7, t)] == (obs_r, 0, 5, 0, 15672)


def test_short_tracks_excluded_and_both_users_decoded(spark):
    """A user with 11 events is excluded by the fixed-length rule; a
    full user alongside still decodes."""
    rows = [(1, 14092)] * 11 + [(2, 14093)] * 12
    out = _run(spark, rows)
    assert {u for (u, _) in out} == {2}
    # user 2 stationary at (10098, 675): cell (5, 0), em 902 + 325
    assert out[(2, 0)] == (5, 0, 5, 0, 12 * (902 + 325))
