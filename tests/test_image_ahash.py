"""Image average-hash fingerprints + banded Hamming near-dup pairs
(multimodal/binary_ops: _gray64_from_seeds / ahash_from_gray /
decode_image_ahash / ahash_pairs)."""

from __future__ import annotations

import numpy as np
import pytest

from extractors_metadata_spark.multimodal.binary_ops import (
    ahash_from_gray,
    ahash_pairs,
    decode_image_ahash,
    hash_bytes_batch,
    _gray64_from_seeds,
)


def test_ahash_is_integer_mean_test():
    """bit j == (64 * p_j >= sum p), assembled LSB-first; the two's-
    complement view round-trips through uint64."""
    pix = np.arange(64, dtype=np.int64).reshape(1, 64)  # sum 2016, mean 31.5
    h, bands = ahash_from_gray(pix)
    want_bits = (64 * np.arange(64) >= 2016).astype(np.uint64)
    want = int((want_bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    assert h[0] == np.uint64(want).astype(np.int64).item() if want < 2**63 else True
    hu = np.array([h[0]], dtype=np.int64).view(np.uint64)[0]
    assert int(hu) == want
    # bands are the four 16-bit chunks of the unsigned value
    for b in range(4):
        assert bands[0][b] == (want >> (16 * b)) & 0xFFFF


def test_identical_payloads_identical_hash():
    seeds = hash_bytes_batch([b"imgA", b"imgB", b"imgA"])
    h, bands = ahash_from_gray(_gray64_from_seeds(seeds))
    assert h[0] == h[2] and (bands[0] == bands[2]).all()
    assert h[0] != h[1]  # avalanche: different payloads differ


def _hashed_df(spark, rows):
    """rows: (url, 64-pixel grid) -> the (url, ahash, b0..b3) frame."""
    import pandas as pd

    h, bands = ahash_from_gray(np.asarray([p for _, p in rows], dtype=np.int64))
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [u for u, _ in rows],
                "ahash": h,
                "b0": bands[:, 0],
                "b1": bands[:, 1],
                "b2": bands[:, 2],
                "b3": bands[:, 3],
            }
        )
    )


def test_pairs_within_distance_found_exactly(spark):
    """Constructed grids: base; 1-bit flip; 3-bit flip; 5-bit flip; far.
    max_dist=3 must return exactly (base,flip1,1), (base,flip3,3) and
    (flip1,flip3,2|4?) — computed against a brute-force popcount replay."""
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, 64).astype(np.int64)

    def flip(pix, idxs):
        """Flip chosen aHash bits by pushing pixels across the mean."""
        out = pix.copy()
        s = out.sum()
        for i in idxs:
            out[i] = 255 if 64 * out[i] < s else 0
        return out

    rows = [
        ("u0", base),
        ("u1", flip(base, [3])),
        ("u2", flip(base, [7, 11, 13])),
        ("u3", flip(base, [2, 20, 30, 40, 50])),
        ("u4", rng.integers(0, 256, 64).astype(np.int64)),
    ]
    df = _hashed_df(spark, rows)
    got = {
        (r.url_a, r.url_b): r.hamdist
        for r in ahash_pairs(df, max_dist=3).collect()
    }
    # brute-force expectation
    h, _ = ahash_from_gray(np.asarray([p for _, p in rows], dtype=np.int64))
    hu = h.view(np.uint64)
    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = bin(int(hu[i]) ^ int(hu[j])).count("1")
            if d <= 3:
                want[(rows[i][0], rows[j][0])] = d
    assert got == want
    assert ("u0", "u1") in got  # the planted 1-bit neighbor is found


def test_pairs_e2e_rehosted_payloads(spark):
    """decode_image_ahash -> ahash_pairs over binary payloads: re-hosted
    (identical) payloads pair at distance 0; nothing else pairs."""
    rows = [(f"u{i}", f"payload-{i}".encode()) for i in range(20)]
    rows += [("u3#mirror", b"payload-3"), ("u7#mirror", b"payload-7")]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = sorted(
        (r.url_a, r.url_b, r.hamdist)
        for r in ahash_pairs(decode_image_ahash(df), max_dist=3).collect()
    )
    assert got == [("u3", "u3#mirror", 0), ("u7", "u7#mirror", 0)]


def test_max_dist_validated(spark):
    df = _hashed_df(spark, [("u0", np.zeros(64, dtype=np.int64))])
    with pytest.raises(ValueError):
        ahash_pairs(df, max_dist=4)


def test_phash_flat_image_dc_only():
    """A flat grid concentrates everything into the DC coefficient: the
    fixed-point DCT rows cancel exactly (symmetric magnitudes), so the
    63 AC coefficients are 0, the median is 0, and only bit 0 sets."""
    import numpy as np

    from extractors_metadata_spark.multimodal.binary_ops import (
        phash_from_gray,
    )

    ph, bands = phash_from_gray(np.full((1, 64), 100, dtype=np.int64))
    assert ph[0] == 1
    assert list(bands[0]) == [1, 0, 0, 0]


def test_phash_duplicates_share_hash(spark):
    """Re-hosted identical payloads (the #dup construction) must collide
    on phash; different payloads should not all collide."""
    from extractors_metadata_spark.multimodal.binary_ops import (
        decode_image_phash,
    )

    rows = [
        ("u1", b"payload-a"), ("u1#dup", b"payload-a"), ("u2", b"payload-b"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r["phash"] for r in decode_image_phash(df).collect()}
    assert out["u1"] == out["u1#dup"]
    assert out["u1"] != out["u2"]


def test_dhash_gradient_sign_hand_grid():
    """Row 0 ramp 0..7 -> bits 0..6 set (p<next), bit 7 clear (7 < 0
    wraps false); a constant row contributes no bits."""
    import numpy as np
    from extractors_metadata_spark.multimodal.binary_ops import dhash_from_gray

    pix = np.zeros((1, 64), dtype=np.int64)
    pix[0, :8] = np.arange(8)          # row 0: ramp
    pix[0, 8:16] = 5                   # row 1: flat
    h, bands = dhash_from_gray(pix)
    assert h[0] & 0xFF == 0x7F         # bits 0..6
    assert (h[0] >> 8) & 0xFF == 0     # flat row: no gradient bits
    assert bands.shape == (1, 4)


def test_dhash_brightness_invariance():
    """dHash is invariant to a global brightness shift (the property
    aHash lacks)."""
    import numpy as np
    from extractors_metadata_spark.multimodal.binary_ops import (
        ahash_from_gray,
        dhash_from_gray,
    )

    rng = np.arange(64, dtype=np.int64).reshape(1, 64) * 3 % 97
    h1, _ = dhash_from_gray(rng)
    h2, _ = dhash_from_gray(rng + 50)
    assert h1[0] == h2[0]


def test_shot_boundaries_piecewise_static_stub(spark):
    """Each shot = 2 identical frames: within-shot hamdist is exactly 0
    and never a boundary; cuts can only appear at even frame indices
    (20, 40, 60 in frame_idx units); first frame carries the -1
    sentinel."""
    from extractors_metadata_spark.multimodal.binary_ops import (
        detect_shot_boundaries,
    )

    df = spark.createDataFrame(
        [("u1", bytearray(b"video-bytes-1")), ("u2", bytearray(b"video-2"))],
        "url string, html binary",
    )
    out = detect_shot_boundaries(df).collect()
    assert len(out) == 16
    for r in out:
        i = r["frame_idx"] // 10
        if i == 0:
            assert r["hamdist"] == -1 and r["is_boundary"] == 0
        elif i % 2 == 1:  # second frame of a shot: identical to first
            assert r["hamdist"] == 0 and r["is_boundary"] == 0
        else:  # cut between shots
            assert r["hamdist"] > 0
