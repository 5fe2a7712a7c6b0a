"""NTT autocorrelation (operators/ntt.py).

The registry oracle already cross-checks butterflies against the O(n^2)
definition in DuckDB; these tests pin the kernel against NumPy directly,
plus the roundtrip and clamp contracts.
"""

from __future__ import annotations

import numpy as np

from extractors_metadata_spark.operators.ntt import (
    NTT_G,
    NTT_P,
    _ntt_matrix,
    ntt_autocorr,
)


def test_ntt_roundtrip_and_convolution_theorem():
    rng = np.random.RandomState(11)
    n, p = 32, NTT_P
    root = pow(NTT_G, (p - 1) // n, p)
    iroot = pow(root, p - 2, p)
    ninv = pow(n, p - 2, p)
    x = rng.randint(0, 1000, size=(7, n)).astype(np.int64)
    f = _ntt_matrix(x.copy(), root)
    back = _ntt_matrix(f, iroot) * ninv % p
    assert np.array_equal(back, x)
    # autocorrelation via NTT == direct definition
    xr = np.concatenate([x[:, :1], x[:, :0:-1]], axis=1)
    r = (
        _ntt_matrix(
            _ntt_matrix(x.copy(), root) * _ntt_matrix(xr, root) % p, iroot
        )
        * ninv
        % p
    )
    direct = np.stack(
        [(x * np.roll(x, -k, axis=1)).sum(axis=1) for k in range(n)], axis=1
    )
    assert np.array_equal(r, direct)


def test_ntt_autocorr_impulse_and_constant(spark):
    # impulse at bin 3 -> r[0] = c^2, r[k>0] = 0
    rows = [("a", 3, 5)] + [("b", b, 2) for b in range(32)]
    df = spark.createDataFrame(rows, "k string, bin long, n long")
    out = ntt_autocorr(df, ["k"], n=32).collect()
    a = {r["lag"]: r["autocorr"] for r in out if r["k"] == "a"}
    assert a[0] == 25 and all(a[l] == 0 for l in range(1, 32))
    # constant series c=2 -> r[k] = 32 * 4 for every lag
    b = {r["lag"]: r["autocorr"] for r in out if r["k"] == "b"}
    assert all(b[l] == 128 for l in range(32))


def test_ntt_autocorr_cap_applies(spark):
    df = spark.createDataFrame([("k", 0, 10**9)], "k string, bin long, n long")
    out = {
        r["lag"]: r["autocorr"]
        for r in ntt_autocorr(df, ["k"], n=32, cap=1000).collect()
    }
    assert out[0] == 1000 * 1000  # clamped before squaring
