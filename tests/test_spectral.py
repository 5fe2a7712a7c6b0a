"""Exact-integer power iteration (operators/spectral.py): alignment with the
float eigensolver and a closed-form dominant axis; the driver oracle
(principal_axis) covers the exact cross-engine replay."""

from __future__ import annotations

import numpy as np


def test_dominant_axis_recovered(spark):
    from extractors_metadata_spark.operators.spectral import principal_axis

    # 40 vectors along e0 (+/- noise on e1), 4 along e3: axis -> e0
    rng = np.random.default_rng(7)
    vs = []
    for i in range(40):
        v = np.zeros(64); v[0] = 0.5; v[1] = float(rng.normal(0, 0.01))
        vs.append((i, [float(x) for x in v]))
    for i in range(40, 44):
        v = np.zeros(64); v[3] = 0.3
        vs.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(vs, "vec_id long, embedding array<double>")
    u = np.zeros(64)
    for r in principal_axis(df, rounds=6).collect():
        u[r["dim"]] = r["u_fp"]
    u = u / np.linalg.norm(u)
    assert abs(u[0]) > 0.999


def test_matches_numpy_eigendirection(spark):
    from extractors_metadata_spark.operators.spectral import principal_axis

    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, 64)
    rows = []
    for i in range(60):
        v = 0.3 * base * rng.normal(1, 0.1) + rng.normal(0, 0.05, 64)
        rows.append((i, [float(x) for x in np.clip(v, -0.6, 0.6)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    u = np.zeros(64)
    for r in principal_axis(df, rounds=6).collect():
        u[r["dim"]] = r["u_fp"]
    u = u / np.linalg.norm(u)
    q = np.rint(np.array([r[1] for r in rows]) * 1000)
    w, vec = np.linalg.eigh(q.T @ q)
    top = vec[:, -1]
    assert abs(float(u @ top)) > 0.999


def test_principal_axis_zero_matvec_oracle_parity(spark):
    """ADVICE r4: all-zero quantized embeddings make round 1's matvec zero;
    the engine breaks and returns u0 = 2^19 everywhere. The unrolled oracle
    must carry the previous iterate forward (mx=0 branch), not emit zeros."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from extractors_metadata_spark.operators.spectral import principal_axis

    zeros = spark.createDataFrame(
        [(i, [0.0] * 64) for i in range(5)], "vec_id long, embedding array<double>"
    )
    out = principal_axis(zeros, rounds=3).toPandas().sort_values("dim")
    assert out["u_fp"].tolist() == [1 << 19] * 64

    con = duckdb.connect()
    con.register(
        "embeddings", pd.DataFrame({"vec_id": range(5), "embedding": [[0.0] * 64] * 5})
    )
    odf = con.execute(entry._principal_axis_sql(3)).df().sort_values("dim")
    assert odf["u_fp"].tolist() == [1 << 19] * 64
