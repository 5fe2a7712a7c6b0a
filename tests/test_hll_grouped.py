"""Grouped HLL (sketches.hll_sketch_grouped / hll_estimate_grouped)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_grouped_hll_estimates_per_group(spark):
    from extractors_metadata_spark.operators.sketches import (
        hll_estimate_grouped,
        hll_sketch_grouped,
    )

    rows = []
    for g, n in (("a", 40), ("b", 400), ("c", 3)):
        rows.extend((g, f"{g}:user{i % n}") for i in range(n * 3))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "k"]))
    regs = hll_sketch_grouped(df, ("g",), F.col("k"), p=8)
    est = {
        r["g"]: r["estimate"]
        for r in hll_estimate_grouped(regs, ("g",), p=8).collect()
    }
    for g, n in (("a", 40), ("b", 400), ("c", 3)):
        assert abs(est[g] - n) / n < 0.2, (g, est[g])


def test_grouped_hll_matches_global_for_single_group(spark):
    """One group must reproduce the global sketch's estimate exactly —
    the grouped estimator (sparse registers + (m-n_obs) zero fill) and the
    dense global one are the same math."""
    from extractors_metadata_spark.operators.sketches import (
        hll_estimate,
        hll_estimate_grouped,
        hll_sketch,
        hll_sketch_grouped,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * 500, "k": [f"u{i % 137}" for i in range(500)]})
    )
    global_est = hll_estimate(hll_sketch(df, F.col("k"), p=8), p=8).collect()[0][
        "estimate"
    ]
    grouped_est = hll_estimate_grouped(
        hll_sketch_grouped(df, ("g",), F.col("k"), p=8), ("g",), p=8
    ).collect()[0]["estimate"]
    assert grouped_est == global_est


def test_grouped_hll_shard_merge_is_exact(spark):
    """Per-shard grouped sketches merged by groupBy-max must equal the
    one-shot sketch bit-for-bit (the 100 TB rollup contract)."""
    from extractors_metadata_spark.operators.sketches import (
        hll_sketch_grouped,
    )

    pdf = pd.DataFrame(
        {"g": ["a" if i % 2 else "b" for i in range(600)],
         "k": [f"u{i % 211}" for i in range(600)]}
    )
    df = spark.createDataFrame(pdf)
    whole = sorted(
        map(tuple, hll_sketch_grouped(df, ("g",), F.col("k"), p=6).collect())
    )
    s1 = hll_sketch_grouped(
        spark.createDataFrame(pdf.iloc[:250]), ("g",), F.col("k"), p=6
    )
    s2 = hll_sketch_grouped(
        spark.createDataFrame(pdf.iloc[250:]), ("g",), F.col("k"), p=6
    )
    merged = sorted(
        map(
            tuple,
            s1.unionByName(s2)
            .groupBy("g", "bucket")
            .agg(F.max("rho").alias("rho"))
            .collect(),
        )
    )
    assert merged == whole


def test_pyramid_cascade_equals_direct_sketch(spark):
    """Register-max cascade at z-1 == sketching z-1 tiles directly from
    raw (mergeability x halving identity — the hll_tile_pyramid core)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from extractors_metadata_spark.functions.tiles import tile_xyz
    from extractors_metadata_spark.operators.sketches import (
        hll_sketch_grouped,
        hll_tile_pyramid,
    )

    i = np.arange(600)
    lat = 33.0 + (i % 223) / 223.0 * 0.02
    lon = -112.0 + (i % 97) / 97.0 * 0.03
    x, y = tile_xyz(lat, lon, 18)
    df = spark.createDataFrame(
        pd.DataFrame({"x": x, "y": y, "user": (i % 37).astype("int64")})
    )
    regs = hll_sketch_grouped(df, ("x", "y"), F.col("user").cast("string"), p=6)
    out, caches = hll_tile_pyramid(regs, z_max=18, z_min=16, p=6)
    got = {(r.z, r.x, r.y): (r.n_zero, r.estimate) for r in out.collect()}
    for c in caches:
        c.unpersist()
    from extractors_metadata_spark.operators.sketches import (
        hll_estimate_grouped,
    )

    for shift, z in ((1, 17), (2, 16)):
        d2 = spark.createDataFrame(
            pd.DataFrame(
                {"x": x >> shift, "y": y >> shift, "user": (i % 37).astype("int64")}
            )
        )
        regs2 = hll_sketch_grouped(d2, ("x", "y"), F.col("user").cast("string"), p=6)
        direct = {
            (z, r.x, r.y): (r.n_zero, r.estimate)
            for r in hll_estimate_grouped(regs2, ("x", "y"), p=6).collect()
        }
        assert {k: v for k, v in got.items() if k[0] == z} == direct
