"""Driver-mimic: run every __spark_entry__ query against its DuckDB oracle.

Compares row count, column names, and order-insensitive values (exact for
ints/strings, exact-double for floats — stricter than any hash the driver
could use). Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    issues = []
    if len(sdf) != len(odf):
        issues.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        issues.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return issues
    a, b = normalize(sdf), normalize(odf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                av = av.astype(np.float64)
                bv = bv.astype(np.float64)
                neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
            elif np.issubdtype(av.dtype, np.datetime64) or np.issubdtype(bv.dtype, np.datetime64):
                neq = pd.to_datetime(a[c]).to_numpy() != pd.to_datetime(b[c]).to_numpy()
            else:
                neq = av.astype(str) != bv.astype(str)
            if neq.any():
                i = int(np.argmax(neq))
                issues.append(
                    f"col {c}: {int(neq.sum())} diffs, first@{i}: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
                )
    return issues


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")), None
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1].split(",") if len(args) > 1 else None

    import __spark_entry__ as entrymod
    from extractors_metadata_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            results[name] = {"status": "fail", "err": f"spark: {e}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            results[name] = {
                "status": "rows_only", "rows": len(sdf),
                "wall_s": round(time.time() - t0, 1),
            }
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {e}")
            results[name] = {"status": "fail", "err": f"oracle: {e}"}
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        if issues:
            print(f"FAIL  {name} ({len(sdf)} rows): " + " | ".join(issues[:4]))
            results[name] = {"status": "fail", "rows": len(sdf), "issues": issues[:4]}
            n_fail += 1
        else:
            print(f"pass  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            results[name] = {
                "status": "pass", "rows": len(sdf),
                "wall_s": round(time.time() - t0, 1),
            }
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "totals": {"pass": n_pass, "rows_only": n_rowsonly, "fail": n_fail},
                    "queries": results,
                },
                f,
                indent=1,
            )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
