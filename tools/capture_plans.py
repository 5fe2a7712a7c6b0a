#!/usr/bin/env python
"""Capture .explain("formatted") for a list of suite queries.

Usage: python tools/capture_plans.py <outdir> <suffix> q1,q2,...

Writes <outdir>/<q>_<suffix>.txt.  For r6's registry-wrapped queries the
UNwrapped builder (fn.__wrapped__) is explained so the file shows the
real operator plan rather than an InMemoryTableScan of the materialized
result (the wrap only changes WHERE the plan materializes, not the
plan).  Explain is driver-only — no jobs run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from extractors_metadata_spark.session import get_spark

    spark = get_spark(
        "capture_plans",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 8),
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        fn = qs[name]
        fn = getattr(fn, "__wrapped__", fn)
        try:
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # construction-time collects may still run
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
