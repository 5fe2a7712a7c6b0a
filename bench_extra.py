#!/usr/bin/env python
"""Per-query measurement harness for optimization work (bench.py stays FROZEN).

Differences from bench.py (the measured artifact):
  - runs each suite query SPARK_GRAFT_BENCHX_RUNS times (default 1),
  - streams one JSON line per query to stdout as it finishes (a kill keeps
    the partial data),
  - records cold-page probes but never sleeps on them,
  - optional name filter: ``python bench_extra.py q1,q2,...``.

Same spark config, same suite list (parsed out of bench.py so the two can
never drift), same count() methodology, same headline pipeline.
"""

from __future__ import annotations

import ast
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _probe_gbps() -> float:
    x = np.zeros(10_000_000)
    t = time.time()
    x.copy()
    return round(8 * 10_000_000 / max(time.time() - t, 1e-9) / 1e9, 3)


def bench_suite() -> list[str]:
    """The frozen bench.py suite list, parsed from its source."""
    src = open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py")).read()
    m = re.search(r"suite = (\[.*?\n    \])", src, re.S)
    return ast.literal_eval(m.group(1))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCHX_RUNS", "1"))
    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    skip_pipeline = os.environ.get("SPARK_GRAFT_BENCHX_NO_PIPELINE") == "1" or only

    import __spark_entry__ as entrymod
    from extractors_metadata_spark.plans.pipeline import run_pipeline_counts
    from extractors_metadata_spark.session import get_spark
    from extractors_metadata_spark.synth import plot_rings, synth_webpages

    spark = get_spark(
        "bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 8),
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def emit(rec: dict) -> None:
        print(json.dumps(rec), flush=True)

    emit({"event": "start", "probe_gbps": _probe_gbps(), "sf_dir": sf_dir, "cpus": cpus, "runs": runs})

    if not skip_pipeline:
        import shutil
        import tempfile

        pages_dir = os.path.join(tempfile.gettempdir(), f"bench_pages_{n_docs}")
        if not os.path.isdir(pages_dir):
            synth_webpages(spark, n_docs, partitions=cpus * 2).write.mode("overwrite").parquet(
                pages_dir + ".tmp"
            )
            shutil.move(pages_dir + ".tmp", pages_dir)
        plots_pdf = plot_rings()
        t0 = time.time()
        pages = spark.read.parquet(pages_dir)
        n_dp, n_tiles = run_pipeline_counts(spark, pages, plots_pdf)
        emit(
            {
                "q": "pipeline_datapoints_tiles",
                "sec": round(time.time() - t0, 3),
                "probe_gbps": _probe_gbps(),
                "datapoints": n_dp,
                "tiles": n_tiles,
            }
        )

    qs = entrymod.queries()
    suite = bench_suite()
    for name in suite:
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"benchx:{name}")
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        emit({"q": name, "sec": round(best, 3), "probe_gbps": _probe_gbps()})
    spark.sparkContext.setJobDescription(None)
    emit({"event": "done"})
    spark.stop()


if __name__ == "__main__":
    main()
