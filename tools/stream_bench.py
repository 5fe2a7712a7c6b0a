#!/usr/bin/env python
"""Streaming drain benchmark: AvailableNow drain of the flagship pipeline
through foreachBatch (streaming/stream.stream_pipeline) — the event-driven
deployment mode — timed end-to-end including the per-batch resume anti-join
and snapshot commits.

Usage:  SPARK_GRAFT_CPUS=4 python tools/stream_bench.py [n_docs]
Prints one JSON line: {"mode": "stream_drain", "cpus": N, "docs": D,
 "wall_s": W, "docs_per_sec": R, "batches": B, "rows_out": X}

Run at two core counts (e.g. 1 and 4 — see BENCH/BASELINE.md on this host's
~8-full-speed-process ceiling) for the streaming scaling datapoint.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))

    from extractors_metadata_spark.session import get_spark
    from extractors_metadata_spark.streaming.stream import stream_pipeline
    from extractors_metadata_spark.synth import plot_rings, synth_webpages

    spark = get_spark(
        "stream-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 8),
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_bench_")
    input_dir = os.path.join(work, "pages")
    table = os.path.join(work, "datapoints")
    ckpt = os.path.join(work, "ckpt")
    # 8 input files per planned batch x 4 batches: the drain exercises real
    # multi-batch behavior (maxFilesPerTrigger=8 below), untimed synthesis
    synth_webpages(spark, n_docs, partitions=32).write.parquet(input_dir)

    plots = plot_rings()
    t0 = time.time()
    q = stream_pipeline(spark, input_dir, table, ckpt, plots, max_files_per_trigger=8)
    q.awaitTermination()
    wall = time.time() - t0

    from extractors_metadata_spark.sources.snapshot import live_snapshots

    manifests = live_snapshots(table)
    rows_out = sum(m["rows"] for m in manifests)
    print(
        json.dumps(
            {
                "mode": "stream_drain",
                "cpus": cpus,
                "docs": n_docs,
                "wall_s": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "batches": len(manifests),
                "rows_out": rows_out,
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
