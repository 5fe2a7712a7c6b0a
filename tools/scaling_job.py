"""The scaling-evidence job: flagship pipeline at a given parallelism level.

Launched via ``spark-submit --py-files <pkg.zip> tools/scaling_job.py --cpus N
--docs M`` (BASELINE.json mandates the spark-submit --py-files launch mode).
Prints one JSON line with docs/sec. Wall time starts after the session is up
(cluster spin-up is deployment cost, not operator throughput) and covers
synthesis + parse + footprint + cells + resolve + tile fan-out + counts.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--shuffle", type=int, default=0, help="override shuffle partitions")
    ap.add_argument("--part-factor", type=int, default=2, dest="part_factor")
    ap.add_argument("--extra", action="append", default=[], help="k=v extra spark conf")
    args = ap.parse_args()

    from extractors_metadata_spark.plans.pipeline import run_pipeline_counts
    from extractors_metadata_spark.session import get_spark
    from extractors_metadata_spark.synth import plot_rings, synth_webpages

    spark = get_spark(
        f"scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.shuffle or max(args.cpus, 8),
        extra_conf=dict(kv.split("=", 1) for kv in args.extra),
    )
    spark.sparkContext.setLogLevel("ERROR")
    plots = plot_rings()  # driver-side dim prep happens in both runs alike

    t0 = time.time()
    pages = synth_webpages(spark, args.docs, partitions=args.cpus * args.part_factor)
    n_dp, n_tiles = run_pipeline_counts(spark, pages, plots)
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "docs": args.docs,
                "datapoints": n_dp,
                "tiles": n_tiles,
                "wall_s": round(wall, 3),
                "docs_per_sec": round(args.docs / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
