#!/bin/bash
# Two-parallelism scaling run (north rule: N vs 4N, efficiency >= 0.8),
# launched the mandated way: spark-submit --py-files. Both levels use the same
# per-core configuration rule: shuffle partitions = 4 x cores, AQE partition
# coalescing off (it under-provisions Python-UDF reduce stages; see
# BENCH/BASELINE.md).
set -euo pipefail
cd "$(dirname "$0")/.."

DOCS="${SPARK_GRAFT_SCALING_DOCS:-2000000}"
N="${SPARK_GRAFT_SCALING_N:-2}"
PKG=/tmp/extractors_metadata_spark.zip
rm -f "$PKG"
(cd . && zip -qr "$PKG" extractors_metadata_spark)

for CPUS in "$N" $((N * 4)); do
  spark-submit --master "local[$CPUS]" --py-files "$PKG" \
    --conf spark.ui.enabled=false \
    --driver-memory 16g \
    tools/scaling_job.py --cpus "$CPUS" --docs "$DOCS" \
    --shuffle $((CPUS * 4)) \
    --extra spark.sql.adaptive.coalescePartitions.enabled=false 2>/dev/null | tail -1
done
