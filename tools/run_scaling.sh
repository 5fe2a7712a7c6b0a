#!/bin/bash
# Two-parallelism scaling run (north rule: N vs 4N, efficiency >= 0.8),
# launched the mandated way: spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."

DOCS="${SPARK_GRAFT_SCALING_DOCS:-400000}"
PKG=/tmp/extractors_metadata_spark.zip
rm -f "$PKG"
(cd . && zip -qr "$PKG" extractors_metadata_spark)

for CPUS in 8 32; do
  spark-submit --master "local[$CPUS]" --py-files "$PKG" \
    --conf spark.ui.enabled=false \
    --driver-memory 8g \
    tools/scaling_job.py --cpus "$CPUS" --docs "$DOCS" 2>/dev/null | tail -1
done
