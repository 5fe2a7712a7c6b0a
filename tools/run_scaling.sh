#!/bin/bash
# Two-parallelism scaling evidence (north rule: N vs 4N, efficiency >= 0.8),
# launched the mandated way: spark-submit --py-files. Both levels use the same
# per-core configuration rule: shuffle partitions = 4 x cores, AQE partition
# coalescing off (it under-provisions Python-UDF reduce stages; see
# BENCH/BASELINE.md).
#
# PAIRS alternating (4N, N) runs — 5 pairs by default — so VM noise hits both
# levels alike; tools/scaling_summary.py reduces the log to best-of-k,
# median-of-best-3 AND median-of-all efficiency.
#
# HOST-HEALTH GATE: this VM's memory backing intermittently degrades ~1000x
# for cold pages (BENCH/BASELINE.md); scaling numbers captured then measure
# page-fault service, not plans (measured negative control: 0.47 "efficiency"
# from a near-constant serial fault term). Before EACH pair the cold-page
# probe must read >= SPARK_GRAFT_MIN_GBPS (default 2 GB/s); otherwise the
# harness sleep-retries (bounded by SPARK_GRAFT_MAX_WAIT_S per pair, default
# 3600) and aborts rather than logging contaminated pairs. Probe values are
# appended to "$OUT.probes" so the artifact is self-describing.
set -euo pipefail
cd "$(dirname "$0")/.."

DOCS="${SPARK_GRAFT_SCALING_DOCS:-1000000}"
N="${SPARK_GRAFT_SCALING_N:-2}"
PAIRS="${SPARK_GRAFT_SCALING_PAIRS:-5}"
OUT="${SPARK_GRAFT_SCALING_OUT:-/tmp/scaling_runs.jsonl}"
MIN_GBPS="${SPARK_GRAFT_MIN_GBPS:-2.0}"
MAX_WAIT="${SPARK_GRAFT_MAX_WAIT_S:-3600}"
PKG=/tmp/extractors_metadata_spark.zip
rm -f "$PKG"
(cd . && zip -qr "$PKG" extractors_metadata_spark)
: > "$OUT"
: > "$OUT.probes"

probe_gbps() {
  python - <<'PYEOF'
import numpy as np, time
x = np.zeros(10_000_000)
t = time.time(); x.copy()
print(round(8 * 10_000_000 / max(time.time() - t, 1e-9) / 1e9, 3))
PYEOF
}

wait_healthy() {
  local waited=0 g
  while :; do
    g=$(probe_gbps)
    echo "probe ${g} GB/s" >> "$OUT.probes"
    if python -c "import sys; sys.exit(0 if float('$g') >= float('$MIN_GBPS') else 1)"; then
      return 0
    fi
    if [ "$waited" -ge "$MAX_WAIT" ]; then
      echo "ABORT: host cold-page probe still ${g} GB/s after ${waited}s" >&2
      echo "abort after ${waited}s at ${g} GB/s" >> "$OUT.probes"
      exit 3
    fi
    echo "host degraded (${g} GB/s < ${MIN_GBPS}); sleeping 60s" >&2
    sleep 60; waited=$((waited + 60))
  done
}

for _ in $(seq 1 "$PAIRS"); do
  wait_healthy
  for CPUS in $((N * 4)) "$N"; do
    spark-submit --master "local[$CPUS]" --py-files "$PKG" \
      --conf spark.ui.enabled=false \
      --driver-memory 16g \
      tools/scaling_job.py --cpus "$CPUS" --docs "$DOCS" \
      --shuffle $((CPUS * 4)) \
      --extra spark.sql.adaptive.coalescePartitions.enabled=false 2>/dev/null \
      | tail -1 | tee -a "$OUT"
  done
done

python tools/scaling_summary.py "$OUT"
