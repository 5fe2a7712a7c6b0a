"""Reduce a scaling-run JSONL log to the north-rule efficiency numbers.

Usage: python tools/scaling_summary.py /tmp/scaling_runs.jsonl

Reports, per parallelism level: all wall times, best docs/sec, and
median-of-best-3 docs/sec; then efficiency = rate(4N) / (4 * rate(N)) on both
reductions. Median-of-best-3 (the middle of each level's three fastest runs)
is the round-2 evidence standard — robust to a single lucky run AND to the
~2x VM noise documented in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_runs.jsonl"
    runs: dict[int, list[dict]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            runs.setdefault(r["cpus"], []).append(r)

    levels = sorted(runs)
    assert len(levels) == 2, f"expected two parallelism levels, got {levels}"
    n, n4 = levels
    assert n4 == 4 * n, f"levels must be N and 4N, got {levels}"

    summary = {}
    for cpus in levels:
        walls = sorted(r["wall_s"] for r in runs[cpus])
        rates = sorted((r["docs_per_sec"] for r in runs[cpus]), reverse=True)
        best3 = rates[:3]
        summary[cpus] = {
            "n_runs": len(walls),
            "wall_s": walls,
            "best": rates[0],
            "median_of_best3": statistics.median(best3),
            "median_all": statistics.median(rates),
        }

    eff_best = summary[n4]["best"] / (4 * summary[n]["best"])
    eff_mob3 = summary[n4]["median_of_best3"] / (4 * summary[n]["median_of_best3"])
    eff_med = summary[n4]["median_all"] / (4 * summary[n]["median_all"])
    out = {
        "levels": summary,
        "efficiency_best": round(eff_best, 3),
        "efficiency_median_of_best3": round(eff_mob3, 3),
        "efficiency_median_all": round(eff_med, 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
