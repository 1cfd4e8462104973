"""Scaling-efficiency evidence for the north rule.

No real cluster exists in this sandbox, so (per BASELINE.md) we run
the IDENTICAL tokenized-sequence workload at two local parallelism
levels — local[N] and local[4N] — each in a fresh JVM (subprocess), on
the same input size, and report both throughputs plus
efficiency = (throughput_4N / throughput_N) / 4.

Usage: python bench_scaling.py [N] [rows]   (default N=8 → 8 vs 32)
Writes BENCH_SCALING.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROWS = sys.argv[2] if len(sys.argv) > 2 else None
REPO = os.path.dirname(os.path.abspath(__file__))


def run_at(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["BENCH_WORKLOAD_ONLY"] = "1"
    if ROWS:
        env["BENCH_ROWS"] = ROWS
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=3000)
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    return json.loads(line)


def main():
    lo = run_at(N)
    hi = run_at(4 * N)
    tput_lo = lo["sequences_per_sec"]
    tput_hi = hi["sequences_per_sec"]
    eff = (tput_hi / tput_lo) / 4.0
    result = {
        "metric": "scaling_efficiency_N_to_4N",
        "N": N,
        "rows": lo["workload"]["rows"],
        "throughput_N": tput_lo,
        "throughput_4N": tput_hi,
        "wall_N_sec": lo["value"],
        "wall_4N_sec": hi["value"],
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
