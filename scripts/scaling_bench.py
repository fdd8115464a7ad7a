"""North-rule scaling evidence: the SAME index-build job at two parallelism
levels (local[8] vs local[32]) on the SAME input; reports throughput at both
and the scaling efficiency

    eff = (tps_hi / tps_lo) / (cpus_hi / cpus_lo)

(the sandbox substitute for N vs 4N executors — BASELINE.json north_rule).
Each run is a fresh subprocess/JVM, executed strictly serially so runs never
contend for cores.  Results land in SCALING.json and should be copied into
BASELINE.md.

Usage: python scripts/scaling_bench.py [lo_cpus hi_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BUILD_ONLY"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench at {cpus} cpus:\n{out.stderr[-2000:]}")


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    r_lo = run_once(lo)
    print(f"local[{lo}]: {r_lo['build_turns_per_sec']} turns/s "
          f"({r_lo['build_sec']}s, {r_lo['n_turns']} turns)", flush=True)
    r_hi = run_once(hi)
    print(f"local[{hi}]: {r_hi['build_turns_per_sec']} turns/s "
          f"({r_hi['build_sec']}s, {r_hi['n_turns']} turns)", flush=True)
    eff = (r_hi["build_turns_per_sec"] / r_lo["build_turns_per_sec"]) / (hi / lo)
    result = {
        "job": "index_build",
        "n_turns": r_lo["n_turns"],
        "cpus_lo": lo,
        "cpus_hi": hi,
        "turns_per_sec_lo": r_lo["build_turns_per_sec"],
        "turns_per_sec_hi": r_hi["build_turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
