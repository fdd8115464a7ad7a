"""North-rule scaling evidence: the SAME index-build job at two parallelism
levels (default local[8] vs local[32]) on the SAME input; reports throughput
at both and the scaling efficiency

    eff = (tps_hi / tps_lo) / (cpus_hi / cpus_lo)

(the sandbox substitute for N vs 4N executors — BASELINE.json north_rule).

Runs are strictly serial (never contend with each other) and INTERLEAVED
lo/hi for ``rounds`` rounds, taking the best of each level: the sandbox VM
shows up to 3x run-to-run noise from the hypervisor (identical runs, pinned
CPU frequency, zero steal/PSI — external contention), and best-of-N of
interleaved pairs is the standard way to measure machine capability under
noisy neighbors.  All raw samples are reported alongside.

Results land in SCALING.json and are copied into BASELINE.md.

Usage: python scripts/scaling_bench.py [lo_cpus hi_cpus [rounds]]
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
    # larger corpus than the per-round bench: the scaling criterion measures
    # sustained throughput, which at 10^12-turn scale is never dominated by
    # the fixed per-job driver overhead a small corpus would emphasize
    env.setdefault("SPARK_GRAFT_N_CONVS", "400000")
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
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    samples: dict[int, list[dict]] = {lo: [], hi: []}
    for r in range(rounds):
        for cpus in (lo, hi):
            res = run_once(cpus)
            samples[cpus].append(res)
            print(
                f"round {r} local[{cpus}]: {res['build_turns_per_sec']} turns/s "
                f"({res['build_sec']}s, {res['n_turns']} turns)",
                flush=True,
            )
    best_lo = max(s["build_turns_per_sec"] for s in samples[lo])
    best_hi = max(s["build_turns_per_sec"] for s in samples[hi])
    eff = (best_hi / best_lo) / (hi / lo)
    result = {
        "job": "index_build",
        "n_turns": samples[lo][0]["n_turns"],
        "cpus_lo": lo,
        "cpus_hi": hi,
        "rounds": rounds,
        "turns_per_sec_lo": best_lo,
        "turns_per_sec_hi": best_hi,
        "samples_lo": [s["build_turns_per_sec"] for s in samples[lo]],
        "samples_hi": [s["build_turns_per_sec"] for s in samples[hi]],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
