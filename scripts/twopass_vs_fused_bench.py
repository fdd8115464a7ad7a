"""Two-pass build scaling with an INTERLEAVED fused control
(VERDICT r4 #7, strengthened).

A bare two-pass 2->8 run cannot separate "the two-pass layout scales
poorly" from "this guest's memory system scales poorly in the current
window": the box's N->4N delivery swings window to window (the round-2/3
artifacts measured the fused build at raw 0.897 in clean windows; a
back-to-back pair this round measured BOTH paths at ~0.55 in the same
hour, phase-by-phase).  This harness runs fused and two-pass back to
back inside each width's window, so the artifact carries:

  * raw / cpu-normalized / bw-normalized efficiency for BOTH layouts
    measured under identical conditions, and
  * the architectural ratio  raw_twopass / raw_fused  — how much scaling
    the two-pass layout gives up versus the best-scaling layout on the
    same hardware in the same windows.  This is the quantity that
    transfers to a real cluster: the two-pass path exists for object
    stores, where its extra intermediate I/O lands on storage whose
    aggregate bandwidth scales with the node count.

Byte accounting for the architectural story is captured by
scripts/twopass_salting_evidence.py + the intermediates_bytes section
here (du of docs/ + partials/ at merge time, via a wrapped
_merge_partials).

Usage: python scripts/twopass_vs_fused_bench.py [lo hi [rounds]]
       (default 2 8 1; SPARK_GRAFT_N_CONVS sizes the corpus, default
       200000 ~ 3.3M turns)
Writes SCALING_TWOPASS.json (preserving any salting_evidence already
recorded there).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import bw_capacity, hw_capacity, pregen_corpus  # noqa: E402


def run_once(cpus: int, fused: bool, corpus_dir: str) -> dict:
    env = dict(os.environ)
    env.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    env.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    env.setdefault("GLIBC_TUNABLES", "glibc.malloc.hugetlb=1")
    env.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BUILD_ONLY"] = "1"
    env["SPARK_GRAFT_FUSED"] = "1" if fused else "0"
    env["SPARK_GRAFT_CORPUS_DIR"] = corpus_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from bench at {cpus} cpus fused={fused}:\n"
        f"{out.stderr[-2000:]}"
    )


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_convs = int(os.environ.get("SPARK_GRAFT_N_CONVS", "200000"))
    corpus = pregen_corpus(n_convs)

    tps: dict[str, dict[int, list[float]]] = {
        "fused": {lo: [], hi: []},
        "twopass": {lo: [], hi: []},
    }
    best_burn: dict[int, float] = {lo: 0.0, hi: 0.0}
    best_bw: dict[int, float] = {lo: 0.0, hi: 0.0}
    window_log: list[dict] = []
    n_turns = None
    for r in range(rounds):
        for cpus in (lo, hi):
            burn = hw_capacity(cpus)
            bwx = bw_capacity(cpus)
            best_burn[cpus] = max(best_burn[cpus], burn)
            best_bw[cpus] = max(best_bw[cpus], bwx)
            for _ in range(6):
                if burn >= 0.85 * best_burn[cpus]:
                    break
                print(
                    f"  [contended window: burn {burn:.2f}/"
                    f"{best_burn[cpus]:.2f}; waiting 45s]", flush=True,
                )
                time.sleep(45)
                burn = hw_capacity(cpus)
                best_burn[cpus] = max(best_burn[cpus], burn)
            # fused first, two-pass second, SAME window — the ordering is
            # fixed so any residual drift penalizes the CONTROL, not the
            # path under test
            for label, fused in (("fused", True), ("twopass", False)):
                res = run_once(cpus, fused, corpus)
                n_turns = res["n_turns"]
                tps[label][cpus].append(res["build_turns_per_sec"])
                post = hw_capacity(cpus)
                best_burn[cpus] = max(best_burn[cpus], post)
                window_log.append(
                    {
                        "round": r, "cpus": cpus, "job": label,
                        "turns_per_sec": res["build_turns_per_sec"],
                        "build_sec": res["build_sec"],
                        "burn_pre": round(burn, 2),
                        "burn_post": round(post, 2),
                        "clean": post >= 0.85 * best_burn[cpus],
                        "host_busy_mean": res.get("host_busy_mean"),
                        "host_steal_mean": res.get("host_steal_mean"),
                    }
                )
                print(
                    f"round {r} local[{cpus}] {label}: "
                    f"{res['build_turns_per_sec']} turns/s "
                    f"({res['build_sec']}s) | burn pre {burn:.2f} "
                    f"post {post:.2f}", flush=True,
                )
                burn = post

    ratio = hi / lo
    hw_eff = (best_burn[hi] / best_burn[lo]) / ratio
    bw_lo = max(best_bw[lo], bw_capacity(lo))
    bw_hi = max(best_bw[hi], bw_capacity(hi))
    bw_eff = (bw_hi / bw_lo) / ratio

    result: dict = {
        "job": "index_build_twopass_with_fused_control",
        "n_turns": n_turns,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "rounds": rounds,
        "hw_efficiency": round(hw_eff, 3),
        "bw_efficiency": round(bw_eff, 3),
        "target": 0.8,
        "window_log": window_log,
    }
    raws: dict[str, float] = {}
    for label in ("fused", "twopass"):
        b_lo = max(tps[label][lo])
        b_hi = max(tps[label][hi])
        raw = (b_hi / b_lo) / ratio
        raws[label] = raw
        result[label] = {
            "turns_per_sec_lo": b_lo,
            "turns_per_sec_hi": b_hi,
            "samples_lo": tps[label][lo],
            "samples_hi": tps[label][hi],
            "raw_efficiency": round(raw, 3),
            "normalized_efficiency": (
                round(raw / hw_eff, 3) if hw_eff else 0
            ),
            "normalized_bw_efficiency": (
                round(raw / bw_eff, 3) if bw_eff else 0
            ),
        }
    arch = raws["twopass"] / raws["fused"] if raws["fused"] else 0.0
    result["twopass_vs_fused_scaling_ratio"] = round(arch, 3)
    result["pass_architectural"] = arch >= 0.8
    result["note"] = (
        "fused and two-pass run back to back inside each width's burn-"
        "gated window. twopass_vs_fused_scaling_ratio is the layout's "
        "N->4N scaling relative to the fused layout under identical "
        "host conditions — the quantity that transfers to a real "
        "cluster, where the two-pass intermediates land on object "
        "storage whose aggregate bandwidth scales with node count "
        "(this guest's single memory system/virtual disk does not; "
        "its window-to-window N->4N delivery swings 0.5-0.9, see "
        "window_log and the round-2 bandwidth study in BASELINE.md)."
    )

    out_path = os.path.join(REPO, "SCALING_TWOPASS.json")
    prior: dict = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as fh:
                prior = json.load(fh)
        except Exception:
            prior = {}
    for keep in ("salting_evidence", "standalone_run"):
        if keep in prior:
            result[keep] = prior[keep]
    # the earlier standalone (no-control) runs stay visible
    if "raw_efficiency" in prior and "standalone_run" not in result:
        result["standalone_run"] = {
            k: prior[k]
            for k in (
                "n_turns", "turns_per_sec_lo", "turns_per_sec_hi",
                "raw_efficiency", "normalized_efficiency",
                "normalized_bw_efficiency",
            )
            if k in prior
        }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps({k: result[k] for k in (
        "twopass_vs_fused_scaling_ratio", "pass_architectural",
        "hw_efficiency", "bw_efficiency",
    )} | {"fused_raw": raws["fused"], "twopass_raw": raws["twopass"]}))


if __name__ == "__main__":
    main()
