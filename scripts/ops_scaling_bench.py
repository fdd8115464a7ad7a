"""North-rule scaling evidence, OPS tier: the LLM-data-pipeline operators
(composed training pipeline + MinHash-LSH dedup + connected components)
at two parallelism levels (N and 4N cores — the sandbox substitute for N
vs 4N executors) over the SAME transcript corpus, reporting turns/sec at
both plus scaling efficiency.

Round-3 verdict gap: build and query both had N->4N artifacts; the dedup/
curation/pipeline tier had correctness oracles and plan pins but zero
measured scaling evidence.  This harness closes it with the same
methodology as scaling_bench.py (burn-gated clean windows, best-of-N
samples, raw + cpu-normalized + bandwidth-normalized efficiencies).

The measured job, per sample (one fresh subprocess):

  1. pipeline: ops.pipeline.training_examples over the corpus
     (exact-dedup window -> quality filter -> chunk -> BPE-ish token
     count), forced through an aggregate that touches every output
     column (chunk_text length included, so Catalyst cannot prune the
     chunk expansion).
  2. dedup: ops.dedup.minhash_lsh_pairs (shingle -> 8 minhash sigs ->
     banded buckets, hot-bucket capped) piped into
     ops.dedup.duplicate_clusters (alternating large/small-star) and
     counted.

Both jobs are reported separately (they stress different shapes: the
pipeline is one window shuffle + map-heavy expansion; dedup is
groupBy-heavy with an iterative join loop).

Usage: python scripts/ops_scaling_bench.py [lo hi [rounds]] (default 2 8 2)
Env: SPARK_GRAFT_N_CONVS (default 200000 ~ 3.3M turns; round artifacts
use 1600000 ~ 26.4M turns), SPARK_GRAFT_OPS_JOBS=pipeline,dedup.
Writes SCALING_OPS.json (copy to a tier-named file before re-running —
this OVERWRITES).
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

JOBS = [
    j
    for j in os.environ.get("SPARK_GRAFT_OPS_JOBS", "pipeline,dedup").split(",")
    if j
]

# dirty-window retries per sample: a 2-core 26.4M-turn dedup sample costs
# ~67 min, so unbounded retries are unaffordable — set to 1 and read the
# per-sample burn controls in the artifact's window_log instead
ATTEMPTS = int(os.environ.get("SPARK_GRAFT_OPS_ATTEMPTS", "3"))

WORKER_CODE = r"""
import json, sys, time

sys.path.insert(0, {repo!r})
import bench
from pyspark.sql import functions as F
from probe_spark.ops.dedup import duplicate_clusters, minhash_lsh_pairs
from probe_spark.ops.pipeline import training_examples
from probe_spark.runtime import ensure_package_on_executors

cpus = {cpus}
spark = bench.build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
ensure_package_on_executors(spark)

corpus = spark.read.parquet({corpus_dir!r})
# turns as documents: a deterministic 64-bit id from the natural key
docs = corpus.select(
    F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
)
n_turns = corpus.count()  # metadata-only, before the clock

out = {{"n_turns": int(n_turns)}}
jobs = {jobs!r}
with bench.HostSampler() as sampler:
    if "pipeline" in jobs:
        t0 = time.time()
        agg = training_examples(docs).agg(
            F.count("*").alias("n"),
            F.sum("bpe_tokens").alias("tok"),
            F.max(F.length("chunk_text")).alias("mx"),
        ).collect()[0]
        dt = time.time() - t0
        out["pipeline_sec"] = round(dt, 3)
        out["pipeline_turns_per_sec"] = round(n_turns / dt, 1)
        out["pipeline_rows"] = int(agg["n"])
    if "dedup" in jobs:
        t0 = time.time()
        pairs = minhash_lsh_pairs(docs)
        n_clustered = duplicate_clusters(pairs).count()
        dt = time.time() - t0
        out["dedup_sec"] = round(dt, 3)
        out["dedup_turns_per_sec"] = round(n_turns / dt, 1)
        out["dedup_clustered"] = int(n_clustered)
out.update(sampler.summary())
print(json.dumps(out))
spark.stop()
"""


def run_once(cpus: int, corpus_dir: str) -> dict:
    code = WORKER_CODE.format(
        repo=REPO, cpus=cpus, corpus_dir=corpus_dir, jobs=JOBS
    )
    env = dict(os.environ)
    env.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    env.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    env.setdefault("GLIBC_TUNABLES", "glibc.malloc.hugetlb=1")
    env.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, timeout=5400,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from ops worker at {cpus} cpus:\n{out.stderr[-2000:]}"
    )


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_convs = int(os.environ.get("SPARK_GRAFT_N_CONVS", "200000"))
    corpus = pregen_corpus(n_convs)

    tps: dict[str, dict[int, list[float]]] = {
        j: {lo: [], hi: []} for j in JOBS
    }
    window_log: list[dict] = []
    best_burn: dict[int, float] = {lo: 0.0, hi: 0.0}
    best_bw: dict[int, float] = {lo: 0.0, hi: 0.0}
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
                    f"{best_burn[cpus]:.2f}; waiting 45s]",
                    flush=True,
                )
                time.sleep(45)
                burn = hw_capacity(cpus)
                best_burn[cpus] = max(best_burn[cpus], burn)
            for attempt in range(ATTEMPTS):
                res = run_once(cpus, corpus)
                post = hw_capacity(cpus)
                best_burn[cpus] = max(best_burn[cpus], post)
                ok = post >= 0.85 * best_burn[cpus]
                n_turns = res["n_turns"]
                for j in JOBS:
                    tps[j][cpus].append(res[f"{j}_turns_per_sec"])
                window_log.append(
                    {
                        "cpus": cpus,
                        "round": r,
                        "attempt": attempt,
                        "burn_pre": round(burn, 3),
                        "burn_post": round(post, 3),
                        "clean": ok,
                        "host_busy_mean": res.get("host_busy_mean"),
                        "host_steal_mean": res.get("host_steal_mean"),
                        **{
                            f"{j}_turns_per_sec": res[
                                f"{j}_turns_per_sec"
                            ]
                            for j in JOBS
                        },
                    }
                )
                print(
                    f"round {r} local[{cpus}]"
                    f"{'' if ok else f' [dirty window, attempt {attempt}]'}: "
                    + " ".join(
                        f"{j} {res[f'{j}_turns_per_sec']} turns/s"
                        f" ({res[f'{j}_sec']}s)"
                        for j in JOBS
                    )
                    + f" | burn pre {burn:.2f} post {post:.2f}"
                    f" | host busy {res.get('host_busy_mean')}%"
                    f" steal {res.get('host_steal_mean')}%",
                    flush=True,
                )
                if ok:
                    break
    ratio = hi / lo
    best_hw_lo, best_hw_hi = best_burn[lo], best_burn[hi]
    hw_eff = (best_hw_hi / best_hw_lo) / ratio
    bw_lo = max(best_bw[lo], bw_capacity(lo))
    bw_hi = max(best_bw[hi], bw_capacity(hi))
    bw_eff = (bw_hi / bw_lo) / ratio
    result = {
        "job": "ops_tier",
        "n_turns": n_turns,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "rounds": rounds,
        "hw_units_per_sec_lo": round(best_hw_lo, 3),
        "hw_units_per_sec_hi": round(best_hw_hi, 3),
        "hw_efficiency": round(hw_eff, 3),
        "bw_units_per_sec_lo": round(bw_lo, 3),
        "bw_units_per_sec_hi": round(bw_hi, 3),
        "bw_efficiency": round(bw_eff, 3),
        "target": 0.8,
        # per-sample clean-window controls: burn_pre/burn_post bracket the
        # sample; clean=False means the post-run burn fell under 85% of
        # best — that sample ran partly contended and its throughput is
        # biased DOWN (compute any contention correction from these
        # numbers, in-artifact)
        "window_log": window_log,
    }
    for j in JOBS:
        b_lo, b_hi = max(tps[j][lo]), max(tps[j][hi])
        raw = (b_hi / b_lo) / ratio
        result[j] = {
            "turns_per_sec_lo": b_lo,
            "turns_per_sec_hi": b_hi,
            "samples_lo": tps[j][lo],
            "samples_hi": tps[j][hi],
            "raw_efficiency": round(raw, 3),
            "normalized_efficiency": round(raw / hw_eff, 3) if hw_eff else 0,
            "normalized_bw_efficiency": (
                round(raw / bw_eff, 3) if bw_eff else 0
            ),
            "pass_raw": raw >= 0.8,
            "pass_normalized": (raw / hw_eff if hw_eff else 0) >= 0.8,
        }
    with open(os.path.join(REPO, "SCALING_OPS.json"), "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
