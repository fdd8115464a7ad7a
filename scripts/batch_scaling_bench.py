"""North-rule scaling evidence, BATCH-retrieval side: the same bulk
mining job (ONE `engine.search_batch` call over a few hundred distinct
queries) at two parallelism levels (N and 4N cores — the sandbox
substitute for N vs 4N executors) over the SAME pre-built index,
reporting batch throughput (queries/sec) at both plus scaling efficiency.

Why a separate artifact: `scripts/query_scaling_bench.py` evidences the
interactive query SERVICE (many independent jobs, concurrency = cores);
the batch path is a single job whose parallelism is its doc-range tasks,
so it scales the way an offline mining stage on a real cluster would —
range workers are embarrassingly parallel and the merge is driver-scale.

Workload: a deterministic mining-style set of distinct boolean queries
generated from the fixture vocabulary (pairs/triples across AND/OR/
required shapes — distinct term sets, so the shared-decode amortization
is realistic, not an artifact of identical queries).

Same methodology as the sibling benches: burn-gated clean windows, fresh
subprocess per sample, best-of interleaved rounds, raw + cpu-normalized +
bw-normalized efficiencies reported.

Usage: python scripts/batch_scaling_bench.py [lo hi [rounds]] (default 2 8 3)
Writes SCALING_BATCH.json.
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

from query_scaling_bench import pregen_index  # noqa: E402
from scaling_bench import bw_capacity, hw_capacity, pregen_corpus  # noqa: E402

N_QUERIES = int(os.environ.get("SPARK_GRAFT_BATCH_QUERIES", "200"))
K = 25


def mining_queries(n: int) -> list[str]:
    """Deterministic distinct boolean queries over the fixture vocab —
    the shape of an offline mining set (pairs/triples, mixed operators,
    hot and cold terms)."""
    words = [
        "error", "data", "request", "response", "token", "service",
        "cache", "queue", "worker", "handler", "filter", "parser",
        "whitelist", "firewall", "database", "password", "timestamp",
        "running", "handling", "processing", "authentication", "migration",
        "client", "server", "config", "event", "listener", "callback",
        "manager", "keyword",
    ]
    ops = [" AND ", " OR ", " "]
    out: list[str] = []
    seen: set[str] = set()
    # enumerate ordered pairs (a, b), a != b: 30*29 = 870 distinct pairs,
    # x3 operator shapes — far more than any sane n; assert anyway
    for i in range(len(words) * (len(words) - 1)):
        a = words[i % len(words)]
        b = words[(i // len(words) + i + 1) % len(words)]
        if a == b:
            continue
        op = ops[i % len(ops)]
        if i % 7 == 6:
            q = f"+{a} {b}"
        elif i % 5 == 4:
            c = words[(i * 11 + 5) % len(words)]
            q = f"({a}{op}{b}) AND {c}" if c not in (a, b) else a + op + b
        else:
            q = a + op + b
        if q not in seen:
            seen.add(q)
            out.append(q)
        if len(out) >= n:
            return out
    raise ValueError(f"could only generate {len(out)} distinct queries")


WORKER_CODE = r"""
import json, sys, time

sys.path.insert(0, {repo!r})
sys.path.insert(0, {scripts!r})
import bench
from batch_scaling_bench import mining_queries, N_QUERIES, K
from probe_spark.search.engine import SearchEngine

cpus = {cpus}
spark = bench.build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
eng = SearchEngine(spark, {index_dir!r})

queries = mining_queries(N_QUERIES)
# warm pass (unmeasured): first-touch codegen, segment metadata, term dfs
eng.search_batch(queries[:10], k=K, with_metadata=False).collect()

with bench.HostSampler() as sampler:
    t0 = time.time()
    rows = eng.search_batch(queries, k=K, with_metadata=False).collect()
    wall = time.time() - t0
print(json.dumps({{
    "qps": round(len(queries) / wall, 3),
    "wall_sec": round(wall, 3),
    "n_queries": len(queries),
    "n_rows": len(rows),
    **sampler.summary(),
}}))
spark.stop()
"""


def run_once(cpus: int, index_dir: str) -> dict:
    code = WORKER_CODE.format(
        repo=REPO,
        scripts=os.path.dirname(os.path.abspath(__file__)),
        cpus=cpus,
        index_dir=index_dir,
    )
    env = dict(
        os.environ,
        PYTHONPATH=os.pathsep.join(
            [REPO, os.path.dirname(os.path.abspath(__file__))]
        ),
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from batch worker at {cpus} cpus:\n{out.stderr[-2000:]}"
    )


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_convs = int(os.environ.get("SPARK_GRAFT_N_CONVS", "200000"))
    corpus = pregen_corpus(n_convs)
    index_dir = pregen_index(corpus, n_convs)

    job: dict[int, list[float]] = {lo: [], hi: []}
    best_burn: dict[int, float] = {lo: 0.0, hi: 0.0}
    best_bw: dict[int, float] = {lo: 0.0, hi: 0.0}
    n_rows = n_queries = None
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
            for attempt in range(3):
                res = run_once(cpus, index_dir)
                post = hw_capacity(cpus)
                post_bw = bw_capacity(cpus)
                best_burn[cpus] = max(best_burn[cpus], post)
                best_bw[cpus] = max(best_bw[cpus], post_bw)
                ok = post >= 0.85 * best_burn[cpus]
                n_rows, n_queries = res["n_rows"], res["n_queries"]
                job[cpus].append(res["qps"])
                print(
                    f"round {r} local[{cpus}]"
                    f"{'' if ok else f' [dirty window, attempt {attempt}]'}: "
                    f"{res['qps']} q/s (wall {res['wall_sec']}s, "
                    f"{res['n_rows']} rows) | burn pre {burn:.2f} post "
                    f"{post:.2f} | host busy {res.get('host_busy_mean')}% "
                    f"steal {res.get('host_steal_mean')}%",
                    flush=True,
                )
                if ok:
                    break
    best_lo, best_hi = max(job[lo]), max(job[hi])
    ratio = hi / lo
    raw = (best_hi / best_lo) / ratio
    hw_eff = (best_burn[hi] / max(best_burn[lo], 0.001)) / ratio
    normalized = raw / hw_eff if hw_eff > 0 else 0.0
    bw_eff = (best_bw[hi] / best_bw[lo]) / ratio if best_bw[lo] else 0.0
    normalized_bw = raw / bw_eff if bw_eff > 0 else 0.0
    result = {
        "job": "bm25_batch_retrieval",
        "n_queries_per_batch": n_queries,
        "n_result_rows": n_rows,
        "k": K,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "rounds": rounds,
        "qps_lo": best_lo,
        "qps_hi": best_hi,
        "samples_lo": job[lo],
        "samples_hi": job[hi],
        "hw_units_per_sec_lo": round(best_burn[lo], 3),
        "hw_units_per_sec_hi": round(best_burn[hi], 3),
        "hw_efficiency": round(hw_eff, 3),
        "bw_units_per_sec_lo": round(best_bw[lo], 3),
        "bw_units_per_sec_hi": round(best_bw[hi], 3),
        "bw_efficiency": round(bw_eff, 3),
        "raw_efficiency": round(raw, 3),
        "normalized_efficiency": round(normalized, 3),
        "normalized_bw_efficiency": round(normalized_bw, 3),
        "target": 0.8,
        "pass_raw": raw >= 0.8,
        "pass_normalized": normalized >= 0.8,
        "pass_normalized_bw": normalized_bw >= 0.8,
        "note": (
            "Batched bulk retrieval: one search_batch job over distinct "
            "mining-style queries, pre-built index, warm subprocess per "
            "sample.  Parallelism = doc-range tasks; the merge is "
            "driver-scale.  Normalizations as in scaling_bench.py."
        ),
    }
    try:
        import pyarrow.dataset as ds

        result["n_turns_indexed"] = ds.dataset(corpus).count_rows()
    except Exception:
        result["n_turns_indexed"] = None
    print(json.dumps(result))
    with open(os.path.join(REPO, "SCALING_BATCH.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
