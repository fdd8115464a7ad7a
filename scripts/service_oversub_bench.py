"""Oversubscribed-service benchmark: in-flight clients >> cores.

The in-flight = cores regime (scripts/query_scaling_bench.py) is where
per-request dispatch shines — each request's job gets scheduled
immediately and the engine's fast paths keep per-query wall ~1s.  A real
front end also faces OVERLOAD: many more concurrent clients than cores.
There, per-request mode collapses (N concurrent Spark jobs thrash the
scheduler and each other) while the micro-batching QueryService
(search/service.py) coalesces the backlog into shared search_batch jobs.

Measured here: the reference suite x 3 passes submitted by ``clients``
concurrent threads at ``cpus`` cores, per-request vs service mode, same
warm engine.  Writes SCALING_QUERY_OVERSUB.json.

Usage: python scripts/service_oversub_bench.py [cpus clients]
       (default 8 64; SPARK_GRAFT_N_CONVS picks the corpus)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from query_scaling_bench import pregen_index  # noqa: E402
from scaling_bench import pregen_corpus  # noqa: E402

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from concurrent.futures import ThreadPoolExecutor
import bench
from probe_spark.fixtures import REFERENCE_QUERIES
from probe_spark.search.engine import SearchEngine
from probe_spark.search.service import QueryService

cpus, clients, mode = {cpus}, {clients}, {mode!r}
spark = bench.build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
eng = SearchEngine(spark, {index_dir!r})
for _qid, q, k in REFERENCE_QUERIES:
    eng.search(q, k=k).collect()
svc = QueryService(eng) if mode == "service" else None

def one(a):
    _qid, q, k = a
    t0 = time.time()
    if svc:
        svc.search(q, k=k)
    else:
        eng.search(q, k=k).collect()
    return time.time() - t0

work = [q for _ in range(3) for q in REFERENCE_QUERIES]
t0 = time.time()
with ThreadPoolExecutor(max_workers=clients) as pool:
    lat = sorted(pool.map(one, work))
wall = time.time() - t0
print(json.dumps({{
    "qps": round(len(work) / wall, 3),
    "p50_sec": round(lat[len(lat) // 2], 2),
    "p95_sec": round(lat[int(0.95 * (len(lat) - 1))], 2),
}}))
if svc:
    svc.close()
spark.stop()
"""


def run(mode: str, cpus: int, clients: int, index_dir: str) -> dict:
    code = WORKER.format(
        repo=REPO, cpus=cpus, clients=clients, mode=mode,
        index_dir=index_dir,
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {mode} worker:\n{out.stderr[-2000:]}")


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    clients = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_convs = int(os.environ.get("SPARK_GRAFT_N_CONVS", "200000"))
    corpus = pregen_corpus(n_convs)
    index_dir = pregen_index(corpus, n_convs)
    res = {
        "job": "query_service_oversubscription",
        "cpus": cpus,
        "clients": clients,
        "suite": "REFERENCE_QUERIES x 3 passes, warm",
        "per_request": run("request", cpus, clients, index_dir),
        "service": run("service", cpus, clients, index_dir),
    }
    res["service_speedup"] = round(
        res["service"]["qps"] / res["per_request"]["qps"], 3
    )
    print(json.dumps(res))
    with open(os.path.join(REPO, "SCALING_QUERY_OVERSUB.json"), "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
