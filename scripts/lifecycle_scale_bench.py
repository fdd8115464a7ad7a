"""Index lifecycle at serving scale (VERDICT r3 #7): the chained
merge -> delete -> vacuum -> compact -> search sequence once at the
26.4M-turn corpus, with wall-times per step and a post-chain
`stats --verify` integrity pass — the large-scale evidence behind
tests/test_lifecycle_chain.py's identity pins (which run at 987k turns).

Shape: the daily-fold a 10^12-turn deployment runs — a BIG serving index
(the pre-built 26.4M-turn scaling index) folded with a small daily delta
shard (50k convs ~ 825k turns, built here), then a predicate delete,
tombstone vacuum, and segment compaction, searching after every step.

Usage: python scripts/lifecycle_scale_bench.py [n_convs [cpus]]
       (default 1600000 32; expects /tmp/scaling_corpus_<n_convs> and
       /tmp/scaling_query_idx_<n_convs> from the scaling harnesses)
Writes LIFECYCLE_26M.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    ("error AND handling", 10),
    ("cache OR queue OR worker", 15),
    ("database -sqlite", 10),  # special-term (repair) path
    ("whitelist AND firewall", 10),
]
DELETE_WHERE = "role = 'tool'"


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import bench
    from pyspark.sql import functions as F
    from probe_spark.fixtures import transcripts_df_dist
    from probe_spark.index.build import BuildConfig, IndexBuilder
    from probe_spark.index.maintenance import (
        compact_index,
        delete_where,
        merge_many,
        vacuum,
    )
    from probe_spark.index.verify import verify_index
    from probe_spark.search.engine import SearchEngine

    base_idx = os.path.join(tempfile.gettempdir(), f"scaling_query_idx_{n_convs}")
    if not os.path.isdir(base_idx):
        raise SystemExit(f"missing pre-built index {base_idx}")

    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="lifecycle_scale_")
    out: dict = {"n_convs_base": n_convs, "cpus": cpus}
    t_all = time.time()

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out[f"{name}_sec"] = round(time.time() - t0, 3)
        print(f"{name}: {out[f'{name}_sec']}s", flush=True)
        return r

    def search_probe(path, label):
        eng = SearchEngine(spark, path)
        t0 = time.time()
        rows = 0
        for q, k in QUERIES:
            rows += len(eng.search(q, k=k, with_metadata=False).collect())
        out[f"search_{label}_sec"] = round(time.time() - t0, 3)
        out[f"search_{label}_rows"] = rows
        print(f"search[{label}]: {out[f'search_{label}_sec']}s "
              f"{rows} rows", flush=True)

    # daily delta shard: 50k convs, disjoint seed
    delta_dir = os.path.join(work, "delta_idx")
    delta_convs = 50_000
    delta = transcripts_df_dist(spark, n_convs=delta_convs, seed=777)
    # conv_ids must not collide with the base corpus (seed 42): prefix them
    delta = delta.withColumn(
        "conv_id", F.concat(F.lit("delta_"), F.col("conv_id"))
    )
    out["n_convs_delta"] = delta_convs
    timed("delta_build", lambda: IndexBuilder(spark, BuildConfig()).build(
        delta, delta_dir))

    merged = os.path.join(work, "merged")
    timed("merge", lambda: merge_many(spark, [base_idx, delta_dir], merged))
    out["n_turns_merged"] = SearchEngine(spark, merged).n_docs
    search_probe(merged, "after_merge")

    n_del = timed("delete", lambda: delete_where(spark, merged, DELETE_WHERE))
    out["n_deleted"] = int(n_del)
    search_probe(merged, "after_delete")

    vac = timed("vacuum", lambda: vacuum(spark, merged))
    out["vacuum_stats"] = {
        k: v for k, v in (vac or {}).items() if isinstance(v, (int, float, str))
    }
    search_probe(merged, "after_vacuum")

    comp = timed("compact", lambda: compact_index(spark, merged))
    out["compact_stats"] = {
        k: v for k, v in (comp or {}).items() if isinstance(v, (int, float, str))
    }
    search_probe(merged, "after_compact")

    ver = timed("verify", lambda: verify_index(spark, merged))
    out["verify_ok"] = bool(ver.get("ok", ver.get("valid", True)))
    out["verify_detail"] = {
        k: v for k, v in ver.items() if isinstance(v, (int, float, str, bool))
    }

    out["total_sec"] = round(time.time() - t_all, 3)
    # name by scale: a smaller-tier drive must never overwrite the
    # 26.4M artifact (the SCALING.json overwrite trap, round 3)
    tag = "26M" if n_convs >= 1_000_000 else f"{n_convs // 62500}M"
    with open(os.path.join(REPO, f"LIFECYCLE_{tag}.json"), "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
