"""One instrumented build at a given core count over a pregen corpus:
prints per-phase walls (PROBE_SPARK_TIMING) and aggregated pass-B task
traces (PROBE_SPARK_TASK_TRACE).

Usage: python scripts/phase_scaling.py <cpus> [corpus_dir]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling_corpus_200000"
    trace = tempfile.mktemp(prefix=f"trace_{cpus}_")
    os.environ["PROBE_SPARK_TIMING"] = "1"
    os.environ["PROBE_SPARK_TASK_TRACE"] = trace

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"phase-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(4 * cpus))
        .config("spark.driver.memory", f"{max(16, int(cpus * 1.5))}g")
        .config("spark.local.dir", "/tmp/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from probe_spark.index.build import BuildConfig, IndexBuilder

    n_turns = spark.read.parquet(corpus).count()
    build_dir = tempfile.mkdtemp(prefix=f"phs_idx_{cpus}_")
    shutil.rmtree(build_dir, ignore_errors=True)
    builder = IndexBuilder(spark, BuildConfig())
    t0 = time.time()
    builder.build(corpus, build_dir)
    wall = time.time() - t0
    print(
        f"CPUS={cpus} turns={n_turns} wall={wall:.1f}s "
        f"tps={n_turns / wall:.0f}",
        flush=True,
    )
    # aggregate task traces
    agg: dict[str, float] = {}
    tasks = []
    if os.path.exists(trace):
        for line in open(trace):
            kv = dict(p.split("=") for p in line.split()[2:])
            tasks.append(kv)
            for k, v in kv.items():
                agg[k] = agg.get(k, 0.0) + float(v)
    print(f"passB tasks={len(tasks)} core-seconds by sub-phase:")
    for k, v in sorted(agg.items(), key=lambda x: -x[1]):
        if k not in ("t0", "t1"):
            print(f"  {k:8s} {v:9.1f}")
    if tasks and "t0" in tasks[0]:
        base = min(float(t["t0"]) for t in tasks)
        span = max(float(t["t1"]) for t in tasks) - base
        walls = [float(t["t1"]) - float(t["t0"]) for t in tasks]
        busies = [
            sum(float(v) for k, v in t.items() if k not in ("t0", "t1"))
            for t in tasks
        ]
        util = sum(walls) / (span * cpus) if span else 0.0
        inside = sum(busies) / sum(walls) if sum(walls) else 0.0
        print(
            f"passB span={span:.1f}s slot-occupancy={util:.2f} "
            f"traced-share-of-task-wall={inside:.2f} "
            f"task wall p50={sorted(walls)[len(walls)//2]:.2f} "
            f"max={max(walls):.2f}"
        )
    shutil.rmtree(build_dir, ignore_errors=True)
    os.unlink(trace)
    spark.stop()


if __name__ == "__main__":
    main()
