"""Profile the index build exactly as scaling_bench measures it (bench.py
configs, pregen corpus read from parquet), with per-phase timers and the
Spark UI stage table.  Usage: python scripts/profile_scaling.py [cpus] [corpus]
"""
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PROBE_SPARK_TIMING"] = "1"


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    corpus_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling_corpus_100000"

    import bench
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"profile-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", os.environ.get("PROF_SHUF") or str(4 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("PROF_MEM") or f"{max(16, int(cpus * 1.5))}g")
        .config("spark.local.dir",
                os.path.join(bench.scratch_dir(), "spark-local"))
        .config("spark.driver.extraJavaOptions",
                os.environ.get("PROF_JAVAOPTS", ""))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("PROF_ARROW", "65536"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4057")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from probe_spark.index.build import BuildConfig, IndexBuilder

    corpus = spark.read.parquet(corpus_dir)
    n_turns = corpus.count()
    build_dir = tempfile.mkdtemp(prefix="prof_idx_", dir=bench.scratch_dir())
    shutil.rmtree(build_dir, ignore_errors=True)
    builder = IndexBuilder(spark, BuildConfig())
    t0 = time.time()
    builder.build(corpus_dir, build_dir)
    wall = time.time() - t0
    print(f"\nBUILD local[{cpus}] {n_turns} turns in {wall:.1f}s = "
          f"{n_turns/wall:.0f} turns/s\n")

    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4057/api/v1/applications/{app_id}/stages"
    stages = json.load(urllib.request.urlopen(url))
    stages.sort(key=lambda s: s["stageId"])
    print(f"{'id':>4} {'tasks':>6} {'wall_s':>8} {'run_core_s':>10} "
          f"{'cpu_core_s':>10} {'gc_s':>6}  name")
    for s in stages:
        if s["status"] != "COMPLETE":
            continue
        run_s = s["executorRunTime"] / 1000.0
        cpu_s = s.get("executorCpuTime", 0) / 1e9
        gc_s = s.get("jvmGcTime", 0) / 1000.0
        sub = time.strptime(s["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        comp = time.strptime(s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        wall_s = time.mktime(comp) - time.mktime(sub)
        print(f"{s['stageId']:>4} {s['numCompleteTasks']:>6} {wall_s:>8.1f} "
              f"{run_s:>10.1f} {cpu_s:>10.1f} {gc_s:>6.1f}  {s['name'][:70]}")
    shutil.rmtree(build_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
