"""Profile the index build with the Spark UI REST API: runs one build on a
synthetic corpus and prints every stage's name, task count, and duration.

Usage: python scripts/profile_build.py [n_convs] [cpus]
"""
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-build")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "65536"),
        )
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM")
            or f"{max(16, int(cpus * 1.5))}g",
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4055")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from probe_spark.fixtures import transcripts_df_dist
    from probe_spark.index.build import BuildConfig, IndexBuilder

    corpus = transcripts_df_dist(spark, n_convs=n_convs, seed=42).persist()
    n_turns = corpus.count()
    if os.environ.get("PROFILE_WARM", "") == "1":
        import shutil as _sh
        wd = tempfile.mkdtemp(prefix="prof_warm_")
        _sh.rmtree(wd, ignore_errors=True)
        IndexBuilder(spark, BuildConfig()).build(
            transcripts_df_dist(spark, n_convs=1000, seed=1), wd
        )
        _sh.rmtree(wd, ignore_errors=True)
    build_dir = tempfile.mkdtemp(prefix="prof_idx_")
    shutil.rmtree(build_dir, ignore_errors=True)
    builder = IndexBuilder(spark, BuildConfig())
    t0 = time.time()
    builder.build(corpus, build_dir)
    wall = time.time() - t0
    print(f"\nBUILD {n_turns} turns in {wall:.1f}s = {n_turns/wall:.0f} turns/s\n")

    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4055/api/v1/applications/{app_id}/stages"
    stages = json.load(urllib.request.urlopen(url))
    stages.sort(key=lambda s: s["stageId"])
    total = 0.0
    print(
        f"{'id':>4} {'tasks':>6} {'wall_s':>8} {'run_core_s':>10} "
        f"{'cpu_core_s':>10} {'gc_s':>6}  name"
    )
    for s in stages:
        if s["status"] != "COMPLETE":
            continue
        run_s = s["executorRunTime"] / 1000.0
        cpu_s = s.get("executorCpuTime", 0) / 1e9
        gc_s = s.get("jvmGcTime", 0) / 1000.0
        sub = time.strptime(s["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        comp = time.strptime(s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        wall_s = time.mktime(comp) - time.mktime(sub)
        total += wall_s
        print(f"{s['stageId']:>4} {s['numCompleteTasks']:>6} {wall_s:>8.1f} "
              f"{run_s:>10.1f} {cpu_s:>10.1f} {gc_s:>6.1f}  {s['name'][:80]}")
    print(f"\nsum stage wall: {total:.1f}s (overlaps possible)")
    shutil.rmtree(build_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
