"""Cross-parallelism determinism (SURVEY.md §5.5, mirroring the reference's
search_determinism_tests.rs): the same corpus built and queried at a
different master / shuffle-partition count must produce identical top-k
(docIDs AND scores).

The second parallelism level runs in a subprocess (one JVM cannot host two
masters); it builds its own index at local[2] with 2 shuffle partitions and
prints (doc_id, score) per query, compared against the session's local[4] /
8-partition build.  This pins the per-row invariants that make the engine
deterministic at any cluster size: stable docID assignment (rank over
(conv_id, turn_idx) — partition-count-free), sorted postings, and
deterministic tie-breaks."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from probe_spark.fixtures import transcripts_df, write_transcripts_parquet
from probe_spark.index.build import BuildConfig, IndexBuilder
from probe_spark.search.engine import SearchEngine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "error AND handling",
    "database -sqlite",
    "+timeout worker",
    '"whitelist" OR handler',
]

_CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.adaptive.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from probe_spark.index.build import BuildConfig, IndexBuilder
from probe_spark.search.engine import SearchEngine
corpus = spark.read.parquet(%(corpus)r)
IndexBuilder(spark, BuildConfig(n_buckets=4)).build(corpus, %(idx)r)
eng = SearchEngine(spark, %(idx)r)
out = {}
for q in %(queries)r:
    rows = eng.search(q, k=10, with_metadata=False).collect()
    out[q] = [[r["doc_id"], r["score"]] for r in rows]
print("RESULT:" + json.dumps(out))
"""


def test_topk_identical_across_parallelism(spark, tmp_path):
    corpus_path = str(tmp_path / "corpus.parquet")
    write_transcripts_parquet(corpus_path, n_convs=50, seed=23)

    # level 1: the session (local[4], 8 shuffle partitions)
    idx_a = str(tmp_path / "idx_a")
    IndexBuilder(spark, BuildConfig(n_buckets=4)).build(
        spark.read.parquet(corpus_path), idx_a
    )
    eng = SearchEngine(spark, idx_a)
    mine = {
        q: [
            [r["doc_id"], r["score"]]
            for r in eng.search(q, k=10, with_metadata=False).collect()
        ]
        for q in QUERIES
    }

    # level 2: subprocess at local[2], 2 shuffle partitions
    idx_b = str(tmp_path / "idx_b")
    script = _CHILD % {
        "repo": REPO, "corpus": corpus_path, "idx": idx_b, "queries": QUERIES,
    }
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [x for x in proc.stdout.splitlines() if x.startswith("RESULT:")][-1]
    theirs = json.loads(line[len("RESULT:"):])

    assert mine == theirs
