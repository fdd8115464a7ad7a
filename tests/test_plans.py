"""Physical-plan regression tests: the scale properties PLANS.md documents
must survive refactors.  Each test asserts on the executed/optimized plan
string, not on timing — these are the properties that decide whether the
same code is viable at 100 TB:

  * postings fetch: bucket partition pruning + term filter PUSHED to the
    parquet scan (not evaluated after a full read)
  * top-k metadata join: k winners BROADCAST against docs (no shuffle of
    the corpus)
  * brute-force cosine: no Python eval node in the plan (codegen only) and
    TakeOrderedAndProject for the top-k (no global sort)
  * single-term pruned search: no shuffle exchange at all
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from probe_spark.fixtures import transcripts_df
    from probe_spark.index.build import BuildConfig, IndexBuilder
    from probe_spark.search.engine import SearchEngine

    path = str(tmp_path_factory.mktemp("plans") / "idx")
    IndexBuilder(spark, BuildConfig(n_buckets=4)).build(
        transcripts_df(spark, 60, 3), path
    )
    return SearchEngine(spark, path)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestScans:
    def test_postings_fetch_prunes_bucket_and_pushes_term(self, engine):
        fetched = engine._fetch(engine.postings, ["error"], "tok")
        plan = _plan(fetched)
        scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
        assert scan, plan
        line = scan[0]
        # bucket is a partition directory -> PartitionFilters non-empty
        assert "PartitionFilters: [" in line and "bucket" in line
        assert "PartitionFilters: []" not in line
        # the term predicate reaches the parquet reader
        assert "PushedFilters: [" in line and "term" in line.split(
            "PushedFilters:"
        )[1]

    def test_docs_metadata_scan_prunes_columns(self, engine):
        df = engine.docs.select("doc_id", "conv_id", "turn_idx")
        line = [ln for ln in _plan(df).splitlines() if "FileScan" in ln][0]
        rs = line.split("ReadSchema:")[1]
        assert "text" not in rs  # 3-column projection must not read text


class TestTopK:
    def test_metadata_join_broadcasts_winners(self, engine):
        res = engine.search("error AND handling", k=5, with_metadata=True)
        plan = _plan(res)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_single_term_pruned_path_has_no_exchange(self, engine):
        res = engine.search("error", k=5, with_metadata=False)
        plan = _plan(res)
        assert "TakeOrderedAndProject" in plan
        # scan -> decode -> top-k with no data shuffle (the only Exchange
        # allowed is the broadcast of the tiny keep-list)
        assert "Exchange hashpartitioning" not in plan
        assert "Exchange rangepartitioning" not in plan


class TestCodegenOnly:
    def test_brute_force_cosine_has_no_python_eval(self, spark):
        from probe_spark.ops import similarity

        rows = [(i, [float(i), 1.0]) for i in range(10)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        res = similarity.brute_force_topk(df, [1.0, 0.0], k=3)
        plan = _plan(res)
        assert "TakeOrderedAndProject" in plan
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert node not in plan
