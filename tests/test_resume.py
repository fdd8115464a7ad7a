"""Kill/resume: a build killed between phases must resume from the manifest
and produce segments identical to an uninterrupted build (SURVEY.md §5.6).

The kill is simulated by making the postings merge raise after the docs
phase has committed — the same on-disk state a real mid-build executor or
driver death leaves behind (docs/_SUCCESS + partials/_SUCCESS present,
postings absent)."""

from __future__ import annotations

import os

import pytest

from probe_spark.fixtures import transcripts_df
from probe_spark.index import build as build_mod
from probe_spark.index.build import BuildConfig, IndexBuilder


def _segments(spark, idx):
    rows = spark.read.parquet(f"{idx}/postings").select(
        "kind", "term", "salt", "seg_seq", "df_seg",
        "min_doc", "max_doc", "seg_bytes", "seg_crc",
    ).collect()
    return {
        (r["kind"], r["term"], r["salt"], r["seg_seq"]): (
            r["df_seg"], r["min_doc"], r["max_doc"],
            r["seg_bytes"], r["seg_crc"],
        )
        for r in rows
    }


class TestFormatVersion:
    def test_version_mismatch_refused(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from probe_spark.search.engine import SearchEngine
        from probe_spark.search.local import LocalSearcher

        idx = str(tmp_path / "vidx")
        IndexBuilder(spark, BuildConfig(n_buckets=4)).build(
            transcripts_df(spark, 10, seed=3), idx
        )
        SearchEngine(spark, idx)  # current version opens fine
        f = glob.glob(f"{idx}/stats/*.parquet")[0]
        t = pq.read_table(f).to_pandas()
        t["format_version"] = 1
        pq.write_table(
            __import__("pyarrow").Table.from_pandas(t, preserve_index=False), f
        )
        with pytest.raises(ValueError, match="format_version"):
            SearchEngine(spark, idx)
        with pytest.raises(ValueError, match="format_version"):
            LocalSearcher(idx)


class TestKillResume:
    def test_kill_after_docs_then_resume_identical(
        self, spark, tmp_path, monkeypatch
    ):
        corpus = transcripts_df(spark, n_convs=50, seed=11)
        cfg = BuildConfig(n_buckets=4)

        golden = str(tmp_path / "golden")
        IndexBuilder(spark, cfg).build(corpus, golden)

        # interrupted build: die inside the postings merge
        idx = str(tmp_path / "killed")

        def _boom(*a, **k):
            raise RuntimeError("simulated kill")

        monkeypatch.setattr(build_mod, "_merge_partials_fused", _boom)
        monkeypatch.setattr(build_mod, "_merge_partials", _boom)
        with pytest.raises(RuntimeError, match="simulated kill"):
            IndexBuilder(spark, cfg).build(corpus, idx)
        monkeypatch.undo()

        # the kill left the docs phase committed, postings absent
        assert os.path.exists(f"{idx}/docs/_SUCCESS")
        assert not os.path.exists(f"{idx}/postings/_SUCCESS")

        # resume: only the missing phase runs, docs are not rebuilt
        docs_mtime = os.path.getmtime(f"{idx}/docs/_SUCCESS")
        out = IndexBuilder(spark, cfg).build(corpus, idx)
        assert "docs" not in out["phases_run"]
        assert "postings" in out["phases_run"]
        assert os.path.getmtime(f"{idx}/docs/_SUCCESS") == docs_mtime

        # resumed segments are identical to the uninterrupted build
        assert _segments(spark, idx) == _segments(spark, golden)

        # and a full no-op resume: everything already done
        again = IndexBuilder(spark, cfg).build(corpus, idx)
        assert again["phases_run"] == []

    def test_resumed_index_answers_queries_identically(
        self, spark, tmp_path, monkeypatch
    ):
        from probe_spark.search.engine import SearchEngine

        corpus = transcripts_df(spark, n_convs=50, seed=11)
        cfg = BuildConfig(n_buckets=4)
        golden = str(tmp_path / "g2")
        IndexBuilder(spark, cfg).build(corpus, golden)

        idx = str(tmp_path / "k2")
        monkeypatch.setattr(
            build_mod, "_merge_partials_fused",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("kill")),
        )
        with pytest.raises(RuntimeError):
            IndexBuilder(spark, cfg).build(corpus, idx)
        monkeypatch.undo()
        IndexBuilder(spark, cfg).build(corpus, idx)

        for q in ["error AND handling", "database -sqlite", '"whitelist"']:
            a = SearchEngine(spark, golden).search(
                q, k=10, with_metadata=False).collect()
            b = SearchEngine(spark, idx).search(
                q, k=10, with_metadata=False).collect()
            assert [(r["doc_id"], r["score"]) for r in a] == [
                (r["doc_id"], r["score"]) for r in b
            ], q
