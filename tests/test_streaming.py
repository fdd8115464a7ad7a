"""Structured Streaming ingest: micro-batch index growth, checkpoint
idempotency, and query-parity with a batch build of the same corpus."""

from __future__ import annotations

import os
import time

import pytest


def _write_batch(path: str, rows: list[dict], name: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {k: [r[k] for r in rows] for k in rows[0]}
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    pq.write_table(
        pa.Table.from_pydict(cols, schema=schema), os.path.join(path, name)
    )


class TestStreamingIngest:
    @pytest.fixture()
    def dirs(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        return {
            "src": str(src),
            "idx": str(tmp_path / "idx"),
            "ckpt": str(tmp_path / "ckpt"),
            "batch_idx": str(tmp_path / "batch_idx"),
        }

    def test_incremental_matches_batch(self, spark, dirs):
        from probe_spark.fixtures import transcripts_rows
        from probe_spark.index.build import BuildConfig, IndexBuilder
        from probe_spark.search.engine import SearchEngine
        from probe_spark.streaming.ingest import stream_index

        rows = transcripts_rows(60, 13)
        half = len(rows) // 2
        # two arrival waves, each internally ordered by (conv_id, turn_idx)
        _write_batch(dirs["src"], rows[:half], "wave0.parquet")

        cfg = BuildConfig(n_buckets=4)
        q = stream_index(spark, dirs["src"], dirs["idx"], dirs["ckpt"], cfg)
        try:
            q.processAllAvailable()
            _write_batch(dirs["src"], rows[half:], "wave1.parquet")
            q.processAllAvailable()
        finally:
            q.stop()

        # batch build over the SAME corpus in the same arrival order
        eng_s = SearchEngine(spark, dirs["idx"])
        assert eng_s.n_docs == len(rows)

        df = spark.createDataFrame(
            [tuple(r.values()) for r in rows],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp_ntz",
        )
        IndexBuilder(spark, cfg).build(df, dirs["batch_idx"])
        eng_b = SearchEngine(spark, dirs["batch_idx"])

        for query in ("error", "error AND handling", "login OR auth"):
            a = [
                (r["conv_id"], r["turn_idx"], round(r["score"], 9))
                for r in eng_s.search(query, k=10).collect()
            ]
            b = [
                (r["conv_id"], r["turn_idx"], round(r["score"], 9))
                for r in eng_b.search(query, k=10).collect()
            ]
            assert a == b, f"streamed vs batch mismatch for {query!r}"

    def test_batch_replay_is_idempotent(self, spark, dirs):
        from probe_spark.fixtures import transcripts_rows
        from probe_spark.index.build import BuildConfig
        from probe_spark.streaming.ingest import StreamingIndexer

        rows = transcripts_rows(10, 3)
        df = spark.createDataFrame(
            [tuple(r.values()) for r in rows],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp_ntz",
        )
        idxer = StreamingIndexer(spark, dirs["idx"], BuildConfig(n_buckets=4))
        idxer.process_batch(df, 0)
        n1 = spark.read.parquet(f"{dirs['idx']}/docs").count()
        idxer.process_batch(df, 0)  # replay after checkpoint recovery
        n2 = spark.read.parquet(f"{dirs['idx']}/docs").count()
        assert n1 == n2 == len(rows)

    def test_compact_preserves_results(self, spark, dirs):
        from probe_spark.fixtures import transcripts_rows
        from probe_spark.index.build import BuildConfig
        from probe_spark.search.engine import SearchEngine
        from probe_spark.streaming.ingest import StreamingIndexer

        rows = transcripts_rows(30, 9)
        third = len(rows) // 3
        mk = lambda rs: spark.createDataFrame(  # noqa: E731
            [tuple(r.values()) for r in rs],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp_ntz",
        )
        idxer = StreamingIndexer(spark, dirs["idx"], BuildConfig(n_buckets=4))
        idxer.process_batch(mk(rows[:third]), 0)
        idxer.process_batch(mk(rows[third : 2 * third]), 1)
        idxer.process_batch(mk(rows[2 * third :]), 2)
        eng = SearchEngine(spark, dirs["idx"])
        before = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.search("error", k=10, with_metadata=False).collect()
        ]
        n_seg_before = eng.postings.count()
        idxer.compact()
        eng.refresh()
        after = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.search("error", k=10, with_metadata=False).collect()
        ]
        assert after == before
        assert eng.postings.count() <= n_seg_before

    def test_refresh_sees_new_batches(self, spark, dirs):
        from probe_spark.fixtures import transcripts_rows
        from probe_spark.index.build import BuildConfig
        from probe_spark.search.engine import SearchEngine
        from probe_spark.streaming.ingest import StreamingIndexer

        rows = transcripts_rows(20, 4)
        half = len(rows) // 2
        mk = lambda rs: spark.createDataFrame(  # noqa: E731
            [tuple(r.values()) for r in rs],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp_ntz",
        )
        idxer = StreamingIndexer(spark, dirs["idx"], BuildConfig(n_buckets=4))
        idxer.process_batch(mk(rows[:half]), 0)
        eng = SearchEngine(spark, dirs["idx"])
        assert eng.n_docs == half
        idxer.process_batch(mk(rows[half:]), 1)
        assert eng.n_docs == half  # old snapshot until refresh
        eng.refresh()
        assert eng.n_docs == len(rows)
