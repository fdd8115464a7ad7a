"""Structured Streaming ingest: continuously index arriving transcripts.

The reference has NO streaming (SURVEY.md §2.10 — its only incremental
behavior is the session cache), so this is the Spark-native extension the
north star's "interrupted build resumes cleanly" points at: micro-batch
index growth with exactly-once bookkeeping.

Design (foreachBatch over a file/table stream):

  * each micro-batch is a DELTA BUILD: docIDs continue densely from the
    current index's n_docs (batch rows ordered by (conv_id, turn_idx)
    within the batch — global order is arrival order, the streaming analog
    of the batch build's stable ordering, documented);
  * the batch's docs rows APPEND to docs/, its postings pack into NEW
    segments appended under the same kind/bucket partitions — the query
    engine already unions arbitrarily many segments per term, so a
    streamed index is structurally identical to a salted batch index;
  * stats/ is rewritten per batch (n_docs, total_dl, avgdl) and a manifest
    lineage row (phase=stream_batch, partition_id=batch_id) records each
    commit; Structured Streaming's checkpoint gives at-least-once batch
    delivery and the manifest's batch_id row makes replayed batches
    detectable (skipped idempotently);
  * the SearchEngine sees new docs after ``refresh()`` (stats + df cache
    reload) — long-lived query services refresh per micro-batch epoch.

Scale note: per-batch work is the batch's own tokenize + pack (no global
shuffle over existing data); segment count grows with batches — periodic
compaction = re-running the batch merge over postings/ (same code path as
the level-0 partial merge; exposed as ``compact()``).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from probe_spark.index.build import (
    PARTIALS_SCHEMA,
    BuildConfig,
    IndexBuilder,
    _make_partial_builder,
    _merge_partials,
)


class StreamingIndexer:
    """foreachBatch sink that grows an index directory per micro-batch."""

    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        cfg: BuildConfig | None = None,
    ):
        import dataclasses

        self.spark = spark
        self.index_path = index_path
        # streaming deltas use the two-pass layout: docs/ must carry the
        # token arrays (compact() re-packs from them without re-tokenizing)
        # and segment appends go through the partitionBy writer
        self.cfg = dataclasses.replace(cfg or BuildConfig(), fused=False)
        self.builder = IndexBuilder(spark, self.cfg)

    # -- bookkeeping ---------------------------------------------------------
    def _stats(self):
        try:
            return self.spark.read.parquet(f"{self.index_path}/stats").collect()[0]
        except Exception:
            return None

    def _batch_seen(self, batch_id: int) -> bool:
        try:
            m = self.spark.read.parquet(f"{self.index_path}/manifest")
        except Exception:
            return False
        return (
            m.filter(
                (F.col("phase") == "stream_batch")
                & (F.col("partition_id") == int(batch_id))
            ).limit(1).count()
            > 0
        )

    def compact(self) -> None:
        """Rebuild postings/ from docs/ as one fresh merge: many small
        streamed segments per term collapse back into the batch layout.
        docs/ stores tokens/raws, so compaction never re-tokenizes — it is
        exactly the batch build's phase 2+3 re-run (same code path)."""
        self.builder._delete_dir(f"{self.index_path}/postings")
        self.builder._delete_dir(f"{self.index_path}/stats")
        self.builder.build(
            self.spark.createDataFrame(
                [],
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp_ntz",
            ),
            self.index_path,
            build_id="compact",
        )

    # -- the sink ------------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: delta-build this micro-batch into the index."""
        if self._batch_seen(batch_id):
            return  # replayed after checkpoint recovery — already committed
        spark = self.spark
        cfg = self.cfg
        stats = self._stats()
        base_id = int(stats["n_docs"]) if stats else 0
        total_dl = int(stats["total_dl"]) if stats else 0

        from probe_spark.index.build import _assign_and_tokenize

        n_parts = cfg.doc_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        docs, parted, n_new = _assign_and_tokenize(batch_df, n_parts)
        if n_new == 0:
            parted.unpersist()
            return
        docs = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(base_id)).cast("long")
        )
        docs.write.mode("append").parquet(f"{self.index_path}/docs")
        parted.unpersist()

        # delta postings: partial-pack ONLY this batch's docs, merge into
        # fresh segments appended under the same bucket layout
        batch_docs = (
            spark.read.parquet(f"{self.index_path}/docs")
            .filter(F.col("doc_id") >= base_id)
            .select("doc_id", "dl", "tokens", "raws")
        )
        partials_path = f"{self.index_path}/partials_b{batch_id}"
        (
            batch_docs.mapInArrow(
                _make_partial_builder(cfg.partial_flush_postings),
                PARTIALS_SCHEMA,
            )
            .write.mode("overwrite")
            .parquet(partials_path)
        )
        stats_row = (
            spark.read.parquet(partials_path)
            .filter(F.col("kind") == "@stats")
            .agg(
                F.sum("df_part").alias("n"), F.sum("min_doc").alias("dl")
            )
            .collect()[0]
        )
        batch_dl = int(stats_row["dl"] or 0)
        _merge_partials(
            spark,
            partials_path,
            base_id + n_new,
            cfg,
            f"{self.index_path}/postings",
            append=True,
        )
        self.builder._delete_dir(partials_path)

        # stats rewrite + lineage row (the commit record for idempotency)
        n_docs = base_id + n_new
        new_total = total_dl + batch_dl
        import pandas as pd

        self.builder._write_stats_frame(
            pd.DataFrame(
                {
                    "n_docs": [n_docs],
                    "total_dl": [new_total],
                    "avgdl": [new_total / n_docs if n_docs else 0.0],
                    "n_buckets": [cfg.n_buckets],
                    "block_size": [cfg.block_size],
                    "build_id": [f"stream_b{batch_id}"],
                }
            ),
            self.index_path,
        )
        self.builder._write_manifest(
            self.index_path,
            [
                {
                    "build_id": f"stream_b{batch_id}",
                    "phase": "stream_batch",
                    "partition_id": int(batch_id),
                    "status": "done",
                    "n_terms": 0,
                    "n_postings": 0,
                    "bytes": 0,
                    "checksum": "",
                    "completed_at": time.time(),
                }
            ],
        )


def stream_index(
    spark: SparkSession,
    source_path: str,
    index_path: str,
    checkpoint_path: str,
    cfg: BuildConfig | None = None,
    schema: str = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz"
    ),
):
    """readStream(parquet dir) -> foreachBatch(StreamingIndexer) query.

    Returns the StreamingQuery; callers drive it with processAllAvailable()
    (tests) or awaitTermination() (production).
    """
    indexer = StreamingIndexer(spark, index_path, cfg)
    stream = (
        spark.readStream.schema(schema).parquet(source_path)
    )
    return (
        stream.writeStream.foreachBatch(indexer.process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime="1 second")
        .start()
    )
