"""Distributed inverted-index build over transcript tables.

Two layouts, selected by ``BuildConfig.fused`` (default True on
posix-visible index paths; streaming deltas and remote object stores use
the two-pass layout):

FUSED SINGLE-PASS PIPELINE (the scale path)

  1. deterministic dense docID assignment over stable (conv_id, turn_idx)
     ordering — never a single-partition window and never
     monotonically_increasing_id (SURVEY.md §4 item 7).  Range boundaries
     come from a deterministic hash sample over a pruned (conv_id,
     turn_idx) scan, exact per-bucket counts from a second pruned scan, and
     rows route to partition == bucket via precomputed murmur3
     representatives — so partition offsets are known BEFORE the build
     pass, the full-row corpus is shuffled exactly once, and nothing is
     persisted (the old repartitionByRange + persist + count design burned
     ~100 GC-core-seconds caching the corpus at 32 cores).
  2. THE pass (one mapInArrow over the range partitioning):
       * tokenize each turn (probe-parity tokenizer, §2.3) — the ONE
         tokenizer pass ever;
       * side-write this partition's docs/ shard with pyarrow's
         vectorized parquet writer (doc_id, conv_id, turn_idx, role,
         tool, ts, text, dl — token arrays excluded unless store_tokens:
         they never touch parquet).  Spark's row-based parquet writer was
         measured at ~40 JVM core-seconds per million turns at 32
         threads; the arrow writer removes that entirely;
       * map-side combine postings into level-0 partials — (kind, term)
         -> delta+varint-packed docID/dl arrays, fully vectorized (Arrow
         list flatten + dictionary_encode + np.repeat/argsort, no
         per-token Python), flushed at partial_flush_postings — and
         side-write them BUCKET-PARTITIONED (partials/bg=N/part-P.parquet,
         bucket = pmod(xxhash64(term), n_buckets));
       * the Spark output is ONE @stats metadata row per partition; the
         driver folds n_docs/total_dl/avgdl out of the collected rows, so
         there is no stats job.
     All side writes are atomic (dot-tmp + rename; retries overwrite).
  3. SHUFFLE-FREE merge: the driver plans one task per (bucket,
     doc-range group) from partial-shard file sizes — greedy grouping
     under merge_group_bytes bounds task memory AND spreads hot buckets
     over tasks (the north rule's doc-range salting, by construction;
     salt = group index).  Each task reads its group's shard files
     directly with pyarrow, concatenates + sorts each (kind, term)'s
     chunks, emits final segments hard-capped at max_postings_per_segment
     with block-max metadata (block_last_doc/block_min_dl + per-block
     byte offsets for WAND), side-written into postings/kind=/bucket=/
     dirs.  The packed postings move exactly once, file -> file; Spark
     carries only the plan in and per-segment metadata out (which also
     yields the manifest without re-reading the index).
  4. manifest lineage rows per phase + per bucket (build_id, counts,
     bytes, checksum, completed_at); finished phases are skipped on
     resume (docs+partials commit together; partials/ is the merge's
     resume point and is deleted after it).

TWO-PASS PIPELINE (fused=False — streaming deltas, non-posix stores):
docs/ parquet carries tokens/raws; a second mapInArrow pass builds
partials; the merge shuffles partials on (kind, term, salt) with
df-threshold hot-term salting and writes via partitionBy.  StreamingIndexer
appends micro-batch deltas through this path and compact() re-packs from
the stored token arrays.

Scale notes (10^12 turns): no DataFrame caching of bulk data — the only
full-corpus shuffle is the docID range partition; postings are packed to
~2 bytes/posting BEFORE leaving the tokenize task and are never shuffled;
per-merge-task memory is bounded by merge_group_bytes regardless of term
skew ("the" at 10^12 docs becomes many independent doc-range groups);
bucket count, partition counts, and group bytes scale via BuildConfig.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from probe_spark.runtime import ensure_package_on_executors, warm_python_workers

# bump when the on-disk layout changes incompatibly (resume across versions
# must start a fresh directory).  v6: raw index additionally stores
# repair-affecting words (tokenize(w,{w}) != tokenize(w)) — v5 indexes
# silently skip special-term repair for those words.
FORMAT_VERSION = 6

POSTINGS_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("term", StringType(), False),
        StructField("salt", IntegerType(), False),
        # chunk sequence within (kind, term, salt): the merge hard-caps
        # segment size, so one salt group may emit several segments;
        # (term, salt, seg_seq) uniquely addresses a segment
        StructField("seg_seq", IntegerType(), False),
        StructField("n_salts", IntegerType(), False),
        StructField("df_seg", LongType(), False),
        StructField("min_doc", LongType(), False),
        StructField("max_doc", LongType(), False),
        StructField("docs_bin", BinaryType(), False),
        StructField("dl_bin", BinaryType(), False),
        StructField("block_last_doc", ArrayType(LongType(), False), False),
        StructField("block_min_dl", ArrayType(IntegerType(), False), False),
        # byte start offsets per block into docs_bin / dl_bin (block-max
        # WAND decodes only surviving blocks)
        StructField("block_doc_off", ArrayType(LongType(), False), False),
        StructField("block_dl_off", ArrayType(LongType(), False), False),
        StructField("bucket", IntegerType(), False),
        # lineage metadata, computed at pack time so the manifest phase
        # aggregates pruned scalar columns instead of re-reading binaries
        StructField("seg_bytes", LongType(), False),
        StructField("seg_crc", LongType(), False),
    ]
)

_SEGMENT_ARROW_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string(), False),
        pa.field("term", pa.string(), False),
        pa.field("salt", pa.int32(), False),
        pa.field("seg_seq", pa.int32(), False),
        pa.field("n_salts", pa.int32(), False),
        pa.field("df_seg", pa.int64(), False),
        pa.field("min_doc", pa.int64(), False),
        pa.field("max_doc", pa.int64(), False),
        pa.field("docs_bin", pa.binary(), False),
        pa.field("dl_bin", pa.binary(), False),
        pa.field("block_last_doc", pa.list_(pa.int64()), False),
        pa.field("block_min_dl", pa.list_(pa.int32()), False),
        pa.field("block_doc_off", pa.list_(pa.int64()), False),
        pa.field("block_dl_off", pa.list_(pa.int64()), False),
        pa.field("bucket", pa.int32(), False),
        pa.field("seg_bytes", pa.int64(), False),
        pa.field("seg_crc", pa.int64(), False),
    ]
)

PARTIALS_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("term", StringType(), False),
        StructField("df_part", LongType(), False),
        StructField("min_doc", LongType(), False),
        StructField("max_doc", LongType(), False),
        StructField("docs_bin", BinaryType(), False),
        StructField("dl_bin", BinaryType(), False),
    ]
)

_PARTIALS_ARROW_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string(), False),
        pa.field("term", pa.string(), False),
        pa.field("df_part", pa.int64(), False),
        pa.field("min_doc", pa.int64(), False),
        pa.field("max_doc", pa.int64(), False),
        pa.field("docs_bin", pa.binary(), False),
        pa.field("dl_bin", pa.binary(), False),
    ]
)


@contextlib.contextmanager
def _timed(label: str):
    """Per-phase wall timing to stderr when PROBE_SPARK_TIMING=1."""
    if os.environ.get("PROBE_SPARK_TIMING") != "1":
        yield
        return
    t0 = time.time()
    yield
    print(f"[timing] {label}: {time.time() - t0:.2f}s", file=sys.stderr, flush=True)


@dataclass
class BuildConfig:
    n_buckets: int = 32  # parquet partition dirs for term-hash pruning
    max_postings_per_segment: int = 1 << 17  # hard cap per final segment
    block_size: int = 128  # block-max granularity
    doc_partitions: int | None = None  # defaults to defaultParallelism
    # level-0 flush threshold: bounds the partial builder's in-memory
    # accumulator (postings held per task before a flush)
    partial_flush_postings: int = 1 << 22
    # fused=True (default): single-pass build — the tokenize pass side-writes
    # the level-0 partials per task (posix-visible index paths only; remote
    # object stores fall back to the two-pass path), and the merge side-
    # writes final segments straight into kind=/bucket=/ dirs, so the token
    # arrays never hit parquet and two full jobs + one shuffle disappear
    fused: bool = True
    # keep tokens/raws columns in docs/ (fused path only; the two-pass path
    # always stores them — its partials pass re-reads them, and the
    # streaming delta/compact path requires them)
    store_tokens: bool = False
    # shuffle-free merge: target input bytes per merge task (one task per
    # (bucket, doc-range group)); bounds task memory AND spreads hot
    # buckets across tasks — the doc-range salting, by construction
    merge_group_bytes: int = 48 << 20


def _make_docs_builder(offsets: dict[int, int]):
    """mapInArrow generator over range-partitioned, partition-sorted
    transcripts: assigns doc_id = partition_offset + local_row_index (dense,
    globally ordered by (conv_id, turn_idx) because range partition index
    order IS range order) and runs the ONE tokenizer pass.

    This replaces a window over a _pid-keyed hash shuffle: hashing ~n_parts
    distinct _pid values into n_parts buckets collides badly (measured: a
    third of partitions empty, stragglers 100x the median task), whereas
    this pass keeps the range partitioning it already has — no shuffle, no
    skew, and doc_id assignment + tokenization share one Python hop.
    """

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        from probe_spark.functions.tokenizer import raw_special_words, tokenize

        pid = TaskContext.get().partitionId()
        next_id = offsets.get(pid, 0)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            texts = batch.column("text").to_pylist()
            tokens = [tokenize(t) if t else [] for t in texts]
            raws = [raw_special_words(t) if t else [] for t in texts]
            arrays = [
                pa.array(range(next_id, next_id + n), pa.int64()),
                batch.column("conv_id"),
                batch.column("turn_idx"),
                batch.column("role"),
                batch.column("tool"),
                batch.column("ts"),
                batch.column("text"),
                pa.array([len(ts) for ts in tokens], pa.int32()),
                pa.array(tokens, pa.list_(pa.string())),
                pa.array(raws, pa.list_(pa.string())),
            ]
            next_id += n
            yield pa.RecordBatch.from_arrays(
                arrays,
                names=[
                    "doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
                    "text", "dl", "tokens", "raws",
                ],
            )

    return gen


def _murmur3_int(x: int, seed: int = 42) -> int:
    """Spark's Murmur3Hash of one IntegerType column (Murmur3 x86_32
    hashInt, public algorithm) — used to precompute routing representatives
    driver-side so ``repartition(n, col)`` places bucket b in partition b
    exactly (plain hash routing of ~n distinct values into n partitions
    collides badly: measured a third of partitions empty)."""
    M = 0xFFFFFFFF
    k1 = (x * 0xCC9E2D51) & M
    k1 = ((k1 << 15) | (k1 >> 17)) & M
    k1 = (k1 * 0x1B873593) & M
    h1 = seed ^ k1
    h1 = ((h1 << 13) | (h1 >> 19)) & M
    h1 = (h1 * 5 + 0xE6546B64) & M
    h1 ^= 4  # length in bytes
    h1 = (h1 ^ (h1 >> 16)) * 0x85EBCA6B & M
    h1 = (h1 ^ (h1 >> 13)) * 0xC2B2AE35 & M
    h1 ^= h1 >> 16
    # Spark interprets the result as a signed int32 and routes via
    # pmod(hash, n)
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _routing_reps(n_parts: int) -> list[int]:
    """reps[b] = smallest non-negative int32 x with pmod(murmur3(x), n) == b:
    remapping bucket b -> reps[b] makes hash repartitioning an exact
    identity routing (partition index == bucket index)."""
    reps: list[int | None] = [None] * n_parts
    found = 0
    x = 0
    while found < n_parts:
        b = _murmur3_int(x) % n_parts
        if reps[b] is None:
            reps[b] = x
            found += 1
        x += 1
    return reps  # type: ignore[return-value]


def _bucket_expr(boundaries: list[tuple[str, int]]):
    """Balanced binary-search ``when`` tree assigning each row its range
    bucket = #boundaries <= (conv_id, turn_idx) under lexicographic order.
    Pure Column expressions (whole-stage codegen; no Python in the
    full-corpus path).  NULL keys compare null -> otherwise-branch ->
    bucket 0, matching range partitioning's nulls-first placement.

    Expression size is O(len(boundaries)): fine for the few thousand
    partitions local mode uses.  A 10^12-turn cluster build (10^5+
    partitions) swaps this for a vectorized np.searchsorted pandas UDF over
    the same boundaries — semantics identical, documented scale path."""

    def tree(lo: int, hi: int):
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        c, t = boundaries[mid]
        ge = (F.col("conv_id") > F.lit(c)) | (
            (F.col("conv_id") == F.lit(c)) & (F.col("turn_idx") >= F.lit(t))
        )
        return F.when(ge, tree(mid + 1, hi)).otherwise(tree(lo, mid))

    return tree(0, len(boundaries))


def _plan_range_layout(
    df: DataFrame, n_parts: int, sample_per_part: int = 120
) -> tuple[DataFrame, dict[int, int], int]:
    """Deterministic dense-docID layout (SURVEY.md §4 item 7) with the
    full-row corpus touched EXACTLY ONCE:

      1. pruned count of (conv_id, turn_idx) (parquet: metadata-only);
      2. deterministic hash sample (pmod(xxhash64(key), K) == 0 — depends
         only on the data, never on partitioning or RNG) -> driver sorts
         the sample and picks n_parts-1 quantile boundaries;
      3. pruned exact per-bucket counts (2-column scan + map-side combined
         groupBy) -> partition offsets known BEFORE the build pass;
      4. route rows to partition == bucket via precomputed murmur3
         representatives + sortWithinPartitions(conv_id, turn_idx).

    Replaces repartitionByRange + persist + count-over-the-cache: no cache
    build (the old 48g-heap GC storm at high core counts), no second
    full-row materialization, and docIDs are deterministic for a given
    corpus regardless of input partitioning (hash sampling), which the
    sampled range exchange could not guarantee.  Returns
    (routed_df, offsets, n_rows)."""
    keys = df.select("conv_id", "turn_idx")
    n_rows = keys.count()
    if n_rows == 0 or n_parts <= 1:
        return (
            df.repartition(1).sortWithinPartitions("conv_id", "turn_idx"),
            {0: 0},
            n_rows,
        )
    target = sample_per_part * n_parts
    k = max(1, n_rows // target)
    sample = [
        (r["conv_id"], r["turn_idx"])
        for r in keys.filter(
            F.pmod(F.abs(F.xxhash64("conv_id", "turn_idx")), F.lit(k)) == 0
        ).collect()
        if r["conv_id"] is not None and r["turn_idx"] is not None
    ]
    sample.sort()
    if not sample:
        return (
            df.repartition(1).sortWithinPartitions("conv_id", "turn_idx"),
            {0: 0},
            n_rows,
        )
    boundaries: list[tuple[str, int]] = []
    for i in range(1, n_parts):
        b = sample[min(len(sample) - 1, i * len(sample) // n_parts)]
        if not boundaries or b > boundaries[-1]:
            boundaries.append(b)
    bucket = _bucket_expr(boundaries)
    counts = {
        r["_b"]: r["cnt"]
        for r in keys.groupBy(bucket.alias("_b"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in range(len(boundaries) + 1):
        offsets[b] = acc
        acc += counts.get(b, 0)
    reps = _routing_reps(len(boundaries) + 1)
    routed = (
        df.repartition(
            len(boundaries) + 1,
            F.element_at(
                F.array(*[F.lit(r) for r in reps]), bucket + F.lit(1)
            ),
        )
        .sortWithinPartitions("conv_id", "turn_idx")
    )
    return routed, offsets, acc


def _docs_schema(ts_type, store_tokens: bool) -> StructType:
    fields = [
        StructField("doc_id", LongType(), False),
        StructField("conv_id", StringType(), True),
        StructField("turn_idx", IntegerType(), True),
        StructField("role", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", ts_type, True),
        StructField("text", StringType(), True),
        StructField("dl", IntegerType(), False),
    ]
    if store_tokens:
        fields += [
            StructField("tokens", ArrayType(StringType(), True), False),
            StructField("raws", ArrayType(StringType(), True), False),
        ]
    return StructType(fields)


def _canonical_input(parted: DataFrame) -> DataFrame:
    """Canonicalize input types (input_hint: turn_idx int32) — callers may
    hand in a long turn_idx (row-inferred DataFrames); the arrow pass-
    through must match the declared output schema exactly."""
    return parted.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("role").cast("string").alias("role"),
        F.col("tool").cast("string").alias("tool"),
        F.col("ts"),
        F.col("text").cast("string").alias("text"),
    )


def _assign_and_tokenize(df: DataFrame, n_parts: int) -> tuple[DataFrame, int]:
    """Dense docID over stable (conv_id, turn_idx) ordering + the single
    tokenizer pass, as one routed shuffle and one mapInArrow (two-pass
    layout: tokens/raws ride the docs parquet for the separate partials
    pass — the streaming delta path).  Returns (docs_df, n_docs)."""
    routed, offsets, acc = _plan_range_layout(df, n_parts)
    ts_type = dict(zip(df.schema.names, df.schema.fields))["ts"].dataType
    docs = _canonical_input(routed).mapInArrow(
        _make_docs_builder(offsets), _docs_schema(ts_type, store_tokens=True)
    )
    return docs, acc


# ---------------------------------------------------------------------------
# partials: map-side combine (docs partitions -> level-0 packed segments)
# ---------------------------------------------------------------------------


class _PartialAcc:
    """Map-side-combine core shared by the two-pass partials builder and the
    fused single-pass builder: accumulates (term-code, doc, dl) triples and
    flushes delta+varint-packed PARTIALS_SCHEMA batches to ``sink``.

    Allocation-light by design: per batch it appends THREE large contiguous
    numpy arrays (global term codes via an interning dict over the batch's
    DISTINCT terms only, repeated doc ids, repeated dls) — no per-term
    slicing, no dict-of-small-arrays.  All grouping work happens once per
    FLUSH: one stable argsort by code, one vectorized varint encode of the
    whole flush with per-value byte offsets, then per-term byte slicing.
    The original per-batch dict-of-slices design thrashed caches badly
    under 32-way worker concurrency (measured 44x per-task inflation at 32
    concurrent workers vs 8 on the same input; this layout removes ~100x
    of the small-object allocations)."""

    def __init__(self, flush_postings: int, sink):
        self.flush_postings = flush_postings
        self.sink = sink  # callable(pa.RecordBatch)
        self.term_ids: dict[tuple[str, str], int] = {}
        self.terms: list[tuple[str, str]] = []
        self.code_chunks: list = []
        self.id_chunks: list = []
        self.dl_chunks: list = []
        self.pending = 0
        self.n_docs = 0
        self.total_dl = 0

    def add(self, ids, dls, kind_cols) -> None:
        """ids/dls: numpy arrays (ids ascending — batches stream in docID
        order within a task, which _flush relies on for per-term
        sortedness); kind_cols: [(kind, arrow list<string>)]."""
        import numpy as np
        import pyarrow.compute as pc

        self.n_docs += int(len(ids))
        self.total_dl += int(dls.sum())
        for kind, arr in kind_cols:
            lens = (
                pc.fill_null(pc.list_value_length(arr), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            if lens.sum() == 0:
                continue
            de = arr.flatten().dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = de.dictionary.to_pylist()
            term_ids = self.term_ids
            terms = self.terms
            gmap = np.empty(len(vocab), dtype=np.int64)
            for i, t in enumerate(vocab):
                key = (kind, t)
                gid = term_ids.get(key)
                if gid is None:
                    gid = len(terms)
                    term_ids[key] = gid
                    terms.append(key)
                gmap[i] = gid
            self.code_chunks.append(gmap[codes])
            self.id_chunks.append(np.repeat(ids, lens))
            self.dl_chunks.append(np.repeat(dls, lens))
            self.pending += int(len(codes))
        if self.pending >= self.flush_postings:
            self.sink(self._flush())

    def _flush(self) -> pa.RecordBatch:
        import numpy as np

        from probe_spark.index.codec import _varint_encode_offsets

        codes = np.concatenate(self.code_chunks)
        ids = np.concatenate(self.id_chunks)
        dls = np.concatenate(self.dl_chunks)
        self.code_chunks, self.id_chunks, self.dl_chunks = [], [], []
        self.pending = 0
        # stable sort by term code: within a term, arrival order is
        # normally ascending doc order (see add), so runs come out sorted.
        # Guard: a parquet read split can concatenate files out of doc
        # order (two-pass layout) — detect and fall back to a full lexsort.
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        si = ids[order]
        run_break = np.empty(len(sc), dtype=bool)
        run_break[0] = True
        np.not_equal(sc[1:], sc[:-1], out=run_break[1:])
        if len(si) > 1 and bool(
            np.any((np.diff(si) <= 0) & ~run_break[1:])
        ):
            order = np.lexsort((ids, codes))
            sc = codes[order]
            si = ids[order]
        codes = sc
        ids = si
        dls = dls[order]
        bounds = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(codes)]))
        # delta within each term run; the run's first gap = absolute id
        gaps = np.empty(len(ids), dtype=np.uint64)
        if len(ids) > 1:
            np.subtract(ids[1:], ids[:-1], out=gaps[1:], casting="unsafe")
        gaps[starts] = ids[starts]
        docs_bin, doc_offs = _varint_encode_offsets(gaps)
        dl_bin, dl_offs = _varint_encode_offsets(dls.astype(np.uint64))
        terms = self.terms
        kind_col: list[str] = []
        term_col: list[str] = []
        docs_col: list[bytes] = []
        dl_col: list[bytes] = []
        for s, e in zip(starts, ends):
            kind, term = terms[codes[s]]
            kind_col.append(kind)
            term_col.append(term)
            docs_col.append(docs_bin[doc_offs[s] : doc_offs[e]])
            dl_col.append(dl_bin[dl_offs[s] : dl_offs[e]])
        return pa.RecordBatch.from_arrays(
            [
                pa.array(kind_col, pa.string()),
                pa.array(term_col, pa.string()),
                pa.array(ends - starts, pa.int64()),
                pa.array(ids[starts], pa.int64()),
                pa.array(ids[ends - 1], pa.int64()),
                pa.array(docs_col, pa.binary()),
                pa.array(dl_col, pa.binary()),
            ],
            schema=_PARTIALS_ARROW_SCHEMA,
        )

    def finish(self) -> None:
        """Flush the tail, then emit the per-partition corpus stats row
        (kind=@stats, df_part=n_docs, min_doc=total_dl): the stats phase
        aggregates partials METADATA instead of re-scanning docs dl."""
        if self.code_chunks:
            self.sink(self._flush())
        self.sink(
            pa.RecordBatch.from_arrays(
                [
                    pa.array(["@stats"], pa.string()),
                    pa.array([""], pa.string()),
                    pa.array([self.n_docs], pa.int64()),
                    pa.array([self.total_dl], pa.int64()),
                    pa.array([0], pa.int64()),
                    pa.array([b""], pa.binary()),
                    pa.array([b""], pa.binary()),
                ],
                schema=_PARTIALS_ARROW_SCHEMA,
            )
        )


def _make_partial_builder(flush_postings: int):
    """mapInArrow generator: (doc_id, dl, tokens, raws) batches ->
    PARTIALS_SCHEMA rows (two-pass layout; the streaming delta path)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        out: list[pa.RecordBatch] = []
        acc = _PartialAcc(flush_postings, out.append)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            acc.add(
                batch.column("doc_id").to_numpy(zero_copy_only=False),
                batch.column("dl").to_numpy(zero_copy_only=False),
                [("tok", batch.column("tokens")), ("raw", batch.column("raws"))],
            )
            while out:
                yield out.pop(0)
        acc.finish()
        yield from out

    return gen


class _ShardWriter:
    """Task-side atomic parquet shard writer: writes to a dot-prefixed tmp
    file (dot-files are invisible to Spark's parquet reader if leaked) and
    renames on close, so a retried task's last successful attempt wins."""

    def __init__(self, dir_path: str, name: str, schema: pa.Schema):
        import pyarrow.parquet as pq

        os.makedirs(dir_path, exist_ok=True)
        self.final = os.path.join(dir_path, name)
        self.tmp = os.path.join(dir_path, f".{name}.tmp{os.getpid()}")
        self.writer = pq.ParquetWriter(self.tmp, schema)

    def write(self, batch: pa.RecordBatch) -> None:
        self.writer.write_table(pa.Table.from_batches([batch]))

    def write_table(self, table: pa.Table) -> None:
        self.writer.write_table(table)

    def close(self) -> None:
        self.writer.close()
        os.replace(self.tmp, self.final)


def _strip_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path


def _is_posix_path(path: str) -> bool:
    return "://" not in path or path.startswith("file://")


class _BucketShardSink:
    """Routes PARTIALS batches into per-bucket shard files
    (partials/bg=N/part-{pid}.parquet): the merge then reads each bucket's
    files directly — no shuffle ever touches the packed postings.  @stats
    rows land under bg=-1.  Rows are grouped by bucket within
    each flush."""

    def __init__(self, base_dir: str, pid: int, n_buckets: int):
        self.base = _strip_scheme(base_dir)
        self.pid = pid
        self.n_buckets = n_buckets
        self.writers: dict[int, _ShardWriter] = {}
        self._bucket_cache: dict[str, int] = {}

    def _writer(self, bg: int) -> _ShardWriter:
        w = self.writers.get(bg)
        if w is None:
            w = _ShardWriter(
                os.path.join(self.base, f"bg={bg}"),
                f"part-{self.pid:05d}.parquet",
                _PARTIALS_ARROW_SCHEMA,
            )
            self.writers[bg] = w
        return w

    def write(self, batch: pa.RecordBatch) -> None:
        import numpy as np

        from probe_spark.index.xxhash import spark_bucket

        kinds = batch.column("kind").to_pylist()
        terms = batch.column("term").to_pylist()
        cache = self._bucket_cache
        buckets = np.empty(len(terms), dtype=np.int64)
        for i, (kind, term) in enumerate(zip(kinds, terms)):
            if kind == "@stats":
                buckets[i] = -1
                continue
            b = cache.get(term)
            if b is None:
                b = spark_bucket(term, self.n_buckets)
                cache[term] = b
            buckets[i] = b
        order = np.argsort(buckets, kind="stable")
        sorted_batch = batch.take(pa.array(order))
        sb = buckets[order]
        bounds = np.flatnonzero(np.diff(sb)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sb)]))
        for s, e in zip(starts, ends):
            self._writer(int(sb[s])).write(sorted_batch.slice(s, e - s))

    def close(self) -> None:
        for w in self.writers.values():
            w.close()


def _make_fused_builder(
    offsets: dict[int, int],
    docs_dir: str,
    partials_dir: str,
    flush_postings: int,
    store_tokens: bool,
    n_buckets: int,
):
    """The single-pass builder: assigns dense docIDs, tokenizes, feeds the
    map-side combiner, and side-writes BOTH this task's docs shard and its
    level-0 partials shard with pyarrow's vectorized parquet writer.  The
    Spark output is a single @stats metadata row per partition — the JVM
    never row-converts or parquet-writes the bulk data (measured: Spark's
    row-based ParquetWriteSupport on the docs write burned ~40 JVM
    core-seconds per million turns and was the 32-core bottleneck), and the
    stats job disappears (the driver folds the collected @stats rows).
    One pass over the corpus; the token arrays never touch parquet."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np
        from pyspark import TaskContext

        from probe_spark.functions.tokenizer import raw_special_words, tokenize

        trace = os.environ.get("PROBE_SPARK_TASK_TRACE")
        tt = {"feed": 0.0, "tok": 0.0, "acc": 0.0, "docs": 0.0, "rows": 0}
        t_start = time.time()

        pid = TaskContext.get().partitionId()
        next_id = offsets.get(pid, 0)
        sink = _BucketShardSink(partials_dir, pid, n_buckets)
        acc = _PartialAcc(flush_postings, sink.write)
        docs_shard: _ShardWriter | None = None  # schema from first batch
        docs_buf: list[pa.RecordBatch] = []
        docs_buf_rows = 0

        def flush_docs() -> None:
            nonlocal docs_buf, docs_buf_rows
            if docs_buf:
                docs_shard.write_table(pa.Table.from_batches(docs_buf))
                docs_buf = []
                docs_buf_rows = 0

        it = iter(batches)
        while True:
            t0 = time.time()
            batch = next(it, None)
            tt["feed"] += time.time() - t0
            if batch is None:
                break
            n = batch.num_rows
            if n == 0:
                continue
            tt["rows"] += n
            t0 = time.time()
            texts = batch.column("text").to_pylist()
            tokens = [tokenize(t) if t else [] for t in texts]
            raws = [raw_special_words(t) if t else [] for t in texts]
            ids = np.arange(next_id, next_id + n, dtype=np.int64)
            dls = np.array([len(ts) for ts in tokens], dtype=np.int64)
            tok_arr = pa.array(tokens, pa.list_(pa.string()))
            raw_arr = pa.array(raws, pa.list_(pa.string()))
            tt["tok"] += time.time() - t0
            t0 = time.time()
            acc.add(ids, dls, [("tok", tok_arr), ("raw", raw_arr)])
            tt["acc"] += time.time() - t0
            t0 = time.time()
            arrays = [
                pa.array(ids),
                batch.column("conv_id"),
                batch.column("turn_idx"),
                batch.column("role"),
                batch.column("tool"),
                batch.column("ts"),
                batch.column("text"),
                pa.array(dls.astype(np.int32)),
            ]
            names = [
                "doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
                "text", "dl",
            ]
            if store_tokens:
                arrays += [tok_arr, raw_arr]
                names += ["tokens", "raws"]
            next_id += n
            docs_batch = pa.RecordBatch.from_arrays(arrays, names=names)
            if docs_shard is None:
                docs_shard = _ShardWriter(
                    _strip_scheme(docs_dir),
                    f"part-{pid:05d}.parquet",
                    docs_batch.schema,
                )
            docs_buf.append(docs_batch)
            docs_buf_rows += n
            if docs_buf_rows >= 1 << 17:  # ~128k rows per row group
                flush_docs()
            tt["docs"] += time.time() - t0
        t0 = time.time()
        acc.finish()
        sink.close()
        if docs_shard is not None:
            flush_docs()
            docs_shard.close()
        tt["docs"] += time.time() - t0
        if trace:
            with open(trace, "a") as f:
                f.write(
                    f"pid={pid} wall={time.time() - t_start:.2f} "
                    + " ".join(
                        f"{k}={v:.2f}" if k != "rows" else f"rows={v}"
                        for k, v in tt.items()
                    )
                    + "\n"
                )
        # the Spark output: this partition's stats row (pid rides max_doc)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(["@stats"], pa.string()),
                pa.array([""], pa.string()),
                pa.array([acc.n_docs], pa.int64()),
                pa.array([acc.total_dl], pa.int64()),
                pa.array([pid], pa.int64()),
                pa.array([b""], pa.binary()),
                pa.array([b""], pa.binary()),
            ],
            schema=_PARTIALS_ARROW_SCHEMA,
        )

    return gen


# ---------------------------------------------------------------------------
# merge: level-0 partials -> final segments (streamed, memory-bounded)
# ---------------------------------------------------------------------------


def _make_partial_merger(block_size: int, max_seg: int, n_buckets: int):
    """mapInArrow generator over partials sorted by (kind, term, salt,
    min_doc) within the partition: decodes each group's partial chunks,
    concatenates + sorts, and emits final segments hard-capped at
    ``max_seg`` postings.  Carries the open tail group across batches so
    memory is bounded by one salt group, never an aggregation buffer."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import zlib

        import numpy as np

        from probe_spark.index.codec import encode_postings, varint_decode
        from probe_spark.index.xxhash import spark_bucket

        out: dict[str, list] = {f.name: [] for f in _SEGMENT_ARROW_SCHEMA}

        def emit(key, n_salt, idc, dlc):
            kind, term, salt = key
            ids = np.concatenate(idc)
            dls = np.concatenate(dlc)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            dls = dls[order]
            bucket = spark_bucket(term, n_buckets)
            for seg_seq, s in enumerate(range(0, len(ids), max_seg)):
                d = ids[s : s + max_seg]
                l = dls[s : s + max_seg]
                (
                    docs_bin, dl_bin, block_last, block_min_dl,
                    block_doc_off, block_dl_off,
                ) = encode_postings(d, l, block=block_size)
                out["kind"].append(kind)
                out["term"].append(term)
                out["salt"].append(salt)
                out["seg_seq"].append(seg_seq)
                out["n_salts"].append(n_salt)
                out["df_seg"].append(len(d))
                out["min_doc"].append(int(d[0]))
                out["max_doc"].append(int(d[-1]))
                out["docs_bin"].append(docs_bin)
                out["dl_bin"].append(dl_bin)
                out["block_last_doc"].append(block_last.tolist())
                out["block_min_dl"].append(block_min_dl.tolist())
                out["block_doc_off"].append(block_doc_off.tolist())
                out["block_dl_off"].append(block_dl_off.tolist())
                out["bucket"].append(int(bucket))
                out["seg_bytes"].append(len(docs_bin) + len(dl_bin))
                out["seg_crc"].append(zlib.crc32(docs_bin))

        def flush() -> pa.RecordBatch:
            batch = pa.RecordBatch.from_arrays(
                [pa.array(out[f.name], f.type) for f in _SEGMENT_ARROW_SCHEMA],
                schema=_SEGMENT_ARROW_SCHEMA,
            )
            for k in out:
                out[k].clear()
            return batch

        carry: dict | None = None
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            kinds = batch.column("kind").to_pylist()
            terms = batch.column("term").to_pylist()
            salts = batch.column("salt").to_numpy(zero_copy_only=False)
            n_salts = batch.column("n_salts").to_numpy(zero_copy_only=False)
            docs_bins = batch.column("docs_bin").to_pylist()
            dl_bins = batch.column("dl_bin").to_pylist()
            for i in range(n):
                key = (kinds[i], terms[i], int(salts[i]))
                gaps = varint_decode(docs_bins[i])
                ids = np.cumsum(gaps.astype(np.int64))
                dls = varint_decode(dl_bins[i]).astype(np.int64)
                if carry is not None and carry["key"] != key:
                    emit(carry["key"], carry["n_salt"], carry["idc"], carry["dlc"])
                    carry = None
                if carry is None:
                    carry = {
                        "key": key,
                        "n_salt": int(n_salts[i]),
                        "idc": [],
                        "dlc": [],
                    }
                carry["idc"].append(ids)
                carry["dlc"].append(dls)
            if out["term"]:
                yield flush()
        if carry is not None:
            emit(carry["key"], carry["n_salt"], carry["idc"], carry["dlc"])
        if out["term"]:
            yield flush()

    return gen


def _merge_partials(
    spark: SparkSession,
    partials_path: str,
    n_docs: int,
    cfg: BuildConfig,
    out_path: str,
    append: bool = False,
) -> None:
    """Two-pass layout merge (streaming append path): salt hot terms by doc
    range, shuffle partials once, stream-merge into final segments, write
    partitioned by (kind, bucket)."""
    partials = spark.read.parquet(partials_path).filter(
        F.col("kind") != "@stats"
    )
    max_seg = cfg.max_postings_per_segment
    salted = _salted_partials(partials, n_docs, cfg)
    merged = (
        salted.repartition("kind", "term", "salt")
        .sortWithinPartitions("kind", "term", "salt", "min_doc")
        .mapInArrow(
            _make_partial_merger(cfg.block_size, max_seg, cfg.n_buckets),
            POSTINGS_SCHEMA,
        )
    )
    (
        merged.repartition("kind", "bucket")
        .sortWithinPartitions("term", "salt", "min_doc")
        .write.mode("append" if append else "overwrite")
        .partitionBy("kind", "bucket")
        .parquet(out_path)
    )


SEG_META_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("term", StringType(), False),
        StructField("df_seg", LongType(), False),
        StructField("seg_bytes", LongType(), False),
        StructField("seg_crc", LongType(), False),
    ]
)

_SEG_META_ARROW_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string(), False),
        pa.field("bucket", pa.int32(), False),
        pa.field("term", pa.string(), False),
        pa.field("df_seg", pa.int64(), False),
        pa.field("seg_bytes", pa.int64(), False),
        pa.field("seg_crc", pa.int64(), False),
    ]
)

# final segment files omit kind/bucket — the kind=/bucket=/ partition dirs
# carry them (identical to what Spark's partitionBy writer produces)
_SEG_FILE_SCHEMA = pa.schema(
    [f for f in _SEGMENT_ARROW_SCHEMA if f.name not in ("kind", "bucket")]
)


def _make_file_merger(block_size: int, max_seg: int, out_dir: str):
    """mapInArrow generator over MERGE-PLAN rows (bucket, salt, n_salts,
    files): each row names the level-0 shard files of one bucket's
    doc-range group.  The task reads those files directly with pyarrow,
    concatenates + sorts each (kind, term)'s chunks, emits final segments
    hard-capped at ``max_seg`` postings into kind=/bucket=/ dirs, and
    yields only per-segment metadata.  NO SHUFFLE anywhere: the packed
    postings move exactly once, file -> file, and skew is handled by the
    driver's size-based range grouping (a hot term's postings are split
    across groups by construction)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import zlib

        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from probe_spark.index.codec import encode_postings, varint_decode

        meta: dict[str, list] = {f.name: [] for f in _SEG_META_ARROW_SCHEMA}

        def flush_meta() -> pa.RecordBatch:
            batch = pa.RecordBatch.from_arrays(
                [pa.array(meta[f.name], f.type) for f in _SEG_META_ARROW_SCHEMA],
                schema=_SEG_META_ARROW_SCHEMA,
            )
            for v in meta.values():
                v.clear()
            return batch

        for batch in batches:
            for row in batch.to_pylist():
                bucket = int(row["bucket"])
                salt = int(row["salt"])
                n_salts = int(row["n_salts"])
                files = list(row["files"])
                tables = [
                    pq.read_table(
                        f,
                        columns=[
                            "kind", "term", "min_doc", "docs_bin", "dl_bin",
                        ],
                    )
                    for f in files
                ]
                t = pa.concat_tables(tables)
                if t.num_rows == 0:
                    continue
                t = t.take(
                    pc.sort_indices(
                        t,
                        sort_keys=[
                            ("kind", "ascending"),
                            ("term", "ascending"),
                            ("min_doc", "ascending"),
                        ],
                    )
                )
                kinds = t.column("kind").to_pylist()
                terms = t.column("term").to_pylist()
                docs_bins = t.column("docs_bin").to_pylist()
                dl_bins = t.column("dl_bin").to_pylist()
                writers: dict[str, tuple[_ShardWriter, dict]] = {}

                def _writer(kind: str):
                    ent = writers.get(kind)
                    if ent is None:
                        w = _ShardWriter(
                            os.path.join(
                                _strip_scheme(out_dir),
                                f"kind={kind}",
                                f"bucket={bucket}",
                            ),
                            f"part-s{salt:05d}.parquet",
                            _SEG_FILE_SCHEMA,
                        )
                        ent = (w, {f.name: [] for f in _SEG_FILE_SCHEMA})
                        writers[kind] = ent
                    return ent

                def emit(kind: str, term: str, idc: list, dlc: list) -> None:
                    ids = np.concatenate(idc)
                    dls = np.concatenate(dlc)
                    order = np.argsort(ids, kind="stable")
                    ids = ids[order]
                    dls = dls[order]
                    w, cols = _writer(kind)
                    for seg_seq, s in enumerate(range(0, len(ids), max_seg)):
                        d = ids[s : s + max_seg]
                        l = dls[s : s + max_seg]
                        (
                            docs_bin, dl_bin, block_last, block_min_dl,
                            block_doc_off, block_dl_off,
                        ) = encode_postings(d, l, block=block_size)
                        cols["term"].append(term)
                        cols["salt"].append(salt)
                        cols["seg_seq"].append(seg_seq)
                        cols["n_salts"].append(n_salts)
                        cols["df_seg"].append(len(d))
                        cols["min_doc"].append(int(d[0]))
                        cols["max_doc"].append(int(d[-1]))
                        cols["docs_bin"].append(docs_bin)
                        cols["dl_bin"].append(dl_bin)
                        cols["block_last_doc"].append(block_last.tolist())
                        cols["block_min_dl"].append(block_min_dl.tolist())
                        cols["block_doc_off"].append(block_doc_off.tolist())
                        cols["block_dl_off"].append(block_dl_off.tolist())
                        cols["seg_bytes"].append(len(docs_bin) + len(dl_bin))
                        cols["seg_crc"].append(zlib.crc32(docs_bin))
                        meta["kind"].append(kind)
                        meta["bucket"].append(bucket)
                        meta["term"].append(term)
                        meta["df_seg"].append(len(d))
                        meta["seg_bytes"].append(len(docs_bin) + len(dl_bin))
                        meta["seg_crc"].append(zlib.crc32(docs_bin))
                    if len(cols["term"]) >= 256:
                        w.write(
                            pa.RecordBatch.from_arrays(
                                [
                                    pa.array(cols[f.name], f.type)
                                    for f in _SEG_FILE_SCHEMA
                                ],
                                schema=_SEG_FILE_SCHEMA,
                            )
                        )
                        for v in cols.values():
                            v.clear()

                cur: tuple[str, str] | None = None
                idc: list = []
                dlc: list = []
                for i in range(t.num_rows):
                    key = (kinds[i], terms[i])
                    if cur is not None and key != cur:
                        emit(cur[0], cur[1], idc, dlc)
                        idc, dlc = [], []
                    cur = key
                    gaps = varint_decode(docs_bins[i])
                    idc.append(np.cumsum(gaps.astype(np.int64)))
                    dlc.append(varint_decode(dl_bins[i]).astype(np.int64))
                if cur is not None:
                    emit(cur[0], cur[1], idc, dlc)
                for w, cols in writers.values():
                    if cols["term"]:
                        w.write(
                            pa.RecordBatch.from_arrays(
                                [
                                    pa.array(cols[f.name], f.type)
                                    for f in _SEG_FILE_SCHEMA
                                ],
                                schema=_SEG_FILE_SCHEMA,
                            )
                        )
                    w.close()
                if meta["term"]:
                    yield flush_meta()
        if meta["term"]:
            yield flush_meta()

    return gen


def _salted_partials(
    partials: DataFrame, n_docs: int, cfg: BuildConfig
) -> DataFrame:
    """Hot-term detection + doc-range salting (shared by both merge paths).
    Hot detection is a metadata-only column scan of the level-0 parquet
    (kind, term, df_part) — never touches the packed binaries."""
    max_seg = cfg.max_postings_per_segment
    hot = (
        partials.groupBy("kind", "term")
        .agg(F.sum("df_part").alias("df"))
        .filter(F.col("df") > max_seg)
        .withColumn("hot_salts", F.ceil(F.col("df") / max_seg).cast("int"))
        .select("kind", "term", "hot_salts")
    )
    span_denom = F.col("n_salts").cast("long")
    return (
        partials.join(F.broadcast(hot), ["kind", "term"], "left")
        .withColumn("n_salts", F.coalesce(F.col("hot_salts"), F.lit(1)))
        # doc-range salt: segments stay doc-contiguous per salt and a hot
        # term's merge spreads across tasks.  Assumes occurrences are
        # roughly uniform over docID space (true for genuinely hot terms);
        # the merge hard-caps segment size regardless.
        .withColumn(
            "salt",
            (
                F.col("min_doc")
                / F.ceil(F.lit(float(max(n_docs, 1))) / span_denom)
            ).cast("int"),
        )
        .drop("hot_salts")
    )


def _merge_partials_fused(
    spark: SparkSession,
    partials_path: str,
    cfg: BuildConfig,
    out_path: str,
    build_id: str,
) -> list[dict]:
    """Shuffle-free merge: the level-0 partials are already bucket-
    partitioned on disk (bg=N dirs, one shard per doc-range source
    partition), so the driver plans one merge task per (bucket, doc-range
    group) straight from file-size metadata — greedy grouping keeps each
    task's input under ``cfg.merge_group_bytes``, which both bounds task
    memory and spreads hot buckets across tasks (the doc-range salting of
    the north rule, achieved by construction).  The packed postings move
    exactly once (shard file -> segment file); Spark carries only the plan
    in and per-segment metadata out.  Returns manifest rows."""
    local = _strip_scheme(partials_path)
    plan: list[tuple[int, int, int, list[str]]] = []
    for entry in sorted(os.listdir(local)):
        if not entry.startswith("bg="):
            continue
        b = int(entry.split("=", 1)[1])
        if b < 0:
            continue  # @stats shards
        d = os.path.join(local, entry)
        files = sorted(
            fn for fn in os.listdir(d) if fn.endswith(".parquet")
        )
        groups: list[list[str]] = []
        cur: list[str] = []
        cur_bytes = 0
        for fn in files:
            sz = os.path.getsize(os.path.join(d, fn))
            if cur and cur_bytes + sz > cfg.merge_group_bytes:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(os.path.join(d, fn))
            cur_bytes += sz
        if cur:
            groups.append(cur)
        for salt, g in enumerate(groups):
            plan.append((b, salt, len(groups), g))
    os.makedirs(_strip_scheme(out_path), exist_ok=True)
    if not plan:
        return []
    plan_df = spark.createDataFrame(
        plan, "bucket int, salt int, n_salts int, files array<string>"
    ).repartition(len(plan))
    meta = plan_df.mapInArrow(
        _make_file_merger(
            cfg.block_size, cfg.max_postings_per_segment, out_path
        ),
        SEG_META_SCHEMA,
    )
    rows = (
        meta.groupBy("kind", "bucket")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("df_seg").alias("n_postings"),
            F.countDistinct("term").alias("n_terms"),
            F.sum("seg_bytes").alias("bytes"),
            F.sum("seg_crc").alias("checksum"),
        )
        .collect()
    )
    return [
        {
            "build_id": build_id,
            "phase": f"postings_{r['kind']}",
            "partition_id": int(r["bucket"]),
            "status": "done",
            "n_terms": int(r["n_terms"]),
            "n_postings": int(r["n_postings"]),
            "bytes": int(r["bytes"]),
            "checksum": str(r["checksum"]),
            "completed_at": time.time(),
        }
        for r in rows
    ]


def _manifest_rows(spark: SparkSession, path: str, build_id: str):
    """Per-(kind, bucket) lineage from the pack-time metadata columns — a
    pruned column scan; the packed binaries are never re-read."""
    df = spark.read.parquet(path)
    rows = (
        df.groupBy("kind", "bucket")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("df_seg").alias("n_postings"),
            F.countDistinct("term").alias("n_terms"),
            F.sum("seg_bytes").alias("bytes"),
            F.sum("seg_crc").alias("checksum"),
        )
        .collect()
    )
    return [
        {
            "build_id": build_id,
            "phase": f"postings_{r['kind']}",
            "partition_id": int(r["bucket"]),
            "status": "done",
            "n_terms": int(r["n_terms"]),
            "n_postings": int(r["n_postings"]),
            "bytes": int(r["bytes"]),
            "checksum": str(r["checksum"]),
            "completed_at": time.time(),
        }
        for r in rows
    ]


class IndexBuilder:
    """Builds (or resumes) an index directory:

    index_path/
      docs/        doc_id, conv_id, turn_idx, role, tool, ts, text, dl,
                   tokens, raws  (tokens/raws are build-internal; queries
                   prune them)
      partials/    level-0 packed partial postings (deleted after merge;
                   present only while the postings phase is in flight —
                   a mid-build resume point)
      postings/    kind={tok,raw}/bucket=*/...  final packed segments
                   (POSTINGS_SCHEMA; kind=raw are lowercase raw-word
                   postings serving exact/excluded query terms)
      stats/       single row: n_docs, total_dl, avgdl, n_buckets, ...
      manifest/    lineage rows per phase/partition
    """

    PHASES = ("docs", "postings", "stats")

    def __init__(self, spark: SparkSession, cfg: BuildConfig | None = None):
        self.spark = spark
        self.cfg = cfg or BuildConfig()
        ensure_package_on_executors(spark)
        warm_python_workers(spark)

    # -- resume helpers -----------------------------------------------------
    def _fs(self, path: str):
        sc = self.spark.sparkContext
        hconf = sc._jsc.hadoopConfiguration()
        Path = sc._jvm.org.apache.hadoop.fs.Path
        p = Path(path)
        return p.getFileSystem(hconf), p, sc._jvm.org.apache.hadoop.fs.Path

    def _phase_done(self, index_path: str, phase: str) -> bool:
        fs, p, _ = self._fs(f"{index_path}/{phase}/_SUCCESS")
        return bool(fs.exists(p))

    def _delete_dir(self, path: str) -> None:
        fs, p, _ = self._fs(path)
        if fs.exists(p):
            fs.delete(p, True)

    def _finalize_side_dir(self, path: str) -> None:
        """Commit a task-side-written directory: drop leaked dot-tmp files
        (failed attempts) and write the _SUCCESS phase marker."""
        local = _strip_scheme(path)
        os.makedirs(local, exist_ok=True)
        for root, _dirs, files in os.walk(local):
            for fn in files:
                if fn.startswith("."):
                    os.unlink(os.path.join(root, fn))
        with open(os.path.join(local, "_SUCCESS"), "w"):
            pass

    def _write_manifest(self, index_path: str, rows: list[dict]) -> None:
        """Append lineage rows.  The manifest is driver-written metadata (a
        few rows per phase); a Spark job per append costs ~1s of serial time
        each, so local paths go straight through pyarrow.  Non-local
        index paths (hdfs://, s3://) fall back to a Spark write."""
        if not rows:
            return
        path = f"{index_path}/manifest"
        pdf = pd.DataFrame(rows)
        if "://" in index_path and not index_path.startswith("file://"):
            self.spark.createDataFrame(pdf).write.mode("append").parquet(path)
            return
        import uuid

        import pyarrow.parquet as pq

        local = path[len("file://"):] if path.startswith("file://") else path
        os.makedirs(local, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            os.path.join(local, f"part-{uuid.uuid4().hex}.parquet"),
        )

    def _simple_manifest(self, index_path, build_id, phase):
        self._write_manifest(
            index_path,
            [
                {
                    "build_id": build_id, "phase": phase, "partition_id": -1,
                    "status": "done", "n_terms": 0, "n_postings": 0,
                    "bytes": 0, "checksum": "", "completed_at": time.time(),
                }
            ],
        )

    # -- build ---------------------------------------------------------------
    def build(
        self, transcripts: DataFrame, index_path: str, build_id: str = "build0"
    ) -> dict:
        # AQE off for the build: skew is handled explicitly (doc-range
        # salting) and partition counts are sized by config, so AQE's only
        # effect here is an extra job-boundary materialization per shuffle
        # (measured ~2x fixed cost on small inputs).  Restored in finally —
        # a failed build must not leak AQE=off into a long-lived session.
        spark = self.spark
        aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return self._build_inner(transcripts, index_path, build_id)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_before)

    def _build_inner(
        self, transcripts: DataFrame, index_path: str, build_id: str
    ) -> dict:
        cfg = self.cfg
        spark = self.spark
        # one doc partition per core, NOT per shuffle partition: each build
        # task carries fixed overhead (32 open bucket-shard writers, flush
        # tails, per-chunk merge rows), and 4x-cpus task counts measured
        # 2-3x slower end-to-end at local[32] than exactly-cpus.  On a real
        # cluster size this by data instead (~256MB of input per task) via
        # cfg.doc_partitions.
        n_parts = cfg.doc_partitions or spark.sparkContext.defaultParallelism
        t0 = time.time()
        phases_run = []

        docs_path = f"{index_path}/docs"
        partials_path = f"{index_path}/partials"
        docs_done = self._phase_done(index_path, "docs")
        postings_done = self._phase_done(index_path, "postings")
        stats_done = self._phase_done(index_path, "stats")
        n_docs_known: int | None = None

        fused = cfg.fused and _is_posix_path(index_path)

        # phase 1: docs — docID assignment + the ONE tokenizer pass, all
        # materialized to parquet (sorted by doc_id within range partitions
        # so row-group stats prune doc_id lookups).  Fused mode side-writes
        # the level-0 partials from the SAME pass, so the token arrays never
        # hit parquet and the separate partials job disappears.
        if fused:
            # partials are deleted after a successful merge, so their
            # absence only forces a rebuild while postings are missing
            if not (
                docs_done
                and (postings_done or self._phase_done(index_path, "partials"))
            ):
                with _timed("docs+partials"):
                    self._delete_dir(partials_path)
                    self._delete_dir(docs_path)
                    routed, offsets, n_docs_known = _plan_range_layout(
                        transcripts, n_parts
                    )
                    # the action: collect one @stats row per partition —
                    # docs/ and partials/ are side-written by the tasks
                    # (pyarrow vectorized writer; the JVM never touches the
                    # bulk rows), and stats fold out of the collected rows,
                    # so the stats job disappears too
                    stat_rows = (
                        _canonical_input(routed)
                        .mapInArrow(
                            _make_fused_builder(
                                offsets,
                                docs_path,
                                partials_path,
                                cfg.partial_flush_postings,
                                cfg.store_tokens,
                                cfg.n_buckets,
                            ),
                            PARTIALS_SCHEMA,
                        )
                        .collect()
                    )
                    self._finalize_side_dir(partials_path)
                    self._ensure_docs_nonempty(docs_path, transcripts)
                    self._finalize_side_dir(docs_path)
                    n_docs_known = sum(int(r["df_part"]) for r in stat_rows)
                    total_dl = sum(int(r["min_doc"]) for r in stat_rows)
                if not stats_done:
                    self._write_stats_values(
                        n_docs_known, total_dl, index_path, build_id
                    )
                    stats_done = True
                    phases_run.append("stats")
                self._simple_manifest(index_path, build_id, "docs")
                self._simple_manifest(index_path, build_id, "partials")
                phases_run.append("docs")
        elif not docs_done:
            with _timed("docs"):
                base, n_docs_known = _assign_and_tokenize(
                    transcripts, n_parts
                )
                base.write.mode("overwrite").parquet(docs_path)
            self._simple_manifest(index_path, build_id, "docs")
            phases_run.append("docs")

        docs = spark.read.parquet(docs_path)

        # phase 2: level-0 partials (two-pass layout only — fused already
        # wrote them), then one compressed shuffle + streaming merge into
        # final segments
        if not postings_done:
            if not fused and not self._phase_done(index_path, "partials"):
                with _timed("partials"):
                    (
                        docs.select("doc_id", "dl", "tokens", "raws")
                        .mapInArrow(
                            _make_partial_builder(cfg.partial_flush_postings),
                            PARTIALS_SCHEMA,
                        )
                        .write.mode("overwrite")
                        .parquet(partials_path)
                    )
                self._simple_manifest(index_path, build_id, "partials")
            # stats ride the partials metadata (@stats rows emitted by the
            # builder) — no separate docs dl scan; must run before the
            # partials cleanup below
            if not stats_done:
                with _timed("stats"):
                    n_docs_known = self._write_stats(
                        spark.read.parquet(partials_path), index_path, build_id
                    )
                stats_done = True
                phases_run.append("stats")
            if n_docs_known is not None:
                n_docs = int(n_docs_known)
            else:
                n_docs = int(
                    spark.read.parquet(f"{index_path}/stats").collect()[0][
                        "n_docs"
                    ]
                )
            with _timed("merge"):
                if fused:
                    self._delete_dir(f"{index_path}/postings")
                    manifest_rows = _merge_partials_fused(
                        spark, partials_path, cfg,
                        f"{index_path}/postings", build_id,
                    )
                    self._finalize_side_dir(f"{index_path}/postings")
                else:
                    _merge_partials(
                        spark, partials_path, n_docs, cfg,
                        f"{index_path}/postings",
                    )
                    manifest_rows = None
            with _timed("manifest_postings"):
                self._write_manifest(
                    index_path,
                    manifest_rows
                    if manifest_rows is not None
                    else _manifest_rows(
                        spark, f"{index_path}/postings", build_id
                    ),
                )
            self._delete_dir(partials_path)
            phases_run.append("postings")

        # phase 3 fallback (resume path: postings already done but stats
        # missing, partials gone) — pruned dl scan over docs/
        if not stats_done:
            with _timed("stats"):
                n_docs_known = self._write_stats(
                    docs.select(
                        F.lit("@stats").alias("kind"),
                        F.lit(1).cast("long").alias("df_part"),
                        F.col("dl").cast("long").alias("min_doc"),
                    ),
                    index_path,
                    build_id,
                )
            phases_run.append("stats")

        elapsed = time.time() - t0
        if n_docs_known is not None:
            n_docs = int(n_docs_known)
        else:
            n_docs = int(
                spark.read.parquet(f"{index_path}/stats").collect()[0]["n_docs"]
            )
        return {
            "build_id": build_id,
            # canonical phase order (stats may execute early off the
            # partials metadata)
            "phases_run": [p for p in self.PHASES if p in phases_run],
            "n_docs": n_docs,
            "elapsed_sec": elapsed,
            "turns_per_sec": (n_docs / elapsed) if elapsed > 0 else 0.0,
        }

    def _write_stats(self, src: DataFrame, index_path: str, build_id: str) -> int:
        """Aggregate (@stats-kind rows: df_part=n_docs, min_doc=total_dl)
        and write stats/.  Returns n_docs."""
        row = (
            src.filter(F.col("kind") == "@stats")
            .agg(
                F.sum("df_part").alias("n_docs"),
                F.sum("min_doc").alias("total_dl"),
            )
            .collect()[0]
        )
        n_docs = int(row["n_docs"] or 0)
        total_dl = int(row["total_dl"] or 0)
        self._write_stats_values(n_docs, total_dl, index_path, build_id)
        return n_docs

    def _write_stats_values(
        self, n_docs: int, total_dl: int, index_path: str, build_id: str
    ) -> None:
        cfg = self.cfg
        pdf = pd.DataFrame(
            {
                "n_docs": [n_docs],
                "total_dl": [total_dl],
                "avgdl": [total_dl / n_docs if n_docs else 0.0],
                "n_buckets": [cfg.n_buckets],
                "block_size": [cfg.block_size],
                "build_id": [build_id],
            }
        )
        self._write_stats_frame(pdf, index_path)
        self._simple_manifest(index_path, build_id, "stats")

    def _ensure_docs_nonempty(self, docs_path: str, transcripts: DataFrame) -> None:
        """A 0-row corpus leaves no side-written docs shards; write one
        empty, correctly-typed file so docs/ stays readable."""
        local = _strip_scheme(docs_path)
        os.makedirs(local, exist_ok=True)
        if any(fn.endswith(".parquet") for fn in os.listdir(local)):
            return
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        ts_type = dict(
            zip(transcripts.schema.names, transcripts.schema.fields)
        )["ts"].dataType
        schema = to_arrow_schema(_docs_schema(ts_type, self.cfg.store_tokens))
        pq.write_table(
            schema.empty_table(), os.path.join(local, "part-00000.parquet")
        )

    def _write_stats_frame(self, pdf: "pd.DataFrame", index_path: str) -> None:
        """Overwrite stats/ with a single-row frame (driver-side for local
        paths — a Spark job for one row costs ~2s of scheduling)."""
        if "format_version" not in pdf.columns:
            pdf = pdf.assign(format_version=FORMAT_VERSION)
        path = f"{index_path}/stats"
        if "://" in index_path and not index_path.startswith("file://"):
            # remote FS: Spark write (its committer creates _SUCCESS).
            # NOT coalesce(1): coalescing a local relation to one partition
            # costs a flat ~5s per write in Spark 4.1 local mode (measured)
            self.spark.createDataFrame(pdf).repartition(1).write.mode(
                "overwrite"
            ).parquet(path)
        else:
            # driver-side single-row write: a Spark job for one row costs
            # ~2s of scheduling; stats/_SUCCESS (the phase-done marker) is
            # created explicitly
            import pyarrow.parquet as pq

            local = (
                path[len("file://"):] if path.startswith("file://") else path
            )
            if os.path.isdir(local):
                for fn in os.listdir(local):
                    os.unlink(os.path.join(local, fn))
            os.makedirs(local, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False),
                os.path.join(local, "part-00000.parquet"),
            )
            with open(os.path.join(local, "_SUCCESS"), "w"):
                pass
