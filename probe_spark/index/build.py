"""Distributed inverted-index build over transcript tables.

Pipeline (all DataFrame/Catalyst; Python only inside Arrow-batched UDFs):

  1. deterministic dense docID assignment over stable (conv_id, turn_idx)
     ordering — two-phase (range-repartition -> per-partition counts ->
     offset broadcast -> partition-local row_number), never a
     single-partition window and never monotonically_increasing_id
     (SURVEY.md §4 item 7)
  2. ONE tokenizer pass: token + raw-word pandas UDFs evaluated in a single
     ArrowEvalPython node, persisted (MEMORY_AND_DISK) and reused by the
     docs / postings / raw_postings / stats phases — the corpus text is
     tokenized exactly once per build
  3. postings: explode(tokens) -> (term, doc_id, dl) -> df per term ->
     hot-term salting (df > max_postings_per_segment gets n_salts = ceil(df /
     max) mod-salted sub-segments, bounding per-group memory and shuffle
     skew) -> groupBy(term, salt) collect_list -> mapInArrow delta+varint
     pack (vectorized; no per-group pandas dispatch) -> parquet partitioned
     by hash bucket of term (query-time partition pruning), sorted by term
     within files (row-group stats pruning)
  4. raw-word postings (same shuffle, kind='raw'): lowercase alnum runs
     filtered to *potential special-term lookups* (is_potential_special) —
     the only words the query engine can ever fetch from this index — serve
     exact/excluded query terms (reference: quoted terms bypass
     tokenization, elastic_query.rs:768-773)
  5. stats: n_docs, total_dl, avgdl (ranking.rs:64-72 semantics: mean over
     ALL docs incl. empty)
  6. manifest: per-phase + per-bucket lineage rows (build_id, phase,
     partition, counts, checksum, completed_at); a finished phase is
     skipped on resume (idempotent overwrite otherwise)

Scale notes (10^12 turns): every stage is a single shuffle on a key whose
cardinality grows with data (doc ranges / term buckets); postings groups are
bounded by max_postings_per_segment regardless of term skew ("the" at 10^12
docs becomes ~10^7 independent segments instead of one 10^12-row group);
bucket count and shuffle partitions scale with input size via builder args.
The token materialization in step 2 trades one persisted pass (spillable)
for three tokenizer passes — at 10^12 turns set materialize_tokens=False to
recompute instead (documented trade; both paths tested).
"""

from __future__ import annotations

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

from probe_spark.functions.tokenizer import raw_special_words_batch, tokenize_batch
from probe_spark.runtime import ensure_package_on_executors, warm_python_workers

POSTINGS_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("term", StringType(), False),
        StructField("salt", IntegerType(), False),
        StructField("n_salts", IntegerType(), False),
        StructField("df_seg", LongType(), False),
        StructField("min_doc", LongType(), False),
        StructField("max_doc", LongType(), False),
        StructField("docs_bin", BinaryType(), False),
        StructField("dl_bin", BinaryType(), False),
        StructField("block_last_doc", ArrayType(LongType(), False), False),
        StructField("block_min_dl", ArrayType(IntegerType(), False), False),
        StructField("bucket", IntegerType(), False),
    ]
)

_PACK_ARROW_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string(), False),
        pa.field("term", pa.string(), False),
        pa.field("salt", pa.int32(), False),
        pa.field("n_salts", pa.int32(), False),
        pa.field("df_seg", pa.int64(), False),
        pa.field("min_doc", pa.int64(), False),
        pa.field("max_doc", pa.int64(), False),
        pa.field("docs_bin", pa.binary(), False),
        pa.field("dl_bin", pa.binary(), False),
        pa.field("block_last_doc", pa.list_(pa.int64()), False),
        pa.field("block_min_dl", pa.list_(pa.int32()), False),
        pa.field("bucket", pa.int32(), False),
    ]
)


@dataclass
class BuildConfig:
    n_buckets: int = 32  # parquet partition dirs for term-hash pruning
    max_postings_per_segment: int = 1 << 17  # salting threshold (hot terms)
    block_size: int = 128  # block-max granularity
    doc_partitions: int | None = None  # defaults to shuffle partitions
    materialize_tokens: bool = True  # persist tokens across phases
    # hot-term df estimation on a sample instead of a full pass (None=exact);
    # at 10^12 pairs the exact pass costs as much as the main shuffle
    hot_sample_fraction: float | None = None


def _assign_doc_ids(df: DataFrame, n_parts: int) -> DataFrame:
    """Two-phase dense docID over (conv_id, turn_idx): correctness does not
    depend on where range boundaries fall, only on ranges being ordered."""
    from pyspark.sql.window import Window

    parted = df.repartitionByRange(n_parts, "conv_id", "turn_idx").withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("_pid").orderBy("conv_id", "turn_idx")
    out = (
        parted.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "doc_id",
            (offset_expr[F.col("_pid")] + F.col("_rn") - F.lit(1)).cast("long"),
        )
        .drop("_pid", "_rn")
    )
    return out


def _pack_sorted_arrow(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """Streaming segment packer over rows sorted by (kind, term, salt,
    doc_id) within the partition: detects group boundaries vectorized,
    varint-packs each group, carries the partial tail group across batches.
    Memory is bounded by one segment (max_postings_per_segment rows), never
    by a whole aggregation buffer — this replaces a collect_list hash agg.

    Input columns: kind, term, salt, n_salts, bucket, doc_id, dl, block_size.
    """
    import numpy as np

    from probe_spark.index.codec import encode_postings

    block_size = 128
    carry: dict | None = None  # partial tail group
    out: dict[str, list] = {k: [] for k in (
        "kind", "term", "salt", "n_salts", "df_seg", "min_doc", "max_doc",
        "docs_bin", "dl_bin", "block_last_doc", "block_min_dl", "bucket",
    )}

    def emit(key, n_salt, bucket, d, l):
        docs_bin, dl_bin, block_last, block_min_dl = encode_postings(
            d, l, block=block_size
        )
        out["kind"].append(key[0])
        out["term"].append(key[1])
        out["salt"].append(key[2])
        out["n_salts"].append(n_salt)
        out["df_seg"].append(len(d))
        out["min_doc"].append(int(d.min()))
        out["max_doc"].append(int(d.max()))
        out["docs_bin"].append(docs_bin)
        out["dl_bin"].append(dl_bin)
        out["block_last_doc"].append(block_last.tolist())
        out["block_min_dl"].append(block_min_dl.tolist())
        out["bucket"].append(bucket)

    def flush():
        batch = pa.RecordBatch.from_arrays(
            [pa.array(out[f.name], f.type) for f in _PACK_ARROW_SCHEMA],
            schema=_PACK_ARROW_SCHEMA,
        )
        for k in out:
            out[k].clear()
        return batch

    for batch in batches:
        n = batch.num_rows
        if n == 0:
            continue
        block_size = int(batch.column("block_size")[0].as_py())
        kinds = np.asarray(batch.column("kind").to_pylist(), dtype=object)
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        salts = batch.column("salt").to_numpy(zero_copy_only=False)
        n_salts = batch.column("n_salts").to_numpy(zero_copy_only=False)
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dls = batch.column("dl").to_numpy(zero_copy_only=False)

        # group boundaries (kind, term, salt)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        if n > 1:
            change[1:] = (
                (terms[1:] != terms[:-1])
                | (kinds[1:] != kinds[:-1])
                | (salts[1:] != salts[:-1])
            )
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)

        for s, e in zip(starts, ends):
            key = (kinds[s], terms[s], int(salts[s]))
            d = doc_ids[s:e]
            l = dls[s:e]
            if carry is not None and carry["key"] == key:
                d = np.concatenate([carry["d"], d])
                l = np.concatenate([carry["l"], l])
                carry = None
            elif carry is not None:
                emit(carry["key"], carry["n_salt"], carry["bucket"],
                     carry["d"], carry["l"])
                carry = None
            if e == n:
                # group may continue in the next batch
                carry = {
                    "key": key, "d": d, "l": l,
                    "n_salt": int(n_salts[s]), "bucket": int(buckets[s]),
                }
            else:
                emit(key, int(n_salts[s]), int(buckets[s]), d, l)
        if out["term"]:
            yield flush()

    if carry is not None:
        emit(carry["key"], carry["n_salt"], carry["bucket"],
             carry["d"], carry["l"])
    if out["term"]:
        yield flush()


def _build_postings(pairs: DataFrame, cfg: BuildConfig, out_path: str) -> None:
    """pairs: (kind, term, doc_id, dl) distinct per (kind, term, doc_id).

    Token and raw-word postings ride the same shuffle (kind is part of the
    grouping key and the output partitioning) — ONE pass over the pairs
    instead of two jobs.
    """
    # df per term — Catalyst partial+final hash agg.  Only HOT terms
    # (df > max_postings_per_segment) need a salt count; that set is tiny, so
    # it broadcast-joins instead of shuffling all pairs against all dfs.
    # With hot_sample_fraction set, the df pass runs on a sample (one full
    # scan saved at 10^12 scale); estimates are padded 25% and detection
    # triggers at half the threshold, so a missed borderline term costs at
    # most one ~2x-oversized segment — a soft bound, never a failure.
    max_seg = cfg.max_postings_per_segment
    frac = cfg.hot_sample_fraction
    src = pairs.sample(frac, seed=42) if frac else pairs
    scale = (1.0 / frac) if frac else 1.0
    detect_at = (max_seg / 2) if frac else max_seg
    hot = (
        src.groupBy("kind", "term")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * scale > detect_at)
        .withColumn(
            "hot_salts",
            F.greatest(
                F.ceil(F.col("cnt") * (scale * 1.25 if frac else scale) / max_seg),
                F.lit(1),
            ).cast("int"),
        )
        .select("kind", "term", "hot_salts")
    )
    salted = (
        pairs.join(F.broadcast(hot), ["kind", "term"], "left")
        .withColumn("n_salts", F.coalesce(F.col("hot_salts"), F.lit(1)))
        .withColumn("salt", (F.col("doc_id") % F.col("n_salts")).cast("int"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.n_buckets)).cast("int")
        )
    )
    shuffled = (
        salted.withColumn("block_size", F.lit(cfg.block_size))
        .repartition("kind", "term", "salt")
        .sortWithinPartitions("kind", "term", "salt", "doc_id")
    )
    packed = shuffled.mapInArrow(_pack_sorted_arrow, POSTINGS_SCHEMA)
    (
        packed.repartition("kind", "bucket")
        .sortWithinPartitions("term", "salt")
        .write.mode("overwrite")
        .partitionBy("kind", "bucket")
        .parquet(out_path)
    )


def _manifest_rows(spark: SparkSession, path: str, build_id: str):
    df = spark.read.parquet(path)
    rows = (
        df.groupBy("kind", "bucket")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("df_seg").alias("n_postings"),
            F.countDistinct("term").alias("n_terms"),
            F.sum(F.length("docs_bin") + F.length("dl_bin")).alias("bytes"),
            F.sum(F.crc32(F.col("docs_bin"))).alias("checksum"),
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
      docs/        doc_id, conv_id, turn_idx, role, tool, ts, text, dl
      postings/    kind={tok,raw}/bucket=*/...  packed segments
                   (POSTINGS_SCHEMA; kind=raw are lowercase raw-word
                   postings serving exact/excluded query terms)
      stats/       single row: n_docs, total_dl, avgdl, n_terms
      manifest/    lineage rows per phase/partition
    """

    PHASES = ("docs", "postings", "stats")

    def __init__(self, spark: SparkSession, cfg: BuildConfig | None = None):
        self.spark = spark
        self.cfg = cfg or BuildConfig()
        ensure_package_on_executors(spark)
        warm_python_workers(spark)

    # -- resume helpers -----------------------------------------------------
    def _phase_done(self, index_path: str, phase: str) -> bool:
        sc = self.spark.sparkContext
        hconf = sc._jsc.hadoopConfiguration()
        Path = sc._jvm.org.apache.hadoop.fs.Path
        p = Path(f"{index_path}/{phase}/_SUCCESS")
        fs = p.getFileSystem(hconf)
        return bool(fs.exists(p))

    def _write_manifest(self, index_path: str, rows: list[dict]) -> None:
        if not rows:
            return
        pdf = pd.DataFrame(rows)
        self.spark.createDataFrame(pdf).write.mode("append").parquet(
            f"{index_path}/manifest"
        )

    # -- build ---------------------------------------------------------------
    def build(
        self, transcripts: DataFrame, index_path: str, build_id: str = "build0"
    ) -> dict:
        cfg = self.cfg
        spark = self.spark
        n_parts = cfg.doc_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        t0 = time.time()
        phases_run = []

        tokenize_udf = F.pandas_udf(
            lambda s: tokenize_batch(s), ArrayType(StringType())
        )
        raw_udf = F.pandas_udf(
            lambda s: raw_special_words_batch(s), ArrayType(StringType())
        )

        docs_done = self._phase_done(index_path, "docs")
        postings_done = self._phase_done(index_path, "postings")
        stats_done = self._phase_done(index_path, "stats")

        docs_path = f"{index_path}/docs"
        base = (
            spark.read.parquet(docs_path)
            if docs_done
            else _assign_doc_ids(transcripts, n_parts)
        )

        # ONE tokenizer pass: both pandas UDFs evaluate in a single
        # ArrowEvalPython node; persisted so later phases reuse it.
        need_tokens = not (postings_done and stats_done and docs_done)
        enriched = None
        if need_tokens:
            enriched = base.withColumn("tokens", tokenize_udf(F.col("text")))
            if not postings_done:
                enriched = enriched.withColumn("raws", raw_udf(F.col("text")))
            else:
                enriched = enriched.withColumn(
                    "raws", F.array().cast(ArrayType(StringType()))
                )
            enriched = enriched.withColumn("dl", F.size("tokens"))
            if cfg.materialize_tokens:
                enriched = enriched.persist()

        # phase 1: docs (scalars + dl only; sorted by doc_id within range
        # partitions so row-group stats prune doc_id lookups)
        if not docs_done:
            (
                enriched.select(
                    "doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
                    "text", "dl",
                )
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(docs_path)
            )
            self._write_manifest(
                index_path,
                [
                    {
                        "build_id": build_id, "phase": "docs", "partition_id": -1,
                        "status": "done", "n_terms": 0,
                        "n_postings": 0, "bytes": 0, "checksum": "",
                        "completed_at": time.time(),
                    }
                ],
            )
            phases_run.append("docs")

        # phase 2: token + raw-word postings in ONE shuffle (kind column);
        # raw words serve exact/excluded query terms (reference: quoted terms
        # bypass tokenization, elastic_query.rs:768-773).  Tokens are already
        # unique per doc (tokenizer dedups) -> no distinct needed.
        if not postings_done:
            toks = enriched.select(
                F.lit("tok").alias("kind"), "doc_id", "dl",
                F.explode("tokens").alias("term"),
            )
            raws = enriched.select(
                F.lit("raw").alias("kind"), "doc_id", "dl",
                F.explode("raws").alias("term"),
            )
            pairs = toks.unionByName(raws).select("kind", "term", "doc_id", "dl")
            _build_postings(pairs, cfg, f"{index_path}/postings")
            self._write_manifest(
                index_path,
                _manifest_rows(spark, f"{index_path}/postings", build_id),
            )
            phases_run.append("postings")

        # phase 4: stats
        if not stats_done:
            src = enriched if enriched is not None else spark.read.parquet(docs_path)
            stats_row = src.agg(
                F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
            ).collect()[0]
            n_docs = stats_row["n_docs"]
            total_dl = stats_row["total_dl"] or 0
            stats = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "n_docs": [n_docs],
                        "total_dl": [total_dl],
                        "avgdl": [total_dl / n_docs if n_docs else 0.0],
                        "n_buckets": [cfg.n_buckets],
                        "block_size": [cfg.block_size],
                        "build_id": [build_id],
                    }
                )
            )
            stats.coalesce(1).write.mode("overwrite").parquet(f"{index_path}/stats")
            self._write_manifest(
                index_path,
                [
                    {
                        "build_id": build_id, "phase": "stats", "partition_id": -1,
                        "status": "done", "n_terms": 0, "n_postings": 0,
                        "bytes": 0, "checksum": "", "completed_at": time.time(),
                    }
                ],
            )
            phases_run.append("stats")

        if enriched is not None and cfg.materialize_tokens:
            enriched.unpersist()

        elapsed = time.time() - t0
        n_docs = spark.read.parquet(f"{index_path}/stats").collect()[0]["n_docs"]
        return {
            "build_id": build_id,
            "phases_run": phases_run,
            "n_docs": int(n_docs),
            "elapsed_sec": elapsed,
            "turns_per_sec": (int(n_docs) / elapsed) if elapsed > 0 else 0.0,
        }
