"""Distributed inverted-index build over transcript tables.

Pipeline (all DataFrame/Catalyst; Python only inside Arrow-batched UDFs):

  1. deterministic dense docID assignment over stable (conv_id, turn_idx)
     ordering — two-phase (range-repartition -> per-partition counts ->
     offset broadcast -> partition-local row_number), never a
     single-partition window and never monotonically_increasing_id
     (SURVEY.md §4 item 7)
  2. tokenize each turn with the probe-compatible tokenizer inside a pandas
     UDF (Arrow-batched; BASELINE.json input_hint: no per-row Python)
  3. postings: explode(tokens) -> (term, doc_id, dl) -> df per term ->
     hot-term salting (df > max_postings_per_segment gets n_salts = ceil(df /
     max) mod-salted sub-segments, bounding per-group memory and shuffle
     skew) -> groupBy(term, salt) applyInPandas delta+varint pack ->
     parquet partitioned by hash bucket of term (query-time partition
     pruning), sorted by term within files (row-group stats pruning)
  4. raw-word postings: same pipeline over lowercase alnum runs — serves
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
"""

from __future__ import annotations

import json
import math
import time
from dataclasses import dataclass

import pandas as pd
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

from probe_spark.functions.tokenizer import raw_words_batch, tokenize_batch
from probe_spark.index.codec import encode_postings
from probe_spark.runtime import ensure_package_on_executors

POSTINGS_SCHEMA = StructType(
    [
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


@dataclass
class BuildConfig:
    n_buckets: int = 32  # parquet partition dirs for term-hash pruning
    max_postings_per_segment: int = 1 << 17  # salting threshold (hot terms)
    block_size: int = 128  # block-max granularity
    doc_partitions: int | None = None  # defaults to shuffle partitions


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


def _pack_groups_fn(block_size: int):
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        n_salts = int(pdf["n_salts"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        docs_bin, dl_bin, block_last, block_min_dl = encode_postings(
            pdf["doc_id"].to_numpy(), pdf["dl"].to_numpy(), block=block_size
        )
        return pd.DataFrame(
            {
                "term": [term],
                "salt": [salt],
                "n_salts": [n_salts],
                "df_seg": [len(pdf)],
                "min_doc": [int(pdf["doc_id"].min())],
                "max_doc": [int(pdf["doc_id"].max())],
                "docs_bin": [docs_bin],
                "dl_bin": [dl_bin],
                "block_last_doc": [block_last.tolist()],
                "block_min_dl": [block_min_dl.tolist()],
                "bucket": [bucket],
            }
        )

    return pack


def _build_postings(
    pairs: DataFrame, cfg: BuildConfig, out_path: str
) -> None:
    """pairs: (term, doc_id, dl) distinct per (term, doc_id)."""
    # df per term — Catalyst partial+final hash agg.  Only HOT terms
    # (df > max_postings_per_segment) need a salt count; that set is tiny, so
    # it broadcast-joins instead of shuffling all pairs against all dfs.
    max_seg = cfg.max_postings_per_segment
    hot = (
        pairs.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_seg)
        .withColumn("hot_salts", F.ceil(F.col("df") / F.lit(max_seg)).cast("int"))
        .select("term", "hot_salts")
    )
    salted = (
        pairs.join(F.broadcast(hot), "term", "left")
        .withColumn("n_salts", F.coalesce(F.col("hot_salts"), F.lit(1)))
        .withColumn("salt", (F.col("doc_id") % F.col("n_salts")).cast("int"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.n_buckets)).cast("int")
        )
    )
    packed = (
        salted.select("term", "salt", "n_salts", "bucket", "doc_id", "dl")
        .groupBy("term", "salt")
        .applyInPandas(_pack_groups_fn(cfg.block_size), POSTINGS_SCHEMA)
    )
    (
        packed.repartition("bucket")
        .sortWithinPartitions("term", "salt")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_path)
    )


def _manifest_rows(spark: SparkSession, path: str, build_id: str, phase: str):
    df = spark.read.parquet(path)
    rows = (
        df.groupBy("bucket")
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
            "phase": phase,
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
      docs/          doc_id, conv_id, turn_idx, role, tool, ts, text, dl
      postings/      bucket=*/...  packed segments (POSTINGS_SCHEMA)
      raw_postings/  same layout over raw lowercase words
      stats/         single row: n_docs, total_dl, avgdl, n_terms
      manifest/      lineage rows per phase/partition
    """

    PHASES = ("docs", "postings", "raw_postings", "stats")

    def __init__(self, spark: SparkSession, cfg: BuildConfig | None = None):
        self.spark = spark
        self.cfg = cfg or BuildConfig()
        ensure_package_on_executors(spark)

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
        raw_udf = F.pandas_udf(lambda s: raw_words_batch(s), ArrayType(StringType()))

        # phase 1: docs with doc_id + dl
        docs_path = f"{index_path}/docs"
        if not self._phase_done(index_path, "docs"):
            with_ids = _assign_doc_ids(transcripts, n_parts)
            docs = (
                with_ids.withColumn("tokens", tokenize_udf(F.col("text")))
                .withColumn("dl", F.size("tokens"))
                .select(
                    "doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
                    "text", "dl", "tokens",
                )
            )
            # store tokens transiently for the postings phase? No — recompute
            # is cheaper than double storage at 10^12 scale; docs/ holds only
            # scalars + dl.  Sorted by doc_id within range partitions so
            # row-group stats prune doc_id lookups.
            (
                docs.drop("tokens")
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

        docs = spark.read.parquet(docs_path)

        # phase 2: token postings
        if not self._phase_done(index_path, "postings"):
            toks = docs.select(
                "doc_id", "dl", F.explode(tokenize_udf(F.col("text"))).alias("term")
            )
            # tokens are already unique per doc (tokenizer dedups) -> no distinct needed
            _build_postings(
                toks.select("term", "doc_id", "dl"), cfg, f"{index_path}/postings"
            )
            self._write_manifest(
                index_path,
                _manifest_rows(spark, f"{index_path}/postings", build_id, "postings"),
            )
            phases_run.append("postings")

        # phase 3: raw-word postings (exact/excluded term lookups)
        if not self._phase_done(index_path, "raw_postings"):
            raws = docs.select(
                "doc_id", "dl", F.explode(raw_udf(F.col("text"))).alias("term")
            )
            _build_postings(
                raws.select("term", "doc_id", "dl"), cfg, f"{index_path}/raw_postings"
            )
            self._write_manifest(
                index_path,
                _manifest_rows(
                    spark, f"{index_path}/raw_postings", build_id, "raw_postings"
                ),
            )
            phases_run.append("raw_postings")

        # phase 4: stats
        if not self._phase_done(index_path, "stats"):
            stats_row = docs.agg(
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

        elapsed = time.time() - t0
        n_docs = spark.read.parquet(f"{index_path}/stats").collect()[0]["n_docs"]
        return {
            "build_id": build_id,
            "phases_run": phases_run,
            "n_docs": int(n_docs),
            "elapsed_sec": elapsed,
            "turns_per_sec": (int(n_docs) / elapsed) if elapsed > 0 else 0.0,
        }
