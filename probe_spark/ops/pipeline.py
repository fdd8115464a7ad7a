"""Composed training-data pipeline: the ops modules chained as ONE
declarative DataFrame job.

A pretraining-corpus prep run is not one operator but a pipeline —
deduplicate, filter on quality, split into context windows, count tokens
for packing.  Because every stage here is a pure DataFrame transform,
composition is plan-level: Catalyst fuses the quality projection and the
chunk expansion into the scan stage, and the whole pipeline costs ONE
shuffle (the dedup window over md5(text)) regardless of how many stages
ride behind it.  At 10^12 turns that is the difference between one pass
over the corpus and four.

Stage choices (and why):
  - dedup keeps the min-id representative per exact text via
    ``row_number() over (partition by md5(text) order by id)`` — ONE
    exchange; the groupBy-min + self-join alternative costs two.
  - quality filter reuses ``text.with_quality`` (same affine score the
    `quality` oracle entry pins) on the deduped survivors.
  - chunking reuses ``text.chunk_documents`` (map-only expansion).
  - per-chunk BPE-ish token counts ride the same projection
    (``regexp_count`` — codegen, no UDF) for downstream example packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from probe_spark.ops.text import BPE_REGEX, chunk_documents, with_quality


def training_examples(
    docs: DataFrame,
    min_quality: float = 0.5,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_counter: str = "vectorized",
) -> DataFrame:
    """Exact-dedup -> quality-filter -> chunk -> count, as one job.

    Returns one training example per row:
    ``(id, chunk_idx, chunk_start, n_words, chunk_text, bpe_tokens)``.
    ``min_quality`` thresholds the 6-dp-rounded ``quality_score`` (the
    reproducible form the `quality` contract entry pins).

    ``token_counter``: "vectorized" (default) counts BPE-ish tokens in an
    Arrow-batched numpy stage — value-identical to the regex column (the
    pattern decomposes into run-start detection, see text.bpe_count_np)
    but it SCALES with executor parallelism where java.util.regex in the
    JVM stage measured a hard per-thread inflation on the bench guest
    (4.8x from 2 to 8 threads; heap/GC-insensitive).  "column" keeps the
    pure-Column ``regexp_count`` plan — the shape the DuckDB oracle
    mirrors 1:1 and the right choice when the corpus is small or Python
    workers are unavailable.
    """
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    kept = (
        docs.select(id_col, text_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    good = (
        with_quality(kept, text_col=text_col)
        .filter(F.col("quality_score") >= min_quality)
        .select(id_col, text_col)
    )
    chunks = chunk_documents(
        good, window=window, stride=stride, id_col=id_col, text_col=text_col
    )
    if token_counter == "vectorized":
        from probe_spark.ops.text import bpe_tokens_vectorized  # noqa: PLC0415

        return chunks.withColumn(
            "bpe_tokens", bpe_tokens_vectorized(F.col("chunk_text"))
        )
    return chunks.withColumn(
        "bpe_tokens", F.regexp_count(F.col("chunk_text"), F.lit(BPE_REGEX))
    )


def pack_examples(
    chunks: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "bpe_tokens",
) -> DataFrame:
    """Assign each chunk a pack index so packs stay under ``budget``
    tokens — the sequence-packing stage that turns variable-length chunks
    into fixed-budget training sequences.

    Packing is PER DOCUMENT (``pack_idx`` restarts at 0 for each id):
    packs never cross documents, which keeps the operation embarrassingly
    parallel (one window partitioned by id — co-partitioned with the
    chunker's output, no global ordering bottleneck) and keeps document
    locality inside each pack.  The boundary rule is the deterministic
    exclusive-prefix form: chunk i joins pack ``floor(cum_before /
    budget)`` where ``cum_before`` is the token sum of earlier chunks of
    the same document — over-budget single chunks get their own pack and
    the stream realigns after them.

    Adds ``pack_idx`` and ``pack_tokens_before`` to the input rows.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    w = (
        Window.partitionBy(id_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(tokens_col).over(w), F.lit(0).cast("long")
    )
    return chunks.withColumn(
        "pack_tokens_before", cum_before
    ).withColumn(
        "pack_idx", F.floor(cum_before / budget).cast("int")
    )


def shuffle_for_training(
    df: DataFrame,
    n_shards: int,
    salt: int = 0,
    id_col: str = "doc_id",
    idx_col: str | None = "chunk_idx",
) -> DataFrame:
    """Deterministic global training shuffle + shard assignment — the
    export stage after packing: every example gets a ``shard`` in
    [0, n_shards) and a ``shard_pos`` (0-based rank within its shard), both
    pure functions of the example's identity and ``salt``, so the order is
    reproducible across re-runs, engines, and retries (re-salting is a new
    epoch permutation without rewriting the data).

    Shape: the shard assignment is map-only (md5-hash mixing, same
    engine-agnostic family as curation.hash_frac); the within-shard rank
    is ONE window per shard partition — n_shards-way parallel, no global
    sort.  Writers then do ``.repartition("shard").write.partitionBy``.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.md5(
        F.concat_ws(
            "|",
            F.lit(str(salt)),
            F.col(id_col).cast("string"),
            *([F.col(idx_col).cast("string")] if idx_col else []),
        )
    )
    h = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    out = df.withColumn("_hkey", key).withColumn(
        "shard", (h % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("_hkey"), F.col(id_col)
    )
    return out.withColumn(
        "shard_pos", (F.row_number().over(w) - F.lit(1)).cast("long")
    ).drop("_hkey")
