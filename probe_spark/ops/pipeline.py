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
) -> DataFrame:
    """Exact-dedup -> quality-filter -> chunk -> count, as one job.

    Returns one training example per row:
    ``(id, chunk_idx, chunk_start, n_words, chunk_text, bpe_tokens)``.
    ``min_quality`` thresholds the 6-dp-rounded ``quality_score`` (the
    reproducible form the `quality` contract entry pins).
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
    return chunks.withColumn(
        "bpe_tokens", F.regexp_count(F.col("chunk_text"), F.lit(BPE_REGEX))
    )
