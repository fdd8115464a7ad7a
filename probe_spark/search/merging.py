"""Adjacent-turn result merging — the transcript analog of the reference's
post-limit block merging (src/search/block_merging.rs:18-167: blocks in the
same file whose line ranges are within ``threshold`` lines merge; merged
score = max, stats = sum/max; default threshold 5).

For transcripts the unit is a turn, so: ranked results from the SAME
conversation whose turn_idx values are within ``threshold`` of each other
merge into one span (turn_lo..turn_hi).  Merged score = max (the rank the
span keeps), n_turns = count, text = turns joined in turn order with a
separator (the reference re-reads gap lines; turns are whole units, so the
span text is exactly its member turns).

Spark shape: the classic sessionize pattern — lag() gap flag + running sum
over (conv_id, turn_idx) — entirely window/agg, no UDF.  The window
partitions by conv_id: results are k rows, so this is driver-scale work
expressed declaratively (same code runs unchanged if merging is applied to
a full result set instead of top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_adjacent_turns(
    results: DataFrame, threshold: int = 5
) -> DataFrame:
    """Merge ranked results (doc_id, score, conv_id, turn_idx, text, ...)
    into conversation spans.

    Returns (conv_id, turn_lo, turn_hi, n_turns, score, doc_id, text):
      - score = max over the span (block_merging.rs:423-453 keeps max)
      - doc_id = the span's best-scoring doc (ties -> lowest doc_id), so
        downstream tie-breaking stays deterministic
      - text = member turns joined with "\\n" in turn order
    Ordering follows the reference's re-sort: score desc, then doc_id asc.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = results.withColumn("_prev", F.lag("turn_idx").over(w)).withColumn(
        "_new_grp",
        F.when(
            F.col("_prev").isNull()
            | ((F.col("turn_idx") - F.col("_prev")) > threshold),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    grouped = gaps.withColumn(
        "_grp", F.sum("_new_grp").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # doc_id of the best-scoring member: max on (score, -doc_id) then negate
    best = (
        grouped.groupBy("conv_id", "_grp")
        .agg(
            F.min("turn_idx").alias("turn_lo"),
            F.max("turn_idx").alias("turn_hi"),
            F.count("*").alias("n_turns"),
            F.max("score").alias("score"),
            F.max(F.struct(F.col("score"), (-F.col("doc_id")).alias("neg"))).alias(
                "_best"
            ),
            F.concat_ws(
                "\n", F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
                .getField("text")
            ).alias("text"),
        )
        .withColumn("doc_id", -F.col("_best.neg"))
        .drop("_best", "_grp")
    )
    return best.orderBy(F.desc("score"), F.asc("doc_id"))
