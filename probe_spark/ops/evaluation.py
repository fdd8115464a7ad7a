"""Retrieval-quality evaluation over DataFrames: recall@k, MRR@k, NDCG@k.

The measurement side of a retrieval/mining pipeline: a run (what the
engine returned per query) against a gold set (what should have been
returned) — the nightly-eval companion to ``SearchEngine.search_batch``.
No reference analog (probe ships a bench harness, not an IR-metrics
suite); this is the training/eval-pipeline extension the build brief
requires.

Shapes (100 TB honest): the run is (n_queries x k) rows and the gold set
is eval-scale — both tiny next to the corpus — so the join is a plain
hash join on (query_id, doc_id) and every metric is ONE groupBy(query_id)
with map-side partials.  Nothing here touches the corpus.

Metric definitions (binary relevance):
  recall@k = |retrieved@k ∩ gold| / |gold|
  MRR@k    = 1 / rank of the first relevant hit (0 when none in top k)
  NDCG@k   = DCG@k / IDCG@k with gain 1, discount 1/log2(rank+1)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def retrieval_metrics(
    run: DataFrame,
    gold: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query IR metrics: ``(query_id, n_gold, n_hits, recall, mrr,
    ndcg)``, all rounded to 6 dp.

    ``run``: one row per retrieved doc with a 1-based ``rank`` per query
    (ties already broken — exactly what search/search_batch emit after
    their deterministic ordering).  ``gold``: (query_id, doc_id) relevant
    pairs.  Queries present in ``gold`` but absent from ``run`` score 0;
    run-only queries are dropped (no gold = not evaluable).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # dedupe the run on (qid, did) keeping the best (min) rank: the eval
    # CLI accepts arbitrary run files, and duplicate pairs would count
    # multiple hits/DCG terms — recall could exceed 1.0, NDCG inflate
    r = (
        run.filter(F.col(rank_col) <= k)
        .select(
            F.col(query_col).alias("qid"),
            F.col(doc_col).alias("did"),
            F.col(rank_col).alias("rnk"),
        )
        .groupBy("qid", "did")
        .agg(F.min("rnk").alias("rnk"))
    )
    g = gold.select(
        F.col(query_col).alias("qid"), F.col(doc_col).alias("did")
    ).distinct()
    n_gold = g.groupBy("qid").agg(F.count("*").alias("n_gold"))
    hits = r.join(g, ["qid", "did"])
    per_q = hits.groupBy("qid").agg(
        F.count("*").alias("n_hits"),
        F.min("rnk").alias("first_rank"),
        F.sum(1.0 / F.log2(F.col("rnk") + F.lit(1.0))).alias("dcg"),
    )
    # ideal DCG: gold docs at ranks 1..min(n_gold, k)
    ideal = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_gold"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + F.lit(1.0)),
    )
    return (
        n_gold.join(per_q, "qid", "left")
        .select(
            F.col("qid").alias(query_col),
            "n_gold",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.col("n_gold"), 6
            ).alias("recall"),
            F.round(
                F.coalesce(1.0 / F.col("first_rank"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / ideal, 6
            ).alias("ndcg"),
        )
    )


def summarize_metrics(per_query: DataFrame) -> DataFrame:
    """Macro-average of retrieval_metrics over queries: one summary row
    ``(n_queries, recall, mrr, ndcg)`` (6-dp)."""
    return per_query.agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("mrr"), 6).alias("mrr"),
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
    )
