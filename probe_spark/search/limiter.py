"""Result limits: max_results / max_bytes / max_tokens budgets.

Reference semantics (src/search/search_limiter.rs:22-226): results sorted
by rank, then greedily accepted while the running byte and token totals
stay under budget; rejected-by-budget results are reported as skipped.
The reference lazily estimates tokens as bytes/4 and switches to exact
tiktoken p50k_base counting near the budget (:151-156) because tiktoken is
slow per row; here token counting is a vectorized JVM-side expression (the
BPE-ish regex split used across the ops layer), so every row is counted
exactly — a documented simplification with identical accept/reject
semantics under the exact counter.

Spark-first: a running-total window over the rank order + filter.  Intended
post-top-k (the window orders the already-limited result set); on unlimited
result sets the single-partition window is the documented cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

try:  # exact reference counter when the public package is present
    import tiktoken as _tiktoken

    _P50K = _tiktoken.get_encoding("p50k_base")
except Exception:  # pragma: no cover - tiktoken not in this container
    _tiktoken = None
    _P50K = None


def active_counter() -> str:
    """Which token counter ``token_count_col`` will use, in the same
    priority order it probes: ``"tiktoken"`` (installed package, exact
    p50k), ``"env_ranks"`` ($PROBE_SPARK_TIKTOKEN_RANKS file),
    ``"builtin"`` (vendored trained table — real BPE, stand-in
    vocabulary), or ``"regex"`` (piece-count fallback).  Token budgets
    differ across these; surface this when diagnosing why the same
    --max-tokens accepts different result sets on two deployments."""
    if _P50K is not None:
        return "tiktoken"
    import os

    from probe_spark.functions import bpe as _bpe

    path = os.environ.get(_bpe.RANKS_ENV)
    if path and os.path.exists(path):
        try:
            _bpe.ranks_from(path)
            return "env_ranks"
        except Exception:
            pass
    try:
        _bpe.builtin_ranks()
        return "builtin"
    except Exception:
        return "regex"


_COUNTER_LOGGED = False


def _log_counter_once() -> None:
    global _COUNTER_LOGGED
    if _COUNTER_LOGGED:
        return
    _COUNTER_LOGGED = True
    import logging

    logging.getLogger("probe_spark").info(
        "token budget counter: %s", active_counter()
    )


def token_count_col(col):
    """Vectorized token count — exact p50k_base BPE when possible
    (search_tokens.rs:331-366), in priority order:

    1. the public ``tiktoken`` package (Arrow-batched pandas UDF);
    2. the from-scratch byte-level BPE encoder (``functions/bpe.py``)
       with ``$PROBE_SPARK_TIKTOKEN_RANKS`` (a standard
       ``p50k_base.tiktoken`` ranks file — exact p50k counts, no
       package) or, by DEFAULT, the vendored deterministic table
       (``bpe.builtin_ranks`` — the real merge loop, pinned stand-in
       vocabulary);
    3. the BPE-ish regex piece count — reached only if the vendored
       table itself cannot load (identical accept/reject semantics
       under whichever counter is active).

    The active counter is reported once at INFO on the ``probe_spark``
    logger and queryable via :func:`active_counter`."""
    _log_counter_once()
    if _P50K is not None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _count(s):
            import pandas as pd

            enc = _P50K
            return pd.Series(
                [len(enc.encode(x)) if x else 0 for x in s],
                dtype="int64",
            )

        return _count(col)
    import os

    from probe_spark.functions import bpe as _bpe

    try:
        _bpe.default_ranks()  # driver-side probe: file/blob must parse
        ranks_path = os.environ.get(_bpe.RANKS_ENV)
        if ranks_path and not os.path.exists(ranks_path):
            ranks_path = None

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _count_bpe(s):
            import functools

            import pandas as pd

            from probe_spark.functions import bpe

            ranks = (
                bpe.ranks_from(ranks_path)
                if ranks_path
                else bpe.builtin_ranks()
            )
            count = functools.lru_cache(maxsize=65536)(
                lambda x: bpe.count_tokens(x, ranks)
            )
            return pd.Series(
                [count(x) if x else 0 for x in s], dtype="int64"
            )

        return _count_bpe(col)
    except Exception:
        pass
    from probe_spark.ops.text import BPE_REGEX

    return F.regexp_count(col, F.lit(BPE_REGEX))


def apply_limits(
    results: DataFrame,
    max_results: int | None = None,
    max_bytes: int | None = None,
    max_tokens: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Greedy rank-order budget acceptance.

    Adds _bytes/_tokens running totals internally; returns the accepted
    rows (original schema) in rank order.  A row is accepted iff ALL
    budgets hold after including it — matching the reference's greedy
    loop, which stops adding once a budget would overflow (overflowing
    rows become skipped_files, search_limiter.rs:44-72).
    """
    out = results
    order = [F.desc("score"), F.asc("doc_id")]
    w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("_rank", F.row_number().over(Window.orderBy(*order)))
    if max_results is not None:
        out = out.filter(F.col("_rank") <= max_results)
    if max_bytes is not None:
        out = out.withColumn(
            "_cum_bytes",
            F.sum(F.octet_length(F.coalesce(F.col(text_col), F.lit("")))).over(w),
        ).filter(F.col("_cum_bytes") <= max_bytes)
    if max_tokens is not None:
        out = out.withColumn(
            "_cum_tokens",
            F.sum(token_count_col(F.coalesce(F.col(text_col), F.lit("")))).over(w),
        ).filter(F.col("_cum_tokens") <= max_tokens)
    return out.drop("_rank", "_cum_bytes", "_cum_tokens")
