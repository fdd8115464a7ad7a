"""Corpus-curation operators for large-scale pretraining-data pipelines.

The reference (buger/probe) is a search tool, not a data-prep system; these
operators are the training-data-pipeline extension the build brief requires
(eval decontamination, source mixing, PII scrubbing, quota selection) —
the steps between "raw 100 TB crawl" and "training-ready corpus" that ride
the same tables and engine as the search side.

Every operator is DataFrame-native (pure Column expressions / joins; no
per-row Python) and its scale shape is stated in the docstring.  Hashing
is md5-based and engine-agnostic so a DuckDB oracle reproduces every
decision bit-for-bit (same trick as ops/dedup.py's MinHash family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from probe_spark.ops.dedup import word_shingles
from probe_spark.ops.text import with_quality

# PII patterns kept to the regex subset with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs.  Counting
# happens on the ORIGINAL text; replacement is chained in a fixed order
# (the placeholders contain no digits/@, so later patterns cannot match
# inside an earlier replacement).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)

_HASH_DENOM = float(1 << 32)


def hash_frac(col: Column, salt: int = 0) -> Column:
    """Deterministic uniform [0, 1) from md5 — engine-agnostic (the DuckDB
    mirror is ``('0x' || substr(md5('<salt>|' || x), 1, 8))::BIGINT``).
    Used for reproducible sampling decisions that survive re-runs,
    repartitioning, and engine swaps (no rand(), no Spark-private hash)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(salt)), col.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    return h / F.lit(_HASH_DENOM)


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Eval-set contamination report: ``(doc_id, n_contaminated)`` — the
    number of distinct word ``k``-grams each training doc shares with the
    eval benchmark.  Docs with no overlap are absent (drop them with
    ``drop_contaminated``).

    Scale shape (100 TB corpus, benchmark-scale eval set): the eval
    shingle set is tiny (an eval suite is MBs, not TBs) -> broadcast; the
    corpus side is a narrow projection + explode of RAW shingles (no
    pre-distinct — that would shuffle every corpus shingle), map-side
    filtered by the broadcast hash join, then a countDistinct groupBy(doc)
    whose shuffle input is only the *matching* shingles — contamination
    traffic, not corpus traffic.  Pinned by
    tests/test_plans.py::TestCurationPlans.
    """
    doc_sh = word_shingles(docs, text_col, id_col, k, distinct=False)
    eval_sh = (
        word_shingles(eval_docs, text_col, id_col, k)
        .select("shingle")
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy(F.col("id").alias(id_col))
        .agg(F.countDistinct("shingle").alias("n_contaminated"))
    )


def drop_contaminated(
    docs: DataFrame,
    report: DataFrame,
    id_col: str = "doc_id",
    min_hits: int = 1,
) -> DataFrame:
    """Remove docs the report flags with >= ``min_hits`` shared n-grams
    (left_anti join; the report is contamination-scale, typically
    broadcastable)."""
    flagged = report.filter(F.col("n_contaminated") >= min_hits).select(
        id_col
    )
    return docs.join(F.broadcast(flagged), id_col, "left_anti")


def mix_sources(
    docs: DataFrame,
    weights: dict[str, float],
    default_weight: float = 0.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted source mixing (the data-mixture step of a
    pretraining run): weight w < 1 downsamples a source to rate w; w > 1
    upsamples (floor(w) full copies + the fractional remainder hashed in),
    emitting an ``epoch`` column (0-based copy index) so downstream
    shuffling can interleave copies.

    Map-only: the keep/repeat decision is a pure expression on
    (source, md5(doc_id)) — no shuffle, no rand(), reproducible under
    retries and repartitioning, and the filter pushes down past column
    pruning.  At 100 TB this is THE shape that works: mixture changes are
    a re-run of a filter, not a rewrite of the corpus.
    """
    rate = None
    for s, w in sorted(weights.items()):
        cond = F.col(source_col) == s
        rate = (
            F.when(cond, F.lit(float(w)))
            if rate is None
            else rate.when(cond, F.lit(float(w)))
        )
    rate_col = (
        rate.otherwise(F.lit(float(default_weight)))
        if rate is not None
        else F.lit(float(default_weight))
    )
    frac = hash_frac(F.col(id_col), salt)
    n_copies = F.floor(rate_col).cast("int") + F.when(
        frac < rate_col - F.floor(rate_col), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        docs.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - F.lit(1))),
        )
        .drop("_n_copies")
    )


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrub: per-category match counts (on the original text) plus the
    redacted text (placeholders substituted in the fixed PII_PATTERNS
    order).  Pure ``regexp_count``/``regexp_replace`` codegen — a narrow
    map-only projection, no UDF, no shuffle."""
    t = F.col(text_col)
    out = docs
    for name, pat, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(t, F.lit(pat)).cast("int")
        )
    red = t
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return out.withColumn("text_redacted", red)


def select_quota(
    docs: DataFrame,
    n_per_source: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source quality quota: keep the ``n_per_source`` highest-quality
    docs of each source (rank by the 6-dp-rounded quality score desc, id
    asc — fully deterministic, oracle-reproducible).

    One shuffle (window partitioned by source).  Skew note: at 100 TB a
    mega-source would hot-spot its window partition; the standard fix is a
    two-phase rank (per (source, salt) pre-rank keeping n, then a final
    per-source rank over the <= n * n_salts survivors) — unnecessary at
    bench scale, noted for the cluster profile.
    """
    scored = with_quality(docs, text_col=text_col).withColumn(
        "_q", F.round(F.col("quality_score"), 6)
    )
    w = Window.partitionBy(source_col).orderBy(
        F.col("_q").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank_in_source", F.row_number().over(w))
        .filter(F.col("rank_in_source") <= n_per_source)
        .select(
            id_col,
            source_col,
            F.col("_q").alias("quality_score"),
            "rank_in_source",
        )
    )


def with_repetition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/MassiveText-style repetition features per doc:

      * ``distinct_word_ratio``  = |distinct words| / |words|
      * ``top_word_fraction``    = occurrences of the most frequent word
                                   / |words|
      * ``top_bigram_fraction``  = occurrences of the most frequent word
                                   bigram / |bigrams| (0.0 if < 2 words)

    Boilerplate and looped generations score high on the top-* fractions
    and low on distinct ratio; the standard prune is a threshold AND.

    All three are per-row folds over the sorted token array
    (``array_sort`` + ``aggregate`` run-length scan — O(n log n) per row,
    whole-stage codegen, no shuffle, no UDF), so the operator stays a
    narrow projection at any corpus size.
    """
    words = F.split(F.col(text_col), " ")

    def _max_run(arr: Column) -> Column:
        # longest run in the sorted array == max multiplicity
        def merge(a: Column, w: Column) -> Column:
            run = F.when(w == a.prev, a.run + F.lit(1)).otherwise(F.lit(1))
            return F.struct(
                w.alias("prev"),
                run.alias("run"),
                F.greatest(a.best, run).alias("best"),
            )

        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )
        return F.aggregate(
            F.array_sort(arr), init, merge, lambda a: a.best
        )

    n_words = F.size(words)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(n_words - F.lit(2), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + F.lit(1), 2)),
    )
    n_bigrams = n_words - F.lit(1)
    return (
        df.withColumn(
            "distinct_word_ratio",
            F.round(
                F.size(F.array_distinct(words)) / n_words.cast("double"), 6
            ),
        )
        .withColumn(
            "top_word_fraction",
            F.round(_max_run(words) / n_words.cast("double"), 6),
        )
        .withColumn(
            "top_bigram_fraction",
            F.when(n_bigrams < 1, F.lit(0.0)).otherwise(
                F.round(_max_run(bigrams) / n_bigrams.cast("double"), 6)
            ),
        )
    )


def corpus_profile(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Dataset-card profile per source: doc count, whitespace-token sum,
    char stats, language spread.  ONE groupBy(source) shuffle with map-side
    partial aggregation; every input column is pruned to the four used."""
    t = F.col(text_col)
    return (
        docs.select(
            source_col,
            lang_col,
            F.length(t).alias("_nc"),
            F.size(F.split(t, " ")).alias("_nw"),
        )
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nw").alias("total_words"),
            F.min("_nc").alias("min_chars"),
            F.max("_nc").alias("max_chars"),
            F.round(F.avg("_nc"), 6).alias("avg_chars"),
            F.countDistinct(lang_col).alias("n_langs"),
        )
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Count-based bigram language model from the corpus itself (the
    CCNet-style quality signal without an external model): returns
    ``(bigram_counts(w1, w2, c2), unigram_counts(w1, c1), vocab_size)``.

    Two groupBy aggregations with map-side partial counts — the same
    shape as the index build's DF aggregation; hot words are just hot
    aggregation keys (combiner absorbs them map-side)."""
    words = F.split(F.col(text_col), " ")
    pairs = docs.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size(words) - F.lit(2), F.lit(0))
                ),
                lambda i: F.struct(
                    F.try_element_at(words, i + F.lit(1)).alias("w1"),
                    F.try_element_at(words, i + F.lit(2)).alias("w2"),
                ),
            )
        ).alias("p")
    ).filter(F.col("p.w2").isNotNull())
    bi = pairs.groupBy(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    ).agg(F.count("*").alias("c2"))
    uni = (
        docs.select(F.explode(words).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.count()
    return bi, uni, int(vocab)


def with_perplexity(
    docs: DataFrame,
    bigram_lm: DataFrame,
    unigram_lm: DataFrame,
    vocab_size: int,
    k_smooth: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc bigram perplexity under an add-k-smoothed count LM:
    ``ppl = exp(-mean ln P(w2|w1))`` with
    ``P(w2|w1) = (c(w1,w2)+k) / (c(w1)+k*V)``.  High perplexity = text
    unlike the (presumably clean) LM training corpus — the standard
    CCNet-style pretraining filter, here with an exactly reproducible
    count model instead of an opaque one.

    Shape: doc bigrams explode map-side, join the aggregated LM tables on
    their keys (plain hash joins — the LM is count-aggregated, so the
    join input is vocab-sized, not corpus-sized), one groupBy(doc) for
    the mean.  Docs with < 2 words get ppl NULL.  Like every other
    ``with_*`` operator, the result is the INPUT plus a ``ppl`` column —
    downstream filters keep text/source without re-joining the corpus."""
    words = F.split(F.col(text_col), " ")
    pairs = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size(words) - F.lit(2), F.lit(0))
                ),
                lambda i: F.struct(
                    F.try_element_at(words, i + F.lit(1)).alias("w1"),
                    F.try_element_at(words, i + F.lit(2)).alias("w2"),
                ),
            )
        ).alias("p"),
        F.size(words).alias("_nw"),
    ).filter((F.col("_nw") >= 2) & F.col("p.w2").isNotNull())
    k = float(k_smooth)
    joined = (
        pairs.select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .join(bigram_lm, ["w1", "w2"], "left")
        .join(unigram_lm, ["w1"], "left")
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
                / (
                    F.coalesce(F.col("c1"), F.lit(0))
                    + F.lit(k * vocab_size)
                )
            ).alias("_lp"),
        )
    )
    ppl = joined.groupBy(id_col).agg(
        F.round(F.exp(-F.avg("_lp")), 6).alias("ppl")
    )
    return docs.join(ppl, id_col, "left")
