"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure DataFrame expressions (JVM-side, whole-stage codegen;
no Python in the hot path) so they survive a 100x scale-up: each is a single
narrow projection over the scan — no shuffle, no UDF, filters/pruning push
down to parquet.

Reference analogs: token counting ~ probe's search_tokens.rs budget counter;
quality heuristics are the training-pipeline extension required by the build
brief (no reference analog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# A small English stopword core (subset of the probe list that matters for
# ratio features; kept tiny so the SQL oracle can inline it verbatim).
QUALITY_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "has",
    "in", "is", "it", "of", "on", "or", "that", "the", "to", "was", "with",
)

# BPE-ish pretokenizer: letter runs | digit runs | single non-alnum non-space
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

FP_MOD = 2147483647  # 2^31 - 1
FP_MUL = 31


def _words(text_col: Column) -> Column:
    return F.split(text_col, " ")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts per row (narrow projection)."""
    t = F.col(text_col)
    return df.withColumn(
        "ws_tokens", F.size(_words(t))
    ).withColumn("bpe_tokens", F.regexp_count(t, F.lit(BPE_REGEX)))


def bpe_count_np(strs: "list[str]"):
    """Vectorized BPE_REGEX token count over a batch of strings — the
    Arrow-stage twin of ``regexp_count(text, BPE_REGEX)``, bit-identical
    by construction: the pattern ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]``
    counts letter runs + digit runs + every other non-space CHARACTER,
    so the count decomposes into pure codepoint classification and
    run-start detection (one boolean pass over the batch's UTF-32
    codepoints, ``np.add.reduceat`` per string).

    Exists because java.util.regex inside the JVM stage stops scaling
    with executor threads on the bench guest (measured: per-chunk cost
    inflates 4.8x from 2 to 8 threads, insensitive to heap/GC knobs),
    while Arrow python workers are separate processes and scale like the
    build's tokenizer stage (0.897 raw at 2->8).  Equality with the
    regex is fuzz-pinned in tests/test_ops.py."""
    import numpy as np  # noqa: PLC0415

    n = len(strs)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    bufs = [s.encode("utf-32-le") for s in strs]
    lens = np.fromiter((len(b) >> 2 for b in bufs), np.int64, n)
    cp = np.frombuffer(b"".join(bufs), dtype=np.uint32)
    if cp.size == 0:
        return out
    is_letter = ((cp >= 65) & (cp <= 90)) | ((cp >= 97) & (cp <= 122))
    is_digit = (cp >= 48) & (cp <= 57)
    is_other = ~(is_letter | is_digit | (cp == 32))
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    prev_letter = np.empty_like(is_letter)
    prev_letter[0] = False
    prev_letter[1:] = is_letter[:-1]
    prev_digit = np.empty_like(is_digit)
    prev_digit[0] = False
    prev_digit[1:] = is_digit[:-1]
    bound = np.zeros(cp.size, dtype=bool)
    bound[starts[lens > 0]] = True
    tok = (
        (is_letter & (~prev_letter | bound))
        | (is_digit & (~prev_digit | bound))
        | is_other
    )
    nz = lens > 0
    if nz.any():
        # reduceat on the uint8 view with an explicit accumulator dtype:
        # no 8x-wider materialized copy (astype to int64 measured ~2s per
        # 44M chars on the bench guest — allocation, not compute)
        out[nz] = np.add.reduceat(
            tok.view(np.uint8), starts[nz], dtype=np.int64
        )
    return out


def bpe_tokens_vectorized(col: Column) -> Column:
    """``bpe_count_np`` as an Arrow-batched pandas UDF column — same
    values as ``F.regexp_count(col, BPE_REGEX)``, including NULL in ->
    NULL out (regexp_count propagates null; so does this).

    Ships the package zip to executors at construction (same mechanism
    as the engine/builder ctors): the worker-side import must work in a
    bare library session regardless of cwd."""
    from pyspark.sql import SparkSession  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    spark = SparkSession.getActiveSession()
    if spark is not None:
        from probe_spark.runtime import (  # noqa: PLC0415
            ensure_package_on_executors,
        )

        ensure_package_on_executors(spark)

    @pandas_udf("long")
    def _count(s):
        import pandas as pd  # noqa: PLC0415

        from probe_spark.ops.text import bpe_count_np  # noqa: PLC0415

        counts = bpe_count_np(["" if x is None else x for x in s])
        out = pd.Series(counts, dtype="Int64")
        mask = s.isna()
        if mask.any():
            out[mask.to_numpy()] = pd.NA
        return out

    return _count(col)


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features + a composite score in [0, ~1].

    Features mirror standard pretraining-corpus filters (length, mean word
    length, stopword ratio, alpha ratio); the composite is a fixed affine
    combination so thresholds are reproducible.
    """
    t = F.col(text_col)
    words = _words(t)
    n_chars = F.length(t)
    n_words = F.size(words)
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*QUALITY_STOPWORDS))
    )
    alpha_chars = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    mean_wlen = (n_chars - (n_words - F.lit(1))) / n_words.cast("double")
    stop_ratio = stop_hits / n_words.cast("double")
    alpha_ratio = alpha_chars / n_chars.cast("double")
    score = (
        F.least(n_words / F.lit(64.0), F.lit(1.0)) * 0.25
        + F.least(mean_wlen / F.lit(8.0), F.lit(1.0)) * 0.25
        + stop_ratio * 0.25
        + alpha_ratio * 0.25
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_wlen, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive 31-bit polynomial rolling hash over the word sequence.

    fp = fold(words, 0, (acc, w) -> (acc*31 + len(w)*131 + ascii(w[0])) % (2^31-1))

    Deterministic, engine-agnostic (pure integer arithmetic — the DuckDB
    oracle reproduces it bit-for-bit), and cheap: one pass per row inside
    codegen via ``F.aggregate``; no shuffle.
    """
    words = _words(F.col(text_col))
    vals = F.transform(
        words,
        lambda w: (F.length(w) * F.lit(131) + F.ascii(w)).cast("long"),
    )
    fp = F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(FP_MUL) + x, F.lit(FP_MOD)),
    )
    return df.withColumn("fingerprint", fp)


# --- language identification (n-gram heuristic) ----------------------------

# Tiny per-language marker profiles: highly characteristic character n-grams
# and function words.  This is the classic "stopword/ngram voting" heuristic
# (a real deployment would swap in fastText/CLD3 weights via the same plumbing).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "of", "to", "is", "that", "with"),
    "de": ("der", "die", "und", "das", "ein", "ich", "sch", "nicht"),
    "fr": ("le", "la", "les", "des", "est", "que", "une", "dans"),
    "es": ("el", "la", "los", "que", "una", "por", "con", "ción"),
    "ru": ("и", "не", "на", "что", "это", "как", "по"),
    "zh": ("的", "是", "不", "了", "在", "我", "有"),
    "ja": ("の", "に", "は", "を", "た", "です", "ます"),
}


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-voting language ID: score(lang) = #profile markers found as
    substrings; predicted = argmax (ties broken by language code asc, 'und'
    if no marker fires).  Pure Column expressions — vectorized, no UDF.
    """
    t = F.lower(F.col(text_col))
    scores = []
    for lang, markers in LANG_PROFILES.items():
        s = None
        for m in markers:
            hit = F.when(F.contains(t, F.lit(m)), 1).otherwise(0)
            s = hit if s is None else s + hit
        scores.append(
            F.struct((-s).cast("int").alias("neg"), F.lit(lang).alias("lang"))
        )
    best = F.array_sort(F.array(*scores))[0]
    return df.withColumn(
        "lang_pred",
        F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("lang_score", -best["neg"])


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping whitespace-token windows — the
    context-window preparation step of an LLM training pipeline (long
    transcripts/documents become fixed-size training examples with
    ``window - stride`` tokens of overlap).

    Semantics: a chunk starts at every ``stride`` token offset below the
    document's token count (null documents produce no chunks; "" splits
    to one empty token -> one empty chunk, matching SQL string_split);
    the last chunk may be shorter than ``window``.  Output one row per
    chunk: (id, chunk_idx, chunk_start, n_words, chunk_text).

    Scale shape: pure Column expressions (split -> posexplode(sequence)
    -> slice/array_join) — one row-expanding projection over the scan,
    whole-stage codegen, no shuffle, no UDF; expansion factor is
    ~n_tokens/stride, exactly the output size, so there is nothing to
    prune.  At 10^12 turns this runs as a map-only stage writing straight
    to the training-shard sink.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    words = F.split(F.col(text_col), " ")
    # sequence is inclusive; size-1 keeps every start < n_tokens
    starts = F.sequence(
        F.lit(0), F.size(F.col("_ws")) - 1, F.lit(stride)
    )
    exploded = (
        df.select(F.col(id_col), words.alias("_ws"))
        .filter(F.size(F.col("_ws")) > 0)
        .select(
            id_col,
            F.col("_ws"),
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
    )
    sliced = F.slice(F.col("_ws"), F.col("chunk_start") + 1, window)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.col("chunk_start"),
        F.size(sliced).alias("n_words"),
        F.array_join(sliced, " ").alias("chunk_text"),
    )
