"""Deduplication operators for training-data pipelines.

Four tiers, all DataFrame-native (no per-row Python anywhere):

  * exact          — md5(text) groupBy; one shuffle on the hash, map-side
                     partial agg; at 100 TB the md5 key is uniform so no skew.
  * ngram Jaccard  — word-shingle inverted candidate join (pairs share >= 1
                     shingle) + exact Jaccard; the candidate join is the
                     standard "prefix/posting" trick — frequency-capped
                     shingles bound the fanout so a stopword shingle can't
                     produce a quadratic pair explosion.
  * MinHash + LSH  — md5-based minhash signatures, banded; only docs sharing
                     a band key are paired.  Hash family is md5(i || shingle)
                     (engine-agnostic: the DuckDB oracle reproduces it
                     bit-for-bit, no Spark-private hash).
  * SimHash        — 64-bit sign-aggregated shingle hashes; near-dups =
                     Hamming distance <= k via band-rotation join.

Scale notes (100 TB): every tier is (narrow shingle projection) ->
(groupBy/join on a hashed key).  The only skew risk is hot shingles; both
Jaccard and LSH cap per-key fanout (``max_shingle_df``) which is the
documented trade: a shingle occurring in more than that many docs carries ~no
signal and is dropped from *candidate generation* (never from the exact
verify step, which rechecks true Jaccard on candidate pairs only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(text_md5, keep_doc_id, dup_count): canonical representative = min id."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


def word_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """Word k-shingles per doc: (id, shingle), deduped per doc by default.
    Narrow + explode; ``distinct=False`` keeps the raw stream (map-only —
    curation.decontaminate filters through a broadcast join BEFORE any
    shuffle, so pre-dedup there would cost a corpus-scale exchange)."""
    words = F.split(F.col(text_col), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - F.lit(k), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + F.lit(1), k)),
    )
    out = df.select(
        F.col(id_col).alias("id"), F.explode(sh).alias("shingle")
    ).filter(F.length("shingle") > 0)
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    candidate = pairs sharing >= 1 non-hot shingle; exact |A∩B| = non-hot
    overlap (from the candidate join) + hot overlap (recounted per
    candidate pair — a pair-list-bounded join, so hot shingles still can't
    explode candidate generation); |A∪B| = n_a + n_b - |A∩B| over *all*
    shingles.  Jaccard is therefore exact for every emitted pair.
    """
    sh = word_shingles(df, text_col, id_col, k).persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_shingle_df)
        .select("shingle")
    )
    cand_sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    inter_nonhot = (
        cand_sh.alias("a")
        .join(cand_sh.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common_nonhot"))
    )
    # hot-shingle overlap per CANDIDATE pair: joins are bounded by
    # |candidates| x (hot shingles per doc), never df(hot)^2
    hot_sh = sh.join(F.broadcast(hot), "shingle")
    hot_common = (
        inter_nonhot.select("id_a", "id_b")
        .join(hot_sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(
            hot_sh.select(F.col("id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common_hot"))
    )
    inter = (
        inter_nonhot.join(hot_common, ["id_a", "id_b"], "left")
        .withColumn(
            "n_common",
            F.col("n_common_nonhot")
            + F.coalesce(F.col("n_common_hot"), F.lit(0)),
        )
        .drop("n_common_nonhot", "n_common_hot")
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # caller-lifetime-bound persist: the plan references the shingle set
    # four times, so it stays cached while the RESULT DataFrame is alive
    # and unpersists when the caller drops it (no module-global leak).
    # Cache-only lifetime, never correctness: a caller that derives a new
    # plan and drops this handle before executing (e.g.
    # `ngram_jaccard_pairs(df).filter(...).collect()`) loses the caching
    # and recomputes the shingles — hold the returned DataFrame across
    # the action to keep the cache.
    import weakref

    weakref.finalize(out, _safe_unpersist, sh)
    return out


def _safe_unpersist(df: DataFrame) -> None:
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # session already stopped


def minhash_signatures(
    sh: DataFrame, n_hashes: int = 8
) -> DataFrame:
    """(id, sig_0..sig_{n-1}): sig_i = min(md5(i || '|' || shingle)).

    md5-based hash family — deterministic and portable across engines.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
    max_band_df: int = 2000,
) -> DataFrame:
    """Candidate near-dup pairs from banded MinHash (id_a < id_b, distinct).

    bands = n_hashes / band_size; two docs pair iff some band agrees on all
    its rows.  ``max_band_df`` caps degenerate band buckets (all-identical
    boilerplate) exactly like hot-shingle capping above.
    """
    sh = word_shingles(df, text_col, id_col, k)
    sig = minhash_signatures(sh, n_hashes)
    n_bands = n_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"sig_{b * band_size + r}") for r in range(band_size)]
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    keyed = sig.select("id", F.explode(bands).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    counts = keyed.groupBy("band", "key").agg(F.count("*").alias("c"))
    keyed = keyed.join(
        F.broadcast(counts.filter(F.col("c") > max_band_df)), ["band", "key"], "left_anti"
    )
    pairs = (
        keyed.alias("a")
        .join(keyed.alias("b"), ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components over near-dup pairs: (id, cluster_id), cluster_id
    = the minimum id in the component.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) — converges in O(log n)
    rounds *independent of graph diameter*, which is the property that
    matters at 10^9-node dedup graphs where chained near-dups
    (A~B~C~...~Z) make naive label propagation O(diameter) rounds.  Each
    round is two groupBy(node) shuffles over the current edge set, and the
    edge set monotonically contracts toward the final star forest.  Skewed
    hubs (one boilerplate doc near-dup to millions) are what large-star is
    for: it re-points the hub's neighbors at the component minimum instead
    of re-pairing them with the hub, so no single reducer ever re-emits a
    hub's full adjacency more than O(log n) times.

    Per-round lineage is truncated with ``localCheckpoint`` (plan depth
    would otherwise grow linearly and re-execute from the source on every
    convergence probe).  On a multi-executor cluster prefer
    ``sc.setCheckpointDir`` + ``.checkpoint()`` if executor loss during the
    (short) loop must be survivable; the loop is idempotent either way.

    ``nodes`` (optional, single column ``id``): universe of ids — ids that
    never appear in ``pairs`` come back as their own singleton cluster.
    """
    e = (
        pairs.select(
            F.col(id_a).cast("long").alias("u"),
            F.col(id_b).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev_sig = None
    for _ in range(max_rounds):
        # large-star: per node u over the symmetrized adjacency, point every
        # LARGER neighbor at m = min(neighbors ∪ {u})
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("u", "mv").alias("m"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: orient edges high->low, point every node (and the
        # center) at the minimum of its <=-neighborhood
        oriented = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            oriented.join(mins2, "u")
            .select(F.col("v").alias("n"), F.col("m"))
            .union(mins2.select(F.col("u").alias("n"), F.col("m")))
            .filter(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        new_e = ss.localCheckpoint()
        sig = new_e.agg(
            F.count("*").alias("n"),
            # decimal(38) accumulator: a sum of 64-bit hashes overflows long
            # under ANSI mode
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        e = new_e
        if prev_sig is not None and tuple(sig) == tuple(prev_sig):
            break  # star forest reached: every edge is (node, component_min)
        prev_sig = sig
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("cluster_id")).union(
        e.select(F.col("v").alias("id"), F.col("v").alias("cluster_id")).distinct()
    )
    if nodes is not None:
        all_ids = nodes.select(F.col("id").cast("long").alias("id")).distinct()
        labels = (
            all_ids.join(labels, "id", "left")
            .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
        )
    return labels


def cluster_survivors(
    quality: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality_score",
) -> DataFrame:
    """(cluster_id, keep_doc_id, n_members): one survivor per duplicate
    cluster — the member with the highest quality score, ties broken by the
    smallest id.  ``quality``: (id_col, quality_col); ``clusters``:
    (id, cluster_id) from :func:`duplicate_clusters`.

    Scale: argmax is an algebraic aggregate (max of a (score, -id) struct),
    so a giant cluster still map-side-combines — no per-cluster row
    materialization, one shuffle on cluster_id.
    """
    j = clusters.join(
        quality.select(
            F.col(id_col).cast("long").alias("id"), F.col(quality_col).alias("_q")
        ),
        "id",
    )
    return (
        j.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.max(F.struct(F.col("_q").alias("q"), (-F.col("id")).alias("neg_id"))).alias("b"),
        )
        .select(
            "cluster_id",
            (-F.col("b.neg_id")).alias("keep_doc_id"),
            "n_members",
        )
    )


def simhash_64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, simhash): 64-bit SimHash over word k-shingles.

    bit_j(doc) = 1 iff sum over shingles of (+1 if bit_j(h(shingle)) else -1) > 0,
    h = first 16 hex chars of md5 (portable).  Vote accumulation is a single
    groupBy(id) over 64 conditional sums — one shuffle, map-side combine.
    """
    sh = word_shingles(df, text_col, id_col, k)
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 16), 16, 10).cast("decimal(20,0)")
    # decimal -> long may overflow sign; use two 32-bit halves
    hi = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5(F.col("shingle")), 9, 8), 16, 10).cast("long")
    _ = h
    with_bits = sh.select(
        "id",
        *[
            (
                F.when(((hi if j >= 32 else lo).bitwiseAND(F.lit(1 << (j % 32)))) != 0, 1)
                .otherwise(-1)
                .alias(f"b{j}")
            )
            for j in range(64)
        ],
    )
    votes = with_bits.groupBy("id").agg(
        *[F.sum(f"b{j}").alias(f"v{j}") for j in range(64)]
    )
    # assemble: bits 0..62 into a long; bit 63 kept separate to avoid sign
    sim = F.lit(0).cast("long")
    for j in range(63):
        sim = sim + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(0).cast("long")
    out = votes.select(
        "id",
        sim.alias("simhash_lo63"),
        F.when(F.col("v63") > 0, 1).otherwise(0).alias("simhash_top_bit"),
    )
    return out
