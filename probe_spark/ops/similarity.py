"""Similarity search over embedding columns (array<float>).

Two paths:

  * brute-force cosine — exact; a narrow projection computing the score via
    ``F.aggregate``/``F.zip_with`` entirely inside codegen (no UDF), then a
    distributed TakeOrderedAndProject top-k.  Per-row cost O(dim); at 100 TB
    this scans everything but shuffles only k rows — the right baseline and
    the verifier for the approximate path.
  * LSH-bucketed (random hyperplanes) — deterministic signed-projection
    buckets; queries probe only their own bucket (and optional neighboring
    probes), cutting the scan by ~2^n_planes.  Plane vectors derive from a
    seeded counter hash (md5 -> uniform in [-1,1]) so driver and executors
    agree without shipping state.
  * IVF-flat (coarse quantizer cells) — every vector is assigned to its
    nearest of n_cells centroid directions (argmax dot); queries scan only
    the n_probe closest cells.  The quantizer has two sources: the default
    seeded-deterministic directions (which an independent SQL oracle can
    reproduce — the driver contract entry pins this path), and a
    k-means-trained quantizer from train_ivf_centroids() (spherical
    Lloyd on a bounded deterministic sample, the standard IVF recipe —
    faiss trains its coarse quantizer on ~1e5-1e6 sampled vectors
    regardless of corpus size).  Trained centroids persist as a
    ``_centroids`` sidecar inside write_ivf_index() output, so queries
    against the index reload the exact training result; every other piece
    of plumbing (partition-by-cell write, probe pruning, fold order) is
    shared between the two sources.

Embedding near-dup (cosine > threshold pairs) composes bucketing with an
exact verify join — the same candidate/verify shape as ops.dedup.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    # cast BEFORE multiplying: float32 products then cast lose ulps vs
    # double-everywhere (the oracle computes s::DOUBLE * s::DOUBLE)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_to_query(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cos_sim) for every row vs a constant query vector — exact,
    codegen-only.  Top-k = .orderBy(desc).limit(k) on the result."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    v = F.col(vec_col)
    cos = _dot(v, q) / (_norm(v) * F.lit(qn))
    return df.select(F.col(id_col).alias("id"), F.round(cos, 6).alias("cos_sim"))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    return (
        cosine_to_query(df, query_vec, vec_col, id_col)
        .orderBy(F.desc("cos_sim"), F.asc("id"))
        .limit(k)
    )


def _seeded_planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """Deterministic hyperplanes from md5(seed, plane, coord) — no RNG state."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            out[p, d] = int(h[:12], 16) / float(1 << 48) * 2.0 - 1.0
    return out


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Add ``bucket`` = sign-bit code of the vector against seeded planes.

    Build side of an ANN index: write partitioned by bucket; a query computes
    its own code driver-side with the same planes and prunes partitions.
    """
    planes = _seeded_planes(dim, n_planes, seed)
    v = F.col(vec_col)
    code = F.lit(0)
    for p in range(n_planes):
        proj = _dot(v, F.array(*[F.lit(float(x)) for x in planes[p]]))
        code = code + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("bucket", code.cast("int"))


def _lsh_probes(
    query_vec: list[float], n_planes: int, seed: int, multiprobe: int
) -> list[int]:
    """Driver-side probe bucket set: the query's own sign-bit code, plus
    (for multiprobe > 0) flipped codes — smallest flip sets first, within a
    size ordered by total flipped margin (likeliest buckets first) — capped
    at exactly 1 + n_planes * multiprobe buckets.

    Projections use the same left-fold accumulation as the executor-side
    F.aggregate so the driver's own-bucket code can't diverge by a
    reassociation ulp (see _left_fold_dot)."""
    import itertools

    planes = _seeded_planes(len(query_vec), n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qcode = 0
    margins = []
    for p in range(n_planes):
        proj = _left_fold_dot(planes[p], qv)
        if proj >= 0:
            qcode |= 1 << p
        margins.append((abs(proj), p))
    probes = [qcode]
    budget = 1 + n_planes * multiprobe
    if multiprobe > 0:
        margins.sort()
        for size in range(1, n_planes + 1):
            if len(probes) >= budget:
                break
            combos = sorted(
                itertools.combinations(margins, size),
                key=lambda c: sum(m for m, _ in c),
            )
            for combo in combos:
                if len(probes) >= budget:
                    break
                mask = 0
                for _, p in combo:
                    mask |= 1 << p
                probes.append(qcode ^ mask)
    return sorted(set(probes))


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only buckets within ``multiprobe`` sign flips
    of the query's bucket (1 + n_planes buckets for multiprobe=1)."""
    probes = _lsh_probes(query_vec, n_planes, seed, multiprobe)
    bucketed = with_lsh_bucket(df, len(query_vec), n_planes, vec_col, seed)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def _seeded_centroids(dim: int, n_cells: int, seed: int = 13) -> np.ndarray:
    """Deterministic coarse-quantizer directions, same scheme as
    _seeded_planes (md5 counter hash -> uniform in [-1,1])."""
    out = np.empty((n_cells, dim), dtype=np.float64)
    for c in range(n_cells):
        for d in range(dim):
            h = hashlib.md5(f"ivf|{seed}|{c}|{d}".encode()).hexdigest()
            out[c, d] = int(h[:12], 16) / float(1 << 48) * 2.0 - 1.0
    return out


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    n_cells: int = 16,
    iters: int = 10,
    sample_size: int = 100_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> np.ndarray:
    """Spherical k-means coarse quantizer on a bounded sample.

    Scale shape: the quantizer trains on a SAMPLE, never the corpus — the
    standard IVF recipe (faiss trains on ~1e5-1e6 vectors whether the
    corpus is 1 GB or 100 TB).  The sample is deterministic without a full
    sort: order by xxhash64(id, seed) and TakeOrdered the first
    sample_size rows (one scan, sample_size * dim floats on the driver).
    Full-corpus assignment stays distributed in with_ivf_cell.

    Lloyd iterations use the assignment rule the executors use (argmax
    dot, ties -> lowest cell index); the update step is mean-then-L2-
    normalize, the exact maximizer of the spherical objective
    sum_i dot(x_i, c_assign(i)) for unit centroids — so the objective is
    monotone non-decreasing from the seeded (normalized) init.  A cell
    that goes empty keeps its previous direction.  Persist the result via
    write_ivf_index(..., centroids=...); queries reload it, so ranking
    never depends on re-running training."""
    sample = (
        df.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(sample_size)
        .collect()
    )
    x = np.asarray([r["v"] for r in sample], dtype=np.float64)
    cents = _seeded_centroids(dim, n_cells, seed)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    if x.size == 0:
        return cents
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cents[c] = v / norm
    return cents


def with_ivf_cell(
    df: DataFrame,
    dim: int,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 13,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """Add ``cell`` = index of the max-dot centroid (ties -> lowest index).

    Build side of an IVF index: write partitioned by cell; queries prune
    to their n_probe nearest cells.  Dot products run inside codegen.
    ``centroids`` (e.g. from train_ivf_centroids) overrides the seeded
    directions; n_cells then follows its row count."""
    cents = _seeded_centroids(dim, n_cells, seed) if centroids is None else centroids
    n_cells = len(cents)
    v = F.col(vec_col)
    dots = F.array(
        *[
            _dot(v, F.array(*[F.lit(float(x)) for x in cents[c]]))
            for c in range(n_cells)
        ]
    )
    return (
        df.withColumn("_ivf_dots", dots)
        .withColumn(
            "cell",
            (
                F.expr("array_position(_ivf_dots, array_max(_ivf_dots))") - 1
            ).cast("int"),
        )
        .drop("_ivf_dots")
    )


def _left_fold_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Strict left-to-right summed dot — the same accumulation order as
    the F.aggregate fold and DuckDB's list_sum, so the driver-side probe
    ranking can't diverge from the plan/oracle by a reassociation ulp."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _ivf_probes(
    query_vec: list[float],
    n_cells: int,
    n_probe: int,
    seed: int,
    centroids: "np.ndarray | None" = None,
) -> list[int]:
    """Driver-side probe cells: the n_probe highest query-centroid dots
    (ties -> lowest cell index), same fold order as the plan/oracle."""
    cents = (
        _seeded_centroids(len(query_vec), n_cells, seed)
        if centroids is None
        else centroids
    )
    n_cells = len(cents)
    qv = np.asarray(query_vec, dtype=np.float64)
    qdots = [_left_fold_dot(cents[c], qv) for c in range(n_cells)]
    order = sorted(range(n_cells), key=lambda c: (-qdots[c], c))
    return sorted(order[:n_probe])


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """Approximate top-k: scan only the n_probe cells whose centroid dot
    with the query is highest (ties -> lowest cell index)."""
    probes = _ivf_probes(query_vec, n_cells, n_probe, seed, centroids)
    cand = with_ivf_cell(
        df, len(query_vec), n_cells, vec_col, seed, centroids
    ).filter(F.col("cell").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def write_lsh_index(
    df: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 7,
) -> None:
    """Materialize an LSH index: the corpus written partitioned by
    ``bucket`` (sign-bit code).  Same scale rationale as write_ivf_index:
    bucketing happens once at build; queries partition-prune to their
    probe buckets."""
    with_lsh_bucket(df, dim, n_planes, vec_col, seed).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)


def lsh_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    multiprobe: int = 1,
) -> DataFrame:
    """Top-k over a write_lsh_index() directory: the driver computes the
    probe bucket set (same plane math as lsh_topk) and ``bucket IN (...)``
    prunes to those directories.  Rank-identical to lsh_topk()."""
    probes = _lsh_probes(query_vec, n_planes, seed, multiprobe)
    cand = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def write_ivf_index(
    df: DataFrame,
    path: str,
    dim: int,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 13,
    centroids: "np.ndarray | None" = None,
) -> None:
    """Materialize an IVF index: the corpus written partitioned by ``cell``.

    At 100 TB this is the point of IVF — cell assignment (n_cells dot
    products per vector) happens ONCE at build; every query then reads only
    its n_probe cell directories via partition pruning, never touching the
    other (n_cells - n_probe)/n_cells of the data and never recomputing
    assignment dots.

    With ``centroids`` (a trained quantizer), the exact values persist to
    a ``_centroids`` sidecar inside the index (underscore-prefixed, so the
    main parquet scan ignores it); ivf_topk_indexed reloads them, making
    the query side independent of the training run."""
    with_ivf_cell(df, dim, n_cells, vec_col, seed, centroids).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    if centroids is not None:
        rows = [(c, [float(v) for v in centroids[c]]) for c in range(len(centroids))]
        df.sparkSession.createDataFrame(
            rows, "cell int, centroid array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(path + "/_centroids")


def _load_ivf_centroids(spark, path: str) -> "np.ndarray | None":
    """Read the trained-quantizer sidecar if the index has one."""
    try:
        rows = spark.read.parquet(path + "/_centroids").collect()
    except Exception:
        return None
    rows.sort(key=lambda r: r["cell"])
    return np.asarray([r["centroid"] for r in rows], dtype=np.float64)


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> DataFrame:
    """Top-k over a write_ivf_index() directory.  The driver picks the
    n_probe cells (from the index's ``_centroids`` sidecar when the
    quantizer was trained, else the seeded directions), and
    ``cell IN (...)`` is a partition filter — the scan lists only those
    directories (PartitionFilters in .explain), so per-query IO is
    n_probe/n_cells of the corpus.  Rank-identical to ivf_topk() on the
    same parameters."""
    centroids = _load_ivf_centroids(spark, path)
    probes = _ivf_probes(query_vec, n_cells, n_probe, seed, centroids)
    cand = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    exact: bool = False,
    seed: int = 7,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine >= threshold.

    The DEFAULT is the LSH-bucketed path (candidates restricted to equal
    sign-bit buckets before the cosine check — the 100 TB shape: recall
    controlled by n_planes, and high-threshold dups almost always share
    all sign bits).  ``exact=True`` (or n_planes=0) opts into the exact
    all-pairs self-join — the verifier / small-scale path a large-corpus
    user must now ask for explicitly rather than stumble into df² work.

    .. note:: BEHAVIOR CHANGE (round 4): the default used to be the exact
       all-pairs join (``n_planes=0``).  Callers that relied on exhaustive
       recall now silently get approximate candidate generation — audit
       call sites and pass ``exact=True`` where missing a true duplicate
       pair is worse than the df² cost.
    """
    if exact:
        n_planes = 0
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("n"),
    )
    if n_planes > 0:
        head = df.select(vec_col).first()
        if head is None or head[0] is None:
            # empty/degenerate input: the exact path below handles it
            # lazily (a self-join over zero rows), no dim needed
            n_planes = 0
    if n_planes > 0:
        dim = len(head[0])
        bucketed = with_lsh_bucket(df, dim, n_planes, vec_col, seed).select(
            F.col(id_col).alias("id"), "bucket"
        )
        base = base.join(bucketed, "id")
        join_cond = (F.col("a.bucket") == F.col("b.bucket")) & (
            F.col("a.id") < F.col("b.id")
        )
    else:
        join_cond = F.col("a.id") < F.col("b.id")
    pairs = (
        base.alias("a")
        .join(base.alias("b"), join_cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    return pairs


def with_ivf_probes(
    queries: DataFrame,
    dim: int,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    seed: int = 13,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """Explode each query row to its ``n_probe`` probe cells.

    Executor-side twin of the driver-side ``_ivf_probes``: centroid dots
    via the same left-fold ``F.aggregate`` accumulation, ranked by
    (dot desc, cell asc) with an ``array_sort`` comparator, top n_probe
    sliced and exploded — so a BATCH of queries computes its probe sets
    in one codegen stage instead of one driver loop per query.  Output:
    the query columns plus ``cell`` (int); a query appears once per
    probe cell."""
    cents = _seeded_centroids(dim, n_cells, seed) if centroids is None else centroids
    n_cells = len(cents)
    v = F.col(vec_col)
    dots = F.array(
        *[
            _dot(v, F.array(*[F.lit(float(x)) for x in cents[c]]))
            for c in range(n_cells)
        ]
    )
    ranked = F.array_sort(
        F.transform(dots, lambda d, i: F.struct(d.alias("d"), i.alias("i"))),
        lambda l, r: (
            F.when(l["d"] > r["d"], F.lit(-1))
            .when(l["d"] < r["d"], F.lit(1))
            .otherwise(l["i"] - r["i"])
        ),
    )
    probe_cells = F.transform(
        F.slice(ranked, 1, n_probe), lambda s: s["i"].cast("int")
    )
    return queries.withColumn("cell", F.explode(probe_cells))


def knn_join(
    queries: DataFrame,
    corpus: "DataFrame | None" = None,
    *,
    spark=None,
    index_path: "str | None" = None,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    q_id_col: str = "query_id",
    seed: int = 13,
    centroids: "np.ndarray | None" = None,
    partial_topk: bool = True,
) -> DataFrame:
    """Batched ANN: top-k neighbors for EVERY query row in ONE job — the
    vector twin of ``SearchEngine.search_batch`` (hard-negative mining,
    embedding-dedup candidate generation, eval-suite retrieval all run
    this shape, not one-vector point lookups).

    Plan (and why it holds at 100 TB):

      1. probe assignment: each query explodes to its n_probe IVF cells
         (``with_ivf_probes``) — one codegen stage over the QUERY batch,
         which is the small side (a mining batch is 1e3-1e6 rows, bounded
         by the caller; chunk the batch if larger).
      2. the union of probed cells (<= n_cells values, metadata-scale
         collect) becomes a literal ``cell IN (...)`` — over a
         ``write_ivf_index`` directory that is a PARTITION filter, so the
         scan lists only the probed cell directories and per-batch IO is
         |union probes|/n_cells of the corpus, never all of it.
      3. candidates ⋈ broadcast(query probes) on cell — the corpus side
         never shuffles: each scanned cell partition map-side joins the
         broadcast query batch (a query meets a candidate exactly once,
         since a candidate lives in exactly one cell).
      4. per-(query, candidate) cosine inside codegen (no UDF), rounded
         to 6 dp BEFORE ranking (ties -> vec_id asc, same rule as every
         other ANN surface here).
      5. top-k: an Arrow-batched per-partition partial top-k first
         (bounded accumulator of Q*k rows per scan partition — the same
         shape search_batch uses for per-range top-k), then one window
         over <= n_partitions*Q*k SLIM rows (query_id, vec_id, cos_sim).
         The full Q * n_probe/n_cells * N candidate set is scored but
         never exchanged; only partial winners cross a shuffle.
         ``partial_topk=False`` skips step 5's Arrow stage and windows
         the raw scored rows — the verifier path (bit-identical result).

    Corpus source: either ``corpus`` (cells computed on the fly) or
    ``index_path`` (a ``write_ivf_index`` directory; trained ``_centroids``
    sidecar honored, partition pruning real).  Returns (query_id, vec_id,
    cos_sim) ordered by (query_id asc, cos_sim desc, vec_id asc).
    """
    if (corpus is None) == (index_path is None):
        raise ValueError("pass exactly one of corpus= or index_path=")
    if index_path is not None:
        if spark is None:
            spark = queries.sparkSession
        trained = _load_ivf_centroids(spark, index_path)
        if trained is not None:
            centroids = trained
        cand_all = spark.read.parquet(index_path)
    else:
        head = queries.select(q_vec_col).first()
        dim = len(head[0]) if head is not None and head[0] is not None else 0
        if dim == 0:
            # empty query batch: nothing to join
            return queries.sparkSession.createDataFrame(
                [], f"{q_id_col} long, {id_col} long, cos_sim double"
            )
        cand_all = with_ivf_cell(corpus, dim, n_cells, vec_col, seed, centroids)

    qhead = queries.select(q_vec_col).first()
    if qhead is None or qhead[0] is None:
        return queries.sparkSession.createDataFrame(
            [], f"{q_id_col} long, {id_col} long, cos_sim double"
        )
    dim = len(qhead[0])

    qv = F.col(q_vec_col)
    qprobes = with_ivf_probes(
        queries.select(
            F.col(q_id_col).alias("_qid"),
            qv.alias("_qv"),
            _norm(qv).alias("_qn"),
        ),
        dim,
        n_cells,
        n_probe,
        vec_col="_qv",
        seed=seed,
        centroids=centroids,
    )

    # union of probed cells: <= n_cells distinct values (metadata-scale
    # collect), becomes a literal IN that partition-prunes an indexed scan
    probed = sorted(
        r["cell"] for r in qprobes.select("cell").distinct().collect()
    )
    if not probed:
        return queries.sparkSession.createDataFrame(
            [], f"{q_id_col} long, {id_col} long, cos_sim double"
        )
    cand = cand_all.filter(F.col("cell").isin([int(c) for c in probed]))

    v = F.col(vec_col)
    scored = (
        cand.select(F.col(id_col).alias("_cid"), v.alias("_cv"), "cell")
        .join(F.broadcast(qprobes), "cell")
        .select(
            F.col("_qid").cast("long").alias(q_id_col),
            F.col("_cid").cast("long").alias(id_col),
            F.round(
                F.try_divide(
                    _dot(F.col("_cv"), F.col("_qv")),
                    _norm(F.col("_cv")) * F.col("_qn"),
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    # zero-norm query or candidate vectors have no cosine: try_divide maps
    # them to NULL (a plain `/` would abort the whole job under ANSI mode);
    # drop them BEFORE ranking so partial_topk's pandas sort (NaN last) and
    # the window path's F.desc (NaN first) agree bit-for-bit
    scored = scored.filter(
        F.col("cos_sim").isNotNull() & ~F.isnan("cos_sim")
    )

    if partial_topk:
        out_schema = f"{q_id_col} long, {id_col} long, cos_sim double"
        sort_cols = [q_id_col, "cos_sim", id_col]

        def _partial(it):
            import pandas as pd  # noqa: PLC0415

            acc = None
            for b in it:
                cur = b if acc is None else pd.concat((acc, b))
                cur = cur.sort_values(
                    sort_cols, ascending=[True, False, True]
                )
                acc = cur.groupby(q_id_col, sort=False).head(k)
            if acc is not None and len(acc):
                yield acc

        scored = scored.mapInPandas(_partial, out_schema)

    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(q_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy(F.asc(q_id_col), F.desc("cos_sim"), F.asc(id_col))
    )
