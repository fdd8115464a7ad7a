"""Unit tests for the training-data pipeline operators (probe_spark.ops).

Each operator gets a small deterministic input with hand-checkable expected
output; where a pure-Python reimplementation is cheap (jaccard, simhash,
cosine) the Spark result is verified against it exactly.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from probe_spark.ops import dedup, events, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy dog"),  # dup of 0
        (3, "completely different words entirely here now"),
        (4, "spark engine index build merge pack"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingles(text: str, k: int = 3) -> set[str]:
    ws = text.split(" ")
    n = max(len(ws) - k, 0)
    return {" ".join(ws[i : i + k]) for i in range(n + 1)}


class TestDedup:
    def test_exact_dedup(self, docs_df):
        out = {r["text_md5"]: r for r in dedup.exact_dedup(docs_df).collect()}
        h = hashlib.md5(b"the quick brown fox jumps over the lazy dog").hexdigest()
        assert out[h]["keep_doc_id"] == 0
        assert out[h]["dup_count"] == 2
        assert sum(r["dup_count"] for r in out.values()) == 5

    def test_ngram_jaccard_pairs(self, docs_df):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                docs_df, threshold=0.5
            ).collect()
        }
        # exact duplicate pair
        assert got[(0, 2)] == 1.0
        # near-dup 0-1: differ in last word
        s0, s1 = _shingles("the quick brown fox jumps over the lazy dog"), _shingles(
            "the quick brown fox jumps over the lazy cat"
        )
        expected = round(len(s0 & s1) / len(s0 | s1), 6)
        assert got[(0, 1)] == pytest.approx(expected)
        assert (0, 3) not in got

    def test_ngram_jaccard_counts_hot_shingles_in_intersection(self, spark):
        # hot shingles are excluded from CANDIDATE generation only; the
        # emitted Jaccard must still count them in |A∩B| (exact verify)
        boiler = "alpha beta gamma"  # shared by every doc -> hot at df>2
        rows = [
            (0, f"{boiler} one two three four"),
            (1, f"{boiler} one two three five"),
            (2, f"{boiler} zz yy xx ww"),
            (3, f"{boiler} qq rr ss tt"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                df, threshold=0.3, max_shingle_df=2
            ).collect()
        }
        s0, s1 = _shingles(rows[0][1]), _shingles(rows[1][1])
        exact = round(len(s0 & s1) / len(s0 | s1), 6)
        assert got[(0, 1)] == pytest.approx(exact)
        # docs sharing ONLY hot shingles generate no candidate pair
        assert (2, 3) not in got

    def test_minhash_lsh_pairs(self, docs_df):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_pairs(docs_df).collect()
        }
        assert (0, 2) in pairs  # identical docs always collide
        assert (0, 3) not in pairs and (3, 4) not in pairs

    def test_simhash_identical_docs_equal(self, docs_df):
        rows = {r["id"]: (r["simhash_lo63"], r["simhash_top_bit"])
                for r in dedup.simhash_64(docs_df).collect()}
        assert rows[0] == rows[2]
        assert rows[0] != rows[3]

    def test_simhash_near_dup_close(self, docs_df):
        rows = {r["id"]: r["simhash_lo63"] for r in dedup.simhash_64(docs_df).collect()}
        ham_near = bin(rows[0] ^ rows[1]).count("1")
        ham_far = bin(rows[0] ^ rows[3]).count("1")
        assert ham_near < ham_far

    def test_duplicate_clusters_chain_and_singletons(self, spark):
        # a 6-node CHAIN is the case naive min-label propagation needs
        # O(diameter) rounds for; large-star/small-star contracts it in
        # O(log n).  Plus a triangle, a pair, and a node with no edges.
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
             (10, 11), (11, 12), (10, 12), (20, 21)],
            "id_a long, id_b long",
        )
        nodes = spark.createDataFrame(
            [(i,) for i in [1, 2, 3, 4, 5, 6, 10, 11, 12, 20, 21, 30]],
            "id long",
        )
        got = sorted(
            (r["id"], r["cluster_id"])
            for r in dedup.duplicate_clusters(pairs, nodes=nodes).collect()
        )
        assert got == [
            (1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (6, 1),
            (10, 10), (11, 10), (12, 10), (20, 20), (21, 20), (30, 30),
        ]

    def test_duplicate_clusters_matches_union_find(self, spark):
        # randomized cross-check vs a driver-side union-find on 60 nodes
        import random

        rng = random.Random(7)
        edges = sorted({
            tuple(sorted(rng.sample(range(60), 2))) for _ in range(45)
        })
        parent = list(range(60))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        want_label = {}
        for n in range(60):
            root = find(n)
            want_label.setdefault(root, []).append(n)
        want = sorted(
            (n, min(members))
            for members in want_label.values() for n in members
        )
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        nodes = spark.createDataFrame([(i,) for i in range(60)], "id long")
        got = sorted(
            (r["id"], r["cluster_id"])
            for r in dedup.duplicate_clusters(pairs, nodes=nodes).collect()
        )
        assert got == want

    def test_cluster_survivors_argmax_and_ties(self, spark):
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (9, 9)], "id long, cluster_id long"
        )
        quality = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.9), (9, 0.1)],
            "doc_id long, quality_score double",
        )
        got = sorted(
            (r["cluster_id"], r["keep_doc_id"], r["n_members"])
            for r in dedup.cluster_survivors(quality, clusters).collect()
        )
        # tie at 0.9 between ids 2 and 3 -> smallest id wins
        assert got == [(1, 2, 3), (9, 9, 1)]


class TestText:
    def test_token_counts(self, docs_df):
        r = {x["doc_id"]: x for x in text.with_token_counts(docs_df).collect()}
        assert r[0]["ws_tokens"] == 9
        assert r[0]["bpe_tokens"] == 9  # pure words, no punctuation

    def test_bpe_regex_counts_punct(self, spark):
        df = spark.createDataFrame([(0, "foo2bar, baz!")], "doc_id long, text string")
        r = text.with_token_counts(df).collect()[0]
        # foo / 2 / bar / , / baz / !
        assert r["bpe_tokens"] == 6

    def test_bpe_count_np_equals_regex(self, spark):
        """The vectorized Arrow counter must equal regexp_count(BPE_REGEX)
        on every string — fuzz over the fixture corpus plus edge cases
        (empty, unicode, runs at boundaries)."""
        import regex as re

        from probe_spark.fixtures import generate_transcripts

        pat = re.compile(text.BPE_REGEX)
        texts = (
            generate_transcripts(n_convs=60, seed=31)
            .column("text").to_pylist()
        )
        texts += ["", " ", "a", "1", "™", "héllo wörld 9x", "  x  ",
                  "ПриветМир 77", "a1b2c3", "...", "ab 12 cd!"]
        exp = [len(pat.findall(t)) for t in texts]
        got = text.bpe_count_np(texts).tolist()
        assert got == exp
        # and through the pandas-UDF column, against the JVM regex
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts[:50])],
            "doc_id long, text string",
        )
        both = df.select(
            "doc_id",
            text.bpe_tokens_vectorized(text.F.col("text")).alias("np_n"),
            text.F.regexp_count(
                text.F.col("text"), text.F.lit(text.BPE_REGEX)
            ).alias("re_n"),
        ).collect()
        assert all(r["np_n"] == r["re_n"] for r in both)

    def test_quality_features(self, spark):
        df = spark.createDataFrame([(0, "the cat sat")], "doc_id long, text string")
        r = text.with_quality(df).collect()[0]
        assert r["n_words"] == 3
        assert r["stopword_ratio"] == pytest.approx(round(1 / 3, 6))
        assert r["mean_word_len"] == pytest.approx(round((11 - 2) / 3, 6))
        assert r["alpha_ratio"] == pytest.approx(round(9 / 11, 6))
        assert 0.0 <= r["quality_score"] <= 1.0

    def test_fingerprint_matches_python(self, docs_df):
        got = {r["doc_id"]: r["fingerprint"]
               for r in text.with_fingerprint(docs_df).collect()}
        for row in docs_df.collect():
            acc = 0
            for w in row["text"].split(" "):
                acc = (acc * 31 + len(w) * 131 + ord(w[0])) % 2147483647
            assert got[row["doc_id"]] == acc
        assert got[0] == got[2] and got[0] != got[1]

    def test_lang_id(self, spark):
        rows = [
            (0, "the quick brown fox is running with the others"),
            (1, "der hund und die katze sind nicht ein problem"),
            (2, "le chat est dans la maison avec les autres"),
            (3, "这是一个中文句子我们在测试语言识别"),
            (4, "xqz vvv kkk"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["lang_pred"] for r in text.with_lang_id(df).collect()}
        assert got[0] == "en"
        assert got[1] == "de"
        assert got[2] == "fr"
        assert got[3] == "zh"
        assert got[4] == "und"

    def test_chunk_documents(self, spark):
        """Overlapping window chunking vs a hand-rolled Python mirror:
        every stride offset below n_tokens starts a chunk; last chunk may
        be short; null text drops; '' yields one empty chunk."""
        rows = [
            (0, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),  # 10 words
            (1, "a b c"),                           # shorter than window
            (2, ""),                                # one empty token
            (3, None),                              # no chunks
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            (
                (r["doc_id"], r["chunk_idx"], r["chunk_start"],
                 r["n_words"], r["chunk_text"])
                for r in text.chunk_documents(
                    df, window=4, stride=3
                ).collect()
            )
        )
        want = []
        for did, t in rows:
            if t is None:
                continue
            ws = t.split(" ")
            for ci, start in enumerate(range(0, len(ws), 3)):
                sl = ws[start:start + 4]
                want.append((did, ci, start, len(sl), " ".join(sl)))
        assert got == sorted(want)
        # 10 words / stride 3 -> starts 0,3,6,9 (last chunk length 1)
        assert [g for g in got if g[0] == 0][-1] == (0, 3, 9, 1, "w9")
        with pytest.raises(ValueError):
            text.chunk_documents(df, window=0)


class TestPipeline:
    def test_training_examples_composes_stages(self, spark):
        """Dedup keeps min-id per exact text, low-quality rows drop, the
        rest chunk with per-chunk BPE counts — verified against a Python
        mirror of the staged semantics."""
        from probe_spark.ops.pipeline import training_examples

        rows = [
            (0, "the service cache returned an error for the request"),
            (1, "the service cache returned an error for the request"),
            (2, "zz zz zz"),  # low quality: short, no stopwords
            (3, "a worker for the queue was running with the handler"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = training_examples(
            df, min_quality=0.5, window=4, stride=3
        ).collect()
        ids = {r["doc_id"] for r in got}
        assert 0 in ids and 3 in ids       # survivors chunked
        assert 1 not in ids                # exact dup of 0 dropped
        assert 2 not in ids                # quality-filtered
        for r in got:
            assert r["n_words"] == len(r["chunk_text"].split(" "))
            assert r["bpe_tokens"] >= r["n_words"]

    def test_pack_examples_boundaries(self, spark):
        """Exclusive-prefix packing: pack_idx = floor(cum_before/budget)
        per document; over-budget chunks own a bin and realign after."""
        from probe_spark.ops.pipeline import pack_examples

        rows = [
            (0, 0, 10), (0, 1, 10), (0, 2, 10),  # cum_before 0,10,20
            (0, 3, 50),                           # cum_before 30 -> pack 1
            (0, 4, 10),                           # cum_before 80 -> pack 2
            (1, 0, 5),                            # new doc restarts at 0
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, chunk_idx int, bpe_tokens int"
        )
        got = {
            (r["doc_id"], r["chunk_idx"]): (
                r["pack_tokens_before"], r["pack_idx"]
            )
            for r in pack_examples(df, budget=32).collect()
        }
        assert got == {
            (0, 0): (0, 0), (0, 1): (10, 0), (0, 2): (20, 0),
            (0, 3): (30, 0), (0, 4): (80, 2), (1, 0): (0, 0),
        }
        import pytest as _pytest

        with _pytest.raises(ValueError):
            pack_examples(df, budget=0)

    def test_training_examples_single_shuffle(self, spark):
        """The composed pipeline costs ONE exchange (the dedup window)
        under BOTH token counters; the vectorized counter adds an
        ArrowEvalPython stage, never a shuffle."""
        from probe_spark.ops.pipeline import training_examples

        df = spark.createDataFrame(
            [(0, "a b c d e f")], "doc_id long, text string"
        )
        for counter in ("column", "vectorized"):
            plan = (
                training_examples(df, token_counter=counter)
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert plan.count("Exchange") == 1, (counter, plan)
        assert "ArrowEvalPython" in plan  # the vectorized stage is Arrow

    def test_training_examples_counters_identical(self, spark):
        from probe_spark.ops.pipeline import training_examples

        rows = [(i, f"the error {i} handler ran, twice! x{i}") for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, training_examples(
            df, window=4, stride=3, token_counter="vectorized").collect()))
        b = sorted(map(tuple, training_examples(
            df, window=4, stride=3, token_counter="column").collect()))
        assert a == b


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb_df(self, spark):
        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(40, 16)).astype(np.float32)
        vecs[7] = vecs[3] + rng.normal(scale=0.01, size=16).astype(np.float32)
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        return df, vecs

    def test_brute_force_topk_matches_numpy(self, emb_df):
        df, vecs = emb_df
        q = vecs[3].astype(np.float64)
        sims = (vecs.astype(np.float64) @ q) / (
            np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(q)
        )
        exp = sorted(range(40), key=lambda i: (-round(sims[i], 6), i))[:5]
        got = [
            r["id"]
            for r in similarity.brute_force_topk(df, list(vecs[3]), k=5).collect()
        ]
        assert got == exp
        assert got[0] == 3 and got[1] == 7

    def test_lsh_topk_finds_near_dup(self, emb_df):
        df, vecs = emb_df
        got = [
            r["id"]
            for r in similarity.lsh_topk(
                df, list(vecs[3]), k=3, n_planes=6, multiprobe=1
            ).collect()
        ]
        assert got[0] == 3
        assert 7 in got  # the planted near-duplicate shares the bucket

    def test_ivf_topk_matches_numpy_probe_scan(self, emb_df):
        # exactness contract: ivf_topk == brute-force restricted to the
        # n_probe cells picked by the (deterministic) coarse quantizer
        df, vecs = emb_df
        q = vecs[3].astype(np.float64)
        cents = similarity._seeded_centroids(16, 8, seed=13)
        dots = vecs.astype(np.float64) @ cents.T  # (40, 8)
        cells = dots.argmax(axis=1)
        qdots = [similarity._left_fold_dot(cents[c], q) for c in range(8)]
        probes = set(sorted(range(8), key=lambda c: (-qdots[c], c))[:3])
        cand = [i for i in range(40) if cells[i] in probes]
        sims = (vecs.astype(np.float64) @ q) / (
            np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(q)
        )
        exp = sorted(cand, key=lambda i: (-round(sims[i], 6), i))[:5]
        got = [
            r["id"]
            for r in similarity.ivf_topk(
                df, list(vecs[3]), k=5, n_cells=8, n_probe=3
            ).collect()
        ]
        assert got == exp
        assert got[0] == 3 and 7 in got  # near-dup lands in the same cell

    def test_with_ivf_cell_matches_numpy_argmax(self, emb_df):
        df, vecs = emb_df
        cents = similarity._seeded_centroids(16, 8, seed=13)
        exp = (vecs.astype(np.float64) @ cents.T).argmax(axis=1)
        got = {
            r["vec_id"]: r["cell"]
            for r in similarity.with_ivf_cell(df, 16, n_cells=8).collect()
        }
        assert got == {i: int(exp[i]) for i in range(40)}

    def test_ivf_indexed_prunes_partitions_and_matches(self, emb_df, tmp_path):
        # the materialized IVF path must (a) be rank-identical to the
        # on-the-fly ivf_topk and (b) actually prune: the filtered scan
        # lists only the n_probe cell directories
        df, vecs = emb_df
        path = str(tmp_path / "ivf_idx")
        similarity.write_ivf_index(df, path, dim=16, n_cells=8)
        spark = df.sparkSession
        got = similarity.ivf_topk_indexed(
            spark, path, list(vecs[3]), k=5, n_cells=8, n_probe=3
        )
        exp = similarity.ivf_topk(
            df, list(vecs[3]), k=5, n_cells=8, n_probe=3
        ).collect()
        assert [(r["id"], r["cos_sim"]) for r in got.collect()] == [
            (r["id"], r["cos_sim"]) for r in exp
        ]
        # pruning evidence: the scan carries the cell predicate as a
        # PARTITION filter (directory pruning), not a data filter
        plan = got._jdf.queryExecution().executedPlan().toString()
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "cell" in pf[0] and "PartitionFilters: []" not in pf[0]

    def test_train_ivf_centroids_improves_spherical_objective(self, emb_df):
        # Lloyd guarantee: the spherical objective (sum of each vector's
        # dot with its assigned unit centroid) is monotone non-decreasing
        # from the seeded init, and trained centroids are unit-norm
        df, vecs = emb_df
        x = vecs.astype(np.float64)
        seeded = similarity._seeded_centroids(16, 4, seed=13)
        seeded = seeded / np.linalg.norm(seeded, axis=1, keepdims=True)
        trained = similarity.train_ivf_centroids(
            df, dim=16, n_cells=4, iters=8, sample_size=1000
        )
        assert trained.shape == (4, 16)
        assert np.allclose(np.linalg.norm(trained, axis=1), 1.0)

        def objective(cents):
            dots = x @ cents.T
            return dots.max(axis=1).sum()

        assert objective(trained) >= objective(seeded) - 1e-9
        # and it genuinely moved off the random init on this data
        assert not np.allclose(trained, seeded)

    def test_ivf_topk_trained_matches_probe_restricted_bruteforce(self, emb_df):
        # same exactness contract as the seeded test, with a trained
        # quantizer threaded through assignment + probe selection
        df, vecs = emb_df
        cents = similarity.train_ivf_centroids(
            df, dim=16, n_cells=4, iters=8, sample_size=1000
        )
        q = vecs[3].astype(np.float64)
        cells = (vecs.astype(np.float64) @ cents.T).argmax(axis=1)
        qdots = [similarity._left_fold_dot(cents[c], q) for c in range(4)]
        probes = set(sorted(range(4), key=lambda c: (-qdots[c], c))[:2])
        cand = [i for i in range(40) if cells[i] in probes]
        sims = (vecs.astype(np.float64) @ q) / (
            np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(q)
        )
        exp = sorted(cand, key=lambda i: (-round(sims[i], 6), i))[:5]
        got = [
            r["id"]
            for r in similarity.ivf_topk(
                df, list(vecs[3]), k=5, n_probe=2, centroids=cents
            ).collect()
        ]
        assert got == exp
        assert got[0] == 3 and 7 in got

    def test_ivf_indexed_trained_sidecar_roundtrip(self, emb_df, tmp_path):
        # write with a trained quantizer -> the query side reloads the
        # _centroids sidecar (no centroids passed) and is rank-identical
        # to the on-the-fly trained path; the sidecar must not leak into
        # the main corpus scan
        df, vecs = emb_df
        cents = similarity.train_ivf_centroids(
            df, dim=16, n_cells=4, iters=8, sample_size=1000
        )
        path = str(tmp_path / "ivf_trained")
        similarity.write_ivf_index(df, path, dim=16, n_cells=4, centroids=cents)
        spark = df.sparkSession
        loaded = similarity._load_ivf_centroids(spark, path)
        assert loaded is not None and np.allclose(loaded, cents)
        got = similarity.ivf_topk_indexed(
            spark, path, list(vecs[3]), k=5, n_cells=4, n_probe=2
        )
        exp = similarity.ivf_topk(
            df, list(vecs[3]), k=5, n_probe=2, centroids=cents
        ).collect()
        assert [(r["id"], r["cos_sim"]) for r in got.collect()] == [
            (r["id"], r["cos_sim"]) for r in exp
        ]
        # underscore sidecar is invisible to the corpus read
        assert spark.read.parquet(path).count() == 40

    def test_lsh_indexed_prunes_partitions_and_matches(self, emb_df, tmp_path):
        df, vecs = emb_df
        path = str(tmp_path / "lsh_idx")
        similarity.write_lsh_index(df, path, dim=16, n_planes=6)
        spark = df.sparkSession
        got = similarity.lsh_topk_indexed(
            spark, path, list(vecs[3]), k=3, n_planes=6, multiprobe=1
        )
        exp = similarity.lsh_topk(
            df, list(vecs[3]), k=3, n_planes=6, multiprobe=1
        ).collect()
        assert [(r["id"], r["cos_sim"]) for r in got.collect()] == [
            (r["id"], r["cos_sim"]) for r in exp
        ]
        plan = got._jdf.queryExecution().executedPlan().toString()
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "bucket" in pf[0] and "PartitionFilters: []" not in pf[0]

    def test_embedding_dup_pairs_exact_vs_lsh(self, emb_df):
        df, _ = emb_df
        exact = {
            (r["id_a"], r["id_b"])
            for r in similarity.embedding_dup_pairs(
                df, threshold=0.95, exact=True
            ).collect()
        }
        assert exact == {(3, 7)}
        # DEFAULT is the LSH-bucketed path (n_planes=8) — the 100 TB
        # shape a user gets without reading the signature
        lsh_default = {
            (r["id_a"], r["id_b"])
            for r in similarity.embedding_dup_pairs(df, threshold=0.95).collect()
        }
        assert lsh_default == {(3, 7)}
        lsh = {
            (r["id_a"], r["id_b"])
            for r in similarity.embedding_dup_pairs(
                df, threshold=0.95, n_planes=4
            ).collect()
        }
        assert lsh == {(3, 7)}

    def _knn_expected(self, df, vecs, qids, k, n_cells, n_probe):
        """Per-query oracle: brute-force cosine over that query's probed
        cells, ranked by (rounded cos desc, id asc)."""
        exp = []
        cells = {
            r["vec_id"]: r["cell"]
            for r in similarity.with_ivf_cell(df, 16, n_cells).select(
                "vec_id", "cell"
            ).collect()
        }
        for qid in qids:
            probes = set(
                similarity._ivf_probes(list(vecs[qid]), n_cells, n_probe, 13)
            )
            q = vecs[qid].astype(np.float64)
            cand = [i for i in range(len(vecs)) if cells[i] in probes]
            sims = {
                i: round(
                    float(
                        vecs[i].astype(np.float64) @ q
                        / (
                            np.linalg.norm(vecs[i].astype(np.float64))
                            * np.linalg.norm(q)
                        )
                    ),
                    6,
                )
                for i in cand
            }
            top = sorted(cand, key=lambda i: (-sims[i], i))[:k]
            exp.extend((qid, i, sims[i]) for i in top)
        return exp

    def test_knn_join_matches_per_query_brute_force(self, emb_df):
        df, vecs = emb_df
        qids = [0, 3, 11]
        queries = df.filter(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = [
            (r["query_id"], r["vec_id"], r["cos_sim"])
            for r in similarity.knn_join(
                queries, df, k=4, n_cells=8, n_probe=3
            ).collect()
        ]
        exp = self._knn_expected(df, vecs, qids, 4, 8, 3)
        assert got == [(q, i, pytest.approx(s)) for q, i, s in exp]
        # a query's own vector tops its list; the planted near-dup pair
        # lands in each other's neighbor lists
        by_q = {}
        for q, i, _s in got:
            by_q.setdefault(q, []).append(i)
        assert by_q[3][0] == 3 and 7 in by_q[3]

    def test_knn_join_partial_equals_window_only(self, emb_df):
        df, _ = emb_df
        queries = df.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        a = similarity.knn_join(
            queries, df, k=3, n_cells=8, n_probe=2
        ).collect()
        b = similarity.knn_join(
            queries, df, k=3, n_cells=8, n_probe=2, partial_topk=False
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_knn_join_zero_norm_agrees_across_paths(self, emb_df, spark):
        """ADVICE r4: zero-norm vectors score NaN; pandas sorts NaN last
        while F.desc ranks NaN first — both paths must DROP non-finite
        scores and agree bit-for-bit."""
        df, _ = emb_df
        dim = len(df.select("embedding").first()[0])
        zq = spark.createDataFrame(
            [(99, [0.0] * dim)], "query_id long, embedding array<double>"
        )
        queries = df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ).unionByName(zq)
        zc = spark.createDataFrame(
            [(98, [0.0] * dim)], "vec_id long, embedding array<double>"
        )
        corpus = df.unionByName(zc)
        a = similarity.knn_join(
            queries, corpus, k=3, n_cells=8, n_probe=2
        ).collect()
        b = similarity.knn_join(
            queries, corpus, k=3, n_cells=8, n_probe=2, partial_topk=False
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert all(r["cos_sim"] == r["cos_sim"] for r in a)  # no NaN
        assert 98 not in {r["vec_id"] for r in a}
        assert 99 not in {r["query_id"] for r in a}

    def test_knn_join_indexed_prunes_partitions(self, emb_df, tmp_path):
        df, vecs = emb_df
        path = str(tmp_path / "knn_idx")
        similarity.write_ivf_index(df, path, dim=16, n_cells=8)
        queries = df.filter(F.col("vec_id").isin([3, 20])).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = similarity.knn_join(
            queries, index_path=path, k=4, n_cells=8, n_probe=3,
            partial_topk=False,
        )
        rows = [
            (r["query_id"], r["vec_id"], r["cos_sim"]) for r in got.collect()
        ]
        exp = self._knn_expected(df, vecs, [3, 20], 4, 8, 3)
        assert rows == [(q, i, pytest.approx(s)) for q, i, s in exp]
        plan = got._jdf.queryExecution().executedPlan().toString()
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "cell" in pf[0] and "PartitionFilters: []" not in pf[0]

    def test_knn_join_trained_centroids_sidecar(self, emb_df, tmp_path):
        # an index written with a TRAINED quantizer must drive knn_join
        # through the sidecar centroids (probe sets differ from seeded)
        df, vecs = emb_df
        cents = similarity.train_ivf_centroids(df, dim=16, n_cells=4, iters=3)
        path = str(tmp_path / "knn_idx_trained")
        similarity.write_ivf_index(df, path, dim=16, n_cells=4, centroids=cents)
        queries = df.filter(F.col("vec_id") == 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = [
            r["vec_id"]
            for r in similarity.knn_join(
                queries, index_path=path, k=4, n_cells=4, n_probe=2
            ).collect()
        ]
        exp = [
            r["id"]
            for r in similarity.ivf_topk(
                df, list(vecs[3]), k=4, n_cells=4, n_probe=2, centroids=cents
            ).collect()
        ]
        assert got == exp


class TestEvents:
    def test_sessionize_gap_split(self, spark):
        rows = [
            (1, 100, "2024-01-01 00:00:00", 1.0),
            (2, 100, "2024-01-01 00:10:00", 2.0),
            (3, 100, "2024-01-01 01:00:00", 3.0),  # 50 min gap -> new session
            (4, 200, "2024-01-01 00:00:00", 4.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, value double"
        ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).col("ts").cast("timestamp_ntz"))
        out = {
            (r["user_id"], r["session_id"]): r
            for r in events.sessionize(df, gap_minutes=30).collect()
        }
        assert out[(100, 1)]["n_events"] == 2
        assert out[(100, 1)]["sum_value"] == 3.0
        assert out[(100, 2)]["n_events"] == 1
        assert out[(200, 1)]["n_events"] == 1

    def test_sessionize_boundary_matches_session_window(self, spark):
        # an event EXACTLY gap_minutes after the previous one MERGES into
        # the session in Spark's session_window (boundary inclusive,
        # verified empirically); the batch sessionize must agree
        from pyspark.sql import functions as F

        rows = [
            (1, 100, "2024-01-01 12:00:00", 1.0),
            (2, 100, "2024-01-01 12:30:00", 2.0),  # exactly 30 min later
            (3, 100, "2024-01-01 13:00:01", 3.0),  # 1s past the gap: new
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        batch = events.sessionize(df, gap_minutes=30).collect()
        native = (
            df.groupBy(
                "user_id", F.session_window(F.col("ts"), "30 minutes")
            )
            .agg(F.count("*").alias("n_events"))
            .collect()
        )
        assert sorted(r["n_events"] for r in native) == sorted(
            r["n_events"] for r in batch
        ) == [1, 2]

    def test_windowed_counts(self, spark):
        rows = [
            (1, "2024-01-01 00:10:00", "click", 1.0),
            (2, "2024-01-01 00:50:00", "click", 2.0),
            (3, "2024-01-01 01:10:00", "click", 4.0),
        ]
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        out = events.windowed_counts(df).collect()
        counts = sorted(r["n_events"] for r in out)
        assert counts == [1, 2]


class TestMultimodal:
    def test_image_features_and_error_rows(self, spark):
        rows = [
            (0, bytearray(b"\x10\x20\x30\x40")),
            (1, bytearray(b"")),  # corrupt -> error row, not task failure
            (2, bytearray(bytes(range(100)))),
        ]
        df = spark.createDataFrame(rows, "sample_id long, image binary")
        out = {r["sample_id"]: r for r in multimodal.image_features(df).collect()}
        assert out[0]["status"] == "ok" and out[0]["n_bytes"] == 4
        assert out[0]["width"] == 16 + 0x10 % 64
        assert out[1]["status"] == "error"
        assert out[2]["byte_mean"] == pytest.approx(np.mean(range(100)), rel=1e-6)

    def test_image_resize_fixed_width_output(self, spark):
        rows = [
            (0, bytearray(bytes(range(200)))),
            (1, bytearray(b"")),  # corrupt -> error row with empty pixels
        ]
        df = spark.createDataFrame(rows, "sample_id long, image binary")
        out = {r["sample_id"]: r
               for r in multimodal.image_resize(df, out_w=4, out_h=4).collect()}
        assert out[0]["status"] == "ok" and len(out[0]["pixels"]) == 16
        # mean-pool fold: cell 0 = mean of bytes 0,16,32,... with zero-pad
        arr = np.pad(np.arange(200, dtype=np.float32), (0, (-200) % 16))
        exp = arr.reshape(-1, 16).mean(axis=0)
        assert out[0]["pixels"][0] == pytest.approx(float(exp[0]), rel=1e-6)
        assert out[1]["status"] == "error" and out[1]["pixels"] == []

    def test_audio_features_pcm_math(self, spark):
        # 4 int16 samples: +1000, -1000, +1000, -1000 -> 3 zero crossings,
        # rms 1000, duration 4/16000 s = 0.25 ms
        pcm = np.array([1000, -1000, 1000, -1000], dtype="<i2").tobytes()
        rows = [(0, bytearray(pcm)), (1, bytearray(b"\x01"))]
        df = spark.createDataFrame(rows, "sample_id long, audio binary")
        out = {r["sample_id"]: r for r in multimodal.audio_features(df).collect()}
        assert out[0]["status"] == "ok"
        assert out[0]["zero_crossings"] == 3
        assert out[0]["rms"] == pytest.approx(1000.0, rel=1e-6)
        assert out[0]["duration_ms"] == pytest.approx(0.25, rel=1e-6)
        assert out[1]["status"] == "error"

    def test_frame_sample_expands_rows(self, spark):
        df = spark.createDataFrame(
            [(0, bytearray(bytes(range(64))))], "sample_id long, video binary"
        )
        out = multimodal.frame_sample(df, n_frames=4, feat_dim=8).collect()
        assert len(out) == 4
        assert sorted(r["frame_idx"] for r in out) == [0, 1, 2, 3]
        assert all(len(r["frame_feature"]) == 8 for r in out)


class TestScoreMath:
    def test_bm25_idf_formula(self):
        # guard: the documented formula (ranking.rs:129-143) as used in oracles
        n, df = 500, 100
        assert math.log(1 + (n - df + 0.5) / (df + 0.5)) == pytest.approx(
            1.6064484, abs=1e-6
        )


class TestCuration:
    @pytest.fixture(scope="class")
    def cur_df(self, spark):
        rows = [
            (0, "alpha beta gamma delta epsilon zeta", "src0", "en"),
            (1, "alpha beta gamma other words here", "src0", "en"),
            (2, "nothing shared with anything else", "src0", "de"),
            (3, "alpha alpha alpha alpha beta beta", "src1", "en"),
            (4, "one two three four five six seven", "src1", "fr"),
            (5, "solo", "src2", "en"),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string, lang string"
        )

    def test_decontaminate_counts_shared_kgrams(self, spark, cur_df):
        from probe_spark.ops import curation

        ev = cur_df.filter("doc_id = 0")
        rep = {
            r["doc_id"]: r["n_contaminated"]
            for r in curation.decontaminate(cur_df, ev, k=3).collect()
        }
        # doc 0 shares all 4 of its own 3-grams; doc 1 shares exactly
        # "alpha beta gamma"; docs 2-5 share nothing
        assert rep[0] == 4
        assert rep[1] == 1
        assert set(rep) == {0, 1}
        kept = curation.drop_contaminated(cur_df, curation.decontaminate(cur_df, ev, k=3))
        assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4, 5]

    def test_mix_sources_rates_and_epochs(self, spark, cur_df):
        from probe_spark.ops import curation

        out = curation.mix_sources(
            cur_df, {"src0": 3.0, "src1": 1.0}, default_weight=0.0
        ).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r["doc_id"], []).append(r["epoch"])
        # integral weights are hash-independent: exactly w copies
        assert sorted(by_id[0]) == [0, 1, 2]
        assert sorted(by_id[3]) == [0]
        assert 5 not in by_id  # src2 weight 0 -> dropped
        # deterministic: a second run is identical
        again = curation.mix_sources(
            cur_df, {"src0": 3.0, "src1": 1.0}, default_weight=0.0
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_mix_sources_fractional_rate_matches_hash(self, spark, cur_df):
        import hashlib as _h

        from probe_spark.ops import curation

        out = curation.mix_sources(cur_df, {"src0": 0.5}, salt=7).collect()
        kept = {r["doc_id"] for r in out}
        for i in (0, 1, 2):
            frac = (
                int(_h.md5(f"7|{i}".encode()).hexdigest()[:8], 16) / 2**32
            )
            assert (i in kept) == (frac < 0.5)

    def test_redact_pii(self, spark):
        from probe_spark.ops import curation

        df = spark.createDataFrame(
            [
                (0, "mail a@b.io or c.d+x@ex.org, ip 10.0.0.1, ssn "
                    "123-45-6789, call 555-123-4567 now"),
                (1, "clean text with no pii at all"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in curation.redact_pii(df).collect()}
        assert out[0]["n_email"] == 2
        assert out[0]["n_ipv4"] == 1
        assert out[0]["n_ssn"] == 1
        assert out[0]["n_phone"] == 1
        red = out[0]["text_redacted"]
        assert "<EMAIL>" in red and "<IP>" in red
        assert "<SSN>" in red and "<PHONE>" in red
        assert "a@b.io" not in red and "123-45-6789" not in red
        assert out[1]["text_redacted"] == "clean text with no pii at all"
        assert out[1]["n_email"] == 0

    def test_select_quota(self, spark, cur_df):
        from probe_spark.ops import curation

        out = curation.select_quota(cur_df, n_per_source=1).collect()
        # one survivor per source, rank 1
        assert sorted(r["source"] for r in out) == ["src0", "src1", "src2"]
        assert all(r["rank_in_source"] == 1 for r in out)

    def test_with_repetition(self, spark):
        from probe_spark.ops import curation

        df = spark.createDataFrame(
            [
                (0, "a a a a"),          # 1 distinct / 4; top word 4/4;
                                         # top bigram "a a" 3/3
                (1, "a b c d"),          # all distinct, every count 1
                (2, "x"),                # single word: bigram fraction 0.0
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in curation.with_repetition(df).collect()}
        assert out[0]["distinct_word_ratio"] == 0.25
        assert out[0]["top_word_fraction"] == 1.0
        assert out[0]["top_bigram_fraction"] == 1.0
        assert out[1]["distinct_word_ratio"] == 1.0
        assert out[1]["top_word_fraction"] == 0.25
        assert out[1]["top_bigram_fraction"] == pytest.approx(1 / 3, abs=1e-6)
        assert out[2]["top_bigram_fraction"] == 0.0
        assert out[2]["distinct_word_ratio"] == 1.0

    def test_corpus_profile(self, spark, cur_df):
        from probe_spark.ops import curation

        prof = {r["source"]: r for r in curation.corpus_profile(cur_df).collect()}
        assert prof["src0"]["n_docs"] == 3
        assert prof["src0"]["n_langs"] == 2
        assert prof["src1"]["total_words"] == 13
        assert prof["src2"]["min_chars"] == len("solo")


class TestPerplexity:
    def test_bigram_lm_hand_computed(self, spark):
        import math

        from probe_spark.ops import curation

        df = spark.createDataFrame(
            [(0, "a b a"), (1, "a a"), (2, "x")], "doc_id long, text string"
        )
        bi, uni, v = curation.train_bigram_lm(df)
        assert v == 3  # vocab {a, b, x}
        bic = {(r["w1"], r["w2"]): r["c2"] for r in bi.collect()}
        assert bic == {("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 1}
        out = {
            r["doc_id"]: r["ppl"]
            for r in curation.with_perplexity(df, bi, uni, v).collect()
        }
        # P(b|a) = 2/7, P(a|b) = 2/4 -> ppl = sqrt(7*2) adjusted:
        # exp(-(ln(2/7)+ln(1/2))/2) = sqrt(7)
        assert out[0] == pytest.approx(math.sqrt(7), abs=1e-6)
        # P(a|a) = 2/7 -> ppl = 7/2
        assert out[1] == pytest.approx(3.5, abs=1e-6)
        assert out[2] is None  # single word: no bigram


class TestTrainingShuffle:
    def test_deterministic_shards_and_positions(self, spark, docs_df):
        from probe_spark.ops.pipeline import shuffle_for_training

        chunks = docs_df.selectExpr(
            "doc_id", "0 as chunk_idx"
        ).union(docs_df.selectExpr("doc_id", "1 as chunk_idx"))
        a = shuffle_for_training(chunks, n_shards=3).collect()
        b = shuffle_for_training(chunks, n_shards=3).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        by_shard: dict[int, list[int]] = {}
        for r in a:
            assert 0 <= r["shard"] < 3
            by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
        for positions in by_shard.values():
            assert sorted(positions) == list(range(len(positions)))
        # a different salt is a different permutation of the same rows
        c = shuffle_for_training(chunks, n_shards=3, salt=1).collect()
        assert sorted(
            (r["doc_id"], r["chunk_idx"]) for r in c
        ) == sorted((r["doc_id"], r["chunk_idx"]) for r in a)
        assert sorted(map(tuple, c)) != sorted(map(tuple, a))

    def test_rejects_bad_shard_count(self, spark, docs_df):
        import pytest as _pytest

        from probe_spark.ops.pipeline import shuffle_for_training

        with _pytest.raises(ValueError):
            shuffle_for_training(docs_df, n_shards=0, idx_col=None)


class TestRetrievalMetrics:
    def test_hand_computed_metrics(self, spark):
        import math

        from probe_spark.ops.evaluation import (
            retrieval_metrics,
            summarize_metrics,
        )

        run = spark.createDataFrame(
            [
                # q0: gold docs at ranks 2 and 4 (of 3 gold)
                (0, 10, 1), (0, 11, 2), (0, 12, 3), (0, 13, 4),
                # q1: nothing relevant retrieved
                (1, 20, 1), (1, 21, 2),
            ],
            "query_id long, doc_id long, rank int",
        )
        gold = spark.createDataFrame(
            [(0, 11), (0, 13), (0, 99), (1, 77), (2, 5)],
            "query_id long, doc_id long",
        )
        out = {
            r["query_id"]: r
            for r in retrieval_metrics(run, gold, k=4).collect()
        }
        q0 = out[0]
        assert q0["n_gold"] == 3 and q0["n_hits"] == 2
        assert q0["recall"] == pytest.approx(2 / 3, abs=1e-6)
        assert q0["mrr"] == pytest.approx(0.5, abs=1e-6)
        dcg = 1 / math.log2(3) + 1 / math.log2(5)
        idcg = 1 + 1 / math.log2(3) + 1 / math.log2(4)
        assert q0["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)
        assert out[1]["recall"] == 0.0 and out[1]["mrr"] == 0.0
        assert out[1]["ndcg"] == 0.0
        # q2 has gold but no run rows -> all zeros, still present
        assert out[2]["n_hits"] == 0 and out[2]["n_gold"] == 1
        summ = summarize_metrics(retrieval_metrics(run, gold, k=4)).collect()[0]
        assert summ["n_queries"] == 3
        assert summ["recall"] == pytest.approx(round((2 / 3) / 3, 6), abs=1e-6)

    def test_duplicate_run_rows_do_not_inflate(self, spark):
        """A run file with duplicate (query_id, doc_id) rows must score
        identically to the deduped run (best rank kept): recall stays
        <= 1.0, no doubled hits/DCG terms."""
        from probe_spark.ops.evaluation import retrieval_metrics

        clean = spark.createDataFrame(
            [(0, 10, 1), (0, 11, 2)],
            "query_id long, doc_id long, rank int",
        )
        dup = spark.createDataFrame(
            [(0, 10, 1), (0, 10, 3), (0, 11, 2), (0, 11, 4)],
            "query_id long, doc_id long, rank int",
        )
        gold = spark.createDataFrame(
            [(0, 10), (0, 11)], "query_id long, doc_id long"
        )
        a = retrieval_metrics(clean, gold, k=5).collect()[0]
        b = retrieval_metrics(dup, gold, k=5).collect()[0]
        assert b["recall"] == a["recall"] == 1.0
        assert b["n_hits"] == a["n_hits"] == 2
        assert b["mrr"] == a["mrr"] and b["ndcg"] == a["ndcg"]

    def test_bpe_vectorized_propagates_null(self, spark):
        """ADVICE r4: NULL text must count as NULL (regexp_count
        semantics), not 0 — the vectorized and column token counters
        must be value-identical including on nulls."""
        df = spark.createDataFrame(
            [(0, "two words"), (1, None), (2, "")],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: (r["np_n"], r["re_n"])
            for r in df.select(
                "doc_id",
                text.bpe_tokens_vectorized(text.F.col("text")).alias("np_n"),
                text.F.regexp_count(
                    text.F.col("text"), text.F.lit(text.BPE_REGEX)
                ).alias("re_n"),
            ).collect()
        }
        assert rows[1] == (None, None)
        assert rows[2] == (0, 0)
        assert rows[0][0] == rows[0][1] == 2
