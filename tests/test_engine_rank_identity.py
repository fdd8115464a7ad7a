"""End-to-end: index build round-trip + Spark-vs-oracle rank identity on the
reference query set (the correctness contract from BASELINE.json: matching
top-k docIDs and BM25 scores, per-turn text equality under stable
(conv_id, turn_idx) ordering)."""

from __future__ import annotations

import pytest

from probe_spark import oracle
from probe_spark.fixtures import (
    REFERENCE_QUERIES,
    transcripts_df,
    transcripts_rows,
)

N_CONVS = 60
SEED = 42


@pytest.fixture(scope="session")
def corpus_rows():
    return transcripts_rows(N_CONVS, SEED)


@pytest.fixture(scope="session")
def index_path(spark, tmp_index_root, corpus_rows):
    from probe_spark.index.build import BuildConfig, IndexBuilder

    path = f"{tmp_index_root}/idx_main"
    df = transcripts_df(spark, N_CONVS, SEED)
    # force multi-segment terms AND multi-group (salted) merges: tiny
    # segment cap + tiny merge-group byte target (the shuffle-free merge
    # salts by doc-range group, driven by partial-shard sizes)
    cfg = BuildConfig(
        n_buckets=8, max_postings_per_segment=64, merge_group_bytes=4096
    )
    result = IndexBuilder(spark, cfg).build(df, path)
    assert result["n_docs"] == len(corpus_rows)
    return path


@pytest.fixture(scope="session")
def engine(spark, index_path):
    from probe_spark.search.engine import SearchEngine

    return SearchEngine(spark, index_path)


class TestIndexRoundTrip:
    def test_docid_assignment_and_text_equality(self, spark, index_path, corpus_rows):
        docs = (
            spark.read.parquet(f"{index_path}/docs")
            .select("doc_id", "conv_id", "turn_idx", "text")
            .orderBy("doc_id")
            .collect()
        )
        assert len(docs) == len(corpus_rows)
        for i, row in enumerate(docs):
            assert row["doc_id"] == i
            assert row["conv_id"] == corpus_rows[i]["conv_id"]
            assert row["turn_idx"] == corpus_rows[i]["turn_idx"]
            # per-row invariant: per-turn text equality (BASELINE.json)
            assert row["text"] == corpus_rows[i]["text"]

    def test_dl_matches_tokenizer(self, spark, index_path, corpus_rows):
        from probe_spark.functions.tokenizer import tokenize

        docs = (
            spark.read.parquet(f"{index_path}/docs")
            .select("doc_id", "dl", "text")
            .orderBy("doc_id")
            .collect()
        )
        for row in docs[:200]:
            assert row["dl"] == len(tokenize(row["text"]))

    def test_postings_salting(self, spark, index_path):
        seg = spark.read.parquet(f"{index_path}/postings")
        multi = seg.filter("n_salts > 1")
        assert multi.count() > 0, "hot terms should be salted at this threshold"
        # every segment respects the max size
        assert seg.filter("df_seg > 64 and n_salts = 1").count() == 0

    def test_postings_decode_consistency(self, spark, index_path, corpus_rows):
        """Decoded postings for a term == docs whose tokens contain it."""
        from probe_spark.functions.tokenizer import tokenize
        from probe_spark.index.codec import decode_postings

        term = "error"
        segs = (
            spark.read.parquet(f"{index_path}/postings")
            .filter(f"kind = 'tok' and term = '{term}'")
            .collect()
        )
        got = set()
        for s in segs:
            ids, dls = decode_postings(bytes(s["docs_bin"]), bytes(s["dl_bin"]))
            got.update(int(i) for i in ids)
        expected = {
            i for i, r in enumerate(corpus_rows) if term in tokenize(r["text"])
        }
        assert got == expected

    def test_manifest_written(self, spark, index_path):
        m = spark.read.parquet(f"{index_path}/manifest")
        phases = {r["phase"] for r in m.select("phase").distinct().collect()}
        assert {"docs", "postings_tok", "postings_raw", "stats"} <= phases


class TestRankIdentity:
    @pytest.mark.parametrize("qid,query,k", REFERENCE_QUERIES)
    def test_query(self, engine, corpus_rows, qid, query, k):
        texts = [r["text"] for r in corpus_rows]
        expected = oracle.search(texts, query, k=k)
        got = engine.search(query, k=k, with_metadata=False).collect()

        got_ids = [r["doc_id"] for r in got]
        exp_ids = [r.doc_id for r in expected]
        assert got_ids == exp_ids, (
            f"q{qid} '{query}': docID mismatch\n got={got_ids}\n exp={exp_ids}"
        )
        for g, e in zip(got, expected):
            assert g["score"] == pytest.approx(e.score, abs=1e-9), (
                f"q{qid} '{query}': score mismatch doc {g['doc_id']}"
            )


class TestDeterminism:
    def test_same_query_stable(self, engine):
        a = engine.search("error AND handling", k=10, with_metadata=False).collect()
        b = engine.search("error AND handling", k=10, with_metadata=False).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]


def _random_queries(n: int, seed: int) -> list[str]:
    """Seeded random query generator over the fixture vocabulary: mixes
    plain words, camelCase (multi-keyword Terms -> the conjunctive ladder),
    +required / -excluded / quoted-exact (special-term repair), AND/OR and
    parentheses — every engine code path gets sampled."""
    import random

    rng = random.Random(seed)
    words = [
        "error", "handling", "database", "timeout", "worker", "cache",
        "queue", "login", "auth", "api", "process", "load", "whitelist",
        "firewall", "handler", "table", "hash", "join", "running",
        "JWTMiddleware", "getUserProfile", "enableFirewallWhitelist",
        "oauth2", "sqlite", "hashtable", "parseJSONToHTML5", "blackmail",
    ]

    def term() -> str:
        w = rng.choice(words)
        deco = rng.random()
        if deco < 0.12:
            return f"+{w}"
        if deco < 0.24:
            return f"-{w}"
        if deco < 0.34:
            return f'"{w}"'
        return w

    out = []
    for _ in range(n):
        k = rng.randint(1, 4)
        parts = [term() for _ in range(k)]
        q = parts[0]
        for p in parts[1:]:
            op = rng.choice([" ", " AND ", " OR "])
            q = f"{q}{op}{p}"
        if k >= 2 and rng.random() < 0.3:
            q = f"({q}) {rng.choice(['AND', 'OR'])} {term()}"
        out.append(q)
    return out


class TestRankIdentityFuzz:
    @pytest.mark.parametrize("query", _random_queries(25, seed=20260818))
    def test_random_query(self, engine, corpus_rows, query):
        texts = [r["text"] for r in corpus_rows]
        expected = oracle.search(texts, query, k=25)
        got = engine.search(query, k=25, with_metadata=False).collect()
        got_ids = [r["doc_id"] for r in got]
        exp_ids = [r.doc_id for r in expected]
        assert got_ids == exp_ids, (
            f"{query!r}: docID mismatch\n got={got_ids}\n exp={exp_ids}"
        )
        for g, e in zip(got, expected):
            assert g["score"] == pytest.approx(e.score, abs=1e-9), (
                f"{query!r}: score mismatch doc {g['doc_id']}"
            )
