"""Batched multi-query retrieval (`SearchEngine.search_batch`): many
queries over ONE shared postings exchange — the offline bulk-retrieval
shape (training-data mining, eval suites).  The contract is per-query
rank- AND score-identity to `search(q, k)` across every query shape in
the reference suite, with fallback queries (zero-included, repair-
affecting specials) unioned in transparently."""

from __future__ import annotations

import pytest

from probe_spark.fixtures import REFERENCE_QUERIES, transcripts_df

N_CONVS = 60
SEED = 42


@pytest.fixture(scope="module")
def engine(spark, tmp_index_root):
    from probe_spark.index.build import BuildConfig, IndexBuilder
    from probe_spark.search.engine import SearchEngine

    path = f"{tmp_index_root}/idx_batch"
    df = transcripts_df(spark, N_CONVS, SEED)
    IndexBuilder(spark, BuildConfig(n_buckets=8)).build(df, path)
    return SearchEngine(spark, path)


def _by_query(rows):
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r["query_idx"], []).append(r)
    return out


class TestBatchRankIdentity:
    def test_whole_reference_suite_in_one_batch(self, engine):
        """Every reference query, one batch, each at its NATIVE k:
        per-query rows equal search() exactly (same doc_ids,
        bit-identical scores, same order)."""
        queries = [q for _i, q, _k in REFERENCE_QUERIES]
        ks = [k for _i, _q, k in REFERENCE_QUERIES]
        batch = _by_query(
            engine.search_batch(queries, k=ks).collect()
        )
        for qi, (q, kq) in enumerate(zip(queries, ks)):
            solo = engine.search(q, k=kq, with_metadata=False).collect()
            got = [
                (r["doc_id"], r["score"]) for r in batch.get(qi, [])
            ]
            want = [(r["doc_id"], r["score"]) for r in solo]
            assert got == want, f"q{qi} {q!r}: {got} != {want}"
            for r in batch.get(qi, []):
                assert r["query"] == q

    def test_with_metadata_matches_solo(self, engine):
        queries = ["error AND handling", "ip whitelist", "+handler -blackmail"]
        batch = _by_query(
            engine.search_batch(queries, k=5, with_metadata=True).collect()
        )
        for qi, q in enumerate(queries):
            solo = engine.search(q, k=5, with_metadata=True).collect()
            got = batch.get(qi, [])
            assert len(got) == len(solo)
            for g, s in zip(got, solo):
                assert g["doc_id"] == s["doc_id"]
                assert g["score"] == s["score"]
                assert sorted(g["matched_terms"]) == sorted(
                    s["matched_terms"]
                )
                assert g["text"] == s["text"]
                assert (g["conv_id"], g["turn_idx"]) == (
                    s["conv_id"],
                    s["turn_idx"],
                )

    def test_large_batch_metadata_uses_distributed_join(
        self, engine, monkeypatch
    ):
        """Past ISIN_PUSHDOWN_CAP winners the metadata attach switches to
        one distributed docs join for the whole batch — same rows."""
        from probe_spark.search import engine as eng_mod

        monkeypatch.setattr(eng_mod, "ISIN_PUSHDOWN_CAP", 1)
        queries = ["error AND handling", "ip whitelist"]
        batch = _by_query(
            engine.search_batch(queries, k=4, with_metadata=True).collect()
        )
        for qi, q in enumerate(queries):
            solo = engine.search(q, k=4, with_metadata=True).collect()
            got = [(r["doc_id"], r["score"], r["text"]) for r in batch[qi]]
            want = [(r["doc_id"], r["score"], r["text"]) for r in solo]
            assert got == want

    def test_where_scopes_whole_batch(self, engine):
        """One metadata scope for all queries (the mining-job shape):
        per-query rows equal search(q, where=...) exactly; an impossible
        scope empties every query; an invalid predicate raises."""
        pred = "role = 'assistant'"
        queries = ["error AND handling", "cache OR queue", "-onlyexcluded"]
        batch = _by_query(
            engine.search_batch(queries, k=5, where=pred).collect()
        )
        for qi, q in enumerate(queries):
            solo = engine.search(
                q, k=5, with_metadata=False, where=pred
            ).collect()
            got = [(r["doc_id"], r["score"]) for r in batch.get(qi, [])]
            assert got == [(r["doc_id"], r["score"]) for r in solo]

        empty = engine.search_batch(
            ["error"], k=5, where="role = 'nosuchrole'"
        ).collect()
        assert empty == []

        with pytest.raises(ValueError):
            engine.search_batch(["error"], k=5, where="no_such_col = 1")

    def test_duplicate_queries_stay_distinct(self, engine):
        batch = _by_query(
            engine.search_batch(["error", "error"], k=3).collect()
        )
        assert set(batch) == {0, 1}
        a = [(r["doc_id"], r["score"]) for r in batch[0]]
        b = [(r["doc_id"], r["score"]) for r in batch[1]]
        assert a == b and len(a) == 3

    def test_unparseable_and_unknown_terms_contribute_nothing(self, engine):
        batch = _by_query(
            engine.search_batch(
                ["error", "zzzznotaword", "(((("], k=5
            ).collect()
        )
        assert 0 in batch
        assert 1 not in batch
        assert 2 not in batch

    def test_tombstones_masked_in_batch(self, spark, tmp_path):
        """Deleted docs vanish from batch results exactly as from solo
        search (tombstones ride the shared exclude mask)."""
        from probe_spark.index.build import BuildConfig, IndexBuilder
        from probe_spark.index.maintenance import delete_where
        from probe_spark.search.engine import SearchEngine

        path = str(tmp_path / "idx_tomb")
        IndexBuilder(spark, BuildConfig(n_buckets=4)).build(
            transcripts_df(spark, 30, 11), path
        )
        pre = SearchEngine(spark, path)
        top = pre.search("error", k=1, with_metadata=True).collect()
        victim_conv = top[0]["conv_id"]
        n = delete_where(spark, path, f"conv_id = '{victim_conv}'")
        assert n > 0
        eng = SearchEngine(spark, path)  # fresh (tombstones load lazily)
        batch = _by_query(
            eng.search_batch(["error", "cache OR queue"], k=10).collect()
        )
        assert top[0]["doc_id"] not in {r["doc_id"] for r in batch.get(0, [])}
        for qi, q in enumerate(["error", "cache OR queue"]):
            solo = eng.search(q, k=10, with_metadata=False).collect()
            got = [(r["doc_id"], r["score"]) for r in batch.get(qi, [])]
            assert got == [(r["doc_id"], r["score"]) for r in solo]

    def test_zero_winner_metadata_batch_keeps_types(self, engine, tmp_path):
        """A compiled batch whose queries match nothing must keep the
        CORPUS metadata column types (NullType columns crash parquet
        sinks and later unions)."""
        out = engine.search_batch(
            ["hash AND zzzznotaword"], k=5, with_metadata=True
        )
        assert out.count() == 0
        assert "void" not in [f.dataType.simpleString() for f in out.schema]
        out.write.mode("overwrite").parquet(str(tmp_path / "sink"))

    def test_empty_batch(self, engine):
        out = engine.search_batch([], k=5)
        assert out.count() == 0
        assert out.columns[:4] == ["query_idx", "query", "doc_id", "score"]


class TestBatchPlanShape:
    def test_one_shared_arrow_stage_for_eligible_queries(self, engine):
        """An all-eligible batch rides ONE mapInArrow over one exchange —
        the amortization that makes batching worth it at cluster scale."""
        df = engine.search_batch(
            ["error AND handling", "ip whitelist", "cache OR queue"], k=5
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInArrow") == 1, plan

    def test_fallback_queries_union_in(self, engine):
        """-onlyexcluded is zero-included (every doc qualifies) -> cannot
        ride the range path; it falls back to search() and unions in."""
        df = engine.search_batch(["error", "-onlyexcluded"], k=5)
        rows = _by_query(df.collect())
        solo = engine.search(
            "-onlyexcluded", k=5, with_metadata=False
        ).collect()
        got = [(r["doc_id"], r["score"]) for r in rows.get(1, [])]
        assert got == [(r["doc_id"], r["score"]) for r in solo]


class TestBatchUnionGate:
    def test_or_excluded_shape_rejects_other_queries_candidates(self, engine):
        """Regression (hypothesis-found): a query of shape
        '"a" AND "a" OR -"a"' evaluates true-with-empty-matched-terms on
        docs that hold NONE of its keywords, so on the batch path it used
        to accept the OTHER queries' candidates at score 0.  The
        elastic_query.rs:372-374 early-termination gate in the range
        evaluator must drop them: batch rows == solo rows exactly."""
        q1 = '"whitelist" AND "whitelist" OR -"whitelist"'
        q2 = "error OR handler"  # broad: many candidates without whitelist
        batch = _by_query(engine.search_batch([q1, q2], k=None).collect())
        for idx, q in enumerate([q1, q2]):
            solo = [
                (r["doc_id"], r["score"])
                for r in engine.search(
                    q, k=None, with_metadata=False
                ).collect()
            ]
            got = [(r["doc_id"], r["score"]) for r in batch.get(idx, [])]
            assert sorted(got) == sorted(solo), q


class TestBatchAllMatches:
    def test_k_none_returns_every_match_per_query(self, engine):
        """k=None (scalar or per-query) = the full result set, identical
        to search(q, k=None) — the mining default."""
        queries = ["error OR handler", "database -sqlite", '"whitelist"']
        batch = _by_query(engine.search_batch(queries, k=None).collect())
        for idx, q in enumerate(queries):
            solo = [
                (r["doc_id"], r["score"])
                for r in engine.search(q, k=None, with_metadata=False).collect()
            ]
            got = [(r["doc_id"], r["score"]) for r in batch.get(idx, [])]
            # k=None solo results carry no ordering guarantee: compare sets
            assert sorted(got) == sorted(solo), q
        # mixed per-query: one capped, one unlimited
        mixed = _by_query(
            engine.search_batch(queries[:2], k=[5, None]).collect()
        )
        assert len(mixed[0]) == 5
        assert sorted(
            (r["doc_id"], r["score"]) for r in mixed[1]
        ) == sorted(
            (r["doc_id"], r["score"])
            for r in engine.search(
                queries[1], k=None, with_metadata=False
            ).collect()
        )
