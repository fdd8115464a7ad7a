"""Special-term repair on the doc-range path (`_repair_overlay`): queries
whose exact/excluded terms change doc tokenization ride the one-exchange
ranged evaluation with a driver-resident repaired overlay instead of the
full groupBy path — and fall back to the full path, with identical
results, when the affected set exceeds the driver caps.

Reference semantics being reproduced: global add_special_term
retokenization (file_processing.rs:1090-1180, ranking.rs:186-208).
"""

from __future__ import annotations

import pytest

from probe_spark import oracle
from probe_spark.fixtures import transcripts_df, transcripts_rows

N_CONVS = 60
SEED = 42

# every shape the overlay must cover: required+excluded, plain+excluded
# (unmatchable special whose registration still shifts df), optional OR
# excluded, and an exact term (repair via camel fragments)
REPAIR_QUERIES = [
    "+handler -blackmail",
    "table -hashtable",
    "hash -hashtable",
    "handler OR -blackmail",
    '"hashtable" OR error',
]


@pytest.fixture(scope="module")
def corpus_rows():
    return transcripts_rows(N_CONVS, SEED)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from probe_spark.index.build import BuildConfig, IndexBuilder
    from probe_spark.search.engine import SearchEngine

    path = str(tmp_path_factory.mktemp("ranged_repair") / "idx")
    IndexBuilder(spark, BuildConfig(n_buckets=8)).build(
        transcripts_df(spark, N_CONVS, SEED), path
    )
    return SearchEngine(spark, path)


def _ids_scores(rows):
    return [(r["doc_id"], r["score"]) for r in rows]


class TestOverlayPath:
    @pytest.mark.parametrize("query", REPAIR_QUERIES)
    def test_rank_identity_via_overlay(self, engine, corpus_rows, query):
        got = engine.search(query, k=15, with_metadata=False).collect()
        expected = oracle.search(
            [r["text"] for r in corpus_rows], query, k=15
        )
        assert [r["doc_id"] for r in got] == [e.doc_id for e in expected]
        for g, e in zip(got, expected):
            assert g["score"] == pytest.approx(e.score, abs=1e-9)

    def test_overlay_taken_not_full_path(self, engine):
        engine._overlay_cache.clear()
        engine._repair_cache.clear()
        engine.search("+handler -blackmail", k=10, with_metadata=False).collect()
        # the repair rode the overlay: bundle cached, full-path repair
        # machinery never engaged
        assert len(engine._overlay_cache) == 1
        bundle = next(iter(engine._overlay_cache.values()))
        assert bundle is not None and bundle[0].size > 0
        assert not engine._repair_cache

    def test_overlay_plan_has_no_groupby(self, engine):
        df = engine.search("+handler -blackmail", k=10, with_metadata=False)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" not in plan, plan

    def test_matched_terms_from_overlay(self, engine, corpus_rows):
        got = engine.search("hash -hashtable", k=15).collect()
        texts = {r["doc_id"]: r["text"] for r in got}
        from probe_spark.functions.tokenizer import tokenize

        for r in got:
            toks = set(tokenize(texts[r["doc_id"]], frozenset({"hashtable"})))
            assert set(r["matched_terms"]) == {"hash"} & toks


class TestExcludeOnRanged:
    def test_session_paging_with_repair_overlay(self, engine, spark):
        # repair overlay + session-exclude on the same ranged plan:
        # page 2 = next-k unseen, union == unfiltered top-2k
        q = "+handler -blackmail"
        ids1 = [
            r["doc_id"]
            for r in engine.search(q, k=6, with_metadata=False).collect()
        ]
        p2 = engine.search(
            q,
            k=6,
            with_metadata=False,
            exclude=spark.createDataFrame([(i,) for i in ids1], "doc_id long"),
        ).collect()
        both = engine.search(q, k=12, with_metadata=False).collect()
        assert ids1 + [r["doc_id"] for r in p2] == [
            r["doc_id"] for r in both
        ]

    def test_exclude_identical_to_full_path(self, engine, spark, monkeypatch):
        q = "error OR handling"
        seen = spark.createDataFrame([(3,), (17,), (42,)], "doc_id long")
        via_ranged = engine.search(
            q, k=10, with_metadata=False, exclude=seen
        ).collect()
        import probe_spark.search.engine as eng_mod

        monkeypatch.setattr(eng_mod, "EXCLUDE_COLLECT_CAP", 0)
        via_full = engine.search(
            q, k=10, with_metadata=False, exclude=seen
        ).collect()
        assert _ids_scores(via_ranged) == _ids_scores(via_full)


class TestCapFallback:
    @pytest.mark.parametrize("query", REPAIR_QUERIES[:3])
    def test_full_path_identical_past_cap(
        self, engine, monkeypatch, query
    ):
        via_overlay = engine.search(query, k=15, with_metadata=False).collect()
        import probe_spark.search.engine as eng_mod

        monkeypatch.setattr(eng_mod, "REPAIR_OVERLAY_CAP", 0)
        engine._overlay_cache.clear()
        via_full = engine.search(query, k=15, with_metadata=False).collect()
        # past the cap the bundle is infeasible -> full repair path,
        # bit-identical results
        assert next(iter(engine._overlay_cache.values())) is None
        assert _ids_scores(via_overlay) == _ids_scores(via_full)
        engine._overlay_cache.clear()
