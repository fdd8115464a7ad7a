"""Metadata-scoped search (``search(where=...)``): only docs matching a
Spark SQL predicate over the metadata columns may qualify, filtered BEFORE
top-k, while idf/avgdl/n_docs stay corpus-global (filter context — the
Lucene/ES sense: a doc scores identically inside and outside the scope).

The ground truth for every case is the engine's own oracle-pinned
k=None full result set, predicate-filtered and re-cut by the global
ordering (score desc, doc_id asc) — so these tests pin the scoped paths
(ranged + allow_ids, repair overlay + allow_ids, full-path semi-join)
to the already-pinned unscoped semantics.
"""

from __future__ import annotations

import pytest

from probe_spark.fixtures import transcripts_df
from probe_spark.search import engine as eng_mod

N_CONVS = 60
SEED = 42


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from probe_spark.index.build import BuildConfig, IndexBuilder
    from probe_spark.search.engine import SearchEngine

    path = str(tmp_path_factory.mktemp("scoped") / "idx")
    IndexBuilder(spark, BuildConfig(n_buckets=8)).build(
        transcripts_df(spark, N_CONVS, SEED), path
    )
    return SearchEngine(spark, path)


def _expected(engine, query, where, k):
    """Unscoped full set -> predicate filter -> global-order re-cut."""
    full = engine.search(query, k=None, with_metadata=False).collect()
    allowed = {
        r["doc_id"]
        for r in engine.docs.filter(where).select("doc_id").collect()
    }
    rows = sorted(
        ((r["doc_id"], r["score"]) for r in full if r["doc_id"] in allowed),
        key=lambda t: (-t[1], t[0]),
    )
    return rows[:k]


def _got(engine, query, where, k, **kw):
    return [
        (r["doc_id"], r["score"])
        for r in engine.search(
            query, k=k, with_metadata=False, where=where, **kw
        ).collect()
    ]


SCOPES = [
    "role = 'user'",
    "tool IS NOT NULL AND tool <> ''",
    "ts >= timestamp'2026-01-01 10:00:00' AND ts < timestamp'2026-01-01 30:00:00'"
    .replace("30:00:00", "20:00:00"),
    "conv_id >= 'conv00000020' AND turn_idx % 2 = 0",
]


class TestScopedRanked:
    @pytest.mark.parametrize("where", SCOPES)
    def test_ranged_path_matches_filtered_full_set(self, engine, where):
        q = "error OR handling"
        assert _got(engine, q, where, 12) == _expected(engine, q, where, 12)

    def test_scores_stay_corpus_global(self, engine):
        # filter context: a doc's score inside the scope == outside it
        where = "role = 'user'"
        scoped = dict(_got(engine, "error OR handling", where, 12))
        full = {
            r["doc_id"]: r["score"]
            for r in engine.search(
                "error OR handling", k=None, with_metadata=False
            ).collect()
        }
        for doc, score in scoped.items():
            assert score == full[doc]

    def test_repair_overlay_respects_scope(self, engine):
        # special terms (retok repair) ride the ranged path with the scope
        q = "+handler -blackmail"
        where = "role = 'user'"
        assert _got(engine, q, where, 10) == _expected(engine, q, where, 10)

    def test_full_path_semi_join_identical(self, engine, monkeypatch):
        # force the allow set past the cap -> distributed semi-join path
        q = "error OR handling"
        where = "role = 'user'"
        engine._allow_cache.clear()
        monkeypatch.setattr(eng_mod, "ALLOW_COLLECT_CAP", 0)
        got = _got(engine, q, where, 12)
        engine._allow_cache.clear()
        monkeypatch.undo()
        assert got == _expected(engine, q, where, 12)

    def test_k_none_export_scoped(self, engine):
        q = "error OR handling"
        where = "role = 'assistant'"
        got = sorted(_got(engine, q, where, None))
        exp = sorted(
            _expected(engine, q, where, 10**9)
        )
        assert got == exp

    def test_time_window_pages_fill(self, engine):
        # a narrow window over the time-clustered fixture still fills k
        where = (
            "ts >= timestamp'2026-01-01 10:00:00' "
            "AND ts < timestamp'2026-01-01 20:00:00'"
        )
        rows = engine.search("error", k=8, where=where).collect()
        assert len(rows) == 8
        assert all(
            "2026-01-01 10" <= str(r["ts"])[:13] <= "2026-01-01 19"
            for r in rows
        )

    def test_zero_included_query_scoped(self, engine):
        # only-excluded queries score every doc — the scope must cut them
        where = "role = 'user'"
        rows = engine.search(
            "-blackmail", k=None, with_metadata=True, where=where
        ).collect()
        assert rows and all(r["role"] == "user" for r in rows)

    def test_empty_scope_returns_empty(self, engine):
        assert (
            engine.search("error", k=5, where="role = 'nosuchrole'")
            .collect()
            == []
        )

    def test_invalid_predicate_raises(self, engine):
        with pytest.raises(ValueError, match="invalid where predicate"):
            engine.search("error", k=5, where="nosuchcol = 1")

    def test_files_only_scoped(self, engine):
        where = "role = 'user'"
        convs = [
            r["conv_id"]
            for r in engine.search_files(
                "error OR handling", max_results=10**6, where=where
            ).collect()
        ]
        full = engine.search(
            "error OR handling", k=None, with_metadata=True, where=where
        )
        exp = sorted({r["conv_id"] for r in full.select("conv_id").collect()})
        assert convs == exp


class TestRangePruning:
    def test_narrow_scope_prunes_ranges_in_plan(self, engine):
        # the scale move: a narrow time window prunes whole doc ranges
        # from the exchange (range_id IN (...) reaches the plan before
        # the repartition)
        where = (
            "ts >= timestamp'2026-01-01 10:00:00' "
            "AND ts < timestamp'2026-01-01 12:00:00'"
        )
        df = engine.search("error", k=5, with_metadata=False, where=where)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # a Filter on range_id sits between the explode and the exchange
        # (Catalyst folds a one-element IN to =, so match the filter head)
        assert "Filter (range_id" in plan or "Filter range_id" in plan


class TestScopedSessionInterplay:
    def test_exclude_and_where_compose(self, engine, spark):
        q = "error OR handling"
        where = "role = 'user'"
        first = engine.search(q, k=5, with_metadata=False, where=where)
        seen = first.select("doc_id")
        second = engine.search(
            q, k=5, with_metadata=False, where=where, exclude=seen
        ).collect()
        exp = _expected(engine, q, where, 10)
        assert [(r["doc_id"], r["score"]) for r in second] == exp[5:10]
