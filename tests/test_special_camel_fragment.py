"""Closed round-1 deviation: a special (exact/excluded) term occurring only
as a camelCase *fragment* of a longer word must be credited.

Reference semantics (tokenization.rs:1167-1187 ``is_special_case`` consulted
per camel part inside 2651-2764): registering K as a special term keeps the
matching camel part whole, so a doc containing 'myHashmapImpl' matches the
exact query ``"hashmap"`` and its dl/DF shift accordingly.  The engine
sources such docs through the raw-word index, which since format v7 stores
base camel parts and special-prefix suffixes alongside full runs
(probe_spark/functions/tokenizer.py ``_word_special_runs``).

Every assertion is engine-vs-oracle rank identity (docIDs exact, scores to
1e-9) — the oracle retokenizes the whole corpus per query with the special
set registered, exactly like the reference's global mutable set.
"""

from __future__ import annotations

import datetime

import pytest

from probe_spark import oracle

TEXTS = [
    "use myHashmapImpl now today",  # K='hashmap' only as camel fragment
    "use hashmap now please",  # whole-word occurrence
    "noise document about nothing",
    "hash words here",  # base token 'hash' but never 'hashmap'
    "the oauth2HashmapThing exists",  # special-prefix strip then fragment
    "WhitelistHashmap combo word",  # two special-eligible camel parts
    "plain quicksortish variant",  # fragment-adjacent: NOT the term itself
]

QUERIES = [
    '"hashmap"',
    "+hashmap",
    "hashmap -nothing",
    "today -hashmap",  # excluded term present only as a fragment
    '"whitelist"',
    '"quicksort"',  # must NOT credit 'quicksortish'
    '"hashmap" AND combo',
]


@pytest.fixture(scope="module")
def camel_engine(spark, tmp_index_root):
    from probe_spark.index.build import BuildConfig, IndexBuilder
    from probe_spark.search.engine import SearchEngine

    rows = [
        {
            "conv_id": f"c{i}",
            "turn_idx": 0,
            "role": "user",
            "text": t,
            "tool": "",
            "ts": datetime.datetime(2026, 1, 1),
        }
        for i, t in enumerate(TEXTS)
    ]
    path = f"{tmp_index_root}/idx_camel"
    IndexBuilder(spark, BuildConfig(n_buckets=2)).build(
        spark.createDataFrame(rows), path
    )
    return SearchEngine(spark, path)


@pytest.mark.parametrize("query", QUERIES)
def test_camel_fragment_rank_identity(camel_engine, query):
    got = [
        (r["doc_id"], r["score"])
        for r in camel_engine.search(query, k=10)
        .orderBy(["score", "doc_id"], ascending=[False, True])
        .collect()
    ]
    want = [(r.doc_id, r.score) for r in oracle.search(TEXTS, query, k=10)]
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), query


def test_fragment_doc_is_credited(camel_engine):
    """The doc whose only occurrence is the camel fragment must appear."""
    ids = {
        r["doc_id"] for r in camel_engine.search('"hashmap"', k=10).collect()
    }
    assert 0 in ids  # myHashmapImpl
    assert 4 in ids  # oauth2HashmapThing
    assert 5 in ids  # WhitelistHashmap


def test_fragment_exclusion(camel_engine):
    """'-hashmap' must exclude docs where it is only a camel fragment."""
    ids = {
        r["doc_id"]
        for r in camel_engine.search("today -hashmap", k=10).collect()
    }
    assert 0 not in ids


def test_raw_keys_cover_fragments():
    from probe_spark.functions.tokenizer import raw_special_words

    assert "hashmap" in raw_special_words("use myHashmapImpl now")
    assert "hashmap" in raw_special_words("the oauth2HashmapThing exists")
    assert "whitelist" in raw_special_words("WhitelistHashmap combo")
    # plain lowercase single-part words do not fan out beyond their runs
    assert raw_special_words("use hashmap now") == ["use", "hashmap", "now"]
