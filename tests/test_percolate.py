"""Standing queries (streaming/percolate.py): a turn matches a standing
query iff the engine would return it for that query — membership AND
matched_terms pinned against SearchEngine over the same corpus, for every
query shape (AND/OR, required, excluded, quoted-exact, repair-affecting,
camelCase).  Stream==batch parity pins the streaming wiring.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from probe_spark.fixtures import transcripts_df
from probe_spark.streaming.percolate import percolate, percolate_counts

N_CONVS = 40
SEED = 7

QUERIES = {
    "q_and": "hash AND join",
    "q_or": "error OR handling",
    "q_req": "+filter group",
    "q_special": '"whitelist" OR error',
    "q_repair": "+handler -blackmail",
    "q_camel": "enableFirewallWhitelist",
}


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_convs=N_CONVS, seed=SEED)


@pytest.fixture(scope="module")
def engine(spark, corpus, tmp_path_factory):
    from probe_spark.index.build import BuildConfig, IndexBuilder
    from probe_spark.search.engine import SearchEngine

    path = str(tmp_path_factory.mktemp("perc") / "idx")
    IndexBuilder(spark, BuildConfig(n_buckets=8)).build(corpus, path)
    return SearchEngine(spark, path)


@pytest.fixture(scope="module")
def matches(corpus):
    by_q: dict[str, dict] = {}
    for r in percolate(corpus, QUERIES).collect():
        by_q.setdefault(r["query_id"], {})[
            (r["conv_id"], r["turn_idx"])
        ] = tuple(r["matched_terms"])
    return by_q


class TestEngineParity:
    @pytest.mark.parametrize("qid", sorted(QUERIES))
    def test_membership_and_matched_terms(self, engine, matches, qid):
        exp = {
            (r["conv_id"], r["turn_idx"]): tuple(r["matched_terms"])
            for r in engine.search(
                QUERIES[qid], k=None, with_metadata=True
            ).collect()
        }
        got = matches.get(qid, {})
        assert set(got) == set(exp)
        assert got == exp  # matched_terms identical too
        if qid != "q_and":
            assert got  # non-trivial coverage

    def test_invalid_query_raises_at_registration(self, corpus):
        with pytest.raises(ValueError, match="invalid standing query"):
            percolate(corpus, {"bad": "((("})

    def test_counts_twin(self, corpus, matches):
        counts = {
            r["query_id"]: r["n_matches"]
            for r in percolate_counts(percolate(corpus, QUERIES)).collect()
        }
        for qid, m in matches.items():
            assert counts.get(qid, 0) == len(m)


class TestStreamParity:
    def test_stream_equals_batch(self, spark, corpus, tmp_index_root):
        src = tempfile.mkdtemp(prefix="perc_src_", dir=tmp_index_root)
        ckpt = tempfile.mkdtemp(prefix="perc_ckpt_", dir=tmp_index_root)
        half = corpus.limit(250)
        half.write.mode("append").parquet(src)
        corpus.subtract(half).write.mode("append").parquet(src)

        stream = spark.readStream.schema(corpus.schema).parquet(src)
        name = os.path.basename(ckpt)
        q = (
            percolate(stream, QUERIES)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            (r["query_id"], r["conv_id"], r["turn_idx"]): tuple(
                r["matched_terms"]
            )
            for r in spark.table(name).collect()
        }
        want = {
            (r["query_id"], r["conv_id"], r["turn_idx"]): tuple(
                r["matched_terms"]
            )
            for r in percolate(corpus, QUERIES).collect()
        }
        assert got == want
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(src, ignore_errors=True)
