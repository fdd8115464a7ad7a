"""Guards for the driver contract (__spark_entry__ / probe_spark.entrypoints).

No SparkSession here — these pin the *static* invariants the oracle SQL
depends on: the inlined word->token CASE mapping matches the real tokenizer,
every query has an oracle, and every oracle parses and runs in DuckDB.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from probe_spark import entrypoints
from probe_spark.functions.tokenizer import tokenize

SF_DIR = "/root/testdata/sf0.001"

DOCS_VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "a", "group",
    "part", "big", "sort", "query", "fast", "the", "dup",
]


class TestStemMapPinned:
    def test_stopwords_drop(self):
        for w in entrypoints.STOPWORDS_IN_CORPUS:
            assert tokenize(w) == []

    def test_every_vocab_word_maps_to_single_token(self):
        for w in DOCS_VOCAB:
            toks = tokenize(w)
            if w in entrypoints.STOPWORDS_IN_CORPUS:
                assert toks == []
            else:
                assert toks == [entrypoints.STEM_MAP.get(w, w)], w

    def test_vocab_still_matches_testdata(self):
        """If the driver regenerates documents.parquet with new words, the
        CASE mapping must be extended — fail loudly here, not with a silent
        oracle hash mismatch."""
        if not os.path.exists(f"{SF_DIR}/documents.parquet"):
            pytest.skip("testdata not present")
        words = {
            w
            for (w,) in duckdb.sql(
                f"SELECT DISTINCT unnest(string_split(text, ' ')) "
                f"FROM '{SF_DIR}/documents.parquet'"
            ).fetchall()
        }
        assert words <= set(DOCS_VOCAB)


class TestContractShape:
    def test_every_query_has_an_oracle(self):
        # rows-only queries are an explicit, documented exception set
        assert set(entrypoints.ORACLES) & entrypoints.ROWS_ONLY == set()
        assert set(entrypoints.ORACLES) | entrypoints.ROWS_ONLY == set(
            entrypoints.QUERIES
        )

    def test_oracles_run_in_duckdb(self):
        if not os.path.exists(f"{SF_DIR}/documents.parquet"):
            pytest.skip("testdata not present")
        con = duckdb.connect()
        for t in ("documents", "embeddings", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )
        for name, sql in entrypoints.ORACLES.items():
            rel = con.sql(sql)
            cols = [d[0] for d in rel.description]
            assert len(cols) == len(set(cols)), f"{name}: duplicate columns"
            rel.fetchmany(3)  # executes the plan

    def test_spark_entry_module_exports(self):
        import __spark_entry__ as m

        assert callable(m.entry)
        q = m.queries()
        o = m.oracle_sql()
        assert set(o) | entrypoints.ROWS_ONLY == set(q)
        assert len(q) >= 19
