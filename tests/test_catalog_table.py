"""Catalog-table input path (VERDICT r4 #8): ``--input <db.table>``
resolved through ``spark.read.table`` — the Iceberg ingestion surface.

This sandbox has no Iceberg runtime jar, so the nearest substitute runs:
a session-catalog (Derby-metastore-style spark-warehouse) managed table
created with ``saveAsTable``, driven through the SAME ``cli._read_input``
dotted-identifier branch an Iceberg catalog table would take.  What this
pins: identifier-vs-path dispatch, build from a catalog DataFrame (no
POSIX corpus path — the builder's non-direct reader lane), query parity
against the path-built index, and maintenance over the result.

Iceberg-specific behaviors this CANNOT cover (documented, asserted
nowhere): snapshot-isolation reads (``VERSION AS OF``), partition-spec
evolution, and sort-order metadata feeding the build's sortedness probe
— on a real Iceberg deployment ``spark.read.table`` returns the same
DataFrame shape, so the engine-side code path is identical; only the
catalog's own guarantees differ.
"""

from __future__ import annotations

import json

import pytest

N_CONVS = 40
SEED = 9


@pytest.fixture(scope="module")
def catalog_table(spark):
    from probe_spark.fixtures import transcripts_df

    spark.sql("CREATE DATABASE IF NOT EXISTS probe_cat_test")
    transcripts_df(spark, N_CONVS, SEED).write.mode("overwrite").saveAsTable(
        "probe_cat_test.transcripts"
    )
    yield "probe_cat_test.transcripts"
    spark.sql("DROP TABLE IF EXISTS probe_cat_test.transcripts")
    spark.sql("DROP DATABASE IF EXISTS probe_cat_test")


class TestCatalogTableInput:
    def test_read_input_dispatch(self, spark, catalog_table, tmp_path):
        from probe_spark import cli

        df = cli._read_input(spark, catalog_table)
        assert df.count() > 0
        assert set(df.columns) >= {
            "conv_id", "turn_idx", "role", "text", "tool", "ts"
        }
        # path-looking inputs keep the parquet branch
        p = str(tmp_path / "x.parquet")
        df.limit(5).write.parquet(p)
        assert cli._read_input(spark, p).count() == 5

    def test_build_query_maintain_via_catalog(
        self, spark, catalog_table, tmp_path, capsys
    ):
        from probe_spark import cli
        from probe_spark.fixtures import transcripts_df
        from probe_spark.index.build import BuildConfig, IndexBuilder
        from probe_spark.search.engine import SearchEngine

        idx = str(tmp_path / "cat_idx")
        rc = cli.main(
            [
                "build", "--input", catalog_table, "--output", idx,
                "--n-buckets", "4",
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["n_docs"] == N_CONVS or out["n_docs"] > 0

        # parity: identical corpus built from a path must rank identically
        # (blank_lines_over=500 matches the CLI's reference-default)
        ref_idx = str(tmp_path / "ref_idx")
        IndexBuilder(
            spark, BuildConfig(n_buckets=4, blank_lines_over=500)
        ).build(transcripts_df(spark, N_CONVS, SEED), ref_idx)
        eng_cat = SearchEngine(spark, idx)
        eng_ref = SearchEngine(spark, ref_idx)
        assert eng_cat.n_docs == eng_ref.n_docs
        assert eng_cat.avgdl == eng_ref.avgdl
        for q in ("error AND handling", "database -sqlite", "error"):
            got = [
                (r["doc_id"], round(r["score"], 9))
                for r in eng_cat.search(q, k=10).collect()
            ]
            want = [
                (r["doc_id"], round(r["score"], 9))
                for r in eng_ref.search(q, k=10).collect()
            ]
            assert got == want, q

        # maintenance over the catalog-built index
        from probe_spark.index.maintenance import delete_where, vacuum
        from probe_spark.index.verify import verify_index

        n_del = delete_where(spark, idx, "turn_idx = 0")
        assert n_del > 0
        vacuum(spark, idx)
        eng2 = SearchEngine(spark, idx)
        assert eng2.n_docs == out["n_docs"] - n_del
        assert verify_index(spark, idx)["ok"]
