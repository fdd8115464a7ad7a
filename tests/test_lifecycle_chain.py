"""Full index-lifecycle chain (VERDICT r2 #10): shard builds -> merge ->
delete -> vacuum -> compact, asserting after EVERY step that search
results stay rank- and score-identical to a fresh build over the same
surviving corpus — the invariant a 10^12-turn deployment leans on when it
folds daily shards, erases documents, reclaims bytes, and defragments,
all without re-tokenizing.

The chain runs once per module (the expensive part); each step's
assertion is its own test so a regression names the exact step.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from probe_spark.fixtures import transcripts_df
from probe_spark.index.build import BuildConfig, IndexBuilder
from probe_spark.index.maintenance import (
    compact_index,
    delete_where,
    merge_many,
    vacuum,
)
from probe_spark.search.engine import SearchEngine

N_CONVS = 120
SEED = 23
QUERIES = [
    ("error AND handling", 10),
    ("cache OR queue OR worker", 15),
    ("database -sqlite", 10),  # special-term (repair) path
    ("api process load", 10),
]
DELETE_WHERE = "role = 'tool'"


def topk(spark, index_path, q, k):
    eng = SearchEngine(spark, index_path)
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.search(q, k=k, with_metadata=False).collect()
    ]


@pytest.fixture(scope="module")
def chain(spark, tmp_path_factory):
    """Run the whole lifecycle once; return every index path + the
    fresh-build references."""
    base = str(tmp_path_factory.mktemp("lifecycle"))
    t = transcripts_df(spark, n_convs=N_CONVS, seed=SEED)
    convs = sorted(r["conv_id"] for r in t.select("conv_id").distinct().collect())
    c1, c2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    shards = {
        "s0": t.filter(F.col("conv_id") < c1),
        "s1": t.filter((F.col("conv_id") >= c1) & (F.col("conv_id") < c2)),
        "s2": t.filter(F.col("conv_id") >= c2),
    }
    cfg = lambda: BuildConfig(n_buckets=8)  # noqa: E731
    paths = {}
    for name, df in shards.items():
        paths[name] = os.path.join(base, name)
        IndexBuilder(spark, cfg()).build(df, paths[name])

    # fresh full build (reference for merge/compact)
    paths["fresh"] = os.path.join(base, "fresh")
    IndexBuilder(spark, cfg()).build(t, paths["fresh"])

    # merged: fold the three daily shards (global conv order = s0,s1,s2)
    paths["merged"] = os.path.join(base, "merged")
    merge_many(spark, [paths["s0"], paths["s1"], paths["s2"]], paths["merged"])

    # delete: tombstone all tool turns on the merged index
    paths["deleted"] = os.path.join(base, "deleted")
    shutil.copytree(paths["merged"], paths["deleted"])
    n_del = delete_where(spark, paths["deleted"], DELETE_WHERE)
    assert n_del > 0

    # fresh build over the surviving corpus (reference for vacuum/compact)
    paths["fresh_survivors"] = os.path.join(base, "fresh_survivors")
    IndexBuilder(spark, cfg()).build(
        t.filter(f"NOT ({DELETE_WHERE})"), paths["fresh_survivors"]
    )

    # vacuum the tombstones away, then compact the segment chains
    paths["vacuumed"] = os.path.join(base, "vacuumed")
    shutil.copytree(paths["deleted"], paths["vacuumed"])
    vacuum(spark, paths["vacuumed"])

    paths["compacted"] = os.path.join(base, "compacted")
    shutil.copytree(paths["vacuumed"], paths["compacted"])
    compact_index(spark, paths["compacted"])
    return paths


@pytest.mark.parametrize("q,k", QUERIES)
class TestLifecycleChain:
    def test_merge_matches_fresh(self, spark, chain, q, k):
        assert topk(spark, chain["merged"], q, k) == topk(
            spark, chain["fresh"], q, k
        )

    def test_delete_masks_before_topk(self, spark, chain, q, k):
        """Tombstoned docs vanish; survivor scores stay AS BUILT (Lucene
        deleted-docs semantics: stats change only at vacuum) — so the
        deleted index's result = fresh full build's scores restricted to
        survivors, re-cut to k."""
        eng = SearchEngine(spark, chain["fresh"])
        full = eng.search(q, k=None, with_metadata=False)
        survivors = {
            r["doc_id"]
            for r in SearchEngine(spark, chain["fresh_survivors"])
            .docs.select("doc_id")
            .collect()
        }
        # fresh_survivors reassigns dense docIDs; map via (conv, turn)
        fresh_meta = {
            (r["conv_id"], r["turn_idx"])
            for r in SearchEngine(spark, chain["fresh_survivors"])
            .docs.select("conv_id", "turn_idx")
            .collect()
        }
        keyed = {
            r["doc_id"]: (r["conv_id"], r["turn_idx"])
            for r in eng.docs.select("doc_id", "conv_id", "turn_idx").collect()
        }
        expect = [
            (r["doc_id"], round(r["score"], 9))
            for r in sorted(
                full.collect(),
                key=lambda r: (-r["score"], r["doc_id"]),
            )
            if keyed[r["doc_id"]] in fresh_meta
        ][:k]
        assert topk(spark, chain["deleted"], q, k) == expect
        assert survivors  # sanity

    def test_vacuum_matches_fresh_survivor_build(self, spark, chain, q, k):
        """After vacuum, scores are recomputed over survivor stats: the
        result must be bit-identical to a fresh build of the surviving
        corpus (same docID order: merge preserved global conv order and
        vacuum densifies in order)."""
        got = topk(spark, chain["vacuumed"], q, k)
        ref = topk(spark, chain["fresh_survivors"], q, k)
        assert [s for _, s in got] == [s for _, s in ref]
        # docIDs agree through the (conv_id, turn_idx) identity
        ids = lambda p, rows: [  # noqa: E731
            tuple(r)
            for r in SearchEngine(spark, p)
            .docs.filter(F.col("doc_id").isin([d for d, _ in rows]))
            .select("conv_id", "turn_idx")
            .collect()
        ]
        assert sorted(ids(chain["vacuumed"], got)) == sorted(
            ids(chain["fresh_survivors"], ref)
        )

    def test_compact_is_invisible(self, spark, chain, q, k):
        assert topk(spark, chain["compacted"], q, k) == topk(
            spark, chain["vacuumed"], q, k
        )


class TestLifecycleLayout:
    def test_compact_collapses_to_fresh_segment_count(self, spark, chain):
        import pyarrow.dataset as pds

        def n_segs(path):
            return pds.dataset(
                os.path.join(path, "postings"), format="parquet",
                partitioning="hive",
            ).to_table(columns=["term"]).num_rows

        # the merge chain accumulates per-shard segments; compaction
        # brings the count back to the fresh survivor build's layout
        assert n_segs(chain["compacted"]) <= n_segs(chain["vacuumed"])
        assert n_segs(chain["compacted"]) == n_segs(chain["fresh_survivors"])
