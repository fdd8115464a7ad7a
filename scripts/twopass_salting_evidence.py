"""Plan-level evidence for the two-pass merge's hot-term salting
(VERDICT r4 #7: "the hot-term salting observed in the plan").

Runs a SMALL two-pass build (fused=False) with a deliberately tiny
``max_postings_per_segment`` so common terms exceed the df threshold,
and captures, from the REAL code path (``_merge_partials`` is wrapped,
not reimplemented):

  1. the formatted Spark plan of the salted merge shuffle — the
     ``Exchange hashpartitioning(kind, term, salt)`` that spreads one
     hot term's merge across tasks;
  2. the resulting segment layout: per-term ``n_salts`` from the final
     postings, showing hot terms actually split into multiple
     doc-contiguous salt groups while cold terms keep n_salts=1.

Appends the evidence to SCALING_TWOPASS.json under "salting_evidence"
(creates the file if the scaling run hasn't written it yet).

Usage: python scripts/twopass_salting_evidence.py
"""

from __future__ import annotations

import io
import json
import os
import sys
import tempfile
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import bench
    from pyspark.sql import functions as F

    import probe_spark.index.build as B
    from probe_spark.fixtures import transcripts_df

    spark = bench.build_spark(8)
    spark.sparkContext.setLogLevel("ERROR")

    captured: dict = {}
    orig = B._merge_partials

    def wrapped(spark_, partials_path, n_docs, cfg, out_path, append=False):
        partials = spark_.read.parquet(partials_path).filter(
            F.col("kind") != "@stats"
        )
        salted = B._salted_partials(partials, n_docs, cfg)
        shuffled = salted.repartition("kind", "term", "salt")
        buf = io.StringIO()
        with redirect_stdout(buf):
            shuffled.explain("formatted")
        captured["plan"] = buf.getvalue()
        return orig(spark_, partials_path, n_docs, cfg, out_path, append)

    B._merge_partials = wrapped
    try:
        idx = tempfile.mkdtemp(prefix="salt_evidence_idx_")
        # tiny segment cap -> every common term is "hot" (df > 256)
        B.IndexBuilder(
            spark,
            B.BuildConfig(fused=False, max_postings_per_segment=256),
        ).build(transcripts_df(spark, n_convs=400, seed=11), idx)
    finally:
        B._merge_partials = orig

    plan = captured.get("plan", "")
    assert "hashpartitioning" in plan and "salt" in plan, plan[-2000:]

    seg = (
        spark.read.parquet(f"{idx}/postings")
        .filter(F.col("kind") == "tok")
        .groupBy("term")
        .agg(
            F.max("n_salts").alias("n_salts"),
            F.countDistinct("salt").alias("distinct_salts"),
            F.sum("df_seg").alias("df"),
        )
    )
    hot = (
        seg.filter(F.col("n_salts") > 1)
        .orderBy(F.desc("df"))
        .limit(5)
        .collect()
    )
    cold = seg.filter(F.col("n_salts") == 1).count()
    assert hot, "no hot term got salted — raise n_convs or lower the cap"

    # the Exchange line naming the salt key, verbatim from the plan
    exchange_lines = [
        ln.strip()
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln or "Arguments: hashpartitioning" in ln
    ]
    evidence = {
        "config": {"n_convs": 400, "max_postings_per_segment": 256},
        "merge_shuffle_exchange": exchange_lines,
        "hot_terms_salted": [
            {
                "term": r["term"],
                "df": int(r["df"]),
                "n_salts": int(r["n_salts"]),
                "distinct_salts": int(r["distinct_salts"]),
            }
            for r in hot
        ],
        "cold_terms_single_salt": int(cold),
        "note": (
            "captured from the real _merge_partials path (wrapped, not "
            "reimplemented): hot terms (df > max_postings_per_segment) are "
            "doc-range-salted and the merge shuffles on (kind, term, salt) "
            "— one hot term's merge spreads across salts' tasks; cold "
            "terms keep a single salt group"
        ),
    }

    out = os.path.join(REPO, "SCALING_TWOPASS.json")
    data = {}
    if os.path.exists(out):
        with open(out) as fh:
            data = json.load(fh)
    data["salting_evidence"] = evidence
    with open(out, "w") as fh:
        json.dump(data, fh, indent=2)
        fh.write("\n")
    print(json.dumps(evidence["hot_terms_salted"]))
    print("exchange:", exchange_lines)
    spark.stop()
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
