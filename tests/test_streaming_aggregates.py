"""Streaming windowed aggregation / session windows: the streamed result
over arrival waves must equal the same aggregation run in batch over the
full input (late rows within the watermark included)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest


def _events_rows():
    # two users, events spread over 3 hours, one late-but-in-watermark row
    base = "2026-01-01 0{h}:{m:02d}:00"
    rows = []
    eid = 0
    for h in range(3):
        for m in (1, 5, 40):
            for u in ("u1", "u2"):
                rows.append((f"e{eid}", u, "click" if m != 40 else "view",
                             float(m), base.format(h=h, m=m)))
                eid += 1
    return rows


@pytest.fixture(scope="module")
def event_waves(spark, tmp_index_root):
    src = tempfile.mkdtemp(prefix="ev_src_", dir=tmp_index_root)
    rows = _events_rows()
    df = spark.createDataFrame(
        rows, "event_id string, user_id string, event_type string, value double, ts_s string"
    ).selectExpr(
        "event_id", "user_id", "event_type", "value",
        "cast(ts_s as timestamp) as ts",
    )
    half = len(rows) // 2
    df.limit(half).write.mode("append").parquet(src)
    # second wave: the rest (arrival order != event-time order)
    df.subtract(df.limit(half)).write.mode("append").parquet(src)
    return src, df


def _run_stream(spark, src, transform, tmp_root):
    ckpt = tempfile.mkdtemp(prefix="ev_ckpt_", dir=tmp_root)
    stream = spark.readStream.schema(
        "event_id string, user_id string, event_type string, value double, "
        "ts timestamp"
    ).parquet(src)
    name = os.path.basename(ckpt)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table(name).collect()
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def test_windowed_counts_stream_equals_batch(spark, event_waves, tmp_index_root):
    from probe_spark.streaming.aggregates import windowed_event_counts

    src, df = event_waves
    got = _run_stream(
        spark, src, lambda s: windowed_event_counts(s), tmp_index_root
    )
    want = windowed_event_counts(df).collect()
    key = lambda r: (r["window_start"], r["event_type"])
    assert sorted(
        [(key(r), r["n_events"], r["sum_value"]) for r in got]
    ) == sorted([(key(r), r["n_events"], r["sum_value"]) for r in want])
    assert len(want) > 0


def test_sessionize_stream_equals_batch(spark, event_waves, tmp_index_root):
    from probe_spark.streaming.aggregates import sessionize_stream

    src, df = event_waves
    got = _run_stream(
        spark, src, lambda s: sessionize_stream(s, gap="10 minutes"),
        tmp_index_root,
    )
    want = sessionize_stream(df, gap="10 minutes").collect()
    key = lambda r: (r["user_id"], r["session_start"])
    assert sorted(
        [(key(r), r["n_events"], r["sum_value"]) for r in got]
    ) == sorted([(key(r), r["n_events"], r["sum_value"]) for r in want])
    # gap=10min splits each hour's (1,5) from (40): 2 sessions/hour/user
    assert len(want) == 2 * 3 * 2
