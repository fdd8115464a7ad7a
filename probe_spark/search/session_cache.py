"""Session cache: drop results already returned earlier in a session.

Reference semantics (src/search/cache.rs:67-186, 317-541 + SURVEY.md §2.1
"Session-cache sink/source"): per session id, block/doc ids already
returned are persisted and filtered out of later results ("early
filtering"), and newly returned ids are recorded.  The reference keys its
store on (session, query-hash via ahash-with-fixed-seed) and invalidates on
file MD5; here the store is an append-only parquet table under the index
directory — content invalidation is inherent because a rebuilt index lives
in a fresh directory (FORMAT_VERSION + build path), and the query hash
(md5; ahash is Rust-internal, not a published stable spec) is carried as
lineage metadata.

Spark-first: the seen-set lookup is a broadcast left_anti join when used on
a DataFrame; the CLI path works on the collected top-k (tiny), mirroring
the reference which filters the final limited results.
"""

from __future__ import annotations

import hashlib
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def _sessions_path(index_path: str) -> str:
    return f"{index_path}/sessions"


def query_hash(query: str) -> str:
    return hashlib.md5(query.encode("utf-8")).hexdigest()


def seen_doc_ids(
    spark: SparkSession, index_path: str, session_id: str
) -> DataFrame:
    """doc_ids already returned in this session (empty DF if none)."""
    path = _sessions_path(index_path)
    local = path[len("file://"):] if path.startswith("file://") else path
    if "://" not in path and not os.path.isdir(local):
        return spark.createDataFrame([], "doc_id long")
    try:
        df = spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], "doc_id long")
    return (
        df.filter(F.col("session_id") == session_id)
        .select("doc_id")
        .distinct()
    )


def record_results(
    spark: SparkSession,
    index_path: str,
    session_id: str,
    query: str,
    doc_ids: list[int],
) -> None:
    """Append newly returned doc ids (driver-side pyarrow for local paths —
    same rationale as the build manifest; Spark write elsewhere)."""
    if not doc_ids:
        return
    import pandas as pd

    path = _sessions_path(index_path)
    now = time.time()
    pdf = pd.DataFrame(
        {
            "session_id": [session_id] * len(doc_ids),
            "query_hash": [query_hash(query)] * len(doc_ids),
            "doc_id": [int(d) for d in doc_ids],
            "returned_at": [now] * len(doc_ids),
        }
    )
    if "://" in path and not path.startswith("file://"):
        spark.createDataFrame(pdf).write.mode("append").parquet(path)
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    local = path[len("file://"):] if path.startswith("file://") else path
    os.makedirs(local, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(local, f"part-{uuid.uuid4().hex}.parquet"),
    )


def filter_unseen(
    spark: SparkSession,
    index_path: str,
    session_id: str,
    results: DataFrame,
) -> DataFrame:
    """DataFrame-level variant: left_anti against the session's seen set."""
    seen = seen_doc_ids(spark, index_path, session_id)
    return results.join(F.broadcast(seen), "doc_id", "left_anti")


def filter_seen(
    spark: SparkSession,
    index_path: str,
    session_id: str,
    query: str,
    results: DataFrame,
) -> DataFrame:
    """CLI path: drop already-seen rows, record the newly returned ones,
    return the filtered results (same schema).  Collects the results —
    intended for final (top-k limited) result sets, like the reference's
    post-limit filtering."""
    seen = {r["doc_id"] for r in seen_doc_ids(spark, index_path, session_id).collect()}
    rows = [r for r in results.collect() if r["doc_id"] not in seen]
    record_results(
        spark, index_path, session_id, query, [r["doc_id"] for r in rows]
    )
    if not rows:
        return spark.createDataFrame([], results.schema)
    return spark.createDataFrame(rows, results.schema)
