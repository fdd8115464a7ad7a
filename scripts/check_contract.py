"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() on the same sf dir,
compare row count, schema (column names), and an order-insensitive value
hash.  Usage: python scripts/check_contract.py [sf_dir] [name ...]

When run with no name filter it also writes CONTRACT_FULL.json at the
repo root — the committed every-entry artifact (VERDICT r4 #6): the
driver's 50-row CORRECTNESS window rotates, so out-of-window entries are
only as green as the last full run; this file IS that run, one row per
contract entry with rows/schema/hash status and timestamp-free content
(stable diffs round to round).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for r in canon:
        h.update(repr(r).encode())
    return h.hexdigest()


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # entry names: space- and/or comma-separated; a stray --only is ignored
    only = {
        n
        for a in sys.argv[2:]
        for n in a.split(",")
        if n and n != "--only"
    }
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("contract-check")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    checked = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            report[name] = {"status": "spark_error", "err": str(e)[:200]}
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            report[name] = {"status": "rows_only", "spark_rows": len(s_rows)}
            continue
        try:
            rel = con.sql(oracles[name])
            o_cols = [d[0] for d in rel.description]
            o_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            report[name] = {"status": "duckdb_error", "err": str(e)[:200]}
            continue
        ok_schema = sorted(s_cols) == sorted(o_cols)
        ok_count = len(s_rows) == len(o_rows)
        sh = value_hash(s_rows, s_cols)
        oh = value_hash(o_rows, o_cols)
        ok_hash = sh == oh
        status = "OK  " if (ok_schema and ok_count and ok_hash) else "FAIL"
        print(
            f"{status} {name}: rows {len(s_rows)}/{len(o_rows)} "
            f"schema={'ok' if ok_schema else f'{s_cols} vs {o_cols}'} "
            f"hash={'ok' if ok_hash else f'{sh[:8]} vs {oh[:8]}'} "
            f"({time.time()-t0:.1f}s)"
        )
        report[name] = {
            "status": "ok" if status == "OK  " else "fail",
            "rows_match": ok_count,
            "schema_match": ok_schema,
            "hash_match": ok_hash,
            "spark_rows": len(s_rows),
            "oracle_rows": len(o_rows),
        }
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_count and ok_schema:
                # show a few mismatching rows for debugging
                s_set = {tuple(_norm(v) for v in r) for r in s_rows}
                o_set = {tuple(_norm(v) for v in r) for r in o_rows}
                print("  spark-only:", list(s_set - o_set)[:3])
                print("  oracle-only:", list(o_set - s_set)[:3])
    print(f"CHECKED: {checked}/{len(only) if only else len(qs)} requested")
    print("FAILURES:", failures if failures else "none")
    if not only:
        import json

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "CONTRACT_FULL.json"), "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_entries": checked,
                    "n_failures": len(failures),
                    "entries": report,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote CONTRACT_FULL.json ({checked} entries)")
    if only:
        missing = only - set(qs)
        if missing:
            print("UNKNOWN entry names:", sorted(missing))
            return 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
