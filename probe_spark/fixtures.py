"""Deterministic synthetic transcript corpus + reference query set.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
  (conv_id string, turn_idx int32, role string, text string, tool string,
   ts timestamp)

Text is seeded to exercise the probe tokenizer: stopwords, camelCase /
PascalCase identifiers, acronym runs, OAuth2, compound words, exception
terms, stemming families, Zipf-distributed hot terms (skew), >500-char lines
and unicode.  Everything is a pure function of (n_convs, seed): the same
corpus is regenerated identically in tests, the oracle, and benchmarks.
No external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["", "search", "bash", "editor", "browser"]

# word pools — chosen to cover the tokenizer cases from the reference's unit
# tests (tokenization.rs:2770-2953) and FIXTURES.md §4
_PLAIN = (
    "the quick brown fox jumps over lazy dog while running through fields "
    "error handling requires careful process design and data validation "
    "login authentication failed because the token expired yesterday "
    "search query returned results sorted by relevance score quickly "
    "connection timeout caused the request retry loop to terminate "
    "user profile settings updated successfully after password reset "
    "the team deployed a new release with improved performance metrics "
    "reading documents from storage takes time when the cache is cold"
).split()

_IDENTIFIERS = [
    "parseJSONToHTML5", "APIDefinition", "OAuth2Provider", "JWTMiddleware",
    "migrateEndpointMetaByType", "typeIgnore", "enableFirewallWhitelist",
    "getUserProfile", "HttpClientFactory", "XMLHttpRequest", "camelCase",
    "PascalCase", "parseConfigFile", "ResponseHandler", "EventListener",
    "TaskQueueWorker", "DatabaseConnection", "RedisCache", "KafkaProducer",
    "GraphQLResolver", "validateIPv4Address", "sha256Checksum",
]

_COMPOUNDS = [
    "whitelist", "blackmail", "firewall", "hashmap", "database", "keyword",
    "timestamp", "airport", "bluetooth", "greenhouse", "waterfall",
    "bookmark", "password", "blacklist", "hashtable", "arraylist",
]

_EXCEPTIONS = [
    "api", "handler", "middleware", "controller", "provider", "client",
    "server", "config", "cache", "queue", "worker", "event", "listener",
    "callback", "filter", "parser", "workflow", "repository", "manager",
]

_STEM_FAMILIES = [
    "running", "run", "runs", "runner", "definition", "define", "defining",
    "handling", "handled", "processing", "processor", "processed",
    "authentication", "authenticate", "ignored", "ignoring", "enabled",
    "migration", "migrating",
]

# Zipf hot terms for skew tests — "error" is the designated hot term
_HOT = ["error", "data", "request", "response", "token", "service"]

_UNICODE_SNIPPETS = ["naïve café résumé", "日本語テキスト処理", "Привет мир", "emoji 🚀 test"]

VOCAB_POOLS = [_PLAIN, _IDENTIFIERS, _COMPOUNDS, _EXCEPTIONS, _STEM_FAMILIES, _HOT]
_POOL_WEIGHTS = np.array([0.50, 0.10, 0.10, 0.12, 0.08, 0.10])

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)


def _make_text(rng: np.random.Generator, long_line: bool, unicode_line: bool) -> str:
    n_words = int(rng.integers(4, 40))
    words: list[str] = []
    pools = rng.choice(len(VOCAB_POOLS), size=n_words, p=_POOL_WEIGHTS)
    for p in pools:
        pool = VOCAB_POOLS[p]
        if p == 5:  # hot terms, Zipf-ish: rank r with prob ~ 1/(r+1)
            ranks = np.arange(len(pool)) + 1.0
            probs = (1.0 / ranks) / (1.0 / ranks).sum()
            words.append(pool[int(rng.choice(len(pool), p=probs))])
        else:
            words.append(pool[int(rng.integers(0, len(pool)))])
    if unicode_line:
        words.append(_UNICODE_SNIPPETS[int(rng.integers(0, len(_UNICODE_SNIPPETS)))])
    text = " ".join(words)
    if long_line:
        filler = " ".join(
            _PLAIN[int(rng.integers(0, len(_PLAIN)))] for _ in range(120)
        )
        text = text + " " + filler  # > 500 chars
    return text


def generate_transcripts(n_convs: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic corpus: ~n_convs × avg 8 turns."""
    rng = np.random.default_rng(seed)
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    base_ts = np.datetime64("2026-01-01T00:00:00", "us").astype("int64")
    for i in range(n_convs):
        cid = f"conv{i:08d}"
        n_turns = int(rng.integers(3, 31))
        for t in range(n_turns):
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(ROLES[t % len(ROLES)])
            long_line = rng.random() < 0.01
            unicode_line = rng.random() < 0.02
            texts.append(_make_text(rng, long_line, unicode_line))
            tools.append(TOOLS[int(rng.integers(0, len(TOOLS)))])
            tss.append(base_ts + i * 3_600_000_000 + t * 60_000_000)

    return pa.Table.from_pydict(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(
                np.array(tss, dtype="int64").view("datetime64[us]"),
                pa.timestamp("us"),
            ),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def transcripts_rows(n_convs: int = 200, seed: int = 42) -> list[dict]:
    """The same corpus as Python rows in stable (conv_id, turn_idx) order —
    the oracle's document list (doc_id = list index)."""
    table = generate_transcripts(n_convs, seed)
    rows = table.to_pylist()
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    return rows


def write_transcripts_parquet(path: str, n_convs: int = 200, seed: int = 42) -> None:
    import pyarrow.parquet as pq

    pq.write_table(generate_transcripts(n_convs, seed), path)


def transcripts_df(spark, n_convs: int = 200, seed: int = 42):
    """Spark DataFrame of the corpus (via Arrow -> pandas for determinism)."""
    table = generate_transcripts(n_convs, seed)
    # explicit schema: inference widens the arrow int32 to long, breaking the
    # input_hint contract (turn_idx:int32)
    return spark.createDataFrame(
        table.to_pandas(),
        schema=(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        ),
    )


def _conv_rows(conv_idx: int, seed: int) -> list[dict]:
    """Rows for one conversation, deterministically seeded by (seed, idx) —
    partitioning-independent, so the distributed generator yields the same
    corpus at any parallelism."""
    rng = np.random.default_rng((seed, conv_idx))
    cid = f"conv{conv_idx:08d}"
    base_ts = np.datetime64("2026-01-01T00:00:00", "us").astype("int64")
    n_turns = int(rng.integers(3, 31))
    rows = []
    for t in range(n_turns):
        rows.append(
            {
                "conv_id": cid,
                "turn_idx": t,
                "role": ROLES[t % len(ROLES)],
                "text": _make_text(
                    rng, rng.random() < 0.01, rng.random() < 0.02
                ),
                "tool": TOOLS[int(rng.integers(0, len(TOOLS)))],
                "ts": base_ts + conv_idx * 3_600_000_000 + t * 60_000_000,
            }
        )
    return rows


def transcripts_df_dist(spark, n_convs: int, seed: int = 42, parts: int | None = None):
    """Distributed corpus generator for benchmarks: conversations are
    generated inside executors via mapInPandas (per-conv seeded RNG), so
    corpus size is bounded by cluster storage, not driver memory."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from probe_spark.runtime import ensure_package_on_executors

    # the gen closure unpickles against this module — ship the package so
    # the generator works in a fresh session with no builder/engine first
    ensure_package_on_executors(spark)
    p = parts or spark.sparkContext.defaultParallelism * 2

    def gen(batches):
        for pdf in batches:
            rows = []
            for conv_idx in pdf["id"]:
                rows.extend(_conv_rows(int(conv_idx), seed))
            out = pd.DataFrame(rows)
            out["ts"] = out["ts"].astype("datetime64[us]")
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    return (
        spark.range(0, n_convs, 1, p)
        .mapInPandas(
            gen,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp_ntz",
        )
    )


# ---------------------------------------------------------------------------
# the reference query set (FIXTURES.md §2) — covers the full grammar
# ---------------------------------------------------------------------------

REFERENCE_QUERIES: list[tuple[int, str, int]] = [
    (1, "error AND handling", 10),
    (2, "login OR authentication OR auth", 10),
    (3, "(error OR exception) AND (handle OR process)", 10),
    (4, "+api +process +load", 10),
    (5, "database -sqlite", 10),
    (6, "ip whitelist", 10),
    (7, '"exact phrase match"', 10),
    (8, "JWTMiddleware", 10),
    (9, "parseJSONToHTML5", 10),
    (10, "api process load data", 10),
    (11, "-onlyexcluded", 10),
    (12, "oauth2 provider", 10),
    (13, "error", 25),
    (14, "running", 10),
    (15, "enableFirewallWhitelist", 10),
    (16, "whitelist AND firewall", 10),
    (17, '+handler -blackmail', 10),
    (18, '"whitelist"', 10),
    (19, "cache OR queue OR worker", 15),
    (20, "authentication AND (token OR login)", 10),
    # 21/22: stem-unstable compound special term ('hashtable' base-splits
    # to hash+tabl, stays whole when registered) — pins the raw-index
    # repair-sourcing clause (tokenizer.is_raw_indexable) and the
    # affected-doc retokenization path
    (21, "table -hashtable", 10),
    (22, "hash -hashtable", 10),
    # 23: optional OR excluded — pins the empty-matched-terms early
    # termination (elastic_query.rs:372-374): docs matching NO query
    # keyword must NOT qualify at score 0
    (23, "handler OR -blackmail", 10),
]
