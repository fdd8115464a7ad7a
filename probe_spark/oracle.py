"""Single-node reference oracle: faithful reimplementation of the reference's
query semantics over an in-memory corpus.

Pipeline (mirrors /root/reference/src/ranking.rs:279-428 ``rank_documents``
composed with the block-level AST filter
/root/reference/src/search/file_processing.rs:202-355):

  1. parse query -> AST + per-query special terms (elastic_query.rs:885-967)
  2. tokenize every doc with those special terms (tokenization.rs:2651-2764);
     the token list is deduplicated, so TF is binary and
     dl = number of unique tokens
  3. DF per term over all docs; N = corpus size; avgdl = mean dl
     (ranking.rs:690-791, 64-72) — corpus-level stats (our engine contract;
     the reference computes them over the candidate blocks of each query,
     which has no stable meaning for a persistent index)
  4. idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)), df=0 terms dropped
     (ranking.rs:129-143)
  5. candidate filter: AST evaluate with negations enforced
     (elastic_query.rs:148-292)
  6. score: per-keyword BM25 with k1=1.5, b=0.5 (ranking.rs:184-208,361-362),
     AST bool combination (ranking.rs:226-274); None => excluded
  7. sort score desc, doc index asc (ranking.rs:405-418); top-k

The Spark engine (probe_spark/search/engine.py) must be rank-identical to
this oracle (docIDs exact, scores to 1e-9) — pinned by tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from probe_spark.functions.tokenizer import tokenize
from probe_spark.query import ast
from probe_spark.query.parser import ParseError, parse_query

K1 = 1.5  # ranking.rs:361
B = 0.5  # ranking.rs:362
MAX_QUERY_TERMS = 256  # ranking.rs:162-182 (u8 token map)


@dataclass
class OracleResult:
    doc_id: int
    score: float


def search(
    docs: list[str], query: str, k: int | None = None, exact: bool = False
) -> list[OracleResult]:
    try:
        expr, special = parse_query(query, exact=exact)
    except ParseError:
        return []

    query_terms = ast.extract_query_terms(expr)
    if len(query_terms) > MAX_QUERY_TERMS:
        return []

    tokenized = [tokenize(d, special) if d else [] for d in docs]
    n_docs = len(docs)
    lengths = [len(t) for t in tokenized]
    avgdl = (sum(lengths) / n_docs) if n_docs else 0.0

    # DF over unique tokens per doc, only for query terms (all we need)
    dfs: dict[str, int] = {t: 0 for t in query_terms}
    token_sets = []
    for toks in tokenized:
        s = set(toks)
        token_sets.append(s)
        for t in query_terms:
            if t in s:
                dfs[t] += 1

    idfs: dict[str, float] = {}
    for t in query_terms:
        df = dfs[t]
        if df > 0:
            idfs[t] = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    results: list[OracleResult] = []
    for i in range(n_docs):
        toks = token_sets[i]
        dl = lengths[i]

        def present(kw: str, _toks=toks) -> bool:
            return kw in _toks

        if not ast.evaluate(expr, present, ignore_negatives=False):
            continue

        denom_factor = K1 * (1.0 - B + B * (dl / avgdl)) if avgdl > 0 else K1

        def kw_score(kw: str, _toks=toks, _den=denom_factor) -> float:
            if kw not in _toks:
                return 0.0
            idf = idfs.get(kw, 0.0)
            # tf == 1 always (deduplicated token list)
            return idf * (1.0 * (K1 + 1.0)) / (1.0 + _den)

        s = ast.score(expr, kw_score)
        if s is None:
            continue
        results.append(OracleResult(i, s))

    results.sort(key=lambda r: (-r.score, r.doc_id))
    if k is not None:
        results = results[:k]
    return results
