"""Property test: the ranged path's numpy scorer/evaluator mirrors the
single-node oracle over RANDOM boolean queries.

`search/ranged._score_eval_numpy` re-implements engine._compile_score /
_compile_eval as a numpy recursion; the specific-query suites pin it on the
reference query shapes, this pins it on hypothesis-generated ASTs (nested
AND/OR/parens, +required, -excluded, quoted exact terms) against
`oracle.search` (the faithful ranking.rs/elastic_query.rs mirror).

Scope matches the engine's dispatch: queries that can match a doc with NO
query keyword present (e.g. ``a OR -b``) take the full-corpus left-join
path, not the ranged fan-out, so they are filtered out here exactly the
way the engine filters them (AST evaluates true under all-false presence).

No Spark: the harness feeds _score_eval_numpy the same presence/dl inputs
the range workers decode, built with the same tokenizer the oracle uses.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from probe_spark import oracle
from probe_spark.functions.tokenizer import tokenize
from probe_spark.query import ast
from probe_spark.query.parser import ParseError, parse_query
from probe_spark.search.ranged import K1, B, _score_eval_numpy

VOCAB = ["error", "handler", "stream", "cache", "token", "alpha", "merge"]
FILLER = ["the", "quick", "document", "about", "nothing", "widget", "gamma"]


@st.composite
def query_strings(draw, depth: int = 2) -> str:
    if depth == 0 or draw(st.booleans()):
        word = draw(st.sampled_from(VOCAB))
        prefix = draw(st.sampled_from(["", "", "", "+", "-"]))
        if draw(st.integers(0, 4)) == 0:
            return f'{prefix}"{word}"'
        return prefix + word
    left = draw(query_strings(depth=depth - 1))
    right = draw(query_strings(depth=depth - 1))
    op = draw(st.sampled_from([" AND ", " OR ", " "]))
    if draw(st.booleans()):
        return f"({left}){op}({right})"
    return f"{left}{op}{right}"


@st.composite
def corpora(draw) -> list[str]:
    n = draw(st.integers(4, 12))
    docs = []
    for _ in range(n):
        words = draw(
            st.lists(st.sampled_from(VOCAB + FILLER), min_size=2, max_size=9)
        )
        docs.append(" ".join(words))
    return docs


def _ranged_results(docs: list[str], query: str):
    """Mirror the engine glue feeding make_range_eval, then run the numpy
    recursion over the candidate universe (docs holding >=1 query keyword)."""
    expr, special = parse_query(query)
    toks = [tokenize(d, special) if d else [] for d in docs]
    n_docs = len(docs)
    lengths = [len(t) for t in toks]
    avgdl = sum(lengths) / n_docs if n_docs else 0.0
    assume(avgdl > 0)

    kws = sorted({kw for t in ast.walk_terms(expr) for kw in t.keywords})
    sets = [set(t) for t in toks]
    idfs = {}
    for kw in kws:
        df = sum(1 for s in sets if kw in s)
        if df > 0:
            idfs[kw] = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    cand = [i for i in range(n_docs) if any(kw in sets[i] for kw in kws)]
    if not cand:
        return []
    present = {
        kw: np.array([kw in sets[i] for i in cand], dtype=bool) for kw in kws
    }
    tf_norm = np.array(
        [
            (K1 + 1.0)
            / (1.0 + K1 * ((1.0 - B) + B * (lengths[i] / avgdl)))
            for i in cand
        ],
        dtype=np.float64,
    )
    score, isnull, ok = _score_eval_numpy(expr, idfs, present, tf_norm, np)
    keep = np.nonzero(ok & ~isnull)[0]
    out = [(cand[int(j)], float(score[j])) for j in keep]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


@settings(max_examples=120, deadline=None)
@given(docs=corpora(), query=query_strings())
def test_numpy_scorer_matches_oracle(docs, query):
    try:
        expr, _special = parse_query(query)
    except ParseError:
        return
    # ranged-path dispatch precondition: at least one included term, and
    # the AST cannot accept a doc with zero query-keyword presence
    terms = list(ast.walk_terms(expr))
    assume(any(not t.excluded for t in terms))
    assume(not ast.evaluate(expr, lambda kw: False, ignore_negatives=False))

    exp = [(r.doc_id, r.score) for r in oracle.search(docs, query)]
    got = _ranged_results(docs, query)
    assert [i for i, _ in got] == [i for i, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert math.isclose(a, b, rel_tol=0, abs_tol=1e-9)


def _eval_over(docs, query, cand):
    """Run the numpy recursion over an EXPLICIT candidate id list (the
    batch path evaluates every query over the union of all queries'
    terms' candidates — extra docs must fall out as ok=False)."""
    expr, special = parse_query(query)
    toks = [tokenize(d, special) if d else [] for d in docs]
    n_docs = len(docs)
    lengths = [len(t) for t in toks]
    avgdl = sum(lengths) / n_docs if n_docs else 0.0
    assume(avgdl > 0)
    kws = sorted({kw for t in ast.walk_terms(expr) for kw in t.keywords})
    sets = [set(t) for t in toks]
    idfs = {}
    for kw in kws:
        df = sum(1 for s in sets if kw in s)
        if df > 0:
            idfs[kw] = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    if not cand:
        return []
    present = {
        kw: np.array([kw in sets[i] for i in cand], dtype=bool) for kw in kws
    }
    tf_norm = np.array(
        [
            (K1 + 1.0)
            / (1.0 + K1 * ((1.0 - B) + B * (lengths[i] / avgdl)))
            for i in cand
        ],
        dtype=np.float64,
    )
    score, isnull, ok = _score_eval_numpy(expr, idfs, present, tf_norm, np)
    keep = np.nonzero(ok & ~isnull)[0]
    out = [(cand[int(j)], float(score[j])) for j in keep]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


@settings(max_examples=100, deadline=None)
@given(docs=corpora(), q1=query_strings(), q2=query_strings())
def test_union_candidate_superset_is_exact(docs, q1, q2):
    """The batch path's core assumption: scoring query q1 over the UNION
    of q1's and q2's candidate docs yields exactly q1's own results —
    union-only docs evaluate to ok=False, never to a scored row.  (Holds
    only for non-zero-included queries, the batch dispatch precondition.)"""
    for q in (q1, q2):
        try:
            expr, _ = parse_query(q)
        except ParseError:
            return
        terms = list(ast.walk_terms(expr))
        assume(any(not t.excluded for t in terms))
        assume(not ast.evaluate(expr, lambda kw: False, ignore_negatives=False))

    def cand_of(q):
        expr, special = parse_query(q)
        toks = [tokenize(d, special) if d else [] for d in docs]
        sets = [set(t) for t in toks]
        kws = {kw for t in ast.walk_terms(expr) for kw in t.keywords}
        return {i for i in range(len(docs)) if any(k in sets[i] for k in kws)}

    own = sorted(cand_of(q1))
    union = sorted(cand_of(q1) | cand_of(q2))
    assert _eval_over(docs, q1, own) == _eval_over(docs, q1, union)
