"""Block-max WAND pruning for distributed top-k BM25 (north star: "posting
-list intersection with block-max WAND pruning").

The reference is scan-based and has no block-max structure (SURVEY.md §2.6:
"absent in reference — we must implement"); this follows the block-max WAND
literature (Ding & Suel, SIGIR'11) re-shaped for a batch/distributed
engine:

  * Build-side, every final segment stores per-block (last_doc, min_dl,
    byte offsets).  With tf == 1 (the tokenizer dedups) the BM25 of doc d
    for term t is idf(t) * C(dl_d) with C monotone decreasing, so
    ub(block) = idf * C(min_dl) is a tight per-block upper bound.
  * Query-side, three metadata-scale steps replace the full posting decode:
      1. collect segment METADATA for the query terms (no binaries —
         parquet column pruning keeps this tiny) and build per-term step
         functions ub_t(doc) from block intervals;
      2. bootstrap a threshold theta: decode only the single best block
         per term (highest ub), partial-score those docs, take the k-th
         best partial.  Partial scores are lower bounds of true scores, so
         theta <= true k-th score — any valid lower bound keeps the
         algorithm exact;
      3. sweep: bound(doc) = sum_t ub_t(doc) (numpy event sweep over all
         block boundaries).  A block survives iff max bound over its
         interval >= theta.  Every block containing a true top-k doc d
         survives (bound >= score(d) >= theta at d's position), so
         surviving docs are scored EXACTLY; docs appearing only in
         partially-surviving term blocks score strictly below theta and
         cannot displace a true top-k member (ties included: partial <
         theta <= s_k).  Rank-identity vs the unpruned path is pinned by
         tests on the reference query set.

  Applies to pure disjunctive queries (every keyword optional, no AND /
  required / excluded nodes) — the classic WAND setting; other shapes are
  already candidate-bounded by their conjunctive structure and use the full
  path.

Scale note (10^12 turns): steps 1 and 3 touch block METADATA (df/128 rows
per term), not postings; step 2 decodes <= one segment per term (bounded by
max_postings_per_segment).  The sweep here is a driver-side numpy pass —
fine up to ~10^7 blocks per query; beyond that the identical sweep is
expressible as a DataFrame window over the same rows (documented trade).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

K1 = 1.5
B = 0.5


def c_factor(dl, avgdl: float):
    """BM25 tf-normalization with tf==1: (k1+1)/(1 + k1*(1-b+b*dl/avgdl))."""
    dl = np.asarray(dl, dtype=np.float64)
    return (K1 + 1.0) / (1.0 + K1 * (1.0 - B + B * dl / max(avgdl, 1e-12)))


@dataclass
class SegmentMeta:
    term: str
    salt: int
    seg_seq: int
    min_doc: int
    max_doc: int
    block_last: np.ndarray  # int64 per block
    block_min_dl: np.ndarray  # int32 per block
    df_seg: int = 0  # postings count in this segment (df contribution)


@dataclass
class BlockRef:
    term: str
    salt: int
    seg_seq: int
    min_doc: int  # segment's min_doc — part of the segment key: streamed
    # delta builds append segments whose seg_seq restarts at 0 per batch,
    # so (term, salt, seg_seq) alone collides across deltas; per-term doc
    # ranges are disjoint, so min_doc disambiguates
    block: int
    start: int  # first possible doc id in the block
    end: int  # last doc id in the block (inclusive)
    ub: float


def block_refs(metas: list[SegmentMeta], idfs: dict[str, float], avgdl: float):
    """Flatten segment metadata into per-block interval/upper-bound refs."""
    refs: list[BlockRef] = []
    for m in metas:
        idf = idfs.get(m.term, 0.0)
        if idf <= 0.0 or len(m.block_last) == 0:
            continue
        ubs = idf * c_factor(m.block_min_dl, avgdl)
        starts = np.empty(len(m.block_last), dtype=np.int64)
        starts[0] = m.min_doc
        starts[1:] = m.block_last[:-1] + 1
        for i in range(len(m.block_last)):
            refs.append(
                BlockRef(
                    m.term, m.salt, m.seg_seq, m.min_doc, i,
                    int(starts[i]), int(m.block_last[i]), float(ubs[i]),
                )
            )
    return refs


def term_block_table(metas: "list[SegmentMeta]") -> "dict[str, np.ndarray]":
    """Columnar per-block table for ONE term's segments — built once per
    term and cacheable (engine._blocktab_cache): block-level arrays
    (salt, seg_seq, seg_min_doc, block index, start, last, min_dl).
    Replaces per-query construction of one Python BlockRef object per
    block (a 60%-df term has ~125k blocks; building and sweeping that
    list in Python cost seconds per query and serialized the concurrent
    service on the driver GIL)."""
    cols = {
        "salt": [], "seg_seq": [], "seg_min_doc": [], "block": [],
        "start": [], "last": [], "min_dl": [],
    }
    for m in metas:
        nb = len(m.block_last)
        if nb == 0:
            continue
        starts = np.empty(nb, dtype=np.int64)
        starts[0] = m.min_doc
        starts[1:] = m.block_last[:-1] + 1
        cols["salt"].append(np.full(nb, m.salt, dtype=np.int32))
        cols["seg_seq"].append(np.full(nb, m.seg_seq, dtype=np.int32))
        cols["seg_min_doc"].append(np.full(nb, m.min_doc, dtype=np.int64))
        cols["block"].append(np.arange(nb, dtype=np.int32))
        cols["start"].append(starts)
        cols["last"].append(np.asarray(m.block_last, dtype=np.int64))
        cols["min_dl"].append(np.asarray(m.block_min_dl, dtype=np.int32))
    if not cols["salt"]:
        return {
            k: np.empty(0, dtype=np.int64 if k in ("seg_min_doc", "start", "last") else np.int32)
            for k in cols
        }
    return {k: np.concatenate(v) for k, v in cols.items()}


def select_blocks_columnar(
    tables: "dict[str, dict[str, np.ndarray]]",
    idfs: dict[str, float],
    avgdl: float,
    theta: float,
) -> "tuple[dict[str, np.ndarray], dict[str, int]]":
    """Vectorized block selection over per-term columnar tables.

    Bound used: ub_t(block) + sum over OTHER terms of max ub — a superset
    of the exact event-sweep keep set (select_blocks), so exactness is
    preserved while the whole selection is a handful of numpy ops instead
    of an O(blocks) Python loop.  For a single term the bound IS the
    sweep's bound (same-term blocks never overlap), so the keep set is
    identical there.  Returns ({term: bool keep mask}, stats)."""
    ubs: dict[str, np.ndarray] = {}
    maxes: dict[str, float] = {}
    total = 0
    for t, tab in tables.items():
        idf = idfs.get(t, 0.0)
        if idf <= 0.0 or not len(tab["min_dl"]):
            continue
        u = idf * c_factor(tab["min_dl"], avgdl)
        ubs[t] = u
        maxes[t] = float(u.max())
        total += len(u)
    stats = {"blocks_total": total, "blocks_kept": 0}
    masks: dict[str, np.ndarray] = {}
    all_max = sum(maxes.values())
    for t, u in ubs.items():
        others = all_max - maxes[t]
        if theta <= 0.0:
            m = np.ones(len(u), dtype=bool)
        else:
            m = (u + others) >= (theta - 1e-12)
        masks[t] = m
        stats["blocks_kept"] += int(m.sum())
    return masks, stats


def best_block_per_term(refs: list[BlockRef]) -> dict[str, BlockRef]:
    best: dict[str, BlockRef] = {}
    for r in refs:
        b = best.get(r.term)
        if b is None or r.ub > b.ub:
            best[r.term] = r
    return best


def select_blocks(
    refs: list[BlockRef], theta: float
) -> tuple[dict[tuple[str, int, int], list[int]], dict[str, int]]:
    """Event-sweep bound computation + block selection.

    Returns ({(term, salt, seg_seq, min_doc): [kept block indices]}, stats).
    With theta <= 0 everything is kept (no pruning possible).
    """
    stats = {"blocks_total": len(refs), "blocks_kept": 0}
    keep: dict[tuple[str, int, int, int], list[int]] = {}
    if not refs:
        return keep, stats
    if theta <= 0.0:
        for r in refs:
            keep.setdefault(
                (r.term, r.salt, r.seg_seq, r.min_doc), []
            ).append(r.block)
        stats["blocks_kept"] = len(refs)
        return keep, stats

    starts = np.array([r.start for r in refs], dtype=np.int64)
    ends = np.array([r.end for r in refs], dtype=np.int64)
    ubs = np.array([r.ub for r in refs], dtype=np.float64)

    # event sweep: +ub at start, -ub after end
    pos = np.concatenate([starts, ends + 1])
    delta = np.concatenate([ubs, -ubs])
    order = np.argsort(pos, kind="stable")
    pos = pos[order]
    delta = delta[order]
    bp, first_idx = np.unique(pos, return_index=True)
    # cumulative bound just after each unique breakpoint
    csum = np.cumsum(delta)
    # value at unique position i = csum at the LAST event with that position
    last_idx = np.append(first_idx[1:], len(pos)) - 1
    bound_at = csum[last_idx]
    # clip float drift
    bound_at[bound_at < 1e-12] = 0.0

    # per-block max bound over [start, end]: max of bound_at over breakpoints
    # in [start, end] plus the bound in force AT start (breakpoint <= start)
    lo = np.searchsorted(bp, starts, side="left")
    lo_in = np.searchsorted(bp, starts, side="right") - 1  # bp <= start
    hi = np.searchsorted(bp, ends, side="right")  # bp <= end (exclusive idx)
    for i, r in enumerate(refs):
        mx = bound_at[lo_in[i]] if lo_in[i] >= 0 else 0.0
        if hi[i] > lo[i]:
            mx = max(mx, float(bound_at[lo[i] : hi[i]].max()))
        if mx >= theta - 1e-12:
            keep.setdefault(
                (r.term, r.salt, r.seg_seq, r.min_doc), []
            ).append(r.block)
            stats["blocks_kept"] += 1
    return keep, stats


def partial_theta(
    decoded: list[tuple[str, np.ndarray, np.ndarray]],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
) -> float:
    """k-th best PARTIAL score over the bootstrap-decoded blocks.

    decoded: [(term, doc_ids, dls)] — one best block per term.  A doc's
    partial score sums only the decoded contributions, hence lower-bounds
    its true score; the k-th best of lower bounds lower-bounds the true
    k-th score, which is exactly what select_blocks needs.
    """
    acc: dict[int, float] = {}
    for term, ids, dls in decoded:
        idf = idfs.get(term, 0.0)
        if idf <= 0.0 or len(ids) == 0:
            continue
        contrib = idf * c_factor(dls, avgdl)
        for d, c in zip(ids.tolist(), contrib.tolist()):
            acc[d] = acc.get(d, 0.0) + c
    if len(acc) < k:
        return 0.0
    scores = np.fromiter(acc.values(), dtype=np.float64, count=len(acc))
    return float(np.partition(scores, len(scores) - k)[len(scores) - k])
