"""Delta + varint posting-list codec, numpy-vectorized.

Postings are stored as LEB128-style varints over doc-id deltas (sorted doc
ids -> first id + gaps) plus a parallel varint stream of per-doc lengths
(dl).  Runs inside Arrow-batched UDFs — no per-row Python.

The reference has no persistent index (its postings are per-query in-memory
maps, search_runner.rs:1581); the layout here follows the standard
inverted-index literature (north_rule: "posting-list construction, merge,
compression").
"""

from __future__ import annotations

import numpy as np

_MASK = np.uint64(0x7F)
_CONT = np.uint64(0x80)


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array as concatenated LEB128 varints (vectorized)."""
    if len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=True)
    # bytes needed per value: ceil(bit_length / 7), min 1
    bits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    while True:
        nonzero = tmp > 0
        if not nonzero.any():
            break
        bits[nonzero] += 1
        tmp >>= np.uint64(7)
    nbytes = np.maximum(bits, 1)
    offsets = np.zeros(len(v) + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    max_b = int(nbytes.max())
    shifted = v.copy()
    for b in range(max_b):
        active = nbytes > b
        idx = offsets[:-1][active] + b
        byte = (shifted[active] & _MASK).astype(np.uint8)
        more = nbytes[active] > (b + 1)
        byte = byte | (more.astype(np.uint8) << 7)
        out[idx] = byte
        shifted = shifted >> np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode concatenated LEB128 varints into a uint64 array (vectorized)."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_end = (raw & 0x80) == 0
    # value id of each byte: 0-based index of the varint it belongs to
    ends = np.flatnonzero(is_end)
    n = len(ends)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    pos_in_value = np.arange(len(raw), dtype=np.int64) - np.repeat(
        starts, ends - starts + 1
    )
    contrib = (raw & 0x7F).astype(np.uint64) << (
        pos_in_value.astype(np.uint64) * np.uint64(7)
    )
    return np.add.reduceat(contrib, starts)


def encode_postings(doc_ids: np.ndarray, dls: np.ndarray, block: int = 128):
    """Pack sorted doc ids + doc lengths into (docs_bin, dl_bin, blocks).

    blocks: (last_doc per block, min_dl per block) for block-max pruning
    (WAND upper bounds: BM25 with tf=1 is monotone decreasing in dl, so the
    per-block max score for a term is idf * C(min_dl)).
    """
    order = np.argsort(doc_ids, kind="stable")
    d = doc_ids[order].astype(np.int64)
    l = dls[order].astype(np.int64)
    gaps = np.empty(len(d), dtype=np.uint64)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:], casting="unsafe")
    docs_bin = varint_encode(gaps)
    dl_bin = varint_encode(l.astype(np.uint64))
    n_blocks = (len(d) + block - 1) // block
    block_last = np.array(
        [d[min((i + 1) * block, len(d)) - 1] for i in range(n_blocks)],
        dtype=np.int64,
    )
    block_min_dl = np.array(
        [int(l[i * block : (i + 1) * block].min()) for i in range(n_blocks)],
        dtype=np.int32,
    )
    return docs_bin, dl_bin, block_last, block_min_dl


def decode_postings(docs_bin: bytes, dl_bin: bytes):
    """Inverse of encode_postings: (doc_ids int64, dls int64)."""
    gaps = varint_decode(docs_bin)
    doc_ids = np.cumsum(gaps.astype(np.int64))
    dls = varint_decode(dl_bin).astype(np.int64)
    return doc_ids, dls
