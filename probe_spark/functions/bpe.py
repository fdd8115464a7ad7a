"""Byte-level BPE token counting — the reference's tiktoken p50k_base
semantics (``/root/reference/src/search/search_tokens.rs:331-366``)
implemented from scratch, so exact counting works WITHOUT the tiktoken
package: point ``PROBE_SPARK_TIKTOKEN_RANKS`` at a standard
``p50k_base.tiktoken`` ranks file (public: base64(token-bytes) SPACE rank
per line) and the limiter's token budgets count real BPE tokens.

The algorithm is the standard byte-level BPE encode:

  1. split text into pieces with the GPT-2/p50k pretokenizer regex
     (contractions, ``" ?"``-prefixed letter runs, digit runs, punct runs,
     trailing-space handling — the published pattern, using the ``regex``
     module for ``\\p{L}``/``\\p{N}``);
  2. per piece (as UTF-8 bytes), repeatedly merge the adjacent pair with
     the LOWEST rank in the ranks table until no mergeable pair remains;
  3. token count = number of remaining parts (unknown byte sequences
     stay as single-byte parts — every byte has a rank in a complete
     table, so this only matters for truncated toy tables).

Counting priority in ``search/limiter.py``: tiktoken package (if
installed) > this encoder with a ranks file > the BPE-ish regex
stand-in.  Tests pin the merge loop against hand-computed toy tables and
against tiktoken itself when it is importable.
"""

from __future__ import annotations

import base64
import functools
import os

import regex as _re

# GPT-2 / p50k_base pretokenizer (published pattern)
P50K_PATTERN = (
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
    r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)
_PAT = _re.compile(P50K_PATTERN)

RANKS_ENV = "PROBE_SPARK_TIKTOKEN_RANKS"


def load_ranks(path: str) -> dict[bytes, int]:
    """Parse a .tiktoken ranks file: ``base64(token) rank`` per line."""
    ranks: dict[bytes, int] = {}
    with open(path, "rb") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            tok_b64, rank = line.split()
            ranks[base64.b64decode(tok_b64)] = int(rank)
    return ranks


def bpe_encode(piece: bytes, ranks: dict[bytes, int]) -> list[bytes]:
    """Merge-by-lowest-rank until no adjacent pair is in the table."""
    parts = [piece[i : i + 1] for i in range(len(piece))]
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def count_tokens(text: str, ranks: dict[bytes, int]) -> int:
    """Exact BPE token count of ``text`` under ``ranks``."""
    n = 0
    for piece in _PAT.findall(text):
        n += len(bpe_encode(piece.encode("utf-8"), ranks))
    return n


@functools.lru_cache(maxsize=4)
def ranks_from(path: str) -> dict[bytes, int]:
    """Process-cached ranks table (executors parse the file once, not
    once per Arrow batch)."""
    return load_ranks(path)


@functools.lru_cache(maxsize=1)
def env_ranks() -> "dict[bytes, int] | None":
    """Ranks table from $PROBE_SPARK_TIKTOKEN_RANKS, if set and readable."""
    path = os.environ.get(RANKS_ENV)
    if not path or not os.path.exists(path):
        return None
    return load_ranks(path)
