"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` (seed 42) for strings.

Used to compute term -> bucket assignments driver-side without launching a
Spark job per query (the build uses F.xxhash64; parity is pinned by a test
against Spark's own output).  XXH64 is a public algorithm
(github.com/Cyan4973/xxHash spec).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Spark's xxhash64 returns a signed long."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_bucket(term: str, n_buckets: int) -> int:
    """pmod(xxhash64(term), n_buckets), matching the index build."""
    return xxh64_signed(term.encode("utf-8")) % n_buckets


def xxh64_vec(values: "list[bytes]", seed: int = 42):
    """Vectorized XXH64 over many short byte strings: numpy uint64 lanes,
    one pass per distinct length (terms are short, so ~a few dozen static
    chunk layouts cover everything).  Inputs of 32+ bytes take the scalar
    path (the striped state machine isn't worth vectorizing for the tail
    of long terms).  Returns signed int64 ndarray, bit-identical to
    ``xxh64_signed`` (pinned by tests).  Exists because per-term scalar
    hashing dominated the build's partial-shard bucketing (~10us x 300k
    distinct terms per task)."""
    import numpy as np

    n = len(values)
    out = np.empty(n, dtype=np.uint64)
    lens = np.fromiter((len(v) for v in values), dtype=np.int64, count=n)
    seed_u = np.uint64(seed)
    p1, p2, p3, p5 = (
        np.uint64(_P1), np.uint64(_P2), np.uint64(_P3), np.uint64(_P5),
    )

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    long_idx = np.flatnonzero(lens >= 32)
    for i in long_idx:
        out[i] = xxh64(values[i], seed)
    for ln in np.unique(lens[lens < 32]):
        L = int(ln)
        idx = np.flatnonzero(lens == ln)
        if L == 0:
            out[idx] = np.uint64(xxh64(b"", seed))
            continue
        mat = np.frombuffer(
            b"".join(values[i] for i in idx), dtype=np.uint8
        ).reshape(len(idx), L)
        h = np.full(len(idx), seed_u + p5 + np.uint64(L), dtype=np.uint64)
        i = 0
        while i + 8 <= L:
            k = np.ascontiguousarray(mat[:, i : i + 8]).view(np.uint64)[:, 0]
            acc = rotl(k * p2, 31) * p1  # _round(0, k)
            h ^= acc
            h = rotl(h, 27) * p1 + np.uint64(_P4)
            i += 8
        if i + 4 <= L:
            k4 = (
                np.ascontiguousarray(mat[:, i : i + 4])
                .view(np.uint32)[:, 0]
                .astype(np.uint64)
            )
            h ^= k4 * p1
            h = rotl(h, 23) * p2 + p3
            i += 4
        while i < L:
            h ^= mat[:, i].astype(np.uint64) * p5
            h = rotl(h, 11) * p1
            i += 1
        h ^= h >> np.uint64(33)
        h *= p2
        h ^= h >> np.uint64(29)
        h *= p3
        h ^= h >> np.uint64(32)
        out[idx] = h
    return out.view(np.int64)


def spark_buckets_vec(terms: "list[str]", n_buckets: int):
    """Vectorized pmod(xxhash64(term), n_buckets) for many terms."""
    h = xxh64_vec([t.encode("utf-8") for t in terms])
    return h % n_buckets  # numpy int64 % positive -> python-style pmod
