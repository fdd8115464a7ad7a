"""Train the vendored byte-level BPE ranks fixture.

The container has no network and no tiktoken package, so the true
p50k_base ranks file cannot be vendored here.  Instead this trains a
PINNED byte-level BPE vocabulary with the standard algorithm (Sennrich
et al. 2016 / the GPT-2 byte-level variant): start from the 256 single
bytes, repeatedly merge the most-frequent adjacent pair (ties -> the
lexicographically smallest pair, so the result is fully deterministic),
emitting ranks in merge order — exactly the table shape a
``p50k_base.tiktoken`` file has, written in the same
``base64(token) SPACE rank`` format ``functions/bpe.load_ranks`` parses.

The training corpus is the repo's own deterministic synthetic
transcripts (``fixtures.generate_transcripts``), so regenerating the
file is reproducible: ``python scripts/train_bpe_ranks.py`` writes
``probe_spark/functions/ranks/builtin.tiktoken`` and prints its stats.

With the fixture vendored, the limiter's token budgets run the REAL BPE
merge loop by default (no env var, no package); pointing
``PROBE_SPARK_TIKTOKEN_RANKS`` at a genuine ``p50k_base.tiktoken`` file
swaps in exact p50k counts with zero code change.
"""

from __future__ import annotations

import base64
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_spark.fixtures import generate_transcripts  # noqa: E402
from probe_spark.functions.bpe import _PAT  # noqa: E402

N_MERGES = 4000
N_CONVS = 800
SEED = 42


def train(texts: "list[str]", n_merges: int) -> "list[bytes]":
    """Merge list in order; rank = 256 + position."""
    # piece frequency table over the pretokenized corpus
    piece_freq: Counter = Counter()
    for t in texts:
        for piece in _PAT.findall(t):
            piece_freq[piece.encode("utf-8")] += 1
    # each unique piece as a list of byte-tokens
    pieces = [[bytes([b]) for b in p] for p in piece_freq]
    freqs = list(piece_freq.values())

    # incremental pair stats: pair -> weighted count, pair -> piece ids
    pair_count: dict = defaultdict(int)
    pair_pieces: dict = defaultdict(set)
    for pid, parts in enumerate(pieces):
        f = freqs[pid]
        for i in range(len(parts) - 1):
            pr = (parts[i], parts[i + 1])
            pair_count[pr] += f
            pair_pieces[pr].add(pid)

    merges: list[bytes] = []
    for _ in range(n_merges):
        if not pair_count:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair
        top = max(pair_count.values())
        best_pair = min(p for p, c in pair_count.items() if c == top)
        if pair_count[best_pair] < 2:
            break  # nothing left worth merging
        new_tok = best_pair[0] + best_pair[1]
        merges.append(new_tok)
        # apply the merge only to pieces containing the pair
        for pid in list(pair_pieces[best_pair]):
            parts = pieces[pid]
            f = freqs[pid]
            # remove old pair contributions for this piece
            for i in range(len(parts) - 1):
                pr = (parts[i], parts[i + 1])
                pair_count[pr] -= f
                if pair_count[pr] <= 0:
                    del pair_count[pr]
                    pair_pieces.pop(pr, None)
                else:
                    s = pair_pieces.get(pr)
                    if s is not None:
                        s.discard(pid)
            # merge every occurrence left-to-right
            out = []
            i = 0
            while i < len(parts):
                if (
                    i + 1 < len(parts)
                    and parts[i] == best_pair[0]
                    and parts[i + 1] == best_pair[1]
                ):
                    out.append(new_tok)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            pieces[pid] = out
            # add new pair contributions
            for i in range(len(out) - 1):
                pr = (out[i], out[i + 1])
                pair_count[pr] += f
                pair_pieces[pr].add(pid)
    return merges


def main() -> None:
    import textwrap
    import zlib

    tbl = generate_transcripts(n_convs=N_CONVS, seed=SEED)
    texts = tbl.column("text").to_pylist()
    merges = train(texts, N_MERGES)
    lines = []
    for i in range(256):
        lines.append(base64.b64encode(bytes([i])) + b" %d" % i)
    for j, tok in enumerate(merges):
        lines.append(base64.b64encode(tok) + b" %d" % (256 + j))
    payload = b"\n".join(lines) + b"\n"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # 1. the .tiktoken file — human-inspectable, env-var compatible
    out_path = os.path.join(
        repo, "probe_spark", "functions", "ranks", "builtin.tiktoken"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as fh:
        fh.write(payload)
    # 2. the embedded module — the executor package zip ships only .py
    # files (runtime.ensure_package_on_executors), so the default table
    # rides as a compressed literal (same precedent as functions/_tables
    # for the reference stopword/vocabulary data)
    blob = base64.b64encode(zlib.compress(payload, 9)).decode()
    mod_path = os.path.join(repo, "probe_spark", "functions", "_builtin_ranks.py")
    wrapped = "\n".join(
        f'    "{c}"' for c in textwrap.wrap(blob, 72)
    )
    with open(mod_path, "w") as fh:
        fh.write(
            '"""GENERATED by scripts/train_bpe_ranks.py — do not edit.\n\n'
            "The vendored default BPE ranks table (256 byte tokens + "
            f"{len(merges)} merges\ntrained deterministically on the synthetic "
            "transcript corpus), embedded as a\ncompressed literal so the "
            "executor package zip carries it.  Same line\nformat as a "
            ".tiktoken file once decompressed.\n"
            '"""\n\n'
            "RANKS_BLOB = (\n" + wrapped + "\n)\n"
        )
    print(
        f"wrote {out_path} and {mod_path}: 256 byte tokens + "
        f"{len(merges)} merges from {len(texts)} turns"
    )


if __name__ == "__main__":
    main()
