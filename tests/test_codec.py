"""Property tests for the varint/delta posting codec (hypothesis).

Guards in particular the run-grouped decode_blocks (consecutive kept blocks
decode as one varint pass): any keep subset must equal the block-by-block
reference decode, and keep=all must equal decode_postings."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from probe_spark.index.codec import (
    decode_blocks,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62 - 1), min_size=1, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.asarray(values, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == values


@st.composite
def _postings(draw):
    n = draw(st.integers(min_value=1, max_value=600))
    gaps = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000), min_size=n, max_size=n
        )
    )
    ids = np.cumsum(np.asarray(gaps, dtype=np.int64) + 1)  # strictly sorted
    dls = np.asarray(
        draw(
            st.lists(
                st.integers(min_value=1, max_value=5_000),
                min_size=n,
                max_size=n,
            )
        ),
        dtype=np.int64,
    )
    block = draw(st.sampled_from([4, 16, 128]))
    return ids, dls, block


@given(_postings())
@settings(max_examples=100, deadline=None)
def test_encode_decode_postings_roundtrip(p):
    ids, dls, block = p
    docs_bin, dl_bin, *_ = encode_postings(ids, dls, block=block)
    got_ids, got_dls = decode_postings(docs_bin, dl_bin)
    assert got_ids.tolist() == ids.tolist()
    assert got_dls.tolist() == dls.tolist()


@given(_postings(), st.data())
@settings(max_examples=100, deadline=None)
def test_decode_blocks_any_subset_matches_reference(p, data):
    ids, dls, block = p
    docs_bin, dl_bin, last, _min_dl, doff, loff = encode_postings(
        ids, dls, block=block
    )
    n_blocks = len(last)
    keep = data.draw(
        st.sets(
            st.integers(min_value=0, max_value=n_blocks - 1),
            min_size=1,
            max_size=n_blocks,
        )
    )
    got_ids, got_dls = decode_blocks(docs_bin, dl_bin, last, doff, loff, keep)
    exp_ids, exp_dls = [], []
    for i in sorted(keep):
        s, e = i * block, min((i + 1) * block, len(ids))
        exp_ids.extend(ids[s:e].tolist())
        exp_dls.extend(dls[s:e].tolist())
    assert got_ids.tolist() == exp_ids
    assert got_dls.tolist() == exp_dls


@given(_postings())
@settings(max_examples=50, deadline=None)
def test_decode_blocks_keep_all_equals_decode_postings(p):
    ids, dls, block = p
    docs_bin, dl_bin, last, _min_dl, doff, loff = encode_postings(
        ids, dls, block=block
    )
    got_ids, got_dls = decode_blocks(
        docs_bin, dl_bin, last, doff, loff, list(range(len(last)))
    )
    assert got_ids.tolist() == ids.tolist()
    assert got_dls.tolist() == dls.tolist()


class TestXXH64Vec:
    def test_vec_matches_scalar_all_lengths(self):
        import random

        import numpy as np

        from probe_spark.index.xxhash import xxh64_signed, xxh64_vec

        rng = random.Random(11)
        vals = [
            bytes(rng.randrange(256) for _ in range(n))
            for n in list(range(0, 40)) + [63, 64, 100]
            for _ in range(5)
        ]
        vec = xxh64_vec(vals)
        assert vec.dtype == np.int64
        for i, v in enumerate(vals):
            assert int(vec[i]) == xxh64_signed(v)

    def test_bucket_vec_matches_scalar(self):
        from probe_spark.index.xxhash import spark_bucket, spark_buckets_vec

        terms = ["error", "handl", "", "ветка", "a" * 40, "hash", "15"]
        got = spark_buckets_vec(terms, 32)
        for t, b in zip(terms, got):
            assert spark_bucket(t, 32) == int(b)
