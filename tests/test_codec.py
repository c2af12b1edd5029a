"""Property tests for the delta+varbyte posting codec (SURVEY.md §5.2.3)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from information_retrieval_project_spark.index.codec import (
    block_max_meta,
    decode_postings,
    encode_postings,
    merge_sorted_runs,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.integers(min_value=1, max_value=10**6),
        ),
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_postings_roundtrip(pairs):
    uniq = {}
    for d, t in pairs:
        uniq[d] = t
    d = np.array(sorted(uniq), dtype=np.int64)
    t = np.array([uniq[x] for x in sorted(uniq)], dtype=np.int64)
    dd, tt = decode_postings(encode_postings(d, t))
    assert np.array_equal(dd, d)
    assert np.array_equal(tt, t)


def test_empty_postings():
    d, t = decode_postings(encode_postings(np.array([], dtype=np.int64), np.array([], dtype=np.int64)))
    assert d.size == 0 and t.size == 0


def test_merge_sums_duplicates():
    d1, t1 = np.array([1, 5, 9]), np.array([2, 1, 1])
    d2, t2 = np.array([1, 7, 9]), np.array([3, 1, 4])
    md, mt = merge_sorted_runs([(d1, t1), (d2, t2)])
    assert md.tolist() == [1, 5, 7, 9]
    assert mt.tolist() == [5, 1, 1, 5]


def test_block_max():
    d = np.arange(0, 300, dtype=np.int64)
    t = np.arange(1, 301, dtype=np.int64)
    bm_d, bm_t = block_max_meta(d, t)
    assert bm_d.tolist() == [127, 255, 299]
    assert bm_t.tolist() == [128, 256, 300]


def test_compression_ratio_on_dense_ids():
    """Dense doc ids (small gaps) must compress well below 8 bytes/posting."""
    rng = np.random.default_rng(7)
    d = np.cumsum(rng.integers(1, 30, size=100_000)).astype(np.int64)
    t = rng.integers(1, 5, size=d.size).astype(np.int64)
    blob = encode_postings(d, t)
    bytes_per_posting = len(blob) / d.size
    assert bytes_per_posting < 3.0, bytes_per_posting


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=-(2**40), max_value=2**40),
                st.integers(min_value=1, max_value=100),
            ),
            max_size=50,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_merge_overlapping_runs_sums_tf(runs_raw):
    """merge_sorted_runs over runs with OVERLAPPING doc ids (the resumed /
    salted-rebuild case) must equal the dict-sum model."""
    runs, model = [], {}
    for pairs in runs_raw:
        uniq = {}
        for d, t in pairs:
            uniq[d] = t
        d = np.array(sorted(uniq), dtype=np.int64)
        t = np.array([uniq[x] for x in sorted(uniq)], dtype=np.int64)
        runs.append((d, t))
        for x, y in uniq.items():
            model[x] = model.get(x, 0) + y
    md, mt = merge_sorted_runs(runs)
    assert md.tolist() == sorted(model)
    assert mt.tolist() == [model[x] for x in sorted(model)]
