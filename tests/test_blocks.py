"""functions/_blocks.py: the per-block dispatch helpers — bucket ids,
segment boundaries, and the vectorized CRC32 (bit-identity vs zlib)."""

import zlib

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ksoup_ray.functions._blocks import (
    bucket_of,
    crc32_of_strings,
    pk_column,
    segment_starts,
    start_of_segment,
)


@given(st.lists(st.text(max_size=120), max_size=60))
@settings(max_examples=50, deadline=None)
def test_crc32_bit_identical_to_zlib(strings):
    got = crc32_of_strings(pa.array(strings, pa.string()))
    want = np.array([zlib.crc32(s.encode()) for s in strings],
                    np.uint32) if strings else np.empty(0, np.uint32)
    assert got.dtype == np.uint32
    assert list(got) == list(want)


def test_crc32_sliced_and_chunked_columns():
    arr = pa.array(["alpha", "beta", "gamma", "delta"])
    sliced = arr.slice(1, 2)
    assert list(crc32_of_strings(sliced)) == \
        [zlib.crc32(b"beta"), zlib.crc32(b"gamma")]
    chunked = pa.chunked_array([["a"], ["bb", "ccc"]])
    assert list(crc32_of_strings(chunked)) == \
        [zlib.crc32(b"a"), zlib.crc32(b"bb"), zlib.crc32(b"ccc")]


def test_crc32_nulls_hash_as_empty():
    got = crc32_of_strings(pa.array(["x", None], pa.string()))
    assert list(got) == [zlib.crc32(b"x"), 0]


def test_bucket_of_and_pk_column_consistent():
    keys = np.array([0, 1, -5, 2**40], np.int64)
    b = bucket_of(keys, 7)
    assert b.dtype == np.int32
    assert ((b >= 0) & (b < 7)).all()
    col = pa.chunked_array([pa.array(keys, pa.int64())])
    assert pk_column(col, 7).to_pylist() == list(b)
    # string keys route through the hash fallback, still bounded
    s = pk_column(pa.chunked_array([pa.array(["a", "b", "a"])]), 7)
    vals = s.to_pylist()
    assert vals[0] == vals[2] and all(0 <= v < 7 for v in vals)


def test_segment_helpers():
    k = np.array([3, 3, 5, 5, 5, 9])
    assert list(segment_starts(k)) == [0, 2, 5]
    assert list(start_of_segment(k)) == [0, 0, 2, 2, 2, 5]
    assert len(segment_starts(np.empty(0))) == 0
    assert len(start_of_segment(np.empty(0))) == 0
