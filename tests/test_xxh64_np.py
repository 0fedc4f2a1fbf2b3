"""Vectorized XXH64 (functions/xxh64_np.py) vs the scalar reference.

The scalar ``xxh64`` is itself pinned bit-exact against Spark's JVM
``xxhash64(string)`` (test_clp_core.py), so equality here transitively
pins the batch hasher to the on-disk id format.  No Spark needed."""

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fluent_bit_clp_spark.functions.clp_pandas import xxh64
from fluent_bit_clp_spark.functions.xxh64_np import (
    _BUCKETS,
    xxh64_batch,
    xxh64_batch_strs,
)


def test_empty_batch():
    assert xxh64_batch([]).shape == (0,)
    assert xxh64_batch([]).dtype == np.int64


def test_every_length_0_to_200():
    """One string of every length through the short buckets — covers all
    tail shapes (0-3 eight-byte chunks, the 4-byte chunk, 0-3 single
    bytes) and the 31/32/33 stripe boundary."""
    rng = random.Random(5)
    items = [bytes(rng.randrange(256) for _ in range(n)) for n in range(201)]
    got = xxh64_batch(items)
    assert [int(g) for g in got] == [xxh64(b) for b in items]


@pytest.mark.parametrize("cap", _BUCKETS)
def test_bucket_boundaries(cap):
    """cap-1 / cap / cap+1 byte strings hash identically to scalar —
    boundary items land in adjacent buckets without corruption."""
    for n in (cap - 1, cap, cap + 1):
        b = bytes((i * 37) % 256 for i in range(n))
        assert int(xxh64_batch([b])[0]) == xxh64(b)


def test_huge_string_beyond_last_bucket():
    b = b"\xabZ9" * 70000  # 210 kB > 131072: the one-at-a-time path
    mixed = [b"", b"short 42", b]
    got = xxh64_batch(mixed)
    assert [int(g) for g in got] == [xxh64(x) for x in mixed]


def test_seed_parameter():
    items = [b"", b"abc", b"x" * 40]
    for seed in (0, 1, 42, 2**63, 2**64 - 1):
        got = xxh64_batch(items, seed=seed)
        assert [int(g) for g in got] == [xxh64(b, seed) for b in items]


def test_strs_utf8_convention():
    ss = ["", "héllo wörld", "日本語テキスト" * 20, "plain ascii 42"]
    got = xxh64_batch_strs(ss)
    assert [int(g) for g in got] == [xxh64(s.encode("utf-8")) for s in ss]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=60),
    st.integers(min_value=0, max_value=2**64 - 1),
)
def test_property_matches_scalar(items, seed):
    got = xxh64_batch(items, seed=seed)
    assert [int(g) for g in got] == [xxh64(b, seed) for b in items]
