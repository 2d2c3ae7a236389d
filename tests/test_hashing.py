"""Kernel unit tests (no Spark) — SURVEY.md §5.2."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lash_spark.hashing import (
    batch_shingle_hashes,
    clz64,
    mix64,
    perm_keys,
    rolling_window_hashes,
)


def test_clz64_edges():
    vals = np.array([0, 1, 2, 0xFF, 1 << 62, 1 << 63, (1 << 64) - 1], dtype=np.uint64)
    assert clz64(vals).tolist() == [64, 63, 62, 56, 1, 0, 0]


def test_mix64_bijective_sample():
    x = np.arange(100_000, dtype=np.uint64)
    assert np.unique(mix64(x)).size == x.size


def test_mix64_avalanche():
    # flipping one input bit flips ~32 output bits on average
    x = np.arange(1000, dtype=np.uint64)
    base = mix64(x)
    flipped = mix64(x ^ np.uint64(1))
    diff = base ^ flipped
    popcnt = np.array([bin(int(v)).count("1") for v in diff])
    assert 24 < popcnt.mean() < 40


def test_perm_keys_distinct_and_seeded():
    k1 = perm_keys(128, 42)
    k2 = perm_keys(128, 42)
    k3 = perm_keys(128, 43)
    assert np.array_equal(k1, k2)
    assert not np.array_equal(k1, k3)
    assert np.unique(k1).size == 128


def test_rolling_window_matches_direct():
    data = b"abcdefgh"
    buf = np.frombuffer(data, dtype=np.uint8)
    h = rolling_window_hashes(buf, 3)
    assert h.shape[0] == 6
    # window content determines hash: same trigram elsewhere hashes equal
    buf2 = np.frombuffer(b"xxabcxx", dtype=np.uint8)
    h2 = rolling_window_hashes(buf2, 3)
    assert h2[2] == h[0]  # "abc"
    assert np.unique(h).size == 6


def test_shingle_min_length_guard():
    # reference semantics: seq shorter than k -> skipped (utils.rs:460-462)
    out = batch_shingle_hashes([b"short", b"exactly16bytes!!", b""], 16)
    assert out[0].size == 0
    assert out[1].size == 1
    assert out[2].size == 0


def test_shingle_no_cross_document_windows():
    # concatenation must not create windows spanning document boundaries
    a, b = b"aaaaaaaaaa", b"bbbbbbbbbb"
    joined = batch_shingle_hashes([a, b], 5)
    single = batch_shingle_hashes([a + b], 5)[0]
    # "aaabb"-style windows exist only in the concatenated doc
    union = np.union1d(joined[0], joined[1])
    assert union.size < single.size


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=0, max_size=200), st.integers(min_value=2, max_value=20))
def test_shingles_permutation_invariant_batch(text, k):
    """Same doc hashes identically regardless of batch position."""
    enc = text.encode("utf-8")
    alone = batch_shingle_hashes([enc], k)[0]
    packed = batch_shingle_hashes([b"padding-padding", enc, b"x" * 30], k)[1]
    assert np.array_equal(alone, packed)
