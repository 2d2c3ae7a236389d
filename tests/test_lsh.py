"""LSH candidate generation: triangular rule, tier equivalence, skew tiers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lash_spark.operators.lsh import (
    band_census,
    explode_bands,
    pairs_from_keys,
    simhash_candidate_pairs,
)


def _keyed(spark, buckets):
    """buckets: dict[key] -> list of ids."""
    rows = [(0, k, i) for k, ids in buckets.items() for i in ids]
    return spark.createDataFrame(rows, "band_id int, key bigint, url bigint")


def _expected_pairs(buckets):
    out = set()
    for ids in buckets.values():
        s = sorted(ids)
        out |= {(a, b) for i, a in enumerate(s) for b in s[i + 1 :]}
    return out


def test_pairs_plain_tier(spark):
    buckets = {1: [3, 1, 2], 2: [5, 6], 3: [7]}
    got = {
        (r.url_a, r.url_b)
        for r in pairs_from_keys(_keyed(spark, buckets), max_bucket=100).collect()
    }
    assert got == _expected_pairs(buckets)


def test_pairs_salted_tier_equals_plain(spark):
    """Tier 2 (salted triangle blocks) must emit exactly the same unordered
    pairs as the plain join — each exactly once."""
    buckets = {10: list(range(40)), 11: [100, 101, 102]}
    keyed = _keyed(spark, buckets)
    plain = pairs_from_keys(keyed, max_bucket=1000).collect()
    salted = pairs_from_keys(keyed, max_bucket=5, salt_buckets=4, star_threshold=10_000).collect()
    assert {(r.url_a, r.url_b) for r in salted} == {(r.url_a, r.url_b) for r in plain}
    assert len(salted) == len({(r.url_a, r.url_b) for r in salted})  # no dupes pre-dedup


def test_pairs_star_tier(spark):
    buckets = {7: list(range(100, 140))}
    got = pairs_from_keys(
        _keyed(spark, buckets), max_bucket=2, salt_buckets=2, star_threshold=10
    ).collect()
    pairs = {(r.url_a, r.url_b) for r in got}
    # star topology: every member linked to min id, linear volume
    assert pairs == {(100, i) for i in range(101, 140)}


def test_triangular_rule_no_self_or_reversed(spark):
    buckets = {1: [1, 2, 3, 4]}
    got = pairs_from_keys(_keyed(spark, buckets)).collect()
    for r in got:
        assert r.url_a < r.url_b  # J2 (utils.rs:158-160)


def test_band_census(spark):
    keyed = _keyed(spark, {1: [5, 2, 9], 2: [1]})
    rows = {(r.key): (r.bucket_n, r.rep) for r in band_census(keyed, "url").collect()}
    assert rows == {1: (3, 2), 2: (1, 1)}


def test_simhash_pigeonhole_complete(spark):
    """Fingerprints within hamming<=3 at 4 chunks must always be found."""
    rows = [
        (1, 0b0000),          # base
        (2, 0b0111),          # hamming 3 from 1 -> candidate
        (3, (1 << 62) | 0b1), # hamming 2 from 1
        (4, -1),              # far from everything (~64 bits)
    ]
    df = spark.createDataFrame(rows, "url bigint, simhash bigint")
    got = {(r.url_a, r.url_b): r.hamming for r in simhash_candidate_pairs(df, "url").collect()}
    assert (1, 2) in got and got[(1, 2)] == 3
    assert (1, 3) in got and got[(1, 3)] == 2
    assert all(h <= 3 for h in got.values())
