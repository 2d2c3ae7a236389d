"""Sketch kernel tests: estimator error bounds, union algebra, properties.

Mirrors the reference semantics cited in SURVEY.md §2.3/2.5 — union is
register-wise max (utils.rs:260-262,355-358), HLL error ~1.04/sqrt(2^p),
MinHash Jaccard unbiasedness, SimHash Hamming ≈ angular distance.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lash_spark.config import LshPlan, SketchParams, mash_distance
from lash_spark.hashing import mix64
from lash_spark.sketches import (
    band_hashes,
    hamming64,
    hll_cardinality,
    hll_registers,
    hmh_jaccard,
    hmh_registers,
    inclusion_exclusion_jaccard,
    minhash_jaccard,
    minhash_signatures_batch,
    register_union,
    simhash64,
    ull_cardinality,
    ull_registers,
    ull_union,
)


def _set(start, n):
    return mix64(np.arange(start, start + n, dtype=np.uint64))


def test_minhash_jaccard_within_ci():
    for n_perm in (64, 128, 256):
        a, b = _set(0, 2000), _set(1000, 2000)  # J = 1000/3000
        true_j = 1000 / 3000
        sigs = minhash_signatures_batch([a, b], n_perm, 42)
        est = minhash_jaccard(sigs[0], sigs[1])
        se = math.sqrt(true_j * (1 - true_j) / n_perm)
        assert abs(est - true_j) < 4 * se, (n_perm, est)


def test_minhash_empty_sets():
    sigs = minhash_signatures_batch([np.empty(0, np.uint64), _set(0, 10)], 64, 42)
    assert (sigs[0] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    assert minhash_jaccard(sigs[0], sigs[0]) == 1.0


def test_hll_error_bound():
    p = 10
    rel = 1.04 / math.sqrt(1 << p)
    for n in (10, 1000, 100_000):
        est = hll_cardinality(hll_registers(_set(7, n), p, 42))
        assert abs(est - n) / n < 3 * rel, (n, est)


def test_union_is_sketch_of_union():
    a, b = _set(0, 5000), _set(3000, 5000)
    u = np.union1d(a, b)
    for make in (
        lambda s: hll_registers(s, 10, 42),
        lambda s: hmh_registers(s, 10, 42),
    ):
        assert np.array_equal(register_union(make(a), make(b)), make(u))
    assert np.array_equal(ull_union(ull_registers(a, 10, 42), ull_registers(b, 10, 42)),
                          ull_registers(u, 10, 42))


@settings(max_examples=30, deadline=None)
@given(st.sets(st.integers(0, 2**20), max_size=200),
       st.sets(st.integers(0, 2**20), max_size=200))
def test_union_commutative_associative_idempotent(sa, sb):
    a = hll_registers(np.array(sorted(sa), dtype=np.uint64), 6, 42)
    b = hll_registers(np.array(sorted(sb), dtype=np.uint64), 6, 42)
    assert np.array_equal(register_union(a, b), register_union(b, a))
    assert np.array_equal(register_union(a, a), a)
    c = hll_registers(np.arange(50, dtype=np.uint64), 6, 42)
    assert np.array_equal(
        register_union(register_union(a, b), c), register_union(a, register_union(b, c))
    )


def test_inclusion_exclusion_jaccard():
    a, b = _set(0, 20000), _set(10000, 20000)  # true J = 1/3
    p = 12
    ca = hll_cardinality(hll_registers(a, p, 42))
    cb = hll_cardinality(hll_registers(b, p, 42))
    cu = hll_cardinality(register_union(hll_registers(a, p, 42), hll_registers(b, p, 42)))
    j = inclusion_exclusion_jaccard(ca, cb, cu)
    assert abs(j - 1 / 3) < 0.08
    # clamp at zero (utils.rs:274,362)
    assert inclusion_exclusion_jaccard(1.0, 1.0, 10.0) == 0.0


def test_ull_cardinality():
    est = ull_cardinality(ull_registers(_set(3, 50_000), 10, 42))
    assert abs(est - 50_000) / 50_000 < 0.1


def test_hmh_jaccard_tracks_true():
    a, b = _set(0, 4000), _set(1000, 4000)  # J = 3000/5000
    j = hmh_jaccard(hmh_registers(a, 10, 42), hmh_registers(b, 10, 42))
    assert abs(j - 0.6) < 0.1


def test_simhash_hamming_orders_similarity():
    base = _set(0, 1000)
    near = np.union1d(base[:950], _set(90_000, 50))
    far = _set(50_000, 1000)
    s0, s1, s2 = simhash64(base), simhash64(near), simhash64(far)
    assert hamming64(s0, s1) < hamming64(s0, s2)
    assert hamming64(s0, s0) == 0


def test_band_hashes_identical_iff_band_equal():
    sig = minhash_signatures_batch([_set(0, 500), _set(0, 500), _set(900, 500)], 128, 42)
    b = band_hashes(sig, 32, 4, 42)
    assert np.array_equal(b[0], b[1])
    assert not np.array_equal(b[0], b[2])


def test_distance_formulas_reference_semantics():
    # frac=1 -> d=0; frac->0 -> poisson clamps at 1 (main.rs:419)
    assert mash_distance(1.0, 16, 1) == 0.0
    assert mash_distance(1e-12, 16, 1) == 1.0
    # binomial d = 1 - frac^(1/k) (main.rs:420)
    j = 0.5
    frac = 2 * j / (1 + j)
    assert math.isclose(mash_distance(j, 16, 2), 1 - frac ** (1 / 16))
    with pytest.raises(ValueError):
        mash_distance(0.5, 16, 3)  # unknown model panics (main.rs:421)


@settings(max_examples=50, deadline=None)
@given(st.floats(min_value=1e-6, max_value=1.0))
def test_poisson_distance_monotone_in_jaccard(j):
    d1 = mash_distance(j, 16, 1)
    d2 = mash_distance(min(1.0, j + 0.01), 16, 1)
    assert d2 <= d1 + 1e-12


def test_lsh_plan_scurve():
    plan = LshPlan.plan(128, 0.8, 0.995)
    assert plan.bands * plan.rows == 128
    assert plan.candidate_probability(0.8) >= 0.995
    # well below threshold the plan should mostly reject
    assert plan.candidate_probability(0.2) < 0.5


def test_params_validation():
    p = SketchParams()
    p.validate_compatible(SketchParams())
    with pytest.raises(ValueError):
        p.validate_compatible(SketchParams(shingle_k=8))
    with pytest.raises(ValueError):
        p.validate_compatible(SketchParams(algorithm="hll"))
    with pytest.raises(ValueError):
        SketchParams(algorithm="hll").validate_compatible(
            SketchParams(algorithm="hll", precision=12)
        )


# ---------------------------------------------------------------- OPH

def test_oph_jaccard_accuracy():
    from lash_spark.sketches import densify_rotation, oph_signatures_segments

    a, b = _set(0, 3000), _set(1500, 4500)  # J = 1500/6000 = 0.25
    h = np.concatenate([a, b])
    seg = np.array([0, a.size, a.size + b.size])
    sig = densify_rotation(oph_signatures_segments(h, seg, 128))
    est = float(np.mean(sig[0] == sig[1]))
    true_j = np.intersect1d(a, b).size / np.union1d(a, b).size
    assert abs(est - true_j) < 4 * math.sqrt(true_j * (1 - true_j) / 128)


def test_oph_deterministic_and_batch_invariant():
    from lash_spark.sketches import densify_rotation, oph_signatures_segments

    d = _set(7, 500)
    alone = densify_rotation(oph_signatures_segments(d, np.array([0, 500]), 64))[0]
    h = np.concatenate([_set(999, 100), d])
    packed = densify_rotation(oph_signatures_segments(h, np.array([0, 100, 600]), 64))[1]
    assert np.array_equal(alone, packed)


def test_oph_small_doc_densifies_fully():
    from lash_spark.sketches import EMPTY_MIN, densify_rotation, oph_signatures_segments

    d = _set(3, 5)  # 5 elements, 128 bins
    sig = densify_rotation(oph_signatures_segments(d, np.array([0, 5]), 128))
    assert not (sig[0] == EMPTY_MIN).any()
    # identical tiny docs -> identical signatures
    h = np.concatenate([d, d])
    s2 = densify_rotation(oph_signatures_segments(h, np.array([0, 5, 10]), 128))
    assert np.array_equal(s2[0], s2[1])


def test_oph_empty_doc_stays_empty():
    from lash_spark.sketches import EMPTY_MIN, densify_rotation, oph_signatures_segments

    sig = densify_rotation(
        oph_signatures_segments(np.empty(0, dtype=np.uint64), np.array([0, 0]), 32)
    )
    assert (sig[0] == EMPTY_MIN).all()


def test_simhash_from_signature_tracks_jaccard():
    from lash_spark.sketches import densify_rotation, oph_signatures_segments, simhash_from_signature

    a = _set(0, 2000)
    near = np.concatenate([a[:1900], _set(50_000, 100)])
    far = _set(90_000, 2000)
    h = np.concatenate([a, near, far])
    seg = np.array([0, 2000, 4000, 6000])
    sig = densify_rotation(oph_signatures_segments(h, seg, 128))
    fp = simhash_from_signature(sig).view(np.uint64)
    ham_near = bin(int(fp[0] ^ fp[1])).count("1")
    ham_far = bin(int(fp[0] ^ fp[2])).count("1")
    assert ham_near < ham_far
