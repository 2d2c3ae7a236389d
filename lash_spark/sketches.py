"""Sketch kernels: MinHash, HLL, ULL, HMH-style, SimHash (pure numpy).

Functional parity with the reference's ``KmerSketch`` trait surface
(``/root/reference/src/utils.rs:377-434``): construct from an element set,
merge (union), estimate cardinality, estimate Jaccard. Register layouts are
NOT bit-compatible with the Rust crates (hyperminhash / hyperloglogplus /
ultraloglog); the contract is the *algebra* — union = element-wise max,
inclusion–exclusion Jaccard, MinHash match-fraction Jaccard — which is what
the pipeline and the acceptance metric (dup-pair recall) consume.

Everything here is batch-vectorized numpy, designed to run inside Arrow
pandas UDFs (see operators/signatures.py). No per-element Python loops on
the hot path.
"""

from __future__ import annotations

import numpy as np

from lash_spark.hashing import U64, clz64, hash_with_seed, mix64, perm_keys

I64 = np.int64
EMPTY_MIN = U64(0xFFFFFFFFFFFFFFFF)  # MinHash register of the empty set


# ---------------------------------------------------------------- MinHash

def minhash_signature(hashes: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """n-permutation MinHash signature of one hash set.

    sig[i] = min over elements of mix64(h ^ key_i) — the A2 analog
    (utils.rs:395-398) generalized from HMH buckets to explicit permutations.
    Empty set -> all EMPTY_MIN. Returns uint64 (n,).
    """
    if hashes.size == 0:
        return np.full(keys.shape[0], EMPTY_MIN, dtype=U64)
    # (m, n) broadcast; m = |set|, n = permutations
    return mix64(hashes[:, None] ^ keys[None, :]).min(axis=0)


def minhash_signatures_batch(
    hash_sets: "list[np.ndarray]", num_perm: int, seed: int
) -> np.ndarray:
    """Batch MinHash: list of per-doc hash sets -> (B, n) uint64 matrix."""
    keys = perm_keys(num_perm, seed)
    out = np.full((len(hash_sets), num_perm), EMPTY_MIN, dtype=U64)
    for i, hs in enumerate(hash_sets):
        if hs.size:
            out[i] = mix64(hs[:, None] ^ keys[None, :]).min(axis=0)
    return out


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """U1 analog: J ≈ fraction of matching registers."""
    return float(np.mean(sig_a == sig_b))


def oph_signatures_segments(
    h: np.ndarray, seg: np.ndarray, num_perm: int
) -> np.ndarray:
    """One-permutation-hashing signatures for a batch of documents given as
    flat window-hash segments (multiset; dedup-invariant).

    bin = low log2(num_perm) bits of the element hash; register = min hash
    in the bin. O(total windows) regardless of num_perm — the 10^12-doc
    signature mode (vs. O(windows x num_perm) for k independent
    permutations). Empty bins keep EMPTY_MIN until densify_rotation().
    """
    n = seg.shape[0] - 1
    sig = np.full((n, num_perm), EMPTY_MIN, dtype=U64)
    if h.size:
        counts = np.diff(seg)
        mask = U64(num_perm - 1)
        idx = (
            np.repeat(np.arange(n, dtype=np.int64), counts) * num_perm
            + (h & mask).astype(np.int64)
        )
        np.minimum.at(sig.reshape(-1), idx, h)
    return sig


def densify_rotation(sig: np.ndarray) -> np.ndarray:
    """Rotation densification (Shrivastava & Li): an empty bin borrows the
    value of the nearest occupied bin to its left (circular). Deterministic
    per document; near-duplicate documents share occupancy patterns, so
    borrowed registers still match with probability ~J. All-empty rows
    (documents shorter than one shingle) stay EMPTY_MIN."""
    out = sig.copy()
    occupied = sig != EMPTY_MIN
    rows = np.flatnonzero(occupied.any(axis=1) & (~occupied).any(axis=1))
    if rows.size == 0:
        return out
    sub = out[rows]
    src = sig[rows]
    p = sig.shape[1]
    for t in range(1, p):
        empty = sub == EMPTY_MIN
        if not empty.any():
            break
        np.copyto(sub, np.roll(src, t, axis=1), where=empty)
    out[rows] = sub
    return out


def simhash_from_signature(sig: np.ndarray) -> np.ndarray:
    """64-bit fingerprint from a signature matrix (n, P): majority vote of
    each bit across the mixed registers — a b-bit-minwise-style fingerprint
    whose Hamming distance tracks (1 - J)/2 per bit. Replaces per-window
    SimHash on the hot path (O(P) per doc instead of O(windows)); the
    set-based simhash64() kernel remains for callers that want the
    classic variant. Empty rows -> 0."""
    n, p = sig.shape
    m = mix64(sig.reshape(-1)).reshape(n, p)
    fp = np.zeros(n, dtype=U64)
    for b in range(64):
        votes = ((m >> U64(b)) & U64(1)).sum(axis=1)
        fp |= ((2 * votes) >= p).astype(U64) << U64(b)
    fp = np.where((sig != EMPTY_MIN).any(axis=1), fp, U64(0))
    return fp.view(np.int64)


# ------------------------------------------------------------------- HLL

def hll_registers(hashes: np.ndarray, p: int, seed: int) -> np.ndarray:
    """HyperLogLog register array (2^p int8-range values in an int32 array).

    A3 analog (utils.rs:406-413): j = top p bits, rank = clz of the
    remaining bits + 1 (capped at 64-p+1); register[j] = max rank.
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.int32)
    if hashes.size == 0:
        return regs
    h = hash_with_seed(hashes, seed)
    j = (h >> U64(64 - p)).astype(np.int64)
    w = h << U64(p)  # remaining 64-p bits, left-aligned
    rank = np.minimum(clz64(w) + 1, 64 - p + 1).astype(np.int32)
    np.maximum.at(regs, j, rank)
    return regs


def hll_cardinality(regs: np.ndarray) -> float:
    """Harmonic-mean HLL estimator with small-range correction (A5 analog
    of ``hll.len()`` / FGRA — utils.rs:214-217,315)."""
    m = regs.shape[0]
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def register_union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sketch union = element-wise max (U2/U3 — utils.rs:260-262,355-358)."""
    return np.maximum(a, b)


def inclusion_exclusion_jaccard(card_a: float, card_b: float, card_u: float) -> float:
    """U4 (utils.rs:273-274,362): J = max(0, (a + b - u) / u)."""
    if card_u <= 0:
        return 0.0
    return max(0.0, (card_a + card_b - card_u) / card_u)


def containment(card_a: float, card_b: float, card_u: float) -> float:
    """Asymmetric containment |A∩B|/|A| — the SetSketch-style extension
    (SURVEY.md U4 note) for asymmetric near-dup."""
    if card_a <= 0:
        return 0.0
    return max(0.0, (card_a + card_b - card_u) / card_a)


# ------------------------------------------------------------------- ULL

def ull_registers(hashes: np.ndarray, p: int, seed: int) -> np.ndarray:
    """UltraLogLog-style registers (A4 analog, utils.rs:421-429).

    Ertl's ULL packs (q, extra bits) per register for ~28% space savings;
    we keep the *algebraic* contract (max-merge + cardinality estimator)
    with a 2-extra-bit register: reg = 4*rank | low-2-bits-seen mask.
    Union remains element-wise max on rank and OR on the bit mask — encoded
    so plain max() is a valid (slightly lossy) merge; we therefore store
    rank and mask in separate halves and merge exactly in ull_union.
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.int32)
    if hashes.size == 0:
        return regs
    h = hash_with_seed(hashes, seed)
    j = (h >> U64(64 - p)).astype(np.int64)
    w = h << U64(p)
    rank = np.minimum(clz64(w) + 1, 64 - p + 1).astype(np.int32)
    # pack: high 16 bits = max rank, low 16 bits = OR-mask of (1 << (rank & 15))
    packed_rank = rank << 16
    packed_mask = (1 << (rank & 15)).astype(np.int32)
    np.maximum.at(regs, j, packed_rank)
    # OR in the mask bits
    mask_accum = np.zeros(m, dtype=np.int32)
    np.bitwise_or.at(mask_accum, j, packed_mask)
    return regs | (mask_accum & 0xFFFF)


def ull_union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    rank = np.maximum(a >> 16, b >> 16)
    mask = (a | b) & 0xFFFF
    return (rank << 16) | mask


def ull_cardinality(regs: np.ndarray) -> float:
    """Estimate via the rank half (reduces to the HLL estimator — the FGRA
    refinement uses the extra bits; rank-only is within the test tolerance)."""
    return hll_cardinality((regs >> 16).astype(np.int32))


# ------------------------------------------------------------------- HMH

def hmh_registers(hashes: np.ndarray, p: int, seed: int, r_bits: int = 16) -> np.ndarray:
    """HyperMinHash-style registers: per 2^p bucket keep (max LZ rank,
    min r_bits sub-hash) — "MinHash in LogLog space" (A2, utils.rs:395-398;
    Yu & Weber 2020).

    Encoded so element-wise MAX is the union: value = (rank << r_bits) |
    (MASK - sub). Higher rank wins; equal rank -> smaller sub wins.
    0 = empty bucket.
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.int32)
    if hashes.size == 0:
        return regs
    h = hash_with_seed(hashes, seed)
    j = (h >> U64(64 - p)).astype(np.int64)
    w = h << U64(p)
    rank = np.minimum(clz64(w) + 1, 64 - p + 1).astype(np.int64)
    sub = (h & U64((1 << r_bits) - 1)).astype(np.int64)
    mask = (1 << r_bits) - 1
    enc = ((rank << r_bits) | (mask - sub)).astype(np.int32)
    np.maximum.at(regs, j, enc)
    return regs


def hmh_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """HMH similarity ≈ fraction of equal non-empty registers over buckets
    occupied in either (the reference's ``q.similarity(r)`` register-wise
    ratio, utils.rs:164)."""
    either = (a != 0) | (b != 0)
    n = int(np.count_nonzero(either))
    if n == 0:
        return 0.0
    match = int(np.count_nonzero((a == b) & either))
    return match / n


# --------------------------------------------------------------- SimHash

def simhash64(hashes: np.ndarray) -> int:
    """64-bit SimHash of a hash set (O3 — no reference counterpart).

    bit_i = sign of sum over elements of (2*bit_i(h) - 1). Returns int64
    (two's-complement view of the uint64 fingerprint).
    """
    if hashes.size == 0:
        return 0
    bits = (hashes[:, None] >> np.arange(64, dtype=U64)[None, :]) & U64(1)
    counts = bits.sum(axis=0, dtype=np.int64)
    fp = np.uint64(0)
    ge = (2 * counts) >= hashes.size
    fp = np.bitwise_or.reduce(np.where(ge, np.uint64(1) << np.arange(64, dtype=U64), U64(0)))
    return int(np.int64(fp.astype(np.uint64)))


def simhash_batch(hash_sets: "list[np.ndarray]") -> np.ndarray:
    out = np.zeros(len(hash_sets), dtype=np.int64)
    for i, hs in enumerate(hash_sets):
        out[i] = simhash64(hs)
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# ------------------------------------------------------------- LSH bands

def band_hashes(sig: np.ndarray, bands: int, rows: int, seed: int) -> np.ndarray:
    """Fold an n-permutation signature into b band hashes (O1).

    band_hash[i] = mix of the band's r registers + band index, so identical
    bands from different band positions never collide.
    """
    n = bands * rows
    assert sig.shape[-1] >= n
    s = sig[..., :n].reshape(*sig.shape[:-1], bands, rows).astype(U64)
    acc = np.full(s.shape[:-1], U64(seed & 0xFFFFFFFFFFFFFFFF), dtype=U64)
    for j in range(rows):
        acc = mix64(acc * np.uint64(0x100000001B3) ^ s[..., j])
    acc = mix64(acc ^ (np.arange(bands, dtype=U64) * np.uint64(0x9E3779B97F4A7C15)))
    return acc
