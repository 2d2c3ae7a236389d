"""Exact-substring duplication pass (O5) via winnowed rolling hashes.

Flags document pairs sharing an exact substring of length >= L. Instead of
a monolithic distributed suffix array, we use the winnowing fingerprint
scheme (Schleimer, Wilkerson, Aiken, SIGMOD 2003): rolling k-gram hashes, then
keep the minimum hash position of every window of w = L - k + 1 consecutive
k-grams. Guarantee: any shared substring of length >= L shares at least one
selected fingerprint, so the fingerprint equi-join is a *complete* candidate
generator; candidates are then verified exactly with a per-pair longest-
common-substring check (bounded — only candidate pairs pay it).

Scale shape: fingerprinting is map-only (Arrow UDF); the join reuses the
skew-tiered pair generator; verification is a pandas UDF over pair texts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lash_spark.hashing import rolling_window_hashes
from lash_spark.operators.lsh import pairs_from_keys


def winnow_fingerprints(data: bytes, min_len: int, k: int = 32) -> np.ndarray:
    """Selected k-gram hashes of one document (winnowing, window
    w = min_len - k + 1). Returns unique uint64 fingerprints."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size < min_len:
        return np.empty(0, dtype=np.uint64)
    h = rolling_window_hashes(buf, k)
    w = min_len - k + 1
    if h.size <= w:
        return np.unique(h[h.argmin() : h.argmin() + 1])
    # min over each window of w consecutive hashes
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(h, w)
    return np.unique(wins.min(axis=1))


def make_fingerprint_udf(min_len: int, k: int = 32):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fp_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            data = t.encode("utf-8") if isinstance(t, str) else b""
            out.append(winnow_fingerprints(data, min_len, k).view(np.int64))
        return pd.Series(out)

    return fp_udf


def _lcs_length(a: bytes, b: bytes, min_len: int) -> int:
    """Longest common substring >= min_len via binary search on length with
    rolling-hash sets (exactness: hash match then confirmed by comparison)."""

    def has_common(L: int) -> int:
        if L == 0 or len(a) < L or len(b) < L:
            return 0
        ha = rolling_window_hashes(np.frombuffer(a, np.uint8), L)
        hb = rolling_window_hashes(np.frombuffer(b, np.uint8), L)
        common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
        for x, y in zip(ia, ib):
            if a[x : x + L] == b[y : y + L]:
                return 1
        return 0

    lo, hi = min_len, min(len(a), len(b))
    if not has_common(lo):
        return 0
    best = lo
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if has_common(mid):
            best = mid
            lo = mid
        else:
            hi = mid - 1
    return best


def make_lcs_udf(min_len: int):
    @F.pandas_udf("int")
    def lcs_udf(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.zeros(len(ta), dtype=np.int32)
        for i, (x, y) in enumerate(zip(ta, tb)):
            bx = x.encode("utf-8") if isinstance(x, str) else b""
            by = y.encode("utf-8") if isinstance(y, str) else b""
            out[i] = _lcs_length(bx, by, min_len)
        return pd.Series(out)

    return lcs_udf


def exact_substring_pairs(
    docs: DataFrame,
    min_len: int = 256,
    k: int = 32,
    id_col: str = "url",
    text_col: str = "norm_text",
    max_bucket: int = 2000,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, common_len) for pairs sharing an exact substring of
    length >= min_len. If ``candidates`` is given (e.g. urls already inside
    near-dup clusters), the pass is restricted to those docs (left_semi) —
    the bounded-pass mode SURVEY.md O5 describes."""
    d = docs.select(F.col(id_col), F.col(text_col))
    if candidates is not None:
        d = d.join(candidates.select(id_col).distinct(), id_col, "left_semi")
    fp = make_fingerprint_udf(min_len, k)
    keyed = (
        d.withColumn("fp", fp(F.col(text_col)))
        .select(F.col(id_col), F.explode("fp").alias("key"))
        .withColumn("band_id", F.lit(0))
    )
    pairs = pairs_from_keys(keyed, id_col=id_col, max_bucket=max_bucket)
    a, b = f"{id_col}_a", f"{id_col}_b"
    texts = d
    lcs = make_lcs_udf(min_len)
    return (
        pairs.join(texts.withColumnsRenamed({id_col: a, text_col: "ta"}), a)
        .join(texts.withColumnsRenamed({id_col: b, text_col: "tb"}), b)
        .withColumn("common_len", lcs(F.col("ta"), F.col("tb")))
        .filter(F.col("common_len") >= min_len)
        .select(a, b, "common_len")
    )
