"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Every document is a pure function of (seed, doc index), generated inside
mapInPandas over spark.range(n) — so the corpus is identical at any
parallelism/partitioning (the property the scaling benchmark and the
resume tests rely on), and generation itself is distributed (no driver-side
materialization at bench scale).

Planted structure by id range (fractions per FIXTURES.md):
- [0.00, 0.60) unique documents (singleton clusters)
- [0.60, 0.90) near-duplicate clusters, sizes cycling 2..20, word-edit
  rates cycling through high-Jaccard (dup) and low-Jaccard (negative) tiers
- [0.90, 0.98) exact duplicates (byte-identical text, distinct urls)
- [0.98, 1.00) template/boilerplate family sharing one hot block (drives
  the hot-band skew tiers) + a long-shared-substring set (O5)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VOCAB = (
    "the a and of to in is был data page web site news query table row "
    "column spark hash join merge sort filter scan batch stream value key "
    "index store cache shard block file text word line item user time day "
    "year city world market price trade stock bank fund rate growth model "
    "train test learn deep neural graph node edge path tree leaf root "
    "branch cloud server client proxy route packet frame signal wave"
).split()

CLUSTER_SIZES = (2, 3, 5, 8, 12, 20)
EDIT_RATES = (0.01, 0.02, 0.04, 0.06, 0.25, 0.45)  # last two = negatives

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("planted_cluster", T.LongType(), False),
        T.StructField("planted_kind", T.StringType(), False),
    ]
)

_EPOCH = pd.Timestamp("2026-01-01T00:00:00")  # fixed, no wall clock
_SUBSTRING_BLOCK_EVERY = 211  # every Nth unique doc gets the shared block


def _rng(seed: int, *streams: int) -> np.random.Generator:
    return np.random.default_rng(np.random.PCG64(seed=[seed, *streams]))


def _base_words(seed: int, key: int, n_words: int) -> np.ndarray:
    r = _rng(seed, 1, key)
    return r.integers(0, len(VOCAB), size=n_words)


def _mutate(words: np.ndarray, seed: int, member: int, rate: float) -> np.ndarray:
    r = _rng(seed, 2, member)
    out = words.copy()
    mask = r.random(out.size) < rate
    out[mask] = r.integers(0, len(VOCAB), size=int(mask.sum()))
    return out


_VOCAB_NP = np.array(VOCAB, dtype=object)


def _words_to_text(idx: np.ndarray) -> str:
    # C-level gather + list join: ~2x over a python genexpr indexing VOCAB
    # per element (same words, same string — profiled 45% of generate_row)
    return " ".join(_VOCAB_NP[idx].tolist())


SHARED_SUBSTRING = " ".join(VOCAB[i % len(VOCAB)] for i in range(64))  # ~380 chars


def generate_row(i: int, n: int, seed: int) -> tuple:
    u_end = int(n * 0.60)
    nd_end = int(n * 0.90)
    ex_end = int(n * 0.98)
    host = i % 1000
    url = f"https://site{host}.example/p/{i}"
    ts = _EPOCH + pd.Timedelta(seconds=i)
    lang = ("en", "en", "en", "en", "en", "en", "en", "en", "de", "fr")[i % 10]

    if i < u_end:  # unique
        r = _rng(seed, 1, i)
        n_words = int(r.integers(40, 600))
        words = _base_words(seed, i, n_words)
        text = _words_to_text(words)
        if i % _SUBSTRING_BLOCK_EVERY == 17:  # long-shared-substring set
            cut = max(1, len(text) // 2)
            text = text[:cut] + " " + SHARED_SUBSTRING + " " + text[cut:]
            return (url, ts, _html(text), text, lang, i, "substring")
        return (url, ts, _html(text), text, lang, i, "unique")

    if i < nd_end:  # near-dup clusters
        j = i - u_end
        # deterministic cluster layout: cycle sizes, assign consecutively
        csize, cid, member = _cluster_of(j)
        rate = EDIT_RATES[cid % len(EDIT_RATES)]
        r = _rng(seed, 3, cid)
        n_words = int(r.integers(120, 600))
        base = _base_words(seed, 10_000_000 + cid, n_words)
        words = base if member == 0 else _mutate(base, seed, j, rate)
        text = _words_to_text(words)
        kind = "neardup" if rate <= 0.1 else "negative"
        return (url, ts, _html(text), text, lang, u_end + cid, kind)

    if i < ex_end:  # exact dups: groups of 2-4 identical texts
        j = i - nd_end
        gid = j // 3
        r = _rng(seed, 4, gid)
        n_words = int(r.integers(60, 400))
        words = _base_words(seed, 20_000_000 + gid, n_words)
        text = _words_to_text(words)
        return (url, ts, _html(text), text, lang, nd_end + gid, "exact")

    # template family: one hot boilerplate block + tiny unique tail
    j = i - ex_end
    r = _rng(seed, 5, j)
    tail = _words_to_text(r.integers(0, len(VOCAB), size=8))
    text = SHARED_SUBSTRING + " " + SHARED_SUBSTRING + " " + tail
    return (url, ts, _html(text), text, lang, ex_end, "template")


def _cluster_of(j: int) -> tuple[int, int, int]:
    """Map the j-th near-dup slot to (cluster_size, cluster_id, member_idx)
    with sizes cycling CLUSTER_SIZES — pure arithmetic, O(1) memory."""
    period = sum(CLUSTER_SIZES)
    full, rem = divmod(j, period)
    cid_base = full * len(CLUSTER_SIZES)
    for si, s in enumerate(CLUSTER_SIZES):
        if rem < s:
            return s, cid_base + si, rem
        rem -= s
    raise AssertionError


def _html(text: str) -> bytes:
    return f"<html><body><p>{text}</p></body></html>".encode()


def generate_pages(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus: spark.range -> mapInPandas."""
    partitions = partitions or max(32, n // 20_000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [generate_row(int(i), n, seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return (
        spark.range(0, n, numPartitions=partitions)
        .mapInPandas(gen, PAGES_SCHEMA)
    )


def generate_pages_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side twin for tiny fixtures / pytest without Spark."""
    rows = [generate_row(i, n, seed) for i in range(n)]
    return pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])
