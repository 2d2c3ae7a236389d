"""Pair verification: sketch-estimate prefilter + exact Jaccard confirm.

The reference computes sketch-estimated similarity for every pair (U1-U4);
at web scale we verify in two tiers:

1. **Signature estimate** (pure Column, no text shuffle): MinHash register
   match fraction — cheap, runs on the signatures already in hand.
2. **Exact shingle Jaccard** (Arrow pandas UDF over the candidate pairs'
   texts): ground truth for the J >= threshold cut. Only candidates that
   survive the estimate prefilter pay the text join.

Exactness note: per-pair exact Jaccard uses the same rolling-hash shingle
sets as the signature stage; 64-bit hash collisions are the only deviation
from string-set Jaccard (P ~ m^2/2^64, negligible — and the DuckDB oracle
agrees empirically at sf0.01).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lash_spark.config import SketchParams
from lash_spark.estimators import minhash_jaccard_expr, with_distance_columns
from lash_spark.hashing import batch_shingle_hashes


def make_exact_jaccard_udf(k: int):
    @F.pandas_udf("double")
    def exact_jaccard(ta: pd.Series, tb: pd.Series) -> pd.Series:
        enc_a = [t.encode("utf-8") if isinstance(t, str) else b"" for t in ta]
        enc_b = [t.encode("utf-8") if isinstance(t, str) else b"" for t in tb]
        ha = batch_shingle_hashes(enc_a, k)
        hb = batch_shingle_hashes(enc_b, k)
        out = np.zeros(len(ha), dtype=np.float64)
        for i, (x, y) in enumerate(zip(ha, hb)):
            if x.size == 0 and y.size == 0:
                out[i] = 0.0
                continue
            inter = np.intersect1d(x, y, assume_unique=True).size
            out[i] = inter / (x.size + y.size - inter)
        return pd.Series(out)

    return exact_jaccard


def estimate_pairs(
    pairs: DataFrame, sig_df: DataFrame, id_col: str = "url"
) -> DataFrame:
    """Attach the MinHash-estimate Jaccard to candidate pairs (tier 1)."""
    a, b = f"{id_col}_a", f"{id_col}_b"
    sig = sig_df.select(F.col(id_col), "minhash")
    return (
        pairs.join(sig.withColumnsRenamed({id_col: a, "minhash": "mh_a"}), a)
        .join(sig.withColumnsRenamed({id_col: b, "minhash": "mh_b"}), b)
        .withColumn("est_jaccard", minhash_jaccard_expr("mh_a", "mh_b"))
        .drop("mh_a", "mh_b")
    )


def verify_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    params: SketchParams,
    id_col: str = "url",
    text_col: str = "norm_text",
    threshold: float = 0.8,
    estimate_margin: float | None = 0.15,
    sig_df: DataFrame | None = None,
    with_distances: bool = True,
) -> DataFrame:
    """Candidates -> verified near-dup pairs with exact jaccard (+ mash
    distances). If ``sig_df`` given, prefilter by estimate >= threshold -
    margin before shuffling texts."""
    a, b = f"{id_col}_a", f"{id_col}_b"
    if sig_df is not None and estimate_margin is not None:
        pairs = estimate_pairs(pairs, sig_df, id_col).filter(
            F.col("est_jaccard") >= threshold - estimate_margin
        )
    texts = docs.select(F.col(id_col), F.col(text_col))
    joined = (
        pairs.join(texts.withColumnsRenamed({id_col: a, text_col: "text_a"}), a)
        .join(texts.withColumnsRenamed({id_col: b, text_col: "text_b"}), b)
    )
    udf = make_exact_jaccard_udf(params.shingle_k)
    out = (
        joined.withColumn("jaccard", udf(F.col("text_a"), F.col("text_b")))
        .drop("text_a", "text_b")
        .filter(F.col("jaccard") >= threshold)
    )
    if with_distances:
        out = with_distance_columns(
            out, "jaccard", k=params.shingle_k, model=params.distance_model
        )
    return out
