"""Operator tests: exact dedup, text stats, ANN, substring pass, multimodal
plumbing, sketch-algebra Column expressions."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lash_spark.config import SketchParams
from lash_spark.estimators import (
    hll_cardinality_expr,
    ie_jaccard_expr,
    minhash_jaccard_expr,
    register_union_expr,
)
from lash_spark.operators.ann import brute_force_topk, embedding_near_dup_pairs, srp_topk
from lash_spark.operators.exact import dedup_exact, exact_dup_pairs
from lash_spark.operators.multimodal import extract_features, frame_sample_plan
from lash_spark.operators.signatures import add_register_sketch, add_signatures
from lash_spark.operators.substring import exact_substring_pairs
from lash_spark.operators.textstats import detect_lang, token_count, with_text_stats
from lash_spark.sketches import hll_cardinality, hll_registers
from lash_spark.hashing import batch_shingle_hashes


def test_exact_dedup(spark):
    rows = [(1, "same text here"), (2, "same text here"), (3, "other"), (4, "same text here")]
    df = spark.createDataFrame(rows, "url bigint, norm_text string")
    kept = {r.url for r in dedup_exact(df, "url").collect()}
    assert kept == {1, 3}
    pairs = {(r.url_a, r.url_b) for r in exact_dup_pairs(df, "url").collect()}
    assert pairs == {(1, 2), (1, 4)}


def test_text_stats_and_lang(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund ist nicht die katze und der vogel"),
            (3, "zzz qqq www"),
        ],
        "id bigint, text string",
    )
    stats = {r.id: r for r in with_text_stats(df).collect()}
    assert stats[1].n_words == 8
    assert stats[1].n_distinct_words == 6
    assert stats[1].stopword_ratio == pytest.approx(5 / 8)
    langs = {r.id: r.lang for r in df.select("id", detect_lang("text").alias("lang")).collect()}
    assert langs[1] == "en" and langs[2] == "de" and langs[3] == "und"
    toks = {r.id: r.n for r in df.select("id", token_count("text").alias("n")).collect()}
    assert toks[1] == 8


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id bigint, embedding array<float>"
    )
    got = brute_force_topk(df, df.filter(F.col("vec_id") < 3), k=3).collect()
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = v @ v.T
    for q in range(3):
        order = [i for i in np.argsort(-sims[q]) if i != q][:3]
        mine = sorted(
            [r for r in got if r.query_id == q], key=lambda r: r.rank
        )
        assert [r.item_id for r in mine] == order


def test_srp_topk_reasonable_recall(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((100, 16)).astype(np.float32)
    # plant near neighbors for queries
    near = base[:5] + rng.standard_normal((5, 16)).astype(np.float32) * 0.05
    vecs = np.vstack([base, near])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id bigint, embedding array<float>"
    )
    got = srp_topk(df, df.filter(F.col("vec_id") < 5), dim=16, k=1, n_planes=8).collect()
    hits = sum(1 for r in got if r.rank == 1 and r.item_id == r.query_id + 100)
    assert hits >= 3  # SRP keeps most true near-dup neighbors in-bucket


def test_embedding_near_dup_pairs(spark):
    rng = np.random.default_rng(5)
    a = rng.standard_normal(32).astype(np.float32)
    rows = [(0, a.tolist()), (1, (a + 0.001).tolist()), (2, rng.standard_normal(32).astype(np.float32).tolist())]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {(r.vec_id_a, r.vec_id_b) for r in embedding_near_dup_pairs(df, dim=32, cosine_threshold=0.99).collect()}
    assert (0, 1) in got
    assert all(p in {(0, 1)} for p in got)


def test_exact_substring_pass(spark):
    block = "x".join(str(i) for i in range(200))  # ~690 chars, low-entropy-free
    rows = [
        (1, "prefix one " + block + " suffix one"),
        (2, "totally different beginning " + block + " and end"),
        (3, "no shared block here at all " + "y" * 400),
    ]
    df = spark.createDataFrame(rows, "url bigint, norm_text string")
    got = exact_substring_pairs(df, min_len=256, id_col="url")
    assert {(r.url_a, r.url_b) for r in got.collect()} == {(1, 2)}
    from lash_spark.operators.substring import common_substring_lengths

    lens = common_substring_lengths(got, df, min_len=256, id_col="url").collect()
    pairs = {(r.url_a, r.url_b): r.common_len for r in lens}
    assert pairs[(1, 2)] >= len(block)


def test_multimodal_plumbing(spark):
    rows = [
        ("m1", "image", bytearray(b"\x01\x02\x03\x04" * 50), "image/fake", 10, 10, None),
        ("m2", "video", bytearray(b"\x09" * 10), "video/fake", None, None, 3500),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, mime string, "
        "width int, height int, duration_ms bigint",
    )
    feats = {r.media_id: r for r in extract_features(df, dim=8).collect()}
    assert feats["m1"].n_bytes == 200
    assert len(feats["m1"].feature) == 8
    assert abs(sum(x * x for x in feats["m1"].feature) - 1.0) < 1e-5
    frames = frame_sample_plan(df, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000, 3000]


def test_sketch_algebra_exprs_match_numpy(spark):
    """Column-expression twins must agree with the numpy kernels."""
    params = SketchParams(algorithm="hll", precision=8)
    rows = [(1, "the quick brown fox jumps over the lazy dog " * 8),
            (2, "the quick brown fox jumps over the lazy cat " * 8)]
    df = spark.createDataFrame(rows, "url bigint, norm_text string")
    regs = add_register_sketch(df, params)
    both = (
        regs.alias("a").crossJoin(regs.alias("b"))
        .filter(F.col("a.url") < F.col("b.url"))
        .select(
            hll_cardinality_expr(F.col("a.regs"), 8).alias("ca"),
            hll_cardinality_expr(F.col("b.regs"), 8).alias("cb"),
            hll_cardinality_expr(register_union_expr(F.col("a.regs"), F.col("b.regs")), 8).alias("cu"),
        )
        .select("ca", "cb", "cu", ie_jaccard_expr("ca", "cb", "cu").alias("j"))
        .first()
    )
    # numpy twin
    hs = batch_shingle_hashes([rows[0][1].encode(), rows[1][1].encode()], 16)
    ra, rb = hll_registers(hs[0], 8, 42), hll_registers(hs[1], 8, 42)
    ca, cb = hll_cardinality(ra), hll_cardinality(rb)
    cu = hll_cardinality(np.maximum(ra, rb))
    assert both.ca == pytest.approx(ca, rel=1e-9)
    assert both.cu == pytest.approx(cu, rel=1e-9)
    want_j = max(0.0, (ca + cb - cu) / cu)
    assert both.j == pytest.approx(want_j, rel=1e-9)


def test_minhash_jaccard_expr_matches_kernel(spark, tiny_pages):
    params = SketchParams()
    from lash_spark.config import LshPlan
    from lash_spark.operators.normalize import with_normalized_text

    docs = with_normalized_text(tiny_pages.limit(20), "text")
    sigs = add_signatures(docs, params, LshPlan.plan(128, 0.8)).select("url", "minhash")
    pair = (
        sigs.alias("a").crossJoin(sigs.alias("b"))
        .filter(F.col("a.url") < F.col("b.url"))
        .select(minhash_jaccard_expr(F.col("a.minhash"), F.col("b.minhash")).alias("j"))
        .collect()
    )
    assert all(0.0 <= r.j <= 1.0 for r in pair)


def test_distance_sinks(spark, tmp_path):
    from lash_spark.operators.sinks import distance_tsv_df, triangular_matrix, write_distance_tsv

    pairs = spark.createDataFrame(
        [(1, 2, 0.123456789), (1, 3, 0.5), (2, 3, 1.0)],
        "url_a bigint, url_b bigint, distance double",
    )
    tsv = {(r.Reference, r.Query): r.Distance for r in distance_tsv_df(pairs).collect()}
    assert tsv[(1, 2)] == "0.123457"  # %.6f (main.rs:459)
    assert tsv[(2, 3)] == "1.000000"
    write_distance_tsv(pairs, str(tmp_path / "tsv"))
    import glob

    files = glob.glob(str(tmp_path / "tsv" / "*.csv"))
    head = open(files[0]).readline().strip()
    assert head == "Reference\tQuery\tDistance"

    m = triangular_matrix(pairs).collect()
    rows = {r.r: r.asDict() for r in m}
    assert rows[3]["2"] == 1.0 and rows[3]["1"] == 0.5
    assert rows[1]["1"] == 0.0  # self-distance 0 (main.rs:452-454)
