"""End-to-end pipeline: recall vs brute-force exact Jaccard (the north_rule
bar), cluster assignment sanity, exact-dup handling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lash_spark.config import PipelineConfig, SketchParams
from lash_spark.hashing import batch_shingle_hashes
from lash_spark.operators.normalize import with_normalized_text
from lash_spark.pipeline import dedup_pipeline


@pytest.fixture(scope="module")
def result(spark, tiny_pages):
    cfg = PipelineConfig(jaccard_threshold=0.8)
    res = dedup_pipeline(tiny_pages, cfg, id_col="url", text_col="text")
    res.dup_pairs.cache().count()
    res.clusters.cache().count()
    return res


def _brute_force_pairs(pages_pdf, k, threshold):
    """Driver-side exact all-pairs Jaccard (oracle for recall)."""
    texts = [t.encode("utf-8") for t in pages_pdf["text"]]
    urls = list(pages_pdf["url"])
    sets = batch_shingle_hashes(texts, k)
    out = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if a.size == 0 or b.size == 0:
                continue
            inter = np.intersect1d(a, b, assume_unique=True).size
            if inter == 0:
                continue
            jacc = inter / (a.size + b.size - inter)
            if jacc >= threshold:
                pair = tuple(sorted((urls[i], urls[j])))
                out.add((pair[0], pair[1], jacc))
    return out


def test_recall_vs_brute_force(spark, tiny_pages, result):
    """Dup-pair recall >= 0.99 at the pinned config (BASELINE.json)."""
    pdf = tiny_pages.select("url", "text").toPandas()
    truth = _brute_force_pairs(pdf, 16, 0.8)
    assert len(truth) > 10, "fixture must contain planted dup pairs"
    got = {(r.url_a, r.url_b) for r in result.dup_pairs.select("url_a", "url_b").collect()}
    truth_pairs = {(a, b) for a, b, _ in truth}
    recall = len(got & truth_pairs) / len(truth_pairs)
    assert recall >= 0.99, f"recall {recall}: missed {truth_pairs - got}"
    # and no false positives: every emitted pair really has J >= threshold
    assert got <= truth_pairs, f"false positives: {got - truth_pairs}"


def test_exact_dups_clustered_together(spark, tiny_pages, result):
    """Byte-identical texts must share a cluster id."""
    groups = (
        tiny_pages.filter(F.col("planted_kind") == "exact")
        .join(result.clusters, "url")
        .groupBy(F.md5("text").alias("h"))
        .agg(F.countDistinct("cluster_id").alias("ncl"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    assert groups, "fixture must contain exact-dup groups"
    assert all(g.ncl == 1 for g in groups)


def test_clusters_cover_all_docs(spark, tiny_pages, result):
    assert result.clusters.count() == tiny_pages.count()
    assert result.clusters.filter(F.col("cluster_id").isNull()).count() == 0


def test_cluster_ids_are_min_member(result):
    bad = (
        result.clusters.groupBy("cluster_id")
        .agg(F.min("url").alias("mn"))
        .filter(F.col("cluster_id") != F.col("mn"))
        .count()
    )
    assert bad == 0


def test_self_pairs_excluded(result):
    assert result.dup_pairs.filter(F.col("url_a") >= F.col("url_b")).count() == 0


def test_distances_consistent(result):
    rows = result.dup_pairs.select("jaccard", "frac", "distance").collect()
    import math

    for r in rows:
        frac = 2 * r.jaccard / (1 + r.jaccard)
        assert math.isclose(r.frac, frac, rel_tol=1e-9)
        want = min(-math.log(frac) / 16, 1.0) if frac > 0 else 1.0
        assert math.isclose(r.distance, max(want, 0.0), rel_tol=1e-9)


def test_normalization_identity_invariant(spark, tiny_pages):
    """Byte-identical extracted text per url across two runs (input_hint)."""
    a = with_normalized_text(tiny_pages, "text").select("url", "norm_text")
    b = with_normalized_text(tiny_pages, "text").select("url", "norm_text")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
