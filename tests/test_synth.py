"""Synthetic corpus: determinism across parallelism, planted structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from lash_spark.synth import generate_pages, generate_pages_pdf


def test_determinism_across_partitioning(spark):
    a = generate_pages(spark, 400, seed=42, partitions=2)
    b = generate_pages(spark, 400, seed=42, partitions=7)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_matches_driver_side_twin(spark):
    sdf = generate_pages(spark, 200, seed=42, partitions=3).orderBy("url").toPandas()
    pdf = generate_pages_pdf(200, seed=42).sort_values("url").reset_index(drop=True)
    assert list(sdf["url"]) == list(pdf["url"])
    assert list(sdf["text"]) == list(pdf["text"])


def test_planted_structure(tiny_pages):
    kinds = {r["planted_kind"]: r["count"] for r in tiny_pages.groupBy("planted_kind").agg(F.count("*").alias("count")).collect()}
    assert set(kinds) >= {"unique", "neardup", "negative", "exact", "template"}
    # exact-dup groups really are byte-identical
    dups = (
        tiny_pages.filter(F.col("planted_kind") == "exact")
        .groupBy("planted_cluster")
        .agg(F.countDistinct("text").alias("ntext"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    assert dups and all(r.ntext == 1 for r in dups)
    # html wraps text
    row = tiny_pages.first()
    assert bytes(row.html).decode().find(row.text) > 0


def test_seed_changes_corpus(spark):
    a = generate_pages(spark, 100, seed=42, partitions=2).select("url", "text")
    b = generate_pages(spark, 100, seed=43, partitions=2).select("url", "text")
    assert not a.exceptAll(b).isEmpty()
