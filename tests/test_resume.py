"""Checkpoint/resume (O6): killed-run semantics — completed stages skipped,
row-level delta resume for signatures, final tables equal a clean run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lash_spark.config import PipelineConfig
from lash_spark.lakeio import ParquetCatalog, resume_delta, run_stage
from lash_spark.pipeline import dedup_pipeline


def test_run_stage_skips_when_complete(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "t1"))
    calls = []

    def build():
        calls.append(1)
        return spark.range(5)

    df1, skipped1 = run_stage(cat, "s1", "hash_a", build)
    df2, skipped2 = run_stage(cat, "s1", "hash_a", build)
    assert (not skipped1) and skipped2
    assert len(calls) == 1
    assert df2.count() == 5
    # params change invalidates the stage
    df3, skipped3 = run_stage(cat, "s1", "hash_b", build)
    assert not skipped3 and len(calls) == 2


def test_resume_delta_anti_join(spark):
    inc = spark.range(10).withColumnRenamed("id", "url")
    done = spark.range(4).withColumnRenamed("id", "url")
    assert resume_delta(inc, done, "url").count() == 6
    assert resume_delta(inc, None, "url").count() == 10


def test_metrics_rows_logged(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "t2"))
    run_stage(cat, "stage_x", "h", lambda: spark.range(3))
    m = cat.metrics().collect()
    assert len(m) == 1 and m[0].stage == "stage_x" and m[0].output_rows == 3
    assert m[0].status == "complete" and m[0].wall_ms > 0


def test_pipeline_resume_skips_and_matches_clean_run(spark, tiny_pages, tmp_path):
    cfg = PipelineConfig()
    docs = tiny_pages.limit(300).cache()
    cat1 = ParquetCatalog(spark, str(tmp_path / "clean"))
    clean = dedup_pipeline(docs, cfg, catalog=cat1)

    # simulate a killed run: signatures + candidates done, rest missing
    cat2 = ParquetCatalog(spark, str(tmp_path / "resumed"))
    import shutil

    shutil.copytree(cat1.root / "signatures", cat2.root / "signatures")
    shutil.copy(cat1.root / "signatures.properties.json", cat2.root / "signatures.properties.json")
    shutil.copytree(cat1.root / "candidates", cat2.root / "candidates")
    (cat2.root / "_stages").mkdir()
    shutil.copy(cat1.root / "_stages" / "candidates.json", cat2.root / "_stages" / "candidates.json")

    resumed = dedup_pipeline(docs, cfg, catalog=cat2)
    # signature stage saw zero delta rows (resume proof: no new rows appended)
    assert cat2.read("signatures").count() == cat1.read("signatures").count()
    # final outputs identical to the clean run
    for t in ("dup_pairs", "clusters"):
        a, b = cat1.read(t), cat2.read(t)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), t
    # candidates stage was skipped (no metrics row for it in resumed run)
    stages = [r.stage for r in cat2.metrics().collect()]
    assert "candidates" not in stages
    assert "dup_pairs" in stages and "clusters" in stages
