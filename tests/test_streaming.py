"""Streaming ingest: micro-batches land in the same signatures table and
match the batch-built signatures exactly (one code path)."""

from __future__ import annotations

from lash_spark.config import LshPlan, SketchParams
from lash_spark.lakeio import ParquetCatalog
from lash_spark.operators.normalize import with_normalized_text
from lash_spark.operators.signatures import build_signatures
from lash_spark.streaming import read_pages_stream, stream_signatures
from lash_spark.synth import generate_pages


def test_stream_signatures_matches_batch(spark, tmp_path):
    pages = generate_pages(spark, 200, seed=42, partitions=4)
    src = str(tmp_path / "src")
    # three parquet "drops" simulating arriving crawl files
    pages.filter("planted_cluster % 3 = 0").write.parquet(f"{src}/d0")
    pages.filter("planted_cluster % 3 = 1").write.parquet(f"{src}/d1")
    pages.filter("planted_cluster % 3 = 2").write.parquet(f"{src}/d2")
    schema = pages.schema

    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    params = SketchParams()
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    q = stream_signatures(
        stream, cat, params, checkpoint_dir=str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)

    got = cat.read("signatures")
    batch = build_signatures(
        with_normalized_text(pages, "text"), params, LshPlan.plan(128, 0.8, 0.995)
    )
    assert got.count() == pages.count()
    assert got.exceptAll(batch).isEmpty() and batch.exceptAll(got).isEmpty()
    assert cat.properties("signatures")["params_hash"] == params.params_hash()
