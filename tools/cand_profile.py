"""Sub-step attribution of the candidate stage (pairs_from_keys) at synth
scale — round-6 instrumentation (bench.py frozen; guide §1.1/§1.5).

Times, inside one session with per-step throttle probes:
  census  window count/min + persist fill over the keyed rows
  mx      the tier-gating max aggregate
  t1      tier-1 self-join -> dedup -> checkpoint (pairs output), plus the
          salt/star tiers when present (whole pairs_from_keys tail)
Usage: python tools/cand_profile.py [--docs=N]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench_extra import _spark, throttle_probe  # noqa: E402


def main(n_docs: int = 50_000):
    from pyspark.sql import Window

    from lash_spark.config import PipelineConfig
    from lash_spark.operators.lsh import explode_bands, pairs_from_keys
    from lash_spark.operators.normalize import with_normalized_text
    from lash_spark.operators.signatures import build_signatures
    from lash_spark.pipeline import _resolve_persist_shingles
    from lash_spark.synth import generate_pages

    spark = _spark()
    cfg = PipelineConfig()
    out: dict = {"n_docs": n_docs, "steps": {}, "probe": {}}

    def step(name, fn):
        out["probe"][name] = throttle_probe()
        spark.sparkContext.setJobDescription(f"cand:{name}")
        t0 = time.monotonic()
        r = fn()
        out["steps"][name] = round(time.monotonic() - t0, 2)
        spark.sparkContext.setJobDescription(None)
        return r

    pages = generate_pages(spark, n_docs, seed=42, partitions=128)
    normed = with_normalized_text(pages.select("url", "text"), "text").persist()
    sigs = build_signatures(
        normed, cfg.params, cfg.lsh_plan(), id_col="url",
        with_shingles=_resolve_persist_shingles(cfg, normed),
    ).persist()
    step("sig_fill", sigs.count)

    keyed = explode_bands(sigs, "url")
    out["rows_keyed"] = step("keyed_count", keyed.count)

    w = Window.partitionBy("band_id", "key")
    k = (
        keyed.withColumn("bucket_n", F.count(F.lit(1)).over(w))
        .withColumn("rep", F.min("url").over(w))
        .filter(F.col("bucket_n") >= 2)
        .persist()
    )
    out["rows_census"] = step("census_fill", k.count)
    out["mx"] = step("mx_agg", lambda: k.agg(F.max("bucket_n")).first()[0])

    # tier volumes (diagnostic, cached reads)
    def tier_counts():
        return k.select(
            F.sum((F.col("bucket_n") <= cfg.max_band_bucket).cast("long")).alias("cold"),
            F.sum(
                (
                    (F.col("bucket_n") > cfg.max_band_bucket)
                    & (F.col("bucket_n") <= cfg.star_threshold)
                ).cast("long")
            ).alias("warm"),
            F.sum((F.col("bucket_n") > cfg.star_threshold).cast("long")).alias("hot"),
        ).first().asDict()

    out["tier_rows"] = step("tier_counts", tier_counts)
    k.unpersist()

    # pre-dedup pair volume from tier 1 (diagnostic)
    def pre_dedup():
        kk = (
            keyed.withColumn("bucket_n", F.count(F.lit(1)).over(w))
            .filter((F.col("bucket_n") >= 2) & (F.col("bucket_n") <= cfg.max_band_bucket))
            .select("band_id", "key", "url")
        )
        return (
            kk.alias("l")
            .join(kk.alias("r"), ["band_id", "key"])
            .where(F.col("l.url") < F.col("r.url"))
            .count()
        )

    out["t1_pre_dedup_pairs"] = step("t1_pre_dedup", pre_dedup)

    # the real thing end-to-end (warm sigs)
    def full():
        return pairs_from_keys(
            explode_bands(sigs, "url"), id_col="url",
            max_bucket=cfg.max_band_bucket, salt_buckets=cfg.salt_buckets,
            star_threshold=cfg.star_threshold,
            star_pair_budget=cfg.star_pair_budget,
        ).count()

    out["rows_pairs"] = step("full_pairs_warm1", full)
    step("full_pairs_warm2", full)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    n = 50_000
    for a in sys.argv:
        if a.startswith("--docs="):
            n = int(a.split("=")[1])
    main(n)
