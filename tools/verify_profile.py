"""Attribute the verify stage's wall to its sub-steps (the BENCH/BIGSCALE
named follow-up): estimate prefilter, degree-cap windows, shingle-set UDF,
and the pair join + array_intersect — so "verify dominates at 500k" can be
split into structure vs box throttling with evidence.

Method: the candidate set and signatures are persisted once, then four
nested variants run INTERLEAVED rep-major (the box throttles in
minutes-long windows; consecutive runs of one variant would alias a
window into its delta):

  est   = estimate join + threshold-margin filter           (count)
  cap   = est + the two per-side degree-cap row_number windows
  sets  = shingle-set UDF over candidate member ids alone   (map-only;
          what the pre-r5 verify paid — kept for the A/B record)
  full  = complete verify_pairs on PERSISTED shingle sets (r5 default:
          est + cap + pair join + intersect, zero Python)
  full_reshingle = complete verify_pairs re-shingling text (pre-r5 path)

Attribution from medians: est | cap-est | sets | full-cap-sets (the pair
join + intersect residual). Writes BENCH/VERIFY_PROFILE.json and prints
one JSON line.

Usage: python tools/verify_profile.py [--docs=100000] [--reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from lash_spark.config import LshPlan, PipelineConfig, SketchParams
    from lash_spark.operators.lsh import lsh_candidate_pairs
    from lash_spark.operators.normalize import with_normalized_text
    from lash_spark.operators.signatures import build_signatures
    from lash_spark.operators.verify import (
        estimate_pairs,
        make_shingle_set_udf,
        verify_pairs,
    )
    from lash_spark.session import get_spark
    from lash_spark.synth import generate_pages

    n_docs, reps = 100_000, 3
    for a in sys.argv:
        if a.startswith("--docs="):
            n_docs = int(a.split("=")[1])
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    extra = {"spark.driver.memory": "48g"}
    if cpus >= 16:
        extra["spark.task.cpus"] = "2"
    spark = get_spark(
        app_name="verify_profile", master=f"local[{cpus}]",
        shuffle_partitions=256, extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = f"/tmp/lash_scaling_input_{n_docs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        generate_pages(spark, n_docs, seed=42, partitions=256).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    cfg = PipelineConfig(max_pairs_per_doc=64)
    params = SketchParams()
    threshold, margin = cfg.jaccard_threshold, 0.15

    normed = with_normalized_text(docs.select("url", "text"), "text").persist()
    # persisted shingle sets included: `full` profiles the r5 default
    # (no-Python verify); `full_reshingle` profiles the pre-r5 path
    sigs = build_signatures(
        normed, params, cfg.lsh_plan(), id_col="url", with_shingles=True
    ).persist()
    sigs.count()
    sigs_nosets = sigs.drop("shingles")
    cands = lsh_candidate_pairs(
        sigs, id_col="url", max_bucket=cfg.max_band_bucket,
        salt_buckets=cfg.salt_buckets, star_threshold=cfg.star_threshold,
    ).persist()
    n_cands = cands.count()

    def v_est():
        return estimate_pairs(cands, sigs, "url").filter(
            F.col("est_jaccard") >= threshold - margin
        ).count()

    def _capped():
        from pyspark.sql import Window

        p = estimate_pairs(cands, sigs, "url").filter(
            F.col("est_jaccard") >= threshold - margin
        )
        for side in ("url_a", "url_b"):
            w = Window.partitionBy(side).orderBy(
                F.desc("est_jaccard"), F.asc("url_a"), F.asc("url_b")
            )
            p = (
                p.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= cfg.max_pairs_per_doc)
                .drop("_rk")
            )
        return p

    def v_cap():
        return _capped().count()

    def v_sets():
        ids = (
            cands.select(F.col("url_a").alias("url"))
            .unionByName(cands.select(F.col("url_b").alias("url")))
            .distinct()
        )
        sh = make_shingle_set_udf(params.shingle_k)
        # sum(size(...)) forces every array through the Arrow transfer
        return (
            normed.join(ids, "url", "left_semi")
            .select(F.size(sh(F.col("norm_text"))).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )

    def v_full():
        return verify_pairs(
            cands, normed, params, id_col="url", threshold=threshold,
            sig_df=sigs, max_pairs_per_doc=cfg.max_pairs_per_doc,
        ).count()

    def v_full_reshingle():
        return verify_pairs(
            cands, normed, params, id_col="url", threshold=threshold,
            sig_df=sigs_nosets, max_pairs_per_doc=cfg.max_pairs_per_doc,
        ).count()

    variants = [
        ("est", v_est),
        ("cap", v_cap),
        ("sets", v_sets),
        ("full", v_full),
        ("full_reshingle", v_full_reshingle),
    ]
    samples: dict[str, list[float]] = {n: [] for n, _ in variants}
    rows: dict[str, int] = {}
    for rep in range(reps):
        for name, fn in variants:
            t0 = time.monotonic()
            rows[name] = int(fn())
            dt = round(time.monotonic() - t0, 2)
            samples[name].append(dt)
            print(f"# rep {rep} {name}: {dt}s rows={rows[name]}",
                  file=sys.stderr, flush=True)

    def med(name):
        s = sorted(samples[name])
        return s[len(s) // 2]

    attribution = {
        "estimate_join": med("est"),
        "degree_cap_windows": round(med("cap") - med("est"), 2),
        # r5 default path: no shingle UDF at all — `full` rides the
        # persisted sets; the UDF cost survives only in full_reshingle
        "shingle_set_udf_if_reshingling": med("sets"),
        "pair_join_intersect_persisted_sets": round(med("full") - med("cap"), 2),
        "persisted_sets_saving": round(med("full_reshingle") - med("full"), 2),
    }
    out = {
        "n_docs": n_docs,
        "reps": reps,
        "n_candidates": n_cands,
        "medians_sec": {n: med(n) for n, _ in variants},
        "samples_sec": samples,
        "attribution_sec": attribution,
        "rows": rows,
    }
    os.makedirs("BENCH", exist_ok=True)
    # one entry per corpus size (same layout rule as BENCH/BIGSCALE.json)
    try:
        with open("BENCH/VERIFY_PROFILE.json") as f:
            all_sizes = json.load(f)
        if "n_docs" in all_sizes:  # legacy single-run layout
            all_sizes = {str(all_sizes["n_docs"]): all_sizes}
    except FileNotFoundError:
        all_sizes = {}
    all_sizes[str(n_docs)] = out
    with open("BENCH/VERIFY_PROFILE.json", "w") as f:
        json.dump(all_sizes, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
