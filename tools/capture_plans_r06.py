"""Capture `.explain("formatted")` for the round-6 optimization targets.

Usage: python tools/capture_plans_r06.py before|after [query ...]

Writes plans/r06/<query>_<suffix>.txt. Frames are built lazily where the
operator allows it; operators that materialize eagerly inside construction
(pairs_from_keys checkpoints; KMeans fit) have their *interesting* sub-frame
captured instead, noted at the top of each file.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from lash_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="capture_plans", master=f"local[{cpus}]", shuffle_partitions=256
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def frames(spark):
    """name -> (note, DataFrame) for every examined query."""
    from lash_spark.config import LshPlan, PipelineConfig, SketchParams
    from lash_spark.operators.lsh import explode_bands, lsh_candidate_pairs
    from lash_spark.operators.normalize import with_normalized_text
    from lash_spark.operators.signatures import build_signatures
    from lash_spark.operators.substring import exact_substring_pairs
    from lash_spark.operators.verify import verify_pairs

    params = SketchParams()
    plan = LshPlan.plan(params.num_perm, 0.8, 0.995)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d = with_normalized_text(docs.select("doc_id", "text"), "text")
    out = {}

    sigs = build_signatures(d, params, plan, id_col="doc_id", with_shingles=True)
    out["signatures"] = ("build_signatures(with_shingles) full lazy plan", sigs)

    sigsp = sigs.persist()
    out["lsh_keyed"] = (
        "explode_bands over persisted signatures (pairs_from_keys input; the "
        "pair-generation output itself is eagerly checkpointed so its plan "
        "is a checkpoint scan)",
        explode_bands(sigsp, "doc_id"),
    )
    cands = lsh_candidate_pairs(
        sigsp, id_col="doc_id", max_bucket=256, salt_buckets=8, star_threshold=512
    )
    out["near_dup_verify"] = (
        "verify_pairs over materialized candidates + persisted signatures "
        "(the near_dup_pairs bench query's timed tail)",
        verify_pairs(
            cands, d, params, id_col="doc_id", threshold=0.8, sig_df=sigsp
        ),
    )

    # substring_pass: final verify join (pairs already checkpointed inside)
    out["substring_pass"] = (
        "exact_substring_pairs final window-set verify join",
        exact_substring_pairs(d, min_len=64, k=32, id_col="doc_id"),
    )

    # substring_pass_sa: the keyed-group construction is the cost center
    from lash_spark.operators import suffixarray as sa

    d2 = d.select(F.col("doc_id").alias("_id"), F.col("norm_text").alias("_t"))
    compact = sa._alphabet_compaction(d2)
    if hasattr(sa, "_sa_group_keys"):
        keyed = sa._sa_group_keys(d2, 64, "doc_id", compact)
        note = "_sa_group_keys (hash-prefiltered exact window grouping input)"
    else:
        keyed = sa._packed_window_keys(d2, 64, compaction=compact).select(
            F.col("_id").alias("doc_id"), F.lit(0).alias("band_id"), F.col("key")
        ).distinct()
        note = "_packed_window_keys position explode + distinct (pairs_from_keys input)"
    out["substring_pass_sa"] = (note, keyed)

    out["repeated_windows"] = (
        "repeated_windows corpus-wide (repeated_window_counts query)",
        sa.repeated_windows(d, window=64, id_col="doc_id", top_n=20),
    )

    # ivf: probe-side plan (fit runs eagerly)
    from lash_spark.operators.ann import ivf_fit, ivf_probe

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = ivf_fit(emb, n_lists=16)
    out["ivf_probe"] = (
        "ivf_probe over a fresh ivf_fit index (fit itself is eager; its cost "
        "is KMeans + the assignment pass visible in this plan's scan side)",
        ivf_probe(idx, emb.filter(F.col("vec_id") < 20), k=10, n_probe=4),
    )

    # full_pipeline clusters plan is dominated by eager CC; capture the edge
    # construction instead
    from lash_spark.operators.exact import exact_dup_pairs

    cfg = PipelineConfig()
    verified = verify_pairs(
        cands, d, cfg.params, id_col="doc_id", threshold=cfg.jaccard_threshold,
        sig_df=sigsp, max_pairs_per_doc=cfg.max_pairs_per_doc,
    )
    edges = (
        verified.select("doc_id_a", "doc_id_b")
        .unionByName(exact_dup_pairs(d, id_col="doc_id"))
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    out["full_pipeline_edges"] = (
        "dedup_pipeline edge construction (verify ∪ exact star edges)", edges
    )
    return out


def main():
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs("plans/r06", exist_ok=True)
    spark = _spark()
    for name, (note, df) in frames(spark).items():
        if only and name not in only:
            continue
        path = f"plans/r06/{name}_{suffix}.txt"
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(path, "w") as f:
            f.write(f"# {name} ({suffix}): {note}\n\n{plan}")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
