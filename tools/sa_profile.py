"""Sub-step attribution of substring_pairs_sa at sf0.1 — round-6
instrumentation (bench.py frozen; guide §1.1/§1.5).

Times, inside one session with per-step throttle probes:
  census    pass-1 window-hash explode + groupBy(h) min/max census
  survivors pass-2 explode + semi-join + raw-substring keying + distinct
  pairs     pairs_from_keys over the exact groups
Usage: python tools/sa_profile.py [--reps=K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench_extra import _spark, throttle_probe  # noqa: E402


def main(reps: int = 2):
    from lash_spark.operators.lsh import pairs_from_keys
    from lash_spark.operators.normalize import with_normalized_text
    from lash_spark.operators.suffixarray import _sa_group_keys, _window_pos_hashes

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    min_len = 64
    out: dict = {"steps": {}, "probe": {}, "rows": {}}

    def step(name, fn):
        out["probe"][name] = throttle_probe()
        spark.sparkContext.setJobDescription(f"sa:{name}")
        t0 = time.monotonic()
        n = fn()
        out["steps"].setdefault(name, []).append(round(time.monotonic() - t0, 2))
        out["rows"][name] = int(n)
        spark.sparkContext.setJobDescription(None)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = with_normalized_text(docs.select("doc_id", "text"), "text")
    d2 = d.select(F.col("doc_id").alias("_id"), F.col("norm_text").alias("_t")).persist()
    step("normalize_fill", d2.count)

    for _ in range(reps):
        pos_h = _window_pos_hashes(d2, min_len)
        step("pos_count", pos_h.count)
        hot = (
            pos_h.groupBy("h")
            .agg(F.min("_id").alias("_mn"), F.max("_id").alias("_mx"))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("h")
        ).persist()
        step("census", hot.count)
        surv = pos_h.join(hot, "h", "left_semi").select("_id", "pos")
        keyed = (
            surv.join(d2, "_id")
            .select(
                F.col("_id").alias("doc_id"),
                F.lit(0).alias("band_id"),
                F.expr(f"substring(_t, pos, {min_len})").alias("key"),
            )
            .distinct()
            .persist()
        )
        step("survivor_keys", keyed.count)
        step("pairs", lambda: pairs_from_keys(keyed, id_col="doc_id", max_bucket=2000).count())
        keyed.unpersist()
        hot.unpersist()
        # the composed operator end-to-end for reference
        step(
            "full_op",
            lambda: pairs_from_keys(
                _sa_group_keys(d2, min_len, "doc_id"), id_col="doc_id", max_bucket=2000
            ).count(),
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    reps = 2
    for a in sys.argv:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    main(reps)
