"""VERDICT r4 #6: measure whether the ULL register wire format
(``array<int>``, 4 B/register + Tungsten array headers) justifies packing
to 2-byte binary before the register-pair shuffle.

Profile, then decide: this tool times the register-pair co-location join
(the only place registers cross the wire) under both formats with
broadcast DISABLED (at 10^12 docs the register table never broadcasts),
reads the per-job-group shuffle read/write bytes from the Spark REST API,
and also times today's real union+FGRA pair query so the shuffle share of
the end-to-end path is on record. Output: BENCH/ULL_WIRE.json.

Run: python tools/ull_wire_profile.py [--docs=100000] [--reps=3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lash_spark.config import SketchParams
from lash_spark.operators.normalize import with_normalized_text
from lash_spark.operators.signatures import add_register_sketch
from lash_spark.session import get_spark
from lash_spark.synth import generate_pages

P = 10  # 2^10 = 1024 registers (reference default precision, main.rs:94)


def _api(ui: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/{path}") as r:
        return json.load(r)


def _group_shuffle(ui: str | None, app_id: str, group: str) -> dict:
    if ui is None:  # UI unavailable: wall-only profile
        return {"shuffle_write_mb": None, "shuffle_read_mb": None}
    jobs = [
        j
        for j in _api(ui, f"applications/{app_id}/jobs?status=succeeded")
        if j.get("jobGroup") == group
    ]
    stage_ids = {s for j in jobs for s in j["stageIds"]}
    stages = _api(ui, f"applications/{app_id}/stages?status=complete")
    w = sum(s["shuffleWriteBytes"] for s in stages if s["stageId"] in stage_ids)
    r = sum(s["shuffleReadBytes"] for s in stages if s["stageId"] in stage_ids)
    return {"shuffle_write_mb": round(w / 1e6, 1), "shuffle_read_mb": round(r / 1e6, 1)}


@F.pandas_udf(T.BinaryType())
def pack_u16(regs: pd.Series) -> pd.Series:
    # 2 B little-endian per register: ULL (q<<2)|d1|d0 fits u16 with slack
    # (q <= 64 => value <= 259); u8 would overflow at q >= 63
    return regs.map(lambda r: np.asarray(r, dtype="<u2").tobytes())


def main():
    n = 100_000
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--docs="):
            n = int(a.split("=")[1])
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="ull_wire_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # the REST status API is the shuffle-bytes source; the session
            # factory disables the UI by default
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui, app_id = sc.uiWebUrl, sc.applicationId

    docs = generate_pages(spark, n, seed=42, partitions=64)
    normed = with_normalized_text(docs.select("url", "text"), "text")
    sk = add_register_sketch(
        normed.withColumn("doc_id", F.abs(F.xxhash64("url"))).select(
            "doc_id", "norm_text"
        ),
        SketchParams(algorithm="ull", precision=P, seed=42, estimator="fgra"),
        out_col="regs",
    ).select("doc_id", "regs", "card_est")
    sk_arr = sk.persist()
    n_rows = sk_arr.count()  # UDF paid once, outside every timing below
    sk_bin = sk_arr.select(
        "doc_id", pack_u16("regs").alias("regs"), "card_est"
    ).persist()
    sk_bin.count()

    # deterministic pair list: each doc paired with its id-order neighbor
    # (m = n rows through the shuffle, every register row touched)
    ids = sk_arr.select("doc_id").orderBy("doc_id")
    w = F.lead("doc_id").over(Window.orderBy("doc_id"))
    pairs = (
        ids.withColumn("doc_id_b", w)
        .where(F.col("doc_id_b").isNotNull())
        .select(F.col("doc_id").alias("doc_id_a"), "doc_id_b")
        .persist()
    )
    m_pairs = pairs.count()

    def q_join(side):
        j = (
            pairs.join(side.alias("a"), pairs.doc_id_a == F.col("a.doc_id"))
            .join(side.alias("b"), pairs.doc_id_b == F.col("b.doc_id"))
        )
        meas = (
            F.length(F.col("a.regs")) + F.length(F.col("b.regs"))
            if dict(side.dtypes)["regs"] == "binary"
            else F.size(F.col("a.regs")) + F.size(F.col("b.regs"))
        )
        return j.agg(F.sum(meas)).collect()[0][0]

    def q_union_fgra():
        from lash_spark.estimators import ull_cardinality_fgra_expr, ull_union_expr

        j = (
            pairs.join(sk_arr.alias("a"), pairs.doc_id_a == F.col("a.doc_id"))
            .join(sk_arr.alias("b"), pairs.doc_id_b == F.col("b.doc_id"))
            .select(
                ull_cardinality_fgra_expr(
                    ull_union_expr("a.regs", "b.regs"), P
                ).alias("cu")
            )
        )
        return j.agg(F.sum("cu")).collect()[0][0]

    tasks = [
        ("join_array", lambda: q_join(sk_arr)),
        ("join_packed_u16", lambda: q_join(sk_bin)),
        ("union_fgra_array", q_union_fgra),
    ]
    samples: dict[str, list] = {name: [] for name, _ in tasks}
    for rep in range(reps):  # rep-major (throttle-window discipline)
        for name, fn in tasks:
            sc.setJobGroup(f"{name}_{rep}", name)
            t0 = time.monotonic()
            fn()
            wall = round(time.monotonic() - t0, 2)
            rec = {"wall_sec": wall, "rep": rep,
                   **_group_shuffle(ui, app_id, f"{name}_{rep}")}
            samples[name].append(rec)
            print(f"# {name} rep {rep}: {json.dumps(rec)}", file=sys.stderr, flush=True)
            sc.setJobGroup("", "")

    out = {"n_docs": n_rows, "m_pairs": m_pairs, "precision": P, "cpus": cpus,
           "reps": reps, "tasks": {}}
    for name, _ in tasks:
        runs = sorted(samples[name], key=lambda s: s["wall_sec"])
        med = runs[len(runs) // 2]
        out["tasks"][name] = {
            "median_sec": med["wall_sec"],
            "spread_sec": [runs[0]["wall_sec"], runs[-1]["wall_sec"]],
            "shuffle_write_mb": med["shuffle_write_mb"],
            "shuffle_read_mb": med["shuffle_read_mb"],
        }
    a, b = out["tasks"]["join_array"], out["tasks"]["join_packed_u16"]
    if a["shuffle_write_mb"] and b["shuffle_write_mb"]:
        out["wire_ratio_array_over_packed"] = round(
            a["shuffle_write_mb"] / b["shuffle_write_mb"], 2
        )
    out["recorded_at_rev"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ULL_WIRE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
