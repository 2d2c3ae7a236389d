"""CLI mirroring the reference's two subcommands plus the full pipeline.

Reference surface: ``lash sketch`` and ``lash dist``
(``/root/reference/src/main.rs:30,107``). Engine surface:

  python -m lash_spark.cli sketch   --input DIR --output DIR [opts]
  python -m lash_spark.cli pairs    --signatures DIR --docs DIR --output DIR
  python -m lash_spark.cli cluster  --pairs DIR --docs DIR --output DIR
  python -m lash_spark.cli pipeline --input DIR --workdir DIR [opts]
  python -m lash_spark.cli synth    --docs N --output DIR

All stages read/write parquet directories (Iceberg tables on a real
cluster via the same catalog API). Designed for `spark-submit --py-files
lash_spark.zip` on multi-executor clusters.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _add_common(p):
    p.add_argument("--k", type=int, default=16, help="shingle width (ref default 16)")
    p.add_argument("--num-perm", type=int, default=128)
    p.add_argument("--precision", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--algorithm", default="minhash")
    p.add_argument("--threshold", type=float, default=0.8)
    # default=None so subcommands can tell "user passed the flag" apart
    # from "default": `dist` honors --model at dist time (the distance
    # equation is a dist-time flag in the reference, main.rs:415-423)
    # while sketch-time subcommands fall back to model 1 / estimator
    # "default" when unset
    p.add_argument("--model", type=int, default=None,
                   help="0=binomial 1=poisson (main.rs numbering)")
    p.add_argument("-e", "--estimator", default=None,
                   help="default|fgra|mle (main.rs:143-151; sketch-time only)")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--id-col", default="url")
    p.add_argument("--text-col", default="text")
    p.add_argument("--normalize-version", type=int, default=1, help="1=whitespace 2=aggressive")
    p.add_argument("--master", default=None)


def load_sketch_params(signatures_dir: str):
    """Strict artifact discovery (S7): the params sidecar written at sketch
    time MUST exist next to the signatures table — the reference's
    find_files panics when the artifact triple is incomplete
    (``/root/reference/src/main.rs:284-337``). Exits with the panic-style
    message instead of silently skipping validation."""
    from lash_spark.config import SketchParams

    sidecar = f"{signatures_dir}_parameters.json"
    try:
        with open(sidecar) as f:
            return SketchParams(**json.load(f))
    except FileNotFoundError:
        raise SystemExit(
            f"error: no parameters file found at {sidecar} "
            "(signatures must be produced by `sketch`, which writes the sidecar)"
        )


def resolve_dist_options(args, params_q):
    """Dist-time flag resolution: the distance equation is a DIST-time
    choice in the reference (main.rs:415-423), so an explicit --model
    overrides the sketch-time sidecar instead of being silently dropped.
    The estimator, by contrast, is baked into the cached card_est at
    sketch time — a conflicting dist-time -e is a hard error rather than
    silently ignored user intent."""
    model = args.model if args.model is not None else params_q.distance_model
    if args.estimator is not None and args.estimator != params_q.estimator:
        raise SystemExit(
            f"error: -e/--estimator is a sketch-time option; these "
            f"signatures were built with '{params_q.estimator}' "
            f"(re-run `sketch -e {args.estimator}` to change it)"
        )
    return model


def _spark(args):
    from lash_spark.session import get_spark

    return get_spark(app_name="lash_spark_cli", master=args.master)


def _params(args):
    from lash_spark.config import SketchParams

    return SketchParams(
        shingle_k=args.k,
        num_perm=args.num_perm,
        precision=args.precision,
        seed=args.seed,
        algorithm=args.algorithm,
        distance_model=args.model if args.model is not None else 1,
        estimator=getattr(args, "estimator", None) or "default",
        normalize_version=getattr(args, "normalize_version", 1),
    )


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lash_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("sketch", help="documents -> signatures table")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    _add_common(p)

    p = sub.add_parser("pairs", help="signatures (+docs) -> verified dup pairs")
    p.add_argument("--signatures", required=True)
    p.add_argument("--docs", required=True)
    p.add_argument("--output", required=True)
    _add_common(p)

    p = sub.add_parser(
        "dist", help="query sketches x reference sketches -> distance TSV (main.rs dist)"
    )
    p.add_argument("--query", required=True, help="query signatures dir (from `sketch`)")
    p.add_argument("--reference", required=True, help="reference signatures dir")
    p.add_argument("--query-docs", required=True)
    p.add_argument("--reference-docs", required=True)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--dm", action="store_true",
        help="write a distance matrix instead of the TSV (main.rs:170-176; "
        "lower-triangular with zero diagonal when query == reference). "
        "Cells for pairs the LSH engine never verified are EMPTY unless "
        "--dm-fill is given (the reference's all-pairs engine fills every "
        "cell)",
    )
    p.add_argument(
        "--dm-fill", type=float, default=None, metavar="DIST",
        help="value printed (%%.6f) in unverified --dm cells, e.g. 1.0; "
        "default leaves them empty",
    )
    _add_common(p)

    p = sub.add_parser("cluster", help="dup pairs -> cluster assignments")
    p.add_argument("--pairs", required=True)
    p.add_argument("--docs", required=True)
    p.add_argument("--output", required=True)
    _add_common(p)

    p = sub.add_parser("pipeline", help="full dedup with checkpoint/resume")
    p.add_argument("--input", required=True)
    p.add_argument("--workdir", required=True)
    _add_common(p)

    p = sub.add_parser("synth", help="write the deterministic synthetic corpus")
    p.add_argument("--docs", type=int, required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--master", default=None)

    args = ap.parse_args(argv)
    spark = _spark(args)

    if args.cmd == "sketch":
        from lash_spark.config import LshPlan
        from lash_spark.operators.normalize import with_normalized_text
        from lash_spark.operators.signatures import build_signatures

        params = _params(args)
        docs = with_normalized_text(
            spark.read.parquet(args.input), args.text_col,
            version=params.normalize_version,
        )
        plan = LshPlan.plan(params.num_perm, args.threshold, 0.995)
        sigs = build_signatures(docs, params, plan, id_col=args.id_col)
        sigs.write.mode("overwrite").parquet(args.output)
        # params sink (K3 analog, main.rs:254-276)
        with open(f"{args.output}_parameters.json", "w") as f:
            json.dump(json.loads(params.to_json()), f, indent=1)
        print(json.dumps({"signatures": args.output, "rows": sigs.count()}))

    elif args.cmd == "pairs":
        from lash_spark.operators.lsh import lsh_candidate_pairs
        from lash_spark.operators.normalize import with_normalized_text
        from lash_spark.operators.verify import verify_pairs

        params = _params(args)
        # F6 compatibility validation against the sketch-time params —
        # strict: a missing sidecar is a hard error (S7, main.rs:284-337)
        params.validate_compatible(load_sketch_params(args.signatures))
        sigs = spark.read.parquet(args.signatures)
        docs = with_normalized_text(
            spark.read.parquet(args.docs), args.text_col,
            version=params.normalize_version,
        )
        cands = lsh_candidate_pairs(sigs, id_col=args.id_col)
        verified = verify_pairs(
            cands, docs, params, id_col=args.id_col, threshold=args.threshold, sig_df=sigs
        )
        if args.fp32:
            verified = verified.withColumn("jaccard", F.col("jaccard").cast("float"))
        verified.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"pairs": args.output, "rows": verified.count()}))

    elif args.cmd == "dist":
        from lash_spark.estimators import with_distance_columns
        from lash_spark.operators.lsh import cross_lsh_candidate_pairs
        from lash_spark.operators.normalize import with_normalized_text
        from lash_spark.operators.sinks import write_distance_tsv
        from lash_spark.operators.verify import cross_verify_pairs

        # strict discovery + F6 cross-validation (main.rs:284-337,368-381)
        params_q = load_sketch_params(args.query)
        params_r = load_sketch_params(args.reference)
        params_q.validate_compatible(params_r)
        dist_model = resolve_dist_options(args, params_q)
        same_files = args.query == args.reference  # main.rs:404
        sig_q = spark.read.parquet(args.query)
        docs_q = with_normalized_text(
            spark.read.parquet(args.query_docs), args.text_col,
            version=params_q.normalize_version,
        )
        if same_files:
            from lash_spark.operators.lsh import lsh_candidate_pairs
            from lash_spark.operators.verify import verify_pairs

            cands = lsh_candidate_pairs(sig_q, id_col=args.id_col)
            verified = verify_pairs(
                cands, docs_q, params_q, id_col=args.id_col,
                threshold=args.threshold, sig_df=sig_q, with_distances=False,
            )
            ia, ib = f"{args.id_col}_a", f"{args.id_col}_b"
            verified = with_distance_columns(
                verified, "jaccard", k=params_q.shingle_k,
                model=dist_model, fp32=args.fp32, id_col=args.id_col,
            )
        else:
            sig_r = spark.read.parquet(args.reference)
            docs_r = with_normalized_text(
                spark.read.parquet(args.reference_docs), args.text_col,
                version=params_r.normalize_version,
            )
            cands = cross_lsh_candidate_pairs(sig_q, sig_r, id_col=args.id_col)
            verified = cross_verify_pairs(
                cands, docs_q, docs_r, params_q, id_col=args.id_col,
                threshold=args.threshold, sig_q=sig_q, sig_r=sig_r,
            )
            ia, ib = f"{args.id_col}_r", f"{args.id_col}_q"
            verified = with_distance_columns(
                verified, "jaccard", k=params_q.shingle_k,
                model=dist_model, fp32=args.fp32, id_col=args.id_col,
            )
        if args.dm:
            from lash_spark.operators.sinks import write_distance_matrix_file

            ids_q = [r[0] for r in sig_q.select(args.id_col).collect()]
            ids_r = (
                ids_q if same_files
                else [r[0] for r in sig_r.select(args.id_col).collect()]
            )
            n_rows = write_distance_matrix_file(
                verified, ids_r, ids_q, args.output,
                id_a=ia, id_b=ib, same_files=same_files,
                fill=args.dm_fill,
            )
            print(json.dumps({"dist": args.output, "matrix_rows": n_rows,
                              "same_files": same_files, "dm": True}))
        else:
            write_distance_tsv(verified, args.output, id_a=ia, id_b=ib)
            print(json.dumps({"dist": args.output, "rows": verified.count(),
                              "same_files": same_files}))

    elif args.cmd == "cluster":
        from lash_spark.operators.components import assign_clusters

        pairs = spark.read.parquet(args.pairs)
        docs = spark.read.parquet(args.docs)
        clusters = assign_clusters(docs, pairs, id_col=args.id_col)
        clusters.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"clusters": args.output, "rows": clusters.count()}))

    elif args.cmd == "pipeline":
        from lash_spark.config import PipelineConfig
        from lash_spark.lakeio import ParquetCatalog
        from lash_spark.pipeline import dedup_pipeline

        cfg = PipelineConfig(params=_params(args), jaccard_threshold=args.threshold)
        cat = ParquetCatalog(spark, args.workdir)
        docs = spark.read.parquet(args.input)
        res = dedup_pipeline(
            docs, cfg, id_col=args.id_col, text_col=args.text_col, catalog=cat
        )
        print(
            json.dumps(
                {
                    "workdir": args.workdir,
                    "dup_pairs": res.dup_pairs.count(),
                    "clusters": res.clusters.select("cluster_id").distinct().count(),
                }
            )
        )

    elif args.cmd == "synth":
        from lash_spark.synth import generate_pages

        pages = generate_pages(spark, args.docs, seed=args.seed)
        pages.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"output": args.output, "rows": args.docs}))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
