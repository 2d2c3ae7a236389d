"""End-to-end near-duplicate detection + clustering pipeline.

documents -> normalize -> signatures (map-only) -> LSH band candidates
(skew-tiered) -> estimate prefilter -> exact-Jaccard verify -> edges
(∪ exact-dup star edges) -> union-find clusters.

With a catalog, every stage is checkpointed/resumable and logs metrics
rows (O6); without one it runs as a single lazy plan (tests / entry()).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lash_spark.config import PipelineConfig
from lash_spark.lakeio import ParquetCatalog, resume_delta, run_stage
from lash_spark.operators.components import assign_clusters
from lash_spark.operators.exact import exact_dup_pairs
from lash_spark.operators.lsh import lsh_candidate_pairs
from lash_spark.operators.normalize import with_normalized_text
from lash_spark.operators.signatures import build_signatures
from lash_spark.operators.verify import verify_pairs


@dataclass
class DedupResult:
    signatures: DataFrame
    candidates: DataFrame
    dup_pairs: DataFrame
    clusters: DataFrame


def dedup_pipeline(
    docs: DataFrame,
    cfg: PipelineConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    catalog: ParquetCatalog | None = None,
    include_exact_edges: bool = True,
) -> DedupResult:
    cfg = cfg or PipelineConfig()
    params = cfg.params
    plan = cfg.lsh_plan()
    phash = params.params_hash()

    normed = with_normalized_text(docs.select(id_col, text_col), text_col=text_col)

    # ---- signatures (map-only; row-level delta resume under a catalog)
    if catalog is not None:
        existing = catalog.read("signatures") if catalog.exists("signatures") else None
        if existing is not None and catalog.properties("signatures").get("params_hash") != phash:
            existing = None  # params changed -> full rebuild (F6 semantics)
        delta = resume_delta(normed, existing, id_col)
        new_sigs = build_signatures(delta, params, plan, id_col=id_col)
        if existing is not None:
            if not delta.isEmpty():
                catalog.append(new_sigs, "signatures")
        else:
            catalog.write(new_sigs, "signatures")
        catalog.set_properties("signatures", {"params_hash": phash, "params": params.to_json()})
        sigs = catalog.read("signatures")
    else:
        # the signatures feed three consumers (band explode + both sides of
        # the estimate join); persist so the Arrow UDF runs once per row —
        # the catalog path gets the same effect from the table round-trip
        sigs = build_signatures(normed, params, plan, id_col=id_col).persist()

    # ---- candidates (skew-tiered LSH band join)
    def build_candidates():
        return lsh_candidate_pairs(
            sigs,
            id_col=id_col,
            max_bucket=cfg.max_band_bucket,
            salt_buckets=cfg.salt_buckets,
            star_threshold=cfg.star_threshold,
        )

    if catalog is not None:
        candidates, _ = run_stage(catalog, "candidates", phash, build_candidates)
    else:
        candidates = build_candidates().persist()

    # ---- verify (estimate prefilter + exact jaccard + distances)
    def build_verified():
        return verify_pairs(
            candidates,
            normed,
            params,
            id_col=id_col,
            threshold=cfg.jaccard_threshold,
            sig_df=sigs,
            max_pairs_per_doc=cfg.max_pairs_per_doc,
        )

    if catalog is not None:
        verified, _ = run_stage(catalog, "dup_pairs", phash, build_verified)
    else:
        # consumed by both the dup_pairs output and the edge/cluster branch
        verified = build_verified().persist()

    # ---- edges -> clusters
    a, b = f"{id_col}_a", f"{id_col}_b"
    edges = verified.select(a, b)
    if include_exact_edges:
        edges = edges.unionByName(exact_dup_pairs(normed, id_col=id_col)).dropDuplicates([a, b])

    def build_clusters():
        return assign_clusters(
            docs.select(id_col), edges, id_col=id_col, max_iterations=cfg.cc_max_iterations
        )

    if catalog is not None:
        clusters, _ = run_stage(catalog, "clusters", phash, build_clusters)
    else:
        clusters = build_clusters()

    return DedupResult(sigs, candidates, verified, clusters)
