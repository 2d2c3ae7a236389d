"""Structured Streaming ingest into the dedup engine.

The reference has no streaming (its "producer-consumer" README claim is
batch rayon in the code — SURVEY.md §2.8); the engine's incremental story
is idempotent batch stages + resume. This module is the documented
extension for continuous ingest: a `readStream` source of new pages feeds
`foreachBatch`, and every micro-batch runs the SAME batch stage functions
(normalize → signatures → append), so streaming and batch share one code
path and one signatures table. Candidate/verify/cluster stages then run as
periodic batch jobs over the growing table (the standard lambda-less
web-crawl layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from lash_spark.config import LshPlan, SketchParams
from lash_spark.lakeio import ParquetCatalog
from lash_spark.operators.normalize import with_normalized_text
from lash_spark.operators.signatures import build_signatures


def stream_signatures(
    pages_stream: DataFrame,
    catalog: ParquetCatalog,
    params: SketchParams,
    plan: LshPlan | None = None,
    id_col: str = "url",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
) -> StreamingQuery:
    """readStream(pages) -> signatures table, effectively-once per document.

    foreachBatch with a blind append is only at-least-once (a restart after
    the append commits but before the offset checkpoint re-runs the batch),
    so the append is made idempotent per id: each micro-batch anti-joins
    against the already-signed ids (resume_delta) before writing. Spark's
    streaming checkpoint (offsets) then composes with the engine's stage
    markers so a killed stream resumes mid-source without duplicating rows.
    """
    from lash_spark.lakeio import resume_delta

    plan = plan or LshPlan.plan(params.num_perm, 0.8, 0.995)
    catalog.set_properties(
        "signatures", {"params_hash": params.params_hash(), "params": params.to_json()}
    )
    # Replay can happen on the FIRST batch after a (re)start (the append
    # committed but the offset checkpoint didn't) AND on a within-run retry
    # (foreachBatch re-invokes the function if it raises after the append
    # committed). Guard both with one flag: it is set pessimistically at
    # batch entry and cleared only after the whole batch succeeded, so any
    # failure leaves the NEXT invocation paying the anti-join — per-batch
    # cost stays amortized O(1) anti-joins on the happy path instead of
    # growing linearly with history.
    guard = {"pending": True}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        need_guard = guard["pending"]
        guard["pending"] = True  # stays set if anything below raises
        normed = with_normalized_text(
            batch_df.select(id_col, text_col), text_col,
            version=params.normalize_version,
        )
        if need_guard:
            existing = catalog.read("signatures") if catalog.exists("signatures") else None
            normed = resume_delta(normed, existing, id_col)
        sigs = build_signatures(normed, params, plan, id_col=id_col, min_parallelism=1)
        catalog.append(sigs, "signatures")
        catalog.log_metrics(
            f"stream_signatures_batch_{batch_id}",
            params.params_hash(),
            wall_ms=0.0,
            output_rows=None,
            status="complete",
        )
        guard["pending"] = False

    writer = pages_stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_pages_stream(
    spark: SparkSession, source_dir: str, schema, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of page parquet drops (the sandbox stand-in for a
    Kafka/WARC firehose)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def stream_exact_dedup(
    pages_stream: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
):
    """Custom stateful streaming operator (applyInPandasWithState): exact
    content dedup over an unbounded page stream — only the FIRST document
    with each normalized-content fingerprint is emitted; later arrivals
    (within and across micro-batches) are dropped.

    State layout: keyed by FINGERPRINT — one tiny boolean state row per
    distinct fp, written exactly once (when the fp is first seen) and only
    read for fps present in the current batch. Per-batch state IO is
    therefore O(batch), never O(corpus); total state-store rows = distinct
    fps, which is exactly the per-key scaling RocksDB-backed state stores
    are built for (vs. the naive per-bucket array design, which rewrites
    the entire seen-set every micro-batch). The reference has no streaming
    at all (SURVEY §2.8); this is the north-rule extension for continuous
    crawl ingest.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from lash_spark.operators.normalize import normalize_text

    fp = F.md5(normalize_text(text_col))
    keyed = pages_stream.select(
        F.col(id_col).cast("string").alias("id"), fp.alias("fp")
    )

    out_schema = "id string, fp string"
    state_schema = "seen boolean"

    def dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:  # fp already emitted in an earlier batch: drop all
            return
        for pdf in pdfs:
            if len(pdf):
                state.update((True,))
                yield pdf.iloc[[0]][["id", "fp"]]
                return

    return keyed.groupBy("fp").applyInPandasWithState(
        dedup_fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_near_dup(
    pages_stream: DataFrame,
    catalog: ParquetCatalog,
    params: SketchParams | None = None,
    id_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.8,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    persist_shingles: bool = True,
) -> StreamingQuery:
    """Streaming NEAR-duplicate detection, INCREMENTAL per micro-batch:
    the batch is normalized and sketched ONCE (O(batch) signature-UDF
    work), emits (a) batch-internal near-dup pairs (triangular LSH +
    verify) and (b) pairs between the batch and ALL previously ingested
    documents by probing the PERSISTED store signature table
    (``stream_sigs``) — history is never re-sketched (VERDICT r3 #1).
    The batch's docs and signatures then append to ``stream_docs`` /
    ``stream_sigs``; pairs accumulate in ``stream_dup_pairs`` as
    canonical (id_a < id_b, jaccard, batch_id).

    Prefix-closure property (tested): streaming over batches B1..Bn yields
    exactly the pair set of the batch triangular pass over their union —
    a cross-batch pair (x in Bi, y in Bj, i < j) is found when Bj probes
    the store, through the SAME signature/candidate/verify stages.

    Ingest semantics: FIRST ingest wins per id — every batch is
    anti-joined against the store's ids, so recrawled ids are dropped
    consistently (recrawl replacement policy belongs upstream in
    url_dedup_latest) and degenerate (x, x) self-pairs cannot occur.

    Replay safety: a three-step append protocol (pairs, then sigs, then
    docs) plus the pessimistic guard of stream_signatures. On a guarded
    (post-failure/restart) invocation the recomputed pairs are anti-joined
    vs ``stream_dup_pairs`` and the recomputed sigs vs ``stream_sigs``,
    so a crash between any two appends re-runs the batch without
    duplicating rows; a crash after a sigs append but before the docs
    append leaves ids in ``stream_sigs`` that ``stream_docs`` lacks —
    exactly the re-run batch's ids — so the guarded run drops them from
    the probe side (no (x, x) self-pairs) and heals the divergence by
    re-appending. A crash after all three no-ops (the batch's ids are in
    the store, so the unconditional id anti-join empties it).

    Per-batch cost at scale: one signature pass over the BATCH, a
    candidate equi-join of batch band keys against the stored band-key
    table (skew-salted both sides; scales with batch × matching-band
    volume), and a verify whose shingle-set UDF touches only candidate
    ids on either side. The only per-batch store-side work is the
    columnar scan of the signature/doc tables feeding those joins — no
    Python runs over history."""
    from pyspark.sql import functions as F

    from lash_spark.operators.lsh import cross_lsh_candidate_pairs, lsh_candidate_pairs
    from lash_spark.operators.verify import cross_verify_pairs, verify_pairs

    params = params or SketchParams()
    plan = LshPlan.plan(params.num_perm, threshold, 0.995)
    a, b = f"{id_col}_a", f"{id_col}_b"
    guard = {"pending": True}

    def _store_normed() -> DataFrame:
        return with_normalized_text(
            catalog.read("stream_docs").select(id_col, text_col),
            text_col,
            version=params.normalize_version,
        )

    # F6 strict-compatibility semantics for the persisted signature store:
    # the batch paths cross-validate params before any pair phase
    # (validate_compatible), and the pre-incremental stream design
    # re-sketched history every batch so it was immune by construction.
    # The incremental design probes STORED band keys, so restarting the
    # stream with different SketchParams or a different LSH plan (bands ×
    # rows changes with threshold) would silently equi-join incompatible
    # band layouts — pairs missing or bogus. The store is therefore
    # stamped with (params_hash, bands x rows) on write, validated at
    # every batch entry, and rebuilt from stream_docs on mismatch.
    sig_props = {
        "params_hash": params.params_hash(),
        "params": params.to_json(),
        "lsh_plan": f"{plan.bands}x{plan.rows}",
        # schema marker: toggling persist_shingles changes the store's
        # column layout, so it participates in the same rebuild-on-mismatch
        # protocol as the sketch params
        "layout": "shingles" if persist_shingles else "plain",
    }

    def process(batch_df: DataFrame, batch_id: int) -> None:
        need_guard = guard["pending"]
        guard["pending"] = True  # stays set if anything below raises
        batch = batch_df.select(id_col, text_col)
        have_docs = catalog.exists("stream_docs")
        if catalog.exists("stream_sigs"):
            stored = catalog.properties("stream_sigs")
            if (
                stored.get("params_hash"),
                stored.get("lsh_plan"),
                stored.get("layout"),
            ) != (
                sig_props["params_hash"],
                sig_props["lsh_plan"],
                sig_props["layout"],
            ):
                # incompatible store: drop — the backfill below rebuilds
                # every stored document's signature under this run's config
                catalog.drop("stream_sigs")
        catalog.set_properties("stream_sigs", sig_props)
        if have_docs:
            # EVERY batch (not just guarded ones) drops ids already in the
            # store: first ingest wins. This makes recrawled ids behave
            # identically with or without a crash in the history, keeps
            # the store one-row-per-id, and makes batch-vs-store
            # self-pairs (x, x) impossible. (Recrawl REPLACEMENT policy
            # belongs upstream — url_dedup_latest — not in the stream.)
            batch = batch.join(
                catalog.read("stream_docs").select(id_col), id_col, "left_anti"
            )
        batch = batch.localCheckpoint()  # consumed by pair joins + append
        if batch.isEmpty():
            guard["pending"] = False
            return
        if have_docs and not catalog.exists("stream_sigs"):
            # store predates the incremental layout (or its sig table was
            # lost): one-time backfill from the stored docs, after which
            # every batch appends only its own signatures
            catalog.write(
                build_signatures(
                    _store_normed(), params, plan, id_col=id_col,
                    with_shingles=persist_shingles,
                ),
                "stream_sigs",
            )
        normed = with_normalized_text(batch, text_col, version=params.normalize_version)
        sigs = build_signatures(
            normed, params, plan, id_col=id_col, min_parallelism=1,
            with_shingles=persist_shingles,
        ).persist()  # feeds triangular cands + cross cands + 2 estimate joins + append
        try:
            pairs = verify_pairs(
                lsh_candidate_pairs(sigs, id_col=id_col),
                normed,
                params,
                id_col=id_col,
                threshold=threshold,
                sig_df=sigs,
                with_distances=False,
            ).select(a, b, "jaccard")
            if have_docs:
                store_sigs = catalog.read("stream_sigs")
                if need_guard:
                    # heal sig/doc divergence: a crash between the sigs and
                    # docs appends left the crashed batch's ids in
                    # stream_sigs but not stream_docs; those ids are exactly
                    # (a subset of) this re-run batch, so dropping them from
                    # the probe side prevents (x, x) self-pairs and restores
                    # the pre-crash store view
                    store_sigs = store_sigs.join(
                        batch.select(id_col), id_col, "left_anti"
                    )
                cross = cross_verify_pairs(
                    cross_lsh_candidate_pairs(sigs, store_sigs, id_col=id_col),
                    normed,
                    _store_normed(),
                    params,
                    id_col=id_col,
                    threshold=threshold,
                    sig_q=sigs,
                    sig_r=store_sigs,
                )
                qc, rc = F.col(f"{id_col}_q"), F.col(f"{id_col}_r")
                pairs = pairs.unionByName(
                    cross.select(
                        F.least(qc, rc).alias(a),
                        F.greatest(qc, rc).alias(b),
                        "jaccard",
                    )
                )
            pairs = pairs.withColumn("batch_id", F.lit(batch_id).cast("long"))
            if need_guard and catalog.exists("stream_dup_pairs"):
                pairs = pairs.join(
                    catalog.read("stream_dup_pairs").select(a, b), [a, b], "left_anti"
                )
            catalog.append(pairs, "stream_dup_pairs")
            sigs_out = sigs
            if need_guard and catalog.exists("stream_sigs"):
                sigs_out = sigs.join(
                    catalog.read("stream_sigs").select(id_col), id_col, "left_anti"
                )
            catalog.append(sigs_out, "stream_sigs")
            catalog.append(batch, "stream_docs")
        finally:
            # release the per-batch signature cache (without this every
            # micro-batch pins a cache entry for the stream's lifetime)
            sigs.unpersist()
        catalog.log_metrics(
            f"stream_near_dup_batch_{batch_id}",
            params.params_hash(),
            wall_ms=0.0,
            output_rows=None,
            status="complete",
        )
        guard["pending"] = False

    writer = pages_stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
