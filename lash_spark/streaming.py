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
) -> StreamingQuery:
    """Streaming NEAR-duplicate detection: each micro-batch emits
    (a) batch-internal near-dup pairs (triangular LSH + verify) and
    (b) pairs between the batch and ALL previously ingested documents
    (the two-dataset cross mode against the accumulated ``stream_docs``
    store), then appends the batch to the store. Pairs accumulate in
    ``stream_dup_pairs`` as canonical (id_a < id_b, jaccard, batch_id).

    Prefix-closure property (tested): streaming over batches B1..Bn yields
    exactly the pair set of the batch triangular pass over their union —
    a cross-batch pair (x in Bi, y in Bj, i < j) is found when Bj probes
    the store, through the SAME signature/candidate/verify stages.

    Ingest semantics: FIRST ingest wins per id — every batch is
    anti-joined against the store's ids, so recrawled ids are dropped
    consistently (recrawl replacement policy belongs upstream in
    url_dedup_latest) and degenerate (x, x) self-pairs cannot occur.

    Replay safety: a two-step append protocol (pairs BEFORE docs) plus the
    pessimistic guard of stream_signatures — on a guarded
    (post-failure/restart) invocation the recomputed pairs are also
    anti-joined vs ``stream_dup_pairs``, so a crash between the two
    appends re-runs the batch without duplicating pairs, and a crash
    after both no-ops (the batch's ids are in the store, so the
    unconditional id anti-join empties it).

    At scale the store probe is the cross-dataset join: batch band keys
    against the store's, skew-salted both sides — per-batch cost scales
    with batch x matching-band volume, not with |store| (the store-side
    signature build IS O(|store|) per batch here; a production deployment
    persists store signatures incrementally via stream_signatures and
    feeds them to the cross candidate stage directly)."""
    from pyspark.sql import functions as F

    from lash_spark.pipeline import cross_dataset_pairs

    params = params or SketchParams()
    a, b = f"{id_col}_a", f"{id_col}_b"
    guard = {"pending": True}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        need_guard = guard["pending"]
        guard["pending"] = True  # stays set if anything below raises
        batch = batch_df.select(id_col, text_col)
        have_store = catalog.exists("stream_docs")
        if have_store:
            # EVERY batch (not just guarded ones) drops ids already in the
            # store: first ingest wins. This makes recrawled ids behave
            # identically with or without a crash in the history, keeps
            # the store one-row-per-id, and makes batch-vs-store
            # self-pairs (x, x) impossible. (Recrawl REPLACEMENT policy
            # belongs upstream — url_dedup_latest — not in the stream.)
            # Unlike stream_signatures, this costs no extra amortized
            # read: the store is read again below for the cross probe.
            batch = batch.join(
                catalog.read("stream_docs").select(id_col), id_col, "left_anti"
            )
        batch = batch.localCheckpoint()  # consumed by 2 pair joins + append
        if batch.isEmpty():
            guard["pending"] = False
            return
        cached: list[DataFrame] = []
        pairs = cross_dataset_pairs(
            batch, batch, params, id_col=id_col, text_col=text_col,
            threshold=threshold, same_files=True, unpersist_into=cached,
        )
        if have_store:
            hist = catalog.read("stream_docs")
            cross = cross_dataset_pairs(
                batch, hist, params, id_col=id_col, text_col=text_col,
                threshold=threshold, unpersist_into=cached,
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
        try:
            catalog.append(pairs, "stream_dup_pairs")
            catalog.append(batch, "stream_docs")
        finally:
            # release the per-batch signature caches (cross_dataset_pairs
            # persists its sig tables; without this every micro-batch pins
            # a store-sized cache entry for the stream's lifetime)
            for df in cached:
                df.unpersist()
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
