"""Distributed suffix-array pass (north_star: "a distributed suffix-array
pass for exact substring duplication").

Builds depth-truncated suffix ranks over the corpus with **prefix doubling**
(Manber–Myers) expressed as DataFrame ops: ceil(log2 depth) rounds, each a
self-join on (doc, pos+step) plus a dense re-ranking of the (rank, rank2)
pairs. After the final round, two positions have equal rank iff their
suffixes agree on the first ``depth`` characters — so for depth = L, rank
equality is EXACT length-L window equality (codepoint-level, no hash collisions;
== byte-level on ASCII corpora),
and `substring_pairs_sa` turns the rank groups into doc pairs through the
same skew-tiered pair generator the LSH path uses.

Scale notes: this pass explodes one row per character position, so like the
reference-class suffix-array dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better") it is the *bounded* second
pass — run it corpus-wide at small scale or restricted to candidate
documents (`candidates=`) at web scale. The winnowing engine
(operators/substring.py) is the probabilistic-candidate production path;
this one is its exact, hash-free twin plus a true lexicographic suffix
order for maximal-repeat analyses. Dense ranking of distinct keys uses a
distributed range-partitioned sort + broadcast partition offsets +
Arrow-batch index assignment (no single-partition window, no per-row
Python serialization anywhere in the DAG).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lash_spark.operators.lsh import pairs_from_keys


def _dense_ranks(keys: DataFrame, cols: "list[str]", out: str = "nr") -> DataFrame:
    """Order-preserving dense ranks for the distinct rows of ``keys``:
    distributed sort (range partitioner) + per-partition row counts
    (O(#partitions) driver state, not O(rows)) + `mapInArrow` offset
    assignment — the scalable alternative to a global Window, and unlike
    rdd.zipWithIndex it never leaves the JVM/Arrow lane (zipWithIndex
    round-trips every row through Python pickle).

    The sorted distinct keys are pinned with localCheckpoint so the counts
    job and the rank-assignment job read the *same* materialized partitions
    (range-partitioner sampling must not re-run between the two jobs)."""
    distinct = keys.select(*cols).distinct().sort(*cols).localCheckpoint(eager=False)
    with_pid = distinct.withColumn("_pid", F.spark_partition_id())
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    names = [f.name for f in distinct.schema.fields]

    def assign(batches):
        pos = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if pos is None:
                pid = batch.column("_pid")[0].as_py()
                pos = offsets[pid]
            idx = pa.array(np.arange(pos, pos + batch.num_rows, dtype=np.int64))
            pos += batch.num_rows
            yield pa.RecordBatch.from_arrays(
                [batch.column(n) for n in names] + [idx], names=names + [out]
            )

    out_schema = T.StructType(list(distinct.schema.fields)).add(out, T.LongType(), False)
    return with_pid.mapInArrow(assign, out_schema)


_ALPHA_CAP = 16384  # beyond 14-bit ranks the packed init can't beat 3 chars


def _alphabet_compaction(d: DataFrame):
    """Corpus-alphabet dense remap: distinct codepoints, sorted, become
    `translate` ranks 1..A, so each character needs only
    bit_length(A + 1) bits in the packed init word instead of the 21-bit
    any-Unicode worst case — an ASCII-ish corpus packs 9 chars per long
    (vs 3), saving up to two prefix-doubling rounds, each of which is a
    full distinct+sort+join sweep over every character position. The
    sorted-codepoint ranks preserve lexicographic order, so downstream
    rank semantics are unchanged. Returns (translate_expr, bits) or None
    when compaction can't help (alphabet > _ALPHA_CAP) or isn't safe
    (supplementary codepoints occupy two UTF-16 units, which `translate`
    does not remap atomically). Costs one distinct-chars sweep — a tiny
    shuffle after map-side partial aggregation."""
    cps = (
        d.filter(F.length("_t") >= 1)  # empty docs would inject codepoint 0
        .select(
            F.explode(
                # per-doc array_distinct first: the explode emits one row
                # per distinct char per doc (~alphabet size), not one per
                # character position
                F.expr(
                    "array_distinct(transform(sequence(1, length(_t)),"
                    " i -> ascii(substring(_t, i, 1))))"
                )
            ).alias("cp")
        )
        .distinct()
        .sort("cp")
        .limit(_ALPHA_CAP + 1)
    )
    rows = [r["cp"] for r in cps.collect()]
    # rows[0] < 1 means NUL (or an empty-text artifact): codepoint 0 would
    # collide with the past-the-end sentinel, so decline and let the
    # generic +1-shifted packing handle it
    if not rows or len(rows) > _ALPHA_CAP or rows[-1] > 0xFFFF or rows[0] < 1:
        return None
    bits = (len(rows) + 1).bit_length()  # values are rank+1 in 2..A+1, 0 sentinel
    if 63 // bits <= 3:
        return None
    src = "".join(chr(c) for c in rows)
    dst = "".join(chr(i + 1) for i in range(len(rows)))
    return F.translate(F.col("_t"), src, dst), bits


def suffix_ranks(
    docs: DataFrame,
    depth: int,
    id_col: str = "url",
    text_col: str = "norm_text",
    checkpoint: bool = True,
    compaction="auto",
) -> DataFrame:
    """(id, pos, sa_rank) for every character position: sa_rank is the dense
    lexicographic rank of the suffix truncated to ``depth`` characters
    (corpus-global). pos is 1-based. Positions with fewer than ``depth``
    characters remaining compare with an end sentinel (-1) that sorts low,
    matching ordinary suffix order for the truncated view. Empty-text docs
    contribute no positions (without the filter, ``sequence(1, 0)`` counts
    DOWN and the init pack hits index 0).

    ``compaction``: "auto" computes the alphabet compaction here; pass a
    precomputed ``_alphabet_compaction`` result (or None for the generic
    21-bit packing) to avoid re-running the distinct-chars sweep when the
    caller already did."""
    # NOTE: deliberately NOT fan_out'd — measured at sf0.1 (round 6): the
    # doubling pipeline reaches its first exchange (the dense-rank
    # distinct/sort) almost immediately, so the extra repartition cost more
    # than the single-partition map work it parallelized (2.3 -> 3.5 s),
    # unlike the census operators below where the explode+hash pass
    # dominates (2-3x wins there).
    d = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")).filter(
        F.length("_t") >= 1
    )
    # initial rank = as many characters as fit one signed long, packed in a
    # base-2^width positional code (codepoint-rank+1; 0 = past-the-end
    # sentinel, so shorter suffixes sort first) — order-preserving,
    # character-exact, and each extra init char saves doubling rounds.
    # Preferred path: alphabet compaction (width = bits of the corpus
    # alphabet size, e.g. 7 for ASCII -> 9 chars/long). Fallback for huge /
    # non-BMP alphabets: width 21 (> 0x110000 covers every codepoint,
    # 3 * 21 = 63 bits). Units are CODEPOINTS, matching SQL substr
    # semantics (== bytes on ASCII corpora).
    if compaction == "auto":
        compact = _alphabet_compaction(d) if depth > 3 else None
    else:
        compact = compaction
    if compact is not None:
        remap, width = compact
        d = d.withColumn("_t", remap)
        init = min(depth, 63 // width)
    else:
        width = 21
        init = min(3, depth)
    weights = [(1 << width) ** (init - 1 - j) for j in range(init)]
    # weights that fit an int (2^21, 1) would otherwise multiply in 32-bit
    # and overflow for codepoints >= 1024 under ANSI mode — force BIGINT
    terms = " + ".join(
        f"coalesce(element_at(_bp, i + {j}), 0) * CAST({w} AS BIGINT)"
        for j, w in enumerate(weights)
    )
    chars = (
        d.withColumn(
            "_bp",
            F.expr(
                "concat(transform(sequence(1, length(_t)),"
                " i -> ascii(substring(_t, i, 1)) + 1),"
                f" array_repeat(0, {init}))"
            ),
        )
        .select(
            "_id",
            F.posexplode(
                F.expr(f"transform(sequence(1, length(_t)), i -> {terms})")
            ).alias("_p0", "r"),
        )
        .select("_id", (F.col("_p0") + 1).alias("pos"), F.col("r").cast("long").alias("r"))
    )

    r = chars
    k = init
    if k >= depth:  # no doubling rounds: densify the packed init ranks
        ranks = _dense_ranks(r, ["r"])
        r = r.join(ranks, ["r"]).select("_id", "pos", F.col("nr").alias("r"))
    while k < depth:
        step = min(k, depth - k)
        shifted = r.select(
            "_id", (F.col("pos") - step).alias("pos"), F.col("r").alias("r2")
        )
        joined = r.join(shifted, ["_id", "pos"], "left").fillna({"r2": -1})
        ranks = _dense_ranks(joined, ["r", "r2"])
        r = joined.join(ranks, ["r", "r2"]).select(
            "_id", "pos", F.col("nr").alias("r")
        )
        k += step
        # localCheckpoint per round: truncates the growing join lineage the
        # same way the union-find loop does (O(log depth) rounds total).
        # checkpoint=False exists for the plan audit, which needs the
        # un-truncated DAG (a checkpoint scan hides upstream operators).
        if checkpoint:
            r = r.localCheckpoint(eager=False)
    return r.select(F.col("_id").alias(id_col), "pos", F.col("r").alias("sa_rank"))


_MAX_PACKED_WORDS = 8  # widest composite window key: 8 longs = 64 bytes


def _packed_window_keys(d: DataFrame, min_len: int, compaction="auto") -> DataFrame | None:
    """Zero-round window keying, unlocked by alphabet compaction: with the
    corpus alphabet dense-remapped to ``bits`` bits per char, one signed
    long packs w = 63 // bits characters, so the full min_len window is
    captured EXACTLY by ceil(min_len / w) packed words whose windows tile
    [pos, pos + min_len). Struct equality of those words ⇔ character
    equality of the window — injective packing, no hashes — so pair
    detection needs NO prefix-doubling rounds at all: one position explode
    + one distinct replaces 2-4 full distinct+sort+join sweeps over every
    character position (the shuffle is one pass at ≤64 B/key instead of
    several at 16-24 B). Returns (_id, key) rows or None when compaction
    is unavailable or the key would exceed _MAX_PACKED_WORDS words (huge
    alphabets fall back to the rank-composite path).

    ``d`` must have columns (_id, _t); rows are (_id, pos, key), pos
    1-based. ``compaction``: "auto" computes it here; callers that already
    ran ``_alphabet_compaction`` pass its result to skip the sweep."""
    compact = _alphabet_compaction(d) if compaction == "auto" else compaction
    if compact is None:
        return None
    remap, bits = compact
    w = min(63 // bits, min_len)
    n_words = -(-min_len // w)
    if n_words > _MAX_PACKED_WORDS:
        return None
    # word i covers [o_i, o_i + w); offsets clamp so the last word ends at
    # exactly min_len (overlap is fine: union coverage is what matters)
    offsets = [min(i * w, min_len - w) for i in range(n_words)]
    d2 = d.withColumn("_t", remap).withColumn(
        "_bp",
        F.expr(
            "transform(sequence(1, length(_t)), i -> ascii(substring(_t, i, 1)) + 1)"
        ),
    )
    weights = [(1 << bits) ** (w - 1 - j) for j in range(w)]

    def word(start: str) -> str:
        return " + ".join(
            f"element_at(_bp, {start} + {j}) * CAST({wt} AS BIGINT)"
            for j, wt in enumerate(weights)
        )

    fields = ", ".join(f"'k{i}', {word(f'(p + {o})')}" for i, o in enumerate(offsets))
    # docs shorter than min_len contribute no positions (explicit branch:
    # sequence(1, n) with n <= 0 would count DOWN, not produce empty)
    return d2.select(
        "_id",
        F.posexplode(
            F.expr(
                f"if(length(_t) < {min_len}, "
                f"array(), "
                f"transform(sequence(1, length(_t) - {min_len} + 1), "
                f"p -> named_struct({fields})))"
            )
        ).alias("_p0", "key"),
    ).select("_id", (F.col("_p0") + 1).alias("pos"), "key")


def _window_pos_hashes(d2: DataFrame, min_len: int) -> DataFrame:
    """(_id, pos, h) rows: a 64-bit JVM hash of every length-``min_len``
    character window (pos 1-based). Docs shorter than min_len contribute no
    positions (explicit branch: sequence(1, n) with n <= 0 counts DOWN)."""
    return d2.select(
        "_id",
        F.posexplode(
            F.expr(
                f"if(length(_t) < {min_len}, array(), "
                f"transform(sequence(1, length(_t) - {min_len} + 1), "
                f"p -> xxhash64(substring(_t, p, {min_len}))))"
            )
        ).alias("_p0", "h"),
    ).select("_id", (F.col("_p0") + 1).alias("pos"), "h")


def _sa_group_keys(
    d2: DataFrame, min_len: int, id_col: str, compaction=None
) -> DataFrame:
    """(id, band_id, key) group rows whose key equality ⇔ exact character
    equality of the min_len window — the pairs_from_keys input for
    :func:`substring_pairs_sa`.

    Two-pass shape (guide §2.3 "shuffle keys and metadata instead of
    payloads"): the r5 single-pass design shuffled a ≤64-byte packed-window
    struct for EVERY character position into one global distinct — ~10M ×
    72 B at sf0.1 — and that exchange dominated the whole query (20.6 s vs
    7.4 s for the winnowing twin on the same truth set; VERDICT r5 #3).

    1. **Hash census** (8 B/key, map-side partial agg): per-position
       xxhash64 of the window, groupBy(h) keeping only min(id)/max(id) —
       a hash whose min and max doc ids agree lives in one document and can
       never produce a pair. Equal windows always hash equal, so this
       prefilter is COMPLETE: no cross-doc window group is lost.
    2. **Exact grouping of the survivors**: positions carrying a surviving
       hash (a tiny set — only genuinely repeated blocks plus the odd
       collision) re-keyed on the RAW min_len substring. Result groups are
       therefore decided by character equality alone — a hash collision
       admits a spurious survivor, never a wrong pair, exactly like the
       Bloom-prefilter pattern of guide §3.2.

    ``compaction`` is accepted for signature compatibility with the old
    packed-key path and ignored (the hash census needs no alphabet map)."""
    pos_h = _window_pos_hashes(d2, min_len)
    hot = (
        pos_h.groupBy("h")
        .agg(F.min("_id").alias("_mn"), F.max("_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("h")
    )
    # the explode re-runs for the survivor pass (two cheap map passes beat
    # materializing the full position table); the semi-join side is tiny
    surv = pos_h.join(hot, "h", "left_semi").select("_id", "pos")
    return (
        surv.join(d2, "_id")
        .select(
            F.col("_id").alias(id_col),
            F.lit(0).alias("band_id"),
            F.expr(f"substring(_t, pos, {min_len})").alias("key"),
        )
        .distinct()
    )


def substring_pairs_sa(
    docs: DataFrame,
    min_len: int = 64,
    id_col: str = "url",
    text_col: str = "norm_text",
    max_bucket: int = 2000,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact (id_a, id_b) pairs sharing a character-identical substring of
    length >= min_len: positions whose first min_len characters are equal
    form a group, and distinct doc pairs within a group ARE the answer —
    groups are decided by raw character equality (no verification step;
    hashes appear only as a complete PREFILTER whose collisions cost work,
    never results — see :func:`_sa_group_keys`). Groups feed the
    skew-tiered pair generator (a giant repeated substring is precisely
    the hot-bucket case).

    Alphabet-independent: the hash census + raw-substring grouping needs
    no alphabet compaction, so the corpus-wide distinct-codepoint sweep
    and the prefix-doubling fallback the r5 version carried are gone.
    ``suffix_ranks`` still produces the true full-depth lexicographic
    order for maximal-repeat analyses."""
    from lash_spark.operators.normalize import fan_out

    d = docs.select(F.col(id_col), F.col(text_col))
    if candidates is not None:
        d = d.join(candidates.select(id_col).distinct(), id_col, "left_semi")
    # the per-position explode+hash passes run on the INPUT partitioning —
    # a single-file scan would run them single-core (measured ~2 s/pass at
    # sf0.1 on 1 partition); no-op on well-partitioned inputs
    d2 = fan_out(d.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")))
    keyed = _sa_group_keys(d2, min_len, id_col)
    return pairs_from_keys(keyed, id_col=id_col, max_bucket=max_bucket)


def repeated_windows(
    docs: DataFrame,
    window: int = 64,
    id_col: str = "url",
    text_col: str = "norm_text",
    top_n: int = 20,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Most-duplicated exact windows — the maximal-repeat-style analysis
    the suffix machinery exists for (Lee et al. 2022 report duplicated
    spans, not just doc pairs): every length-``window`` character window
    appearing in >= 2 distinct docs, with distinct-doc and total-occurrence
    counts plus the window text, top ``top_n`` by
    (n_docs desc, n_occ desc, window asc) — a total order, so the result
    set is deterministic.

    ``candidates`` (ids, e.g. near-dup cluster members) restricts the
    span analysis to those documents — the bounded mode that makes this
    runnable at corpus scale (VERDICT r3 #5): counts are then over the
    restricted set, and the per-position explode touches only candidate
    text instead of every character position in the corpus. Corpus-wide
    mode remains for analysis-tier jobs at moderate scale.

    Shape (two-pass census, same pattern as :func:`_sa_group_keys` —
    guide §2.3 "shuffle keys and metadata instead of payloads"): the old
    single-pass design shuffled a 64-byte packed key for EVERY character
    position into one exact groupBy whose countDistinct additionally
    Expand-doubled the rows. Now pass 1 is an 8-byte hash census
    (groupBy(h) keeping min(id)/max(id), map-side partial agg) — equal
    windows always hash equal, so hashes whose min and max doc id agree
    can never reach n_docs >= 2 and the prefilter is COMPLETE; pass 2
    re-keys only the surviving positions (genuinely cross-doc windows
    plus the odd collision) on the RAW substring and takes the exact
    n_docs/n_occ counts there. Counts are exact: every occurrence of a
    surviving window carries the same hash, so the survivor set holds
    ALL its positions; a collision admits a spurious survivor group that
    the exact n_docs >= 2 filter then drops — work, never results. The
    raw key IS the window text, so the old text-recovery join is gone."""
    from lash_spark.operators.normalize import fan_out

    src = docs.select(F.col(id_col), F.col(text_col))
    if candidates is not None:
        src = src.join(candidates.select(id_col).distinct(), id_col, "left_semi")
    # fan out under-partitioned inputs before the per-position passes (see
    # substring_pairs_sa)
    d = fan_out(src.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")))
    pos_h = _window_pos_hashes(d, window)
    hot = (
        pos_h.groupBy("h")
        .agg(F.min("_id").alias("_mn"), F.max("_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("h")
    )
    # the explode re-runs for the survivor pass (two cheap map passes beat
    # materializing the full position table); the semi-join side is tiny
    surv = pos_h.join(hot, "h", "left_semi").select("_id", "pos")
    keys = surv.join(d, "_id").select(
        "_id", F.expr(f"substring(_t, pos, {window})").alias("key")
    )
    return (
        keys.groupBy("key")
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(F.col("key").alias("window"), "n_docs", "n_occ")
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("window"))
        .limit(top_n)
    )
