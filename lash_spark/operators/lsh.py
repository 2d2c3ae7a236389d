"""Candidate-pair generation: LSH band equi-joins with explicit skew tiers.

Replaces (does not port) the reference's all-pairs nested loop
(``/root/reference/src/utils.rs:150-161,248-259,342-352``) — O(N·M) pairs is
impossible at 10^12 docs. Candidates come from equi-joins on compact keys
(MinHash band hashes — O1; SimHash chunks — O3), with the hot-key problem
handled *explicitly* (north_rule; SURVEY.md O2), because the blow-up is
quadratic-in-bucket-size pair generation, which AQE skew-join cannot fix:

- tier 1 (|bucket| <= max_bucket): plain self equi-join, `id_a < id_b`
  (J2 triangular rule, utils.rs:158-160).
- tier 2 (max_bucket < |bucket| <= star_threshold): **salted** all-pairs —
  members get salt s = hash(id) % S; the bucket key is split into the
  S(S+1)/2 triangle blocks (i <= j) and each member is replicated to the S
  blocks it participates in, so one hot reducer becomes ~S²/2 balanced
  reducers while still emitting every unordered pair exactly once.
- tier 3 (|bucket| > star_threshold): boilerplate-class buckets are
  star-linked to the bucket's min-id representative — preserves cluster
  connectivity through verification without quadratic pair volume; volume
  is observable via band_census().

Pairs found in multiple bands are deduped *before* expensive verification
(manual early-dedup rewrite, SURVEY.md §4.2(5)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_bands(sig_df: DataFrame, id_col: str = "url") -> DataFrame:
    """Signatures -> (id, band_id, band_hash) key rows (O1).

    Empty-signature documents (text shorter than one shingle) are excluded:
    they all share the EMPTY register pattern and would otherwise form one
    giant garbage bucket per band at web scale."""
    if "n_windows" in sig_df.columns:
        sig_df = sig_df.filter(F.col("n_windows") > 0)
    return sig_df.select(
        F.col(id_col), F.posexplode("bands").alias("band_id", "band_hash")
    ).withColumn("key", F.col("band_hash")).drop("band_hash")


def band_census(keyed: DataFrame, id_col: str = "url") -> DataFrame:
    """Bucket-size census over (band_id, key) — the observability handle for
    skew decisions and the hot-band metrics row."""
    return keyed.groupBy("band_id", "key").agg(
        F.count(id_col).alias("bucket_n"), F.min(id_col).alias("rep")
    )


def pairs_from_keys(
    keyed: DataFrame,
    id_col: str = "url",
    max_bucket: int = 2000,
    salt_buckets: int = 8,
    star_threshold: int | None = None,
) -> DataFrame:
    """Generic skew-tiered candidate pair generation from (band_id, key, id)
    rows. Returns distinct (id_a, id_b) with id_a < id_b.
    """
    spark = keyed.sparkSession
    star_threshold = star_threshold or max_bucket * salt_buckets * 4

    # (keyed ⋈ census) feeds all three tiers below; persist so the upstream
    # signature UDF + explode run once per row instead of once per tier
    # branch (the physical plan otherwise repeats the Arrow subtree).
    stats = band_census(keyed, id_col)
    k = (
        keyed.join(stats, ["band_id", "key"])
        .filter(F.col("bucket_n") >= 2)
        .persist()
    )

    a, b = f"{id_col}_a", f"{id_col}_b"

    # --- tier 1: plain equi-join
    cold = k.filter(F.col("bucket_n") <= max_bucket).select("band_id", "key", id_col)
    p1 = (
        cold.alias("l")
        .join(cold.alias("r"), ["band_id", "key"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias(a), F.col(f"r.{id_col}").alias(b))
    )

    # --- tier 2: salted triangle blocks
    warm = (
        k.filter((F.col("bucket_n") > max_bucket) & (F.col("bucket_n") <= star_threshold))
        .select("band_id", "key", id_col)
        .withColumn("salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets)).cast("int"))
    )
    blocks = spark.createDataFrame(
        [(i, j) for i in range(salt_buckets) for j in range(i, salt_buckets)], "bi int, bj int"
    )
    rep = warm.join(
        F.broadcast(blocks), (F.col("salt") == F.col("bi")) | (F.col("salt") == F.col("bj"))
    )
    p2 = (
        rep.alias("l")
        .join(rep.alias("r"), ["band_id", "key", "bi", "bj"])
        .where(
            (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            & (F.least("l.salt", "r.salt") == F.col("bi"))
            & (F.greatest("l.salt", "r.salt") == F.col("bj"))
        )
        .select(F.col(f"l.{id_col}").alias(a), F.col(f"r.{id_col}").alias(b))
    )

    # --- tier 3: star-link to representative (rep == min id, so rep < id)
    p3 = (
        k.filter(F.col("bucket_n") > star_threshold)
        .where(F.col(id_col) != F.col("rep"))
        .select(F.col("rep").alias(a), F.col(id_col).alias(b))
    )

    return p1.unionByName(p2).unionByName(p3).dropDuplicates([a, b])


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "url",
    max_bucket: int = 2000,
    salt_buckets: int = 8,
    star_threshold: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs from the signatures table."""
    return pairs_from_keys(
        explode_bands(sig_df, id_col),
        id_col=id_col,
        max_bucket=max_bucket,
        salt_buckets=salt_buckets,
        star_threshold=star_threshold,
    )


def simhash_chunks(sig_df: DataFrame, id_col: str = "url", chunks: int = 4) -> DataFrame:
    """SimHash -> (id, chunk_id, chunk_val) keys. Pigeonhole: two fingerprints
    within Hamming distance t < chunks share at least one exact chunk, so the
    per-chunk equi-join is a complete candidate generator for d <= chunks-1
    (multi-probe rotations would extend beyond that; not needed at t=3,q=4).
    """
    width = 64 // chunks
    mask = (1 << width) - 1
    if "n_windows" in sig_df.columns:  # same garbage-bucket guard as bands
        sig_df = sig_df.filter(F.col("n_windows") > 0)
    cols = []
    for c in range(chunks):
        val = F.shiftrightunsigned(F.col("simhash"), c * width).bitwiseAND(F.lit(mask))
        cols.append(F.struct(F.lit(c).alias("band_id"), val.alias("key")))
    return (
        sig_df.select(F.col(id_col), F.explode(F.array(*cols)).alias("ck"))
        .select(id_col, F.col("ck.band_id"), F.col("ck.key"))
    )


def simhash_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "url",
    chunks: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 2000,
    salt_buckets: int = 8,
) -> DataFrame:
    """Hamming-ball near-dup candidates (O3): chunk equi-join then verify
    bit_count(a^b) <= t JVM-side."""
    assert max_hamming < chunks, "pigeonhole requires t < chunks"
    keys = simhash_chunks(sig_df, id_col, chunks)
    pairs = pairs_from_keys(keys, id_col=id_col, max_bucket=max_bucket, salt_buckets=salt_buckets)
    a, b = f"{id_col}_a", f"{id_col}_b"
    sim = sig_df.select(F.col(id_col), "simhash")
    return (
        pairs.join(sim.withColumnsRenamed({id_col: a, "simhash": "sim_a"}), a)
        .join(sim.withColumnsRenamed({id_col: b, "simhash": "sim_b"}), b)
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(a, b, "hamming")
    )
