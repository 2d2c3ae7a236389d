"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``: flagship near-dup pipeline on sf0.001.
``queries()``: one entry per implemented operator (SURVEY.md §2).
``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query.

Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lash_spark.config import LshPlan, PipelineConfig, SketchParams
from lash_spark.estimators import mash_distance_expr, shared_fraction_expr
from lash_spark.operators.ann import brute_force_topk, cosine_expr, embedding_near_dup_pairs
from lash_spark.operators.components import assign_clusters
from lash_spark.operators.exact import exact_dup_pairs
from lash_spark.operators.lsh import band_census, explode_bands, lsh_candidate_pairs
from lash_spark.operators.normalize import normalize_text, with_normalized_text
from lash_spark.operators.signatures import add_register_sketch, build_signatures
from lash_spark.operators.substring import exact_substring_pairs
from lash_spark.operators.textstats import detect_lang, token_count, with_text_stats
from lash_spark.operators.verify import verify_pairs
from lash_spark.pipeline import dedup_pipeline

from lash_spark.operators.textstats import LANG_MARKERS, STOPWORDS

K = 16  # reference default shingle width (main.rs:55)
THRESHOLD = 0.8

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _normed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_normalized_text(_docs(spark, sf_dir), "text")


def _params() -> SketchParams:
    return SketchParams(shingle_k=K, num_perm=128, seed=42)


def _dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates -> exact-Jaccard verify >= 0.8 (the flagship path)."""
    docs = _normed(spark, sf_dir)
    params = _params()
    plan = LshPlan.plan(params.num_perm, THRESHOLD, 0.995)
    # persist: the signatures feed the band explode AND the estimate join
    sigs = build_signatures(
        docs, params, plan, id_col="doc_id", with_shingles=True
    ).persist()
    cands = lsh_candidate_pairs(sigs, id_col="doc_id")
    verified = verify_pairs(
        cands, docs, params, id_col="doc_id", threshold=THRESHOLD,
        sig_df=sigs, with_distances=False,
    )
    return verified.select("doc_id_a", "doc_id_b", "jaccard")


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-dup pairs + mash distances + cluster ids on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _docs(spark, sf_dir)
    res = dedup_pipeline(docs, PipelineConfig(), id_col="doc_id", text_col="text")
    return res.dup_pairs.join(
        res.clusters.withColumnsRenamed({"doc_id": "doc_id_a", "cluster_id": "cluster_id"}),
        "doc_id_a",
    ).select("doc_id_a", "doc_id_b", "jaccard", "frac", "distance", "cluster_id")


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- flagship: MinHash-LSH near-dup pairs, exact-verified (O1/J1/J2/U1)
    q["near_dup_pairs"] = _dup_pairs

    # ---- clustering: union-find over verified edges (O4)
    def near_dup_clusters(spark, sf_dir):
        pairs = _dup_pairs(spark, sf_dir).select("doc_id_a", "doc_id_b")
        return assign_clusters(_docs(spark, sf_dir), pairs, id_col="doc_id")

    q["near_dup_clusters"] = near_dup_clusters

    # ---- distance formulas on verified pairs (F1/F2/F3)
    def distance_formulas(spark, sf_dir):
        pairs = _dup_pairs(spark, sf_dir)
        frac = shared_fraction_expr("jaccard")
        # "+ 0.0" normalizes any IEEE -0.0 (e.g. -ln(1)/k) before hashing
        return pairs.select(
            "doc_id_a",
            "doc_id_b",
            F.round("jaccard", 6).alias("jaccard_r"),
            (F.round(frac, 6) + F.lit(0.0)).alias("frac"),
            (F.round(mash_distance_expr(frac, K, 1), 6) + F.lit(0.0)).alias("d_poisson"),
            (F.round(mash_distance_expr(frac, K, 2), 6) + F.lit(0.0)).alias("d_binomial"),
        )

    q["distance_formulas"] = distance_formulas

    # ---- exact dedup groups (hash groupBy)
    def exact_dedup(spark, sf_dir):
        return (
            _docs(spark, sf_dir)
            .groupBy(F.md5(normalize_text("text")).alias("content_md5"))
            .agg(F.count("*").alias("group_size"), F.min("doc_id").alias("rep"))
        )

    q["exact_dedup_groups"] = exact_dedup

    # ---- shingle extraction parity (T4 in SQL-expressible form)
    def shingle_counts(spark, sf_dir):
        d = _normed(spark, sf_dir)
        return d.select(
            "doc_id",
            F.expr(
                f"size(array_distinct(transform(sequence(1, length(norm_text) - {K - 1}),"
                f" i -> substring(norm_text, i, {K}))))"
            ).alias("n_shingles"),
        ).where(F.length("norm_text") >= K)

    q["shingle_counts"] = shingle_counts

    # ---- inclusion-exclusion jaccard + containment on exact word sets (U4)
    def ie_jaccard(spark, sf_dir):
        d = (
            _normed(spark, sf_dir)
            .filter(F.col("doc_id") < 60)
            .select("doc_id", F.array_distinct(F.split("norm_text", " ")).alias("w"))
        )
        pairs = (
            d.alias("a")
            .crossJoin(d.alias("b"))
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
                F.size("a.w").cast("double").alias("card_a"),
                F.size("b.w").cast("double").alias("card_b"),
                F.size(F.array_union("a.w", "b.w")).cast("double").alias("card_u"),
            )
        )
        return pairs.select(
            "doc_id_a",
            "doc_id_b",
            "card_a",
            "card_b",
            "card_u",
            F.greatest(
                F.lit(0.0), (F.col("card_a") + F.col("card_b") - F.col("card_u")) / F.col("card_u")
            ).alias("jaccard_ie"),
            F.greatest(
                F.lit(0.0), (F.col("card_a") + F.col("card_b") - F.col("card_u")) / F.col("card_a")
            ).alias("containment_a"),
        )

    q["ie_jaccard_containment"] = ie_jaccard

    # ---- word 3-gram Jaccard dedup (bounded subset; SQL-expressible T4
    # variant — the scale path uses char shingles + LSH instead of all-pairs)
    def word_ngram_jaccard(spark, sf_dir):
        d = (
            _normed(spark, sf_dir)
            .filter(F.col("doc_id") < 150)
            .filter(F.size(F.split("norm_text", " ")) >= 3)
            .select(
                "doc_id",
                F.expr(
                    "array_distinct(transform(sequence(1, size(split(norm_text,' ')) - 2),"
                    " i -> concat_ws(' ', slice(split(norm_text,' '), i, 3))))"
                ).alias("g"),
            )
        )
        pairs = (
            d.alias("a")
            .crossJoin(d.alias("b"))
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
                F.size(F.array_intersect("a.g", "b.g")).alias("inter"),
                (F.size("a.g") + F.size("b.g")).alias("tot"),
            )
            .withColumn(
                "jaccard_w3",
                F.col("inter").cast("double") / (F.col("tot") - F.col("inter")).cast("double"),
            )
            .filter(F.col("jaccard_w3") >= 0.5)
        )
        return pairs.select("doc_id_a", "doc_id_b", "jaccard_w3")

    q["word_ngram_jaccard_pairs"] = word_ngram_jaccard

    # ---- text quality stats
    def doc_stats(spark, sf_dir):
        return with_text_stats(_docs(spark, sf_dir), "text").select(
            "doc_id",
            F.col("n_chars").alias("chars"),
            "n_words",
            "n_distinct_words",
            "avg_word_len",
            "stopword_ratio",
            "alpha_ratio",
        )

    q["doc_stats"] = doc_stats

    # ---- language-ID heuristic
    def lang_detect(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id", detect_lang("text").alias("lang_pred")
        )

    q["lang_detect"] = lang_detect

    # ---- token counting (regex tokens)
    def token_counts(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id",
            F.size(F.split("text", " ")).alias("ws_tokens"),
            token_count("text").alias("re_tokens"),
        )

    q["token_counts"] = token_counts

    # ---- document fingerprinting
    def fingerprints(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id", F.md5(normalize_text("text")).alias("fingerprint")
        )

    q["fingerprints"] = fingerprints

    # ---- triangular self-join pair filter (J2) per source group
    def triangular_pairs(spark, sf_dir):
        d = _docs(spark, sf_dir).select("doc_id", "source")
        return (
            d.alias("a")
            .join(d.alias("b"), "source")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy("source")
            .agg(F.count("*").alias("n_pairs"))
        )

    q["triangular_pairs"] = triangular_pairs

    # ---- ANN: brute-force cosine top-k (rank-compared; cosine rounded
    # before ranking so FP noise cannot flip ranks between engines)
    def ann_topk(spark, sf_dir):
        emb = _emb(spark, sf_dir)
        queries_df = emb.filter(F.col("vec_id") < 10)
        scored = (
            emb.select(F.col("vec_id").alias("item_id"), F.col("embedding").cast("array<double>").alias("cv"))
            .join(
                F.broadcast(
                    queries_df.select(
                        F.col("vec_id").alias("query_id"),
                        F.col("embedding").cast("array<double>").alias("qv"),
                    )
                ),
                F.col("query_id") != F.col("item_id"),
            )
            .withColumn("cos_r", F.round(cosine_expr(F.col("qv"), F.col("cv")), 9))
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(F.desc("cos_r"), F.asc("item_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "item_id", "rank", "cos_r")
        )

    q["ann_cosine_topk"] = ann_topk

    # ---- fingerprints under the v2 (aggressive / AA-profile analog)
    # normalization — the second config-selectable profile (T2)
    def fingerprints_v2(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id", F.md5(normalize_text("text", version=2)).alias("fingerprint_v2")
        )

    q["fingerprints_v2"] = fingerprints_v2

    # ---- signature-stage window bookkeeping (T3/T4 segment accounting is
    # SQL-expressible: n_windows == max(len - k + 1, 0))
    def signature_window_counts(spark, sf_dir):
        d = _normed(spark, sf_dir)
        sigs = build_signatures(d, _params(), LshPlan.plan(128, THRESHOLD, 0.995), id_col="doc_id")
        return sigs.select("doc_id", "n_windows")

    q["signature_window_counts"] = signature_window_counts

    # ---- HLL cached-cardinality accuracy gate (S4/S5 + A3/A5): the exact
    # distinct-shingle count is SQL-expressible; the sketch estimate must
    # sit within 10% of it on every document (p=12 => ~1.6% sigma, so the
    # bound is ~6 sigma; the oracle emits the constant `true`)
    def hll_cardinality_tolerance(spark, sf_dir):
        d = _normed(spark, sf_dir).where(F.length("norm_text") >= K)
        regs = add_register_sketch(
            d.select("doc_id", "norm_text"),
            SketchParams(shingle_k=K, algorithm="hll", precision=12, seed=42),
            out_col="regs",
        )
        exact = F.expr(
            f"size(array_distinct(transform(sequence(1, length(norm_text) - {K - 1}),"
            f" i -> substring(norm_text, i, {K}))))"
        )
        return regs.select(
            "doc_id",
            exact.alias("n_exact"),
            (F.abs(F.col("card_est") - exact) / exact <= 0.1).alias("within_tol"),
        )

    q["hll_cardinality_tolerance"] = hll_cardinality_tolerance

    # ---- IE-Jaccard over register sketches (U2/U3/U4 + S4/S5 cached
    # cardinalities in pair math): union = zip_with max (pure Column), both
    # side cardinalities come from the cached card_est column; the estimate
    # must land within 0.1 of the exact shingle-set IE-Jaccard on every
    # bounded pair (oracle emits the constant true + exact jaccard basis)
    def ie_jaccard_sketch_tolerance(spark, sf_dir):
        from lash_spark.estimators import hll_cardinality_expr, register_union_expr

        p = 10
        d = (
            _normed(spark, sf_dir)
            .filter((F.col("doc_id") < 60) & (F.length("norm_text") >= K))
        )
        sk = add_register_sketch(
            d.select("doc_id", "norm_text"),
            SketchParams(shingle_k=K, algorithm="hll", precision=p, seed=42),
            out_col="regs",
        ).select("doc_id", "regs", "card_est")
        pairs = (
            sk.alias("a")
            .crossJoin(sk.alias("b"))
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
                F.col("a.card_est").alias("ca"),
                F.col("b.card_est").alias("cb"),
                hll_cardinality_expr(
                    register_union_expr("a.regs", "b.regs"), p
                ).alias("cu"),
            )
        )
        j_est = F.greatest(
            F.lit(0.0), (F.col("ca") + F.col("cb") - F.col("cu")) / F.col("cu")
        )
        exact = F.expr(
            f"size(array_distinct(transform(sequence(1, length(norm_text) - {K - 1}),"
            f" i -> substring(norm_text, i, {K}))))"
        ).cast("double")
        ex = d.select("doc_id", exact.alias("n_sh"), F.col("norm_text"))
        # exact pairwise IE basis via word-free shingle intersection is what
        # the near-dup oracle already checks; here the gate is |est - exact|
        # on the same pair grid, with the exact side from DuckDB
        inter = F.size(
            F.array_intersect(
                F.expr(f"array_distinct(transform(sequence(1, length(ta) - {K - 1}), i -> substring(ta, i, {K})))"),
                F.expr(f"array_distinct(transform(sequence(1, length(tb) - {K - 1}), i -> substring(tb, i, {K})))"),
            )
        ).cast("double")
        withx = (
            pairs.join(
                ex.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("na"), F.col("norm_text").alias("ta")),
                "doc_id_a",
            )
            .join(
                ex.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("nb"), F.col("norm_text").alias("tb")),
                "doc_id_b",
            )
            .withColumn("j_exact", inter / (F.col("na") + F.col("nb") - inter))
            .withColumn("within_tol", F.abs(j_est - F.col("j_exact")) <= 0.1)
        )
        return withx.select("doc_id_a", "doc_id_b", F.round("j_exact", 6).alias("j_exact"), "within_tol")

    q["ie_jaccard_sketch_tolerance"] = ie_jaccard_sketch_tolerance

    # ---- ULL twin of the gate above (A4/U2/A5): registers carry Ertl's
    # (q<<2)|d1|d0 layout, card_est comes from the closed-form FGRA batch
    # estimator (the reference's `-e fgra` default, main.rs:143-151), the
    # union is the EXACT d-bit Column merge (ull_union_expr — not the
    # lossy greatest()), and the union cardinality is the FGRA Column
    # expression, so the whole ULL pair phase is JVM-side codegen
    def ull_ie_jaccard_tolerance(spark, sf_dir):
        from lash_spark.estimators import ull_cardinality_fgra_expr, ull_union_expr

        p = 10
        d = (
            _normed(spark, sf_dir)
            .filter((F.col("doc_id") < 60) & (F.length("norm_text") >= K))
        )
        sk = add_register_sketch(
            d.select("doc_id", "norm_text"),
            SketchParams(
                shingle_k=K, algorithm="ull", precision=p, seed=42, estimator="fgra"
            ),
            out_col="regs",
        ).select("doc_id", "regs", "card_est")
        pairs = (
            sk.alias("a")
            .crossJoin(sk.alias("b"))
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
                F.col("a.card_est").alias("ca"),
                F.col("b.card_est").alias("cb"),
                ull_cardinality_fgra_expr(
                    ull_union_expr("a.regs", "b.regs"), p
                ).alias("cu"),
            )
        )
        j_est = F.greatest(
            F.lit(0.0), (F.col("ca") + F.col("cb") - F.col("cu")) / F.col("cu")
        )
        exact_sh = F.expr(
            f"array_distinct(transform(sequence(1, length(norm_text) - {K - 1}),"
            f" i -> substring(norm_text, i, {K})))"
        )
        ex = d.select("doc_id", exact_sh.alias("sh"))
        inter = F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("double")
        withx = (
            pairs.join(
                ex.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sa")),
                "doc_id_a",
            )
            .join(
                ex.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sb")),
                "doc_id_b",
            )
            .withColumn(
                "j_exact",
                inter / (F.size("sa") + F.size("sb") - inter),
            )
            .withColumn("within_tol", F.abs(j_est - F.col("j_exact")) <= 0.1)
        )
        return withx.select(
            "doc_id_a", "doc_id_b", F.round("j_exact", 6).alias("j_exact"), "within_tol"
        )

    q["ull_ie_jaccard_tolerance"] = ull_ie_jaccard_tolerance

    # ---- two-dataset query x reference pair mode (the reference's primary
    # `dist` use case, main.rs:353-401): band cross-join + exact verify
    def cross_dataset(spark, sf_dir):
        from lash_spark.pipeline import cross_dataset_pairs

        docs = _docs(spark, sf_dir)
        dq = docs.filter(F.col("doc_id") % 7 == 3)
        dr = docs.filter(F.col("doc_id") % 3 == 0)
        return cross_dataset_pairs(
            dq, dr, _params(), id_col="doc_id", text_col="text", threshold=THRESHOLD
        ).select("doc_id_q", "doc_id_r", "jaccard")

    q["cross_dataset_pairs"] = cross_dataset

    # ---- C4-style quality filter flags (pre-dedup hygiene pass)
    def quality_filter_flags(spark, sf_dir):
        from lash_spark.operators.textstats import quality_flags

        flags = quality_flags("text")
        keep = F.lit(True)
        for c in flags.values():
            keep = keep & ~c
        return _docs(spark, sf_dir).select(
            "doc_id",
            flags["too_short"].alias("too_short"),
            flags["odd_word_len"].alias("odd_word_len"),
            flags["low_alpha"].alias("low_alpha"),
            flags["no_stopwords"].alias("no_stopwords"),
            keep.alias("keep"),
        )

    q["quality_filter_flags"] = quality_filter_flags

    # ---- IVF ANN (the inverted-file scale path): with n_probe == n_lists
    # every cell is probed, so the result is exactly brute-force top-k —
    # the oracle checks the whole KMeans-assign/probe/join plumbing
    def ivf_topk_query(spark, sf_dir):
        from lash_spark.operators.ann import ivf_topk

        emb = _emb(spark, sf_dir)
        return ivf_topk(
            emb,
            emb.filter(F.col("vec_id") < 10),
            k=5,
            n_lists=8,
            n_probe=8,
            cosine_round=9,
        ).select("query_id", "item_id", "rank", F.col("cosine").alias("cos_r"))

    q["ivf_cosine_topk"] = ivf_topk_query

    # ---- multimodal plumbing: binary payload -> mapInPandas byte-histogram
    # features. Components are exact integer counts (normalize=False), so
    # the DuckDB oracle reproduces them with zero FP risk.
    def media_features(spark, sf_dir):
        from lash_spark.operators.multimodal import extract_features

        media = _docs(spark, sf_dir).select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.lit("image").alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
            F.lit("text/fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        )
        feats = extract_features(media, dim=16, normalize=False)
        return feats.select(
            F.col("media_id").cast("long").alias("doc_id"),
            "n_bytes",
            F.col("feature")[0].cast("long").alias("h0"),
            F.col("feature")[7].cast("long").alias("h7"),
            F.col("feature")[15].cast("long").alias("h15"),
        )

    q["media_features"] = media_features

    # ---- non-SQL-expressible (rows-only checks) --------------------------
    # array columns are digested to scalars (md5 of the JSON form): the
    # driver's canonicalizer factorizes each column and cannot hash lists
    def minhash_signatures(spark, sf_dir):
        d = _normed(spark, sf_dir)
        sigs = build_signatures(d, _params(), LshPlan.plan(128, THRESHOLD, 0.995), id_col="doc_id")
        return sigs.select(
            "doc_id",
            "n_windows",
            F.md5(F.to_json("minhash")).alias("sig_digest"),
            F.md5(F.to_json("bands")).alias("bands_digest"),
        )

    q["minhash_signatures"] = minhash_signatures

    def lsh_candidates(spark, sf_dir):
        d = _normed(spark, sf_dir)
        sigs = build_signatures(d, _params(), LshPlan.plan(128, THRESHOLD, 0.995), id_col="doc_id")
        return lsh_candidate_pairs(sigs, id_col="doc_id")

    q["lsh_candidates"] = lsh_candidates

    def simhash_hamming_pairs(spark, sf_dir):
        from lash_spark.operators.lsh import simhash_candidate_pairs

        d = _normed(spark, sf_dir)
        sigs = build_signatures(d, _params(), LshPlan.plan(128, THRESHOLD, 0.995), id_col="doc_id")
        return simhash_candidate_pairs(sigs, id_col="doc_id", chunks=4, max_hamming=3)

    q["simhash_hamming_pairs"] = simhash_hamming_pairs

    def hll_register_sketches(spark, sf_dir):
        d = _normed(spark, sf_dir)
        return add_register_sketch(
            d.select("doc_id", "norm_text"), SketchParams(algorithm="hll"), out_col="regs"
        ).select(
            "doc_id",
            F.md5(F.to_json("regs")).alias("regs_digest"),
            F.round("card_est", 3).alias("card_est"),
        )

    q["hll_register_sketches"] = hll_register_sketches

    # ---- exact-substring pass (O5): pairs sharing a >=64-char substring.
    # SQL-expressible: any shared substring of length >= L contains a shared
    # length-L window, so the DuckDB window equi-join is an exact oracle.
    def substring_pairs(spark, sf_dir):
        return exact_substring_pairs(
            _normed(spark, sf_dir), min_len=64, k=32, id_col="doc_id"
        )

    q["substring_dup_pairs"] = substring_pairs

    # same truth set via the distributed suffix-array pass (prefix-doubling
    # ranks at depth 64; byte-exact, no hashes) — the north_star's named
    # second engine for exact substring duplication
    def substring_pairs_sa_q(spark, sf_dir):
        from lash_spark.operators.suffixarray import substring_pairs_sa

        return substring_pairs_sa(_normed(spark, sf_dir), min_len=64, id_col="doc_id")

    q["substring_dup_pairs_sa"] = substring_pairs_sa_q

    # bounded `candidates=` mode — the web-scale shape SURVEY O5
    # prescribes: the corpus-wide suffix sort is restricted (left_semi) to
    # members of verified near-dup pairs, so the SA pass cost scales with
    # the duplicate-suspect set, not the corpus. Same window-join oracle,
    # restricted to the same member set.
    def substring_sa_bounded(spark, sf_dir):
        from lash_spark.operators.suffixarray import substring_pairs_sa

        d = _normed(spark, sf_dir)
        dup = q["near_dup_pairs"](spark, sf_dir)
        members = (
            dup.select(F.col("doc_id_a").alias("doc_id"))
            .unionByName(dup.select(F.col("doc_id_b").alias("doc_id")))
            .distinct()
        )
        return substring_pairs_sa(d, min_len=64, id_col="doc_id", candidates=members)

    q["substring_sa_bounded"] = substring_sa_bounded

    # ---- train/eval decontamination: eval docs (doc_id % 5 == 1) sharing
    # an exact >=64-char substring with any train doc (doc_id % 2 == 0) —
    # role-ordered; a doc in both subsets pairs with itself (that IS
    # contamination). Winnow-fingerprint cross equi-join + window-set
    # verify; oracle is the window equi-join across the two subsets.
    def decontamination_pairs(spark, sf_dir):
        from lash_spark.operators.substring import cross_substring_overlap

        d = _normed(spark, sf_dir)
        return cross_substring_overlap(
            d.filter(F.col("doc_id") % 5 == 1),
            d.filter(F.col("doc_id") % 2 == 0),
            min_len=64,
            k=32,
            id_col="doc_id",
        )

    q["decontamination_pairs"] = decontamination_pairs

    # ---- Gopher/MassiveText repetition signals (word-2-gram family):
    # per-doc mode computed WITHOUT a shuffle (sort_array + aggregate fold)
    def repetition_stats_q(spark, sf_dir):
        from lash_spark.operators.textstats import repetition_stats

        return repetition_stats(_normed(spark, sf_dir), "norm_text").select(
            "doc_id",
            "n_2grams",
            "dup_2gram_frac",
            "top_2gram",
            "top_2gram_count",
            "top_2gram_char_frac",
        )

    q["repetition_stats"] = repetition_stats_q

    # ---- most-duplicated exact windows (maximal-repeat-style analysis on
    # the suffix machinery): every 64-char window in >= 2 distinct docs,
    # top 20 by (n_docs, n_occ, window) — a total order, so the LIMIT set
    # is deterministic and oracle-comparable
    def repeated_window_counts(spark, sf_dir):
        from lash_spark.operators.suffixarray import repeated_windows

        return repeated_windows(
            _normed(spark, sf_dir), window=64, id_col="doc_id", top_n=20
        )

    q["repeated_window_counts"] = repeated_window_counts

    # bounded twin (VERDICT r3 #5): the same span analysis restricted to
    # near-dup-pair members — the 100-TB-safe mode (per-position explode
    # only over candidate text; counts over the restricted set)
    def repeated_window_counts_bounded(spark, sf_dir):
        from lash_spark.operators.suffixarray import repeated_windows

        dup = q["near_dup_pairs"](spark, sf_dir)
        members = (
            dup.select(F.col("doc_id_a").alias("doc_id"))
            .unionByName(dup.select(F.col("doc_id_b").alias("doc_id")))
            .distinct()
        )
        return repeated_windows(
            _normed(spark, sf_dir), window=64, id_col="doc_id", top_n=20,
            candidates=members,
        )

    q["repeated_window_counts_bounded"] = repeated_window_counts_bounded

    # ---- dedup yield analysis: cluster-size histogram over the verified
    # near-dup clusters (how much mass dedup removes at each multiplicity)
    def cluster_size_histogram(spark, sf_dir):
        cl = q["near_dup_clusters"](spark, sf_dir)
        return (
            cl.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("cluster_size"))
            .groupBy("cluster_size")
            .agg(F.count(F.lit(1)).alias("n_clusters"))
        )

    q["cluster_size_histogram"] = cluster_size_histogram

    # ---- Gopher-family CORPUS-level signal (complements the within-doc
    # repetition_stats): fraction of each doc's distinct word-5-grams that
    # occur in at least one other document
    def cross_doc_ngram_dup(spark, sf_dir):
        from lash_spark.operators.textstats import cross_doc_ngram_dup_stats

        return cross_doc_ngram_dup_stats(
            _normed(spark, sf_dir), "norm_text", n=5, id_col="doc_id"
        )

    q["cross_doc_ngram_dup"] = cross_doc_ngram_dup

    # ---- true lexicographic suffix order (the SA operator itself, not
    # just its pair-detection use): dense corpus-global rank of every
    # depth-32-truncated suffix over a 50-doc subset. Oracle: DuckDB
    # dense_rank() over the substr-truncated suffixes — shorter suffixes
    # sort before longer ones sharing a prefix in both engines.
    def suffix_rank_order(spark, sf_dir):
        from lash_spark.operators.suffixarray import suffix_ranks

        d = _normed(spark, sf_dir).filter(F.col("doc_id") < 50)
        return suffix_ranks(d, 32, id_col="doc_id", text_col="norm_text")

    q["suffix_rank_order"] = suffix_rank_order

    # maximal common-substring length per verified pair; oracled via the
    # all-lengths window-set intersection (L >= 64 only — the pair set
    # guarantees a shared 64-window, so the max is >= 64)
    def substring_lens(spark, sf_dir):
        from lash_spark.operators.substring import common_substring_lengths

        d = _normed(spark, sf_dir)
        pairs = exact_substring_pairs(d, min_len=64, k=32, id_col="doc_id")
        return common_substring_lengths(pairs, d, min_len=64, id_col="doc_id")

    q["substring_common_len"] = substring_lens

    # ---- embedding near-dup pairs: the corpus is augmented with 50
    # deterministic near-duplicate vectors (vec_id+100000, first coordinate
    # shifted by +0.01 => cosine ~0.99995), built identically in the oracle,
    # so the SRP banded candidate generator is tested against a NON-EMPTY
    # truth set (round-1 version passed vacuously at threshold 0.95).
    def embedding_near_dups(spark, sf_dir):
        emb = _emb(spark, sf_dir).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        planted = emb.filter(F.col("vec_id") < 50).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.concat(
                F.array(F.col("v")[0] + F.lit(0.01)), F.slice("v", 2, 63)
            ).alias("v"),
        )
        allv = emb.unionByName(planted)
        out = embedding_near_dup_pairs(
            allv, dim=64, cosine_threshold=0.99, n_planes=12, n_tables=6, vec_col="v"
        )
        # cosine rounded to 3dp: the planted pairs sit at ~0.99995, far from
        # any 3dp boundary, so engine/oracle FP summation order cannot flip it
        return out.select(
            "vec_id_a", "vec_id_b", F.round("cosine", 3).alias("cos_r")
        )

    q["embedding_near_dups"] = embedding_near_dups

    # ---- crawl-side URL canonicalization + latest-fetch dedup (the stage
    # upstream of content dedup; reference has no URL layer — north-rule
    # input_hint columns url/warc_ts). The testdata has no url column, so
    # a deterministic synthetic crawl log is derived from doc_id INSIDE
    # the query (the media_features trick): per doc, two url variants that
    # canonicalize equal (host case, default port, tracking params,
    # trailing slash), one distinct query-param page (params sorted, not
    # dropped), and one malformed url that must fall back to itself. The
    # oracle constructs the expected winners from the same arithmetic.
    def url_dedup(spark, sf_dir):
        from lash_spark.operators.normalize import url_dedup_latest

        d = _docs(spark, sf_dir).select("doc_id")
        host = F.concat(
            F.lit("site"), (F.col("doc_id") % 50).cast("string"), F.lit(".example")
        )
        path = F.concat(F.lit("/p/"), F.col("doc_id").cast("string"))
        ts = F.col("doc_id") * 10
        fetches = d.select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(
                        F.concat(F.lit("https://"), host, path).alias("url"),
                        (ts + 1).alias("fetch_ts"),
                    ),
                    F.struct(
                        F.concat(
                            F.lit("https://"), F.upper(host), F.lit(":443"),
                            path, F.lit("/?utm_source=x&gclid=1"),
                        ).alias("url"),
                        (ts + 2).alias("fetch_ts"),
                    ),
                    F.struct(
                        F.concat(
                            F.lit("https://"), host, path, F.lit("?b=2&a=1")
                        ).alias("url"),
                        (ts + 3).alias("fetch_ts"),
                    ),
                    F.struct(
                        F.concat(F.lit("p/"), F.col("doc_id").cast("string")).alias("url"),
                        (ts + 4).alias("fetch_ts"),
                    ),
                )
            ).alias("f"),
        ).select("doc_id", "f.url", "f.fetch_ts")
        return url_dedup_latest(fetches, url_col="url", ts_col="fetch_ts")

    q["url_dedup_latest"] = url_dedup

    return q


# --------------------------------------------------------------------------
# oracle SQL (DuckDB)
# --------------------------------------------------------------------------

_SHINGLE_PAIRS_CTE = f"""
WITH normed AS (
  SELECT doc_id, {_NORM_SQL} AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, substr(t, i.i, {K}) AS s
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t) - {K - 1})) AS i) i
  WHERE len(t) >= {K}
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jacc AS (
  SELECT da AS doc_id_a, db AS doc_id_b,
         c * 1.0 / (sa.n + sb.n - c) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = da
  JOIN sizes sb ON sb.doc_id = db
),
dup AS (SELECT * FROM jacc WHERE jaccard >= {THRESHOLD})
"""

_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    # PARITY NOTE (conditional, by design): the engine shingles UTF-8 BYTES
    # (hashing.py) while substr() shingles CHARACTERS, and the LSH plan +
    # estimate prefilter are probabilistic generators. Hash-identity vs the
    # exact all-pairs oracle therefore holds because (a) the test corpus is
    # pure ASCII (bytes == chars) and (b) the planted pairs sit far from the
    # LSH miss region (plan recall 0.995 at J=0.8; observed recall 1.0, see
    # tests/test_pipeline.py). On non-ASCII corpora compare recall, not row
    # sets.
    o["near_dup_pairs"] = _SHINGLE_PAIRS_CTE + "SELECT doc_id_a, doc_id_b, jaccard FROM dup"

    o["near_dup_clusters"] = (
        _SHINGLE_PAIRS_CTE.replace("WITH normed", "WITH RECURSIVE normed", 1)
        + """,
edges AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM dup
  UNION ALL
  SELECT doc_id_b AS src, doc_id_a AS dst FROM dup
),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT e.dst AS node, r.r
  FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
"""
    )

    o["distance_formulas"] = (
        _SHINGLE_PAIRS_CTE
        + f"""
SELECT doc_id_a, doc_id_b,
       round(jaccard, 6) AS jaccard_r,
       round(2 * jaccard / (1 + jaccard), 6) + 0.0 AS frac,
       round(least(1.0, -ln(2 * jaccard / (1 + jaccard)) / {K}), 6) + 0.0 AS d_poisson,
       round(1.0 - pow(2 * jaccard / (1 + jaccard), 1.0 / {K}), 6) + 0.0 AS d_binomial
FROM dup
"""
    )

    o["exact_dedup_groups"] = f"""
SELECT md5({_NORM_SQL}) AS content_md5,
       count(*) AS group_size,
       min(doc_id) AS rep
FROM documents GROUP BY 1
"""

    o["shingle_counts"] = f"""
WITH normed AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
sh AS (
  SELECT doc_id, substr(t, i.i, {K}) AS s
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t) - {K - 1})) AS i) i
  WHERE len(t) >= {K}
)
SELECT doc_id, count(DISTINCT s) AS n_shingles FROM sh GROUP BY doc_id
"""

    o["ie_jaccard_containment"] = f"""
WITH d AS (
  SELECT doc_id, list_distinct(string_split({_NORM_SQL}, ' ')) AS w
  FROM documents WHERE doc_id < 60
),
p AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         len(a.w)::DOUBLE AS card_a, len(b.w)::DOUBLE AS card_b,
         len(list_distinct(list_concat(a.w, b.w)))::DOUBLE AS card_u
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT doc_id_a, doc_id_b, card_a, card_b, card_u,
       greatest(0.0, (card_a + card_b - card_u) / card_u) AS jaccard_ie,
       greatest(0.0, (card_a + card_b - card_u) / card_a) AS containment_a
FROM p
"""

    o["word_ngram_jaccard_pairs"] = f"""
WITH w AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
  WHERE doc_id < 150 AND len(string_split({_NORM_SQL}, ' ')) >= 3
),
g AS (
  SELECT DISTINCT doc_id, array_to_string(w[i.i:i.i+2], ' ') AS s
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) i
),
sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da AS doc_id_a, db AS doc_id_b,
       c * 1.0 / (sa.n + sb.n - c) AS jaccard_w3
FROM inter
JOIN sizes sa ON sa.doc_id = da
JOIN sizes sb ON sb.doc_id = db
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
"""

    o["doc_stats"] = f"""
SELECT doc_id,
       len(text) AS chars,
       len(string_split(text, ' ')) AS n_words,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
       len(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')) AS avg_word_len,
       len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_IN})))::DOUBLE
         / len(string_split(text, ' ')) AS stopword_ratio,
       len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / len(text) AS alpha_ratio
FROM documents
"""

    lang_scores = {
        "en": ("the", "and", "of", "to", "is"),
        "de": ("der", "die", "und", "nicht", "ist"),
        "fr": ("le", "la", "et", "les", "est"),
        "es": ("el", "los", "que", "es", "una"),
    }
    score_cols = ",\n       ".join(
        f"len(list_filter(list_distinct(string_split(lower(text), ' ')), "
        f"x -> x IN ({', '.join(repr(m) for m in ms)}))) AS s_{lang}"
        for lang, ms in lang_scores.items()
    )
    o["lang_detect"] = f"""
WITH s AS (
  SELECT doc_id,
       {score_cols}
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM s
"""

    o["token_counts"] = """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS re_tokens
FROM documents
"""

    o["fingerprints"] = f"""
SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents
"""

    o["triangular_pairs"] = """
SELECT a.source AS source, count(*) AS n_pairs
FROM documents a JOIN documents b
  ON a.source = b.source AND a.doc_id < b.doc_id
GROUP BY 1
"""

    o["ann_cosine_topk"] = """
WITH scored AS (
  SELECT q.vec_id AS query_id, t.vec_id AS item_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], t.embedding::DOUBLE[]), 9) AS cos_r
  FROM embeddings q JOIN embeddings t ON q.vec_id < 10 AND t.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, item_id, cos_r,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, item_id ASC) AS rank
  FROM scored
)
SELECT query_id, item_id, rank, cos_r FROM ranked WHERE rank <= 5
"""

    o["fingerprints_v2"] = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint_v2
FROM documents
"""

    o["signature_window_counts"] = f"""
WITH normed AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents)
SELECT doc_id, greatest(len(t) - {K - 1}, 0) AS n_windows
FROM normed WHERE len(t) >= 1
"""

    # exact distinct-shingle count is computable in SQL; the engine's HLL
    # estimate must land within the tolerance on every row, so the oracle's
    # within_tol is the constant true (a statistical accuracy gate)
    o["hll_cardinality_tolerance"] = f"""
WITH normed AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
sh AS (
  SELECT doc_id, substr(t, i.i, {K}) AS s
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t) - {K - 1})) AS i) i
  WHERE len(t) >= {K}
)
SELECT doc_id, count(DISTINCT s) AS n_exact, true AS within_tol
FROM sh GROUP BY doc_id
"""

    o["ie_jaccard_sketch_tolerance"] = f"""
WITH normed AS (
  SELECT doc_id, {_NORM_SQL} AS t FROM documents
  WHERE doc_id < 60 AND len({_NORM_SQL}) >= {K}
),
sh AS (
  SELECT DISTINCT doc_id, substr(t, i.i, {K}) AS s
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t) - {K - 1})) AS i) i
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
grid AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, a.n AS na, b.n AS nb
  FROM sizes a JOIN sizes b ON a.doc_id < b.doc_id
),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT g.doc_id_a, g.doc_id_b,
       round(coalesce(i.c, 0) * 1.0 / (g.na + g.nb - coalesce(i.c, 0)), 6) AS j_exact,
       true AS within_tol
FROM grid g LEFT JOIN inter i ON i.da = g.doc_id_a AND i.db = g.doc_id_b
"""

    # ULL twin runs the same doc subset through FGRA cardinalities + the
    # exact d-bit Column union; the exact-jaccard basis and the constant
    # within_tol gate are identical, so the oracle SQL is shared
    o["ull_ie_jaccard_tolerance"] = o["ie_jaccard_sketch_tolerance"]

    o["cross_dataset_pairs"] = f"""
WITH normed AS (
  SELECT doc_id, {_NORM_SQL} AS t FROM documents
  WHERE doc_id % 7 = 3 OR doc_id % 3 = 0
),
sh AS (
  SELECT DISTINCT doc_id, substr(t, i.i, {K}) AS s
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t) - {K - 1})) AS i) i
  WHERE len(t) >= {K}
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS dq, b.doc_id AS dr, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 7 = 3 AND b.doc_id % 3 = 0
  GROUP BY 1, 2
)
SELECT dq AS doc_id_q, dr AS doc_id_r,
       c * 1.0 / (sa.n + sb.n - c) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = dq
JOIN sizes sb ON sb.doc_id = dr
WHERE c * 1.0 / (sa.n + sb.n - c) >= {THRESHOLD}
"""

    o["substring_dup_pairs"] = f"""
WITH normed AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
w AS (
  SELECT DISTINCT doc_id, substr(t, i.i, 64) AS s
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t) - 63)) AS i) i
  WHERE len(t) >= 64
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

    # identical truth set; the SA engine is byte-exact so this parity is
    # unconditional (no hash-collision caveat)
    o["substring_dup_pairs_sa"] = o["substring_dup_pairs"]

    o["cluster_size_histogram"] = (
        _SHINGLE_PAIRS_CTE.replace("WITH normed", "WITH RECURSIVE normed", 1)
        + """,
edges AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM dup
  UNION ALL
  SELECT doc_id_b AS src, doc_id_a AS dst FROM dup
),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT e.dst AS node, r.r
  FROM reach r JOIN edges e ON e.src = r.node
),
labels AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
csizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
SELECT cluster_size, count(*) AS n_clusters FROM csizes GROUP BY cluster_size
"""
    )

    o["cross_doc_ngram_dup"] = f"""
WITH normed AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM normed),
g AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ws, i.i, i.i + 4), ' ') AS gram
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 4)) AS i) i
  WHERE len(ws) >= 5
),
gd AS (SELECT gram, count(DISTINCT doc_id) AS n_docs FROM g GROUP BY gram)
SELECT g.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
       round(sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_frac
FROM g JOIN gd USING (gram)
GROUP BY g.doc_id
"""

    o["suffix_rank_order"] = f"""
WITH normed AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents WHERE doc_id < 50),
s AS (
  SELECT doc_id, i.i AS pos, substr(t, i.i, 32) AS suf
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) i
  WHERE len(t) >= 1
)
SELECT doc_id, pos, dense_rank() OVER (ORDER BY suf) - 1 AS sa_rank FROM s
"""

    o["repeated_window_counts"] = f"""
WITH normed AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
w AS (
  SELECT doc_id, substr(t, i.i, 64) AS s
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t) - 63)) AS i) i
  WHERE len(t) >= 64
)
SELECT s AS window, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
FROM w GROUP BY s HAVING count(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occ DESC, s ASC
LIMIT 20
"""

    o["repeated_window_counts_bounded"] = _SHINGLE_PAIRS_CTE + """,
members AS (
  SELECT doc_id_a AS doc_id FROM dup UNION SELECT doc_id_b FROM dup
),
w AS (
  SELECT n.doc_id, substr(n.t, i.i, 64) AS s
  FROM normed n JOIN members m ON m.doc_id = n.doc_id,
       LATERAL (SELECT unnest(generate_series(1, len(n.t) - 63)) AS i) i
  WHERE len(n.t) >= 64
)
SELECT s AS window, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
FROM w GROUP BY s HAVING count(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occ DESC, s ASC
LIMIT 20
"""

    o["decontamination_pairs"] = f"""
WITH normed AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
wq AS (
  SELECT DISTINCT doc_id, substr(t, i.i, 64) AS s
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t) - 63)) AS i) i
  WHERE len(t) >= 64 AND doc_id % 5 = 1
),
wr AS (
  SELECT DISTINCT doc_id, substr(t, i.i, 64) AS s
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t) - 63)) AS i) i
  WHERE len(t) >= 64 AND doc_id % 2 = 0
)
SELECT q.doc_id AS doc_id_q, r.doc_id AS doc_id_r
FROM wq q JOIN wr r ON q.s = r.s
GROUP BY 1, 2
"""

    o["repetition_stats"] = f"""
WITH normed AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
g AS (
  SELECT doc_id, t,
         CASE WHEN len(string_split(t, ' ')) >= 2 THEN
           list_transform(generate_series(1, len(string_split(t, ' ')) - 1),
                          i -> string_split(t, ' ')[i] || ' ' || string_split(t, ' ')[i + 1])
         ELSE []::VARCHAR[] END AS gs
  FROM normed
),
flat AS (SELECT doc_id, unnest(gs) AS gram FROM g),
cnts AS (SELECT doc_id, gram, count(*) AS c FROM flat GROUP BY 1, 2),
top AS (
  SELECT doc_id, gram, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram DESC) AS rn
  FROM cnts
)
SELECT g.doc_id,
       len(gs) AS n_2grams,
       round(CASE WHEN len(gs) > 0
             THEN (len(gs) - len(list_distinct(gs))) * 1.0 / len(gs)
             ELSE 0 END, 6) AS dup_2gram_frac,
       coalesce(t.gram, '') AS top_2gram,
       coalesce(t.c, 0) AS top_2gram_count,
       round(CASE WHEN len(gs) > 0
             THEN coalesce(t.c, 0) * len(coalesce(t.gram, '')) * 1.0 / len(g.t)
             ELSE 0 END, 6) AS top_2gram_char_frac
FROM g LEFT JOIN top t ON t.doc_id = g.doc_id AND t.rn = 1
"""

    # bounded mode: same window join restricted to near-dup pair members
    o["substring_sa_bounded"] = _SHINGLE_PAIRS_CTE + """,
members AS (
  SELECT doc_id_a AS doc_id FROM dup UNION SELECT doc_id_b FROM dup
),
w AS (
  SELECT DISTINCT n.doc_id, substr(n.t, i.i, 64) AS s
  FROM normed n JOIN members m ON m.doc_id = n.doc_id,
       LATERAL (SELECT unnest(generate_series(1, len(n.t) - 63)) AS i) i
  WHERE len(n.t) >= 64
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

    o["quality_filter_flags"] = f"""
WITH s AS (
  SELECT doc_id,
         len(string_split(text, ' '))::DOUBLE AS n_words,
         len(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')) AS avg_wl,
         len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / len(text) AS alpha,
         len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_IN}))) AS stop_hits
  FROM documents
)
SELECT doc_id,
       n_words < 10 AS too_short,
       (avg_wl < 2.0 OR avg_wl > 12.0) AS odd_word_len,
       alpha < 0.6 AS low_alpha,
       stop_hits = 0 AS no_stopwords,
       NOT (n_words < 10 OR avg_wl < 2.0 OR avg_wl > 12.0 OR alpha < 0.6 OR stop_hits = 0)
         AS keep
FROM s
"""

    # IVF with n_probe == n_lists == exact brute force (same truth set and
    # round-before-rank discipline as ann_cosine_topk)
    o["ivf_cosine_topk"] = """
WITH scored AS (
  SELECT q.vec_id AS query_id, t.vec_id AS item_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], t.embedding::DOUBLE[]), 9) AS cos_r
  FROM embeddings q JOIN embeddings t ON q.vec_id < 10 AND t.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, item_id, cos_r,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, item_id ASC) AS rank
  FROM scored
)
SELECT query_id, item_id, rank, cos_r FROM ranked WHERE rank <= 5
"""

    # byte-histogram features over the UTF-8 payload; unicode(c) == byte on
    # the ASCII corpus (documented corpus assumption, same as shingling)
    o["media_features"] = """
WITH chars AS (
  SELECT doc_id, len(text) AS n_bytes, unicode(substr(text, i.i, 1)) % 16 AS b
  FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text))) AS i) i
),
hist AS (
  SELECT doc_id, any_value(n_bytes) AS n_bytes,
         count(*) FILTER (b = 0) AS h0,
         count(*) FILTER (b = 7) AS h7,
         count(*) FILTER (b = 15) AS h15
  FROM chars GROUP BY doc_id
)
SELECT doc_id, n_bytes, h0, h7, h15 FROM hist
"""

    # the corpus + 50 planted near-dup vectors (same derivation as the
    # engine side: vec_id+100000, v[0] += 0.01), brute-force cosine truth
    o["embedding_near_dups"] = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planted AS (
  SELECT vec_id + 100000 AS vec_id, list_prepend(v[1] + 0.01, v[2:]) AS v
  FROM base WHERE vec_id < 50
),
allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       round(list_cosine_similarity(a.v, b.v), 3) AS cos_r
FROM allv a JOIN allv b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.99
"""

    # maximal common-substring length: for each oracled pair, the greatest
    # L whose length-L window sets intersect (O(len^2) substrings per pair
    # member, restricted to L >= 64 — fine at oracle scale; the ENGINE
    # computes it with seed-and-extend, not this quadratic form). Byte ==
    # char on the ASCII corpus (the engine extends byte-wise).
    o["substring_common_len"] = f"""
WITH normed AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
w AS (
  SELECT DISTINCT doc_id, substr(t, i.i, 64) AS s
  FROM normed, LATERAL (SELECT unnest(generate_series(1, len(t) - 63)) AS i) i
  WHERE len(t) >= 64
),
p AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
members AS (SELECT da AS doc_id FROM p UNION SELECT db FROM p),
mt AS (SELECT n.doc_id, n.t FROM normed n JOIN members USING (doc_id)),
subs AS (
  SELECT DISTINCT doc_id, l.l AS L, substr(t, i.i, l.l) AS s
  FROM mt,
       LATERAL (SELECT unnest(generate_series(64, len(t))) AS l) l,
       LATERAL (SELECT unnest(generate_series(1, len(t) - l.l + 1)) AS i) i
)
SELECT p.da AS doc_id_a, p.db AS doc_id_b, max(sa.L) AS common_len
FROM p
JOIN subs sa ON sa.doc_id = p.da
JOIN subs sb ON sb.doc_id = p.db AND sb.L = sa.L AND sb.s = sa.s
GROUP BY 1, 2
"""

    # url_dedup_latest: the synthetic crawl log is derived from doc_id, so
    # the oracle constructs the expected winner rows directly — per doc:
    # the canonical page won by its latest fetch (the uppercase-host /
    # :443 / tracking-param / trailing-slash variant, ts+2), the distinct
    # query-param page (params sorted, ts+3), and the malformed url that
    # falls back to itself (ts+4)
    o["url_dedup_latest"] = """
SELECT 'https://site' || (doc_id % 50) || '.example/p/' || doc_id AS canonical_url,
       doc_id,
       'https://SITE' || (doc_id % 50) || '.EXAMPLE:443/p/' || doc_id
         || '/?utm_source=x&gclid=1' AS url,
       doc_id * 10 + 2 AS fetch_ts
FROM documents
UNION ALL
SELECT 'https://site' || (doc_id % 50) || '.example/p/' || doc_id || '?a=1&b=2',
       doc_id,
       'https://site' || (doc_id % 50) || '.example/p/' || doc_id || '?b=2&a=1',
       doc_id * 10 + 3
FROM documents
UNION ALL
SELECT 'p/' || doc_id, doc_id, 'p/' || doc_id, doc_id * 10 + 4
FROM documents
"""

    # minhash_signatures / lsh_candidates / simhash_hamming_pairs /
    # hll_register_sketches:
    # non-SQL-expressible (register contents / LSH bucketing) —
    # intentionally omitted -> driver records rows-only checks; their
    # semantics are covered by tests/ (unit + property + brute-force
    # recall / engine self-parity).
    return o
