"""Presentation sinks mirroring the reference's output formats.

K4: TSV with header ``Reference\\tQuery\\tDistance`` and %.6f values
(``/root/reference/src/main.rs:405,411,458-460``). K5: lower-triangular
matrix (``main.rs:439-447,461-466``) — a small-scale presentation detail
(pivot), not part of the scale pipeline. The parquet/Iceberg pairs table is
the real artifact; these exist so a reference user can keep their
downstream tooling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distance_tsv_df(
    pairs: DataFrame, id_a: str = "url_a", id_b: str = "url_b", dist: str = "distance"
) -> DataFrame:
    """(Reference, Query, Distance) with %.6f-formatted distance — column
    names and fixed-point format match the reference TSV (main.rs:411,459).
    """
    return pairs.select(
        F.col(id_a).alias("Reference"),
        F.col(id_b).alias("Query"),
        F.format_number(F.col(dist), 6).alias("Distance"),
    )


def write_distance_tsv(
    pairs: DataFrame,
    path: str,
    id_a: str = "url_a",
    id_b: str = "url_b",
    dist: str = "distance",
) -> None:
    """Distributed TSV sink (one part per partition; no driver mutex — the
    reference serializes through Arc<Mutex<File>>, main.rs:405)."""
    (
        distance_tsv_df(pairs, id_a, id_b, dist)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )


def triangular_matrix(
    pairs: DataFrame, id_a: str = "url_a", id_b: str = "url_b", dist: str = "distance"
) -> DataFrame:
    """Lower-triangular distance matrix via pivot (small-scale only: the
    column count equals the number of distinct ids). Missing pairs are null;
    the self-distance diagonal is 0 (J3, main.rs:452-454)."""
    ids = (
        pairs.select(F.col(id_a).alias("id"))
        .unionByName(pairs.select(F.col(id_b).alias("id")))
        .distinct()
    )
    sym = (
        pairs.select(F.col(id_a).alias("r"), F.col(id_b).alias("q"), F.col(dist).alias("d"))
        .unionByName(
            pairs.select(F.col(id_b).alias("r"), F.col(id_a).alias("q"), F.col(dist).alias("d"))
        )
        .unionByName(ids.select(F.col("id").alias("r"), F.col("id").alias("q"), F.lit(0.0).alias("d")))
    )
    # keep lower triangle (r >= q) to match the reference's row-major emit
    return (
        sym.where(F.col("r") >= F.col("q"))
        .groupBy("r")
        .pivot("q")
        .agg(F.first("d"))
        .orderBy("r")
    )
