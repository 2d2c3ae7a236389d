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


def write_distance_matrix_file(
    pairs: DataFrame,
    ids_r: "list[str]",
    ids_q: "list[str]",
    path: str,
    id_a: str = "url_a",
    id_b: str = "url_b",
    dist: str = "distance",
    same_files: bool = False,
    max_ids: int = 5000,
    fill: float | None = None,
) -> int:
    """The reference's ``--dm`` emit (``/root/reference/src/main.rs:439-447,
    461-466``; ``src/utils.rs:130-160``): one header line of tab-prefixed
    query names, then one row per reference id — ``name\\t%.6f...``. With
    ``same_files`` only the lower triangle (column index <= row index) is
    printed, and the diagonal is 0 (J3). Row/column order is sorted ids —
    deterministic, unlike the reference's HashMap iteration order.

    Cells for pairs the LSH engine never verified (below-threshold, so no
    distance was computed) print EMPTY by default — the reference's
    all-pairs engine always fills them; the parquet pairs table remains the
    scale artifact. Pass ``fill`` (e.g. 1.0, the distance models' cap) to
    print ``%.6f``-formatted ``fill`` in those cells instead, which keeps
    strict reference-format parsers (split row -> float per cell) working.
    Driver-side single-file emit (the reference
    serializes through one Arc<Mutex<File>>), guarded by ``max_ids``
    because the matrix is O(n^2) presentation output. Returns the number
    of data rows written."""
    if max(len(ids_r), len(ids_q)) > max_ids:
        raise ValueError(
            f"--dm matrix would have {len(ids_r)}x{len(ids_q)} cells; "
            f"use the TSV/parquet pairs output above {max_ids} ids"
        )
    cells: dict[tuple[str, str], float] = {}
    for row in pairs.select(id_a, id_b, dist).collect():
        cells[(row[0], row[1])] = row[2]
        if same_files:
            cells[(row[1], row[0])] = row[2]
    rows_r = sorted(ids_r)
    cols_q = sorted(ids_q)
    col_idx = {q: i for i, q in enumerate(cols_q)}
    with open(path, "w") as f:
        f.write("".join(f"\t{q}" for q in cols_q))
        for i, r in enumerate(rows_r):
            out = [r]
            for q in cols_q:
                if same_files and col_idx[q] > i:
                    break  # lower triangle only (utils.rs:158)
                if q == r:
                    out.append("0.000000")
                else:
                    d = cells.get((r, q), fill)
                    out.append("" if d is None else f"{d:.6f}")
            f.write("\n" + "\t".join(out))
        f.write("\n")
    return len(rows_r)


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
