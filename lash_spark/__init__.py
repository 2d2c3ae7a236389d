"""lash_spark — a PySpark-native near-duplicate detection + clustering engine.

Brand-new engine with the query/data-processing capabilities of the
``jianshu93/lash`` reference (sketch construction + pairwise sketch
distances), re-architected for web-scale dedup over DataFrames:

- per-document shingling → batched MinHash / HLL / ULL / HMH / SimHash
  signatures via vectorized pandas/Arrow UDFs (no per-row Python),
- LSH band equi-joins (with explicit hot-band skew handling) and SimHash
  Hamming-ball probes for candidate generation instead of the reference's
  all-pairs loop (``/root/reference/src/utils.rs:150-161``),
- sketch algebra (union = register max, inclusion–exclusion Jaccard,
  Mash-style distance models) as pure Column expressions,
- union-find connected components (large-star/small-star) for cluster ids,
- a winnowed rolling-hash exact-substring pass,
- per-stage lineage/metrics + checkpoint/resume.

Everything is DataFrame-first: Catalyst handles pushdown/pruning/AQE; the
only Python on the hot path is Arrow-batched numpy kernels.
"""

__version__ = "0.1.0"

from lash_spark.config import LshPlan, SketchParams  # noqa: F401
