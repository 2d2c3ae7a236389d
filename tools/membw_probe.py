"""Memory-bandwidth ceiling probe (no Spark).

Runs the signature kernel (rolling k-gram hashes + OPH scatter-min +
densify) in N plain Python processes on identical synthetic batches and
reports aggregate throughput. Used as evidence in BENCH/BASELINE.md that
8 -> 32 core scaling on this sandbox is bounded by memory bandwidth, not by
the engine's topology.
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np


def work(seed: int) -> float:
    from lash_spark.hashing import batch_window_hash_segments
    from lash_spark.sketches import densify_rotation, oph_signatures_segments

    rng = np.random.default_rng(seed)
    texts = [bytes(rng.integers(97, 123, size=1500, dtype=np.uint8)) for _ in range(1000)]
    t0 = time.monotonic()
    h, seg = batch_window_hash_segments(texts, 16)
    densify_rotation(oph_signatures_segments(h, seg, 128))
    return time.monotonic() - t0


def main():
    counts = [int(a) for a in sys.argv[1:]] or [1, 2, 8, 32]
    for procs in counts:
        with mp.Pool(procs) as p:
            t0 = time.monotonic()
            r = p.map(work, range(procs * 2))
            wall = time.monotonic() - t0
        docs = procs * 2 * 1000
        print(
            f"{procs:>2} procs: {docs / wall:7.0f} docs/s aggregate "
            f"(wall {wall:.1f}s, per-task avg {np.mean(r):.2f}s)"
        )


if __name__ == "__main__":
    main()
