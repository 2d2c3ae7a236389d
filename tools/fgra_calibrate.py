"""FGRA calibration + validation for the ULL estimator (offline tool).

The FGRA (further-generalized-remaining-area) statistic per register is
area(u)^tau, where area(u) is the probability mass of the hash-space region
that would CHANGE the register state u = (q, d1, d0):

    area = [q < q_max]*2^-q + (1-d1)*2^-(q-1)*[q>=2] + (1-d0)*2^-(q-2)*[q>=3]

(empty register: area = 1; fully saturated q_max with both bits: area = 0).
Under the standard Poisson model (rank-j arrivals at rate lam*2^-j per
register), E[area^tau] ~ C(tau) * lam^-tau for mid/large lam, giving the
closed-form estimator

    n_hat = m * (C * m / S)^(1/tau),   S = sum_k area(u_k)^tau

with HLL-style linear counting below the crossover. This script:
  1. computes the exact Poisson expectation psi(lam) = E[area^tau] and
     reports how flat lam^tau * psi(lam) is over the operating range
     (flatness == bias of the closed form);
  2. simulates sketches across cardinalities and compares FGRA vs the
     Poisson MLE (sketches.ull_cardinality mle) for bias + RMSE, over a
     tau grid, to pick the tau constant hardcoded in sketches.py.

Run: python tools/fgra_calibrate.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def psi(lam: np.ndarray, p: int, tau: float) -> np.ndarray:
    """Exact E[area(u)^tau] per register (shared with the engine)."""
    from lash_spark.sketches import _fgra_psi

    return _fgra_psi(lam, p, tau)


def main():
    from lash_spark import sketches as S

    p = 10
    m = 1 << p
    rng = np.random.default_rng(42)

    print("=== flatness of lam^tau * psi(lam) over lam in [3, 1000] ===")
    lam = np.geomspace(3, 1000, 60)
    for tau in (0.5, 0.65, 0.75, 0.85, 1.0):
        c = lam ** tau * psi(lam, p, tau)
        spread = (c.max() / c.min() - 1) * 100
        print(f"tau={tau:4}: C median={np.median(c):.6f}  spread={spread:.2f}%")

    print("\n=== simulation: FGRA (closed form, this tau) vs MLE ===")
    ns = [50, 200, 1000, 5000, 20000, 100000, 1000000]
    trials = 60
    for tau in (0.65, 0.75, 0.85):
        lam_cal = np.geomspace(3, 1000, 60)
        C = float(np.median(lam_cal ** tau * psi(lam_cal, p, tau)))
        print(f"-- tau={tau}  C={C:.6f}")
        for n in ns:
            est_f, est_m = [], []
            for t in range(trials):
                h = rng.integers(0, 2 ** 63, size=n, dtype=np.int64).astype(np.uint64)
                regs = S.ull_registers(np.unique(h), p, seed=7 + t)
                u = regs.astype(np.int64)
                q = u >> 2
                area = (
                    np.where(q < 64 - p + 1, 2.0 ** -q, 0.0)
                    + (1 - ((u >> 1) & 1)) * np.where(q >= 2, 2.0 ** -(q - 1), 0.0)
                    + (1 - (u & 1)) * np.where(q >= 3, 2.0 ** -(q - 2), 0.0)
                )
                s = (area ** tau).sum()
                raw = m * (C * m / s) ** (1 / tau)
                zeros = int((u == 0).sum())
                if raw <= 2.5 * m and zeros > 0:
                    raw = m * np.log(m / zeros)
                est_f.append(raw)
                if t < 20:
                    est_m.append(S.ull_cardinality(regs, p, estimator="mle"))
            ef = np.array(est_f)
            em = np.array(est_m)
            print(
                f"  n={n:>8}: fgra bias={ef.mean() / n - 1:+.4f} rmse={np.sqrt(((ef - n) ** 2).mean()) / n:.4f}"
                f" | mle bias={em.mean() / n - 1:+.4f} rmse={np.sqrt(((em - n) ** 2).mean()) / n:.4f}"
            )


if __name__ == "__main__":
    main()
