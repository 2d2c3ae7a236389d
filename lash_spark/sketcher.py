"""The Sketcher protocol — the engine's programmable surface (SURVEY §3.3).

The reference's only extension point is the ``KmerSketch`` trait
(``/root/reference/src/utils.rs:377-386``): implementing it plugs a new
sketch into the unchanged pipeline, selected by the ``-a`` string
(``main.rs:212,223,234``). The engine equivalent is this protocol + registry:
a Sketcher supplies

- ``registers_segments(h, seg, p, seed)`` — the vectorized batch kernel
  (flat window-hash segments -> (n_docs, m) int32 register matrix), run
  inside the Arrow UDF (operators/signatures.py);
- ``union_expr(a, b)`` — register merge as a pure Column expression;
- ``similarity_expr(a, b)`` — register-wise similarity Column;
- ``cardinality(regs, p, estimator)`` — scalar estimate (the ``-e`` choice).

Registered implementations: ``hll``, ``ull``, ``hmh`` (register family) and
``minhash`` / ``simhash`` (signature family, handled by the signature UDF —
their entries expose the algebra half of the protocol). New sketches
register with ``@register_sketcher("name")`` and become selectable via
``SketchParams(algorithm="name")`` exactly like ``-a``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Protocol

import numpy as np
from pyspark.sql import Column

from lash_spark import estimators as E
from lash_spark import sketches as S


class Sketcher(Protocol):
    """Structural protocol for register-family sketches."""

    name: str

    def registers_segments(
        self, h: np.ndarray, seg: np.ndarray, p: int, seed: int
    ) -> np.ndarray: ...

    def union(self, a: np.ndarray, b: np.ndarray) -> np.ndarray: ...

    def union_expr(self, a: Column | str, b: Column | str) -> Column: ...

    def similarity_expr(self, a: Column | str, b: Column | str) -> Column: ...

    def cardinality(self, regs: np.ndarray, p: int, estimator: str) -> float: ...

    def cardinality_batch(self, regs: np.ndarray, p: int, estimator: str) -> np.ndarray: ...

    def rank_view(self, regs: np.ndarray) -> np.ndarray: ...


_REGISTRY: dict[str, "Sketcher"] = {}


def register_sketcher(name: str) -> Callable:
    def deco(cls):
        _REGISTRY[name] = cls()
        return cls

    return deco


def get_sketcher(name: str) -> "Sketcher":
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown sketch algorithm {name!r}; one of {sorted(_REGISTRY)}")


@register_sketcher("hll")
@dataclass(frozen=True)
class HllSketcher:
    name: str = "hll"

    def registers_segments(self, h, seg, p, seed):
        return S.hll_registers_segments(h, seg, p, seed)

    def union(self, a, b):
        return S.register_union(a, b)

    def union_expr(self, a, b):
        return E.register_union_expr(a, b)

    def similarity_expr(self, a, b):
        return E.hmh_jaccard_expr(a, b)  # register-equality ratio

    def cardinality(self, regs, p, estimator="default"):
        return S.hll_cardinality(regs, estimator="mle" if estimator in ("mle", "fgra") else "default")

    def cardinality_batch(self, regs, p, estimator="default"):
        # HLL has no d-bits, so FGRA degenerates to the rank-only family;
        # "fgra"/"mle" run the histogram MLE per doc (small: ~55 bins)
        if estimator in ("mle", "fgra"):
            return np.array([S.hll_cardinality_mle(regs[i], p) for i in range(regs.shape[0])])
        return S.hll_cardinality_batch(regs)

    def rank_view(self, regs):
        return regs


@register_sketcher("ull")
@dataclass(frozen=True)
class UllSketcher:
    name: str = "ull"

    def registers_segments(self, h, seg, p, seed):
        return S.ull_registers_segments(h, seg, p, seed)

    def union(self, a, b):
        return S.ull_union(a, b)

    def union_expr(self, a, b):
        # exact d-bit merge as a Column expression (property-tested equal
        # to the Python kernel ull_union on random register pairs)
        return E.ull_union_expr(a, b)

    def similarity_expr(self, a, b):
        return E.hmh_jaccard_expr(a, b)

    def cardinality(self, regs, p, estimator="fgra"):
        return S.ull_cardinality(regs, p, estimator=estimator)

    def cardinality_batch(self, regs, p, estimator="fgra"):
        if estimator == "mle":
            return np.array(
                [S.ull_cardinality(regs[i], p, "mle") for i in range(regs.shape[0])]
            )
        if estimator == "default":  # rank-only harmonic family
            return S.hll_cardinality_batch(self.rank_view(regs))
        return S.ull_cardinality_fgra_batch(regs, p)

    def rank_view(self, regs):
        return (regs >> 2).astype(np.int32)


@register_sketcher("hmh")
@dataclass(frozen=True)
class HmhSketcher:
    name: str = "hmh"

    def registers_segments(self, h, seg, p, seed):
        return S.hmh_registers_segments(h, seg, p, seed)

    def union(self, a, b):
        return S.register_union(a, b)  # encoding makes max the exact merge

    def union_expr(self, a, b):
        return E.register_union_expr(a, b)

    def similarity_expr(self, a, b):
        return E.hmh_jaccard_expr(a, b)

    def cardinality(self, regs, p, estimator="default"):
        return S.hll_cardinality(self.rank_view(regs), estimator="mle" if estimator in ("mle", "fgra") else "default")

    def cardinality_batch(self, regs, p, estimator="default"):
        rv = self.rank_view(regs)
        if estimator in ("mle", "fgra"):
            return np.array([S.hll_cardinality_mle(rv[i], p) for i in range(rv.shape[0])])
        return S.hll_cardinality_batch(rv)

    def rank_view(self, regs):
        return (regs >> 16).astype(np.int32)
