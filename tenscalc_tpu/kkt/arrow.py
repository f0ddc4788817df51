"""Arrow-plus-band KKT factorization.

MPC-family problems with a few *global* variables (sampling time as an
optimization variable, shared parameters being estimated, an initial
state coupling into every stage's cost) produce a KKT matrix that is
banded except for a handful of dense rows/columns — the "arrow".
SURVEY.md §7 step 4 calls for exactly this class ("blocked LDL/Cholesky
... for block-tridiagonal + arrow KKT").

Plan: detect high-degree rows (the arrow set), order them last, RCM the
remainder into a band.  Factor/solve by block elimination:

    W = [[B, C], [C^T, D]],  B banded (block-tridiagonal path),
    S = D - C^T B^{-1} C  (dense |arrow| x |arrow| Schur complement),
    x_band = B^{-1}(b_1 - C x_arrow),  x_arrow = S^{-1}(b_2 - C^T B^{-1} b_1)

B solves ride the structured backend; the Schur block is tiny and dense.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .structure import BandedPlan, plan_banded
from .tridiag import TridiagFactorization, _factor_dtype, tridiag_factorize
from .dense import hdot


@dataclasses.dataclass
class ArrowPlan:
    arrow: np.ndarray        # indices of arrow rows (original ordering)
    band: np.ndarray         # indices of band rows (original ordering)
    band_plan: BandedPlan    # plan for the band block (band-local indices)
    n: int

    @property
    def worthwhile(self) -> bool:
        return self.band_plan.worthwhile and len(self.arrow) < 0.25 * self.n


def plan_arrow(pattern: np.ndarray, degree_factor: float = 4.0,
               max_arrow_frac: float = 0.2) -> Optional[ArrowPlan]:
    """Detect dense rows and plan band+arrow elimination.

    Arrow set = rows whose degree exceeds ``degree_factor`` x the median
    degree (capped at ``max_arrow_frac`` of n).  Returns None when no
    helpful arrow split exists.
    """
    n = pattern.shape[0]
    deg = pattern.sum(axis=1)
    med = np.median(deg)
    arrow_mask = deg > degree_factor * max(med, 1)
    n_arrow = int(arrow_mask.sum())
    if n_arrow == 0 or n_arrow > max_arrow_frac * n:
        return None
    arrow = np.nonzero(arrow_mask)[0]
    band = np.nonzero(~arrow_mask)[0]
    sub = pattern[np.ix_(band, band)]
    bp = plan_banded(sub)
    if not bp.worthwhile:
        return None
    return ArrowPlan(arrow=arrow, band=band, band_plan=bp, n=n)


class ArrowFactorization:
    """KKT-backend adapter: banded elimination + dense Schur on the
    arrow block, f32 with f64 iterative refinement."""

    def __init__(self, WW, plan: ArrowPlan, n_refine: int = 2):
        self.WW = WW
        self.plan = plan
        self.n_refine = n_refine
        band = jnp.asarray(plan.band)
        arrow = jnp.asarray(plan.arrow)
        fdt = _factor_dtype(WW)  # f32 on TPU, native dtype on CPU
        self._fdt = fdt
        B = WW[band][:, band]
        self.C = WW[band][:, arrow].astype(fdt)
        D = WW[arrow][:, arrow].astype(fdt)
        self.bfac = tridiag_factorize(B, plan.band_plan, n_refine=0)
        # Schur complement S = D - C^T B^{-1} C (factor dtype)
        BC = self.bfac.solve(self.C.astype(WW.dtype)).astype(fdt)
        S = D - self.C.T @ BC
        self.S_lu = jax.scipy.linalg.lu_factor(S)
        self._band_idx = band
        self._arrow_idx = arrow

    def _solve32(self, rhs):
        b1 = rhs[self._band_idx].astype(self._fdt)
        b2 = rhs[self._arrow_idx].astype(self._fdt)
        y1 = self.bfac._solve32(b1).astype(self._fdt)
        x2 = jax.scipy.linalg.lu_solve(self.S_lu, b2 - self.C.T @ y1)
        x1 = self.bfac._solve32((b1 - self.C @ x2).astype(self._fdt))
        x1 = x1.astype(self._fdt)
        out = jnp.zeros((self.plan.n,), self._fdt)
        out = out.at[self._band_idx].set(x1)
        out = out.at[self._arrow_idx].set(x2)
        return out

    def solve(self, rhs):
        if rhs.ndim == 2:
            return jax.vmap(self.solve, in_axes=1, out_axes=1)(rhs)
        dt = rhs.dtype
        x = self._solve32(rhs).astype(dt)
        for _ in range(self.n_refine):
            x = x + self._solve32(rhs - hdot(self.WW, x)).astype(dt)
        return x

    def inertia(self, tol: float = 0.0):
        z = jnp.zeros((), jnp.result_type(self.WW))
        return z, z
