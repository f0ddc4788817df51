"""Direct banded-KKT assembly helpers shared by the game solvers.

Round-4 gave the optimize path direct band assembly (ipm/solver.py
BandKKT): when the derivative matrices are certified iteration-invariant
the permuted band of the KKT matrix is assembled straight from the
hoisted constituents — the dense (nK, nK) matrix is never materialized,
and the per-iteration cost drops from O(nK^2) assembly + permutation to
O(w * nF * nK) GEMVs.  The game KKTs are banded the same way (the
reference stacks the same stage-banded blocks for both game classes:
lib/ipmPDeqlat_CS.m:300-415, lib/ipmPDminmax_CS.m:214-241), so this
module factors the shared machinery:

* band extraction of the CONSTANT part (once per solve): permute with
  one-hot MXU matmuls at HIGHEST precision, peel diagonals with strided
  slices (NOT pad/flatten/reshape — layout rewrites of the full matrix
  under vmap, round-4 trace);
* per-diagonal PAIR PRODUCTS for rank-structured varying terms
  A diag(wts) B: band[c, i] = (wts @ (AP[:, i:] * BP[:, :n-i]))[c] —
  one GEMV per diagonal per iteration, no (nF, nK)-scale per-iteration
  tensors;
* static masks mapping global (row, col) regularization entries to
  band slots;
* :class:`BandedOperator` — the matvec-only handle the FromBand
  factorization adapters consume (kkt/fleet_banded.py
  FleetBandedFromBand for symmetric LDL, kkt/banded_lu.py
  FleetBandedLUFromBand for the unsymmetric equilibrium system).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_HP = jax.lax.Precision.HIGHEST


def perm_onehot(perm: np.ndarray, dt) -> jax.Array:
    """One-hot permutation matrix P with P[a, perm[a]] = 1, so that
    (P W P^T)[a, b] = W[perm[a], perm[b]].  One-hot matmuls at HIGHEST
    precision are exact and ride the MXU — a vmapped index gather of
    the same permutation costs ~15 ms at (1024, 290) (round-4 trace)."""
    n = len(perm)
    return jnp.asarray(np.eye(n, dtype=np.float64)[np.asarray(perm)], dt)


def extract_band_lower(Wp: jax.Array, w: int) -> jax.Array:
    """Lower band of a permuted matrix: out[c, i] = Wp[c+i, c] for
    i = 0..w (zero-padded past the edge) -> (n, w+1)."""
    dt = Wp.dtype
    cols = []
    for i in range(w + 1):
        d = jnp.diagonal(Wp, offset=-i)
        cols.append(
            jnp.concatenate([d, jnp.zeros((i,), dt)]) if i else d
        )
    return jnp.stack(cols, axis=1)


def extract_band_upper(Wp: jax.Array, w: int) -> jax.Array:
    """Upper band: out[c, q-1] = Wp[c, c+q] for q = 1..w -> (n, w)."""
    dt = Wp.dtype
    cols = []
    for q in range(1, w + 1):
        d = jnp.diagonal(Wp, offset=q)
        cols.append(jnp.concatenate([d, jnp.zeros((q,), dt)]))
    return jnp.stack(cols, axis=1) if w else jnp.zeros((Wp.shape[0], 0), dt)


def pair_products_lower(AP: jax.Array, BP: jax.Array, w: int) -> jax.Array:
    """Stack (w+1, nF, n) with out[i][k, c] = AP[k, c+i] * BP[k, c]:
    the lower-band contribution of sum_k wts_k A[:, k] B[k, :] is then
    ``wts @ out[i]`` per diagonal (one GEMV each at runtime)."""
    nF, n = AP.shape
    dt = AP.dtype
    pads = []
    for i in range(w + 1):
        gi = AP[:, i:] * BP[:, : n - i]
        if i:
            gi = jnp.concatenate([gi, jnp.zeros((nF, i), dt)], axis=1)
        pads.append(gi)
    return jnp.stack(pads, axis=0)


def pair_products_upper(AP: jax.Array, BP: jax.Array, w: int) -> jax.Array:
    """Stack (w, nF, n) with out[q-1][k, c] = AP[k, c] * BP[k, c+q]."""
    nF, n = AP.shape
    dt = AP.dtype
    pads = []
    for q in range(1, w + 1):
        gq = AP[:, : n - q] * BP[:, q:]
        gq = jnp.concatenate([gq, jnp.zeros((nF, q), dt)], axis=1)
        pads.append(gq)
    return (
        jnp.stack(pads, axis=0) if w else jnp.zeros((0, nF, n), dt)
    )


def entry_masks(perm: np.ndarray, rows: np.ndarray, cols: np.ndarray,
                w: int, dt):
    """Static masks placing unit entries at global positions
    (rows[j], cols[j]) into permuted band storage.

    Returns ``(lmask (n, w+1), umask (n, w))`` such that adding
    ``coef * lmask`` to the lower band and ``coef * umask`` to the
    upper band adds ``coef`` at every listed position.  Raises if a
    position falls outside the band (the plan must come from a probe
    whose pattern included these entries)."""
    n = len(perm)
    iperm = np.empty(n, dtype=np.int64)
    iperm[np.asarray(perm)] = np.arange(n)
    lm = np.zeros((n, w + 1))
    um = np.zeros((n, max(w, 0)))
    for r, c in zip(np.asarray(rows), np.asarray(cols)):
        a, b = iperm[r], iperm[c]
        off = a - b
        if off >= 0:
            if off > w:
                raise ValueError(
                    f"regularization entry ({r},{c}) falls outside the "
                    f"band (offset {off} > w={w})"
                )
            lm[b, off] += 1.0
        else:
            if -off > w:
                raise ValueError(
                    f"regularization entry ({r},{c}) falls outside the "
                    f"band (offset {off} < -w={w})"
                )
            um[a, -off - 1] += 1.0
    return jnp.asarray(lm, dt), jnp.asarray(um, dt)


def shifted_cols(v: jax.Array, w: int, start: int = 0) -> jax.Array:
    """(n, w+1-start) with out[c, i] = v[c + start + i] (zero-padded):
    the per-slot row-index factors of a band (e.g. row scalings)."""
    n = v.shape[0]
    vp = jnp.concatenate([v, jnp.zeros((w,), v.dtype)])
    return jnp.stack(
        [lax.dynamic_slice_in_dim(vp, i, n) for i in range(start, w + 1)],
        axis=1,
    )


class BandedOperator:
    """Directly-assembled permuted band + a structured matvec closure —
    the handle the FromBand factorization adapters consume.  ``band``
    is (n, w+1) lower storage for the symmetric LDL kernel, or
    (n, 2w+1) full storage ([diag, sub 1..w, super 1..w]) for the
    unsymmetric LU kernel."""

    __slots__ = ("band", "P", "_mv")

    def __init__(self, band, P, matvec):
        self.band = band
        self.P = P
        self._mv = matvec

    def matvec(self, x):
        return self._mv(x)
