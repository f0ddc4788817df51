"""Bunch-Kaufman pivoted symmetric-indefinite elimination for inertia.

The reference computes inertia from the diagonal of its unpivoted
symbolic LDL (lib/ipmPD_CS.m:277-279, ``sum(heaviside(+-dHess))``) and
simply errors out when a zero pivot would need pivoting
(lib/@csparse/sparsity_ldl.m:188).  On TPU the unpivoted route is not
robust in f32 on IPM endgame KKT matrices (pivot collapse — see
kkt/dense.py), and full f64 LDL is emulated and slow.  This module
provides the fast robust path: a Bunch-Kaufman partially-pivoted
symmetric elimination whose 1x1/2x2 pivot blocks give the exact
eigenvalue sign counts (Sylvester's law) even in f32, because the BK
pivot strategy bounds element growth.

Only the inertia is taken from this factorization; the KKT *solve*
continues to use XLA's native pivoted LU (+ f64 iterative refinement),
which is far faster on the MXU.  Implemented as masked full-matrix
rank-1/rank-2 updates under a ``lax.while_loop`` — O(n) sequential
steps with static shapes, vmap/jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_ALPHA = (1.0 + 17.0 ** 0.5) / 8.0  # Bunch-Kaufman growth-optimal threshold


def _swap_sym(M: jax.Array, i, j):
    """Symmetric row+column swap i<->j (dynamic indices)."""
    idx = jnp.arange(M.shape[-1])
    p = idx.at[i].set(j).at[j].set(i)
    return M[p][:, p]


def bk_inertia(A: jax.Array, tol: float = 0.0) -> tuple[jax.Array, jax.Array]:
    """(#positive, #negative) eigenvalue counts of symmetric A.

    Bunch-Kaufman partial pivoting: at step k either a 1x1 pivot (with
    optional symmetric swap) or a 2x2 pivot (indefinite block, one
    eigenvalue of each sign when det<0).  Zero active columns are
    skipped and counted as zero eigenvalues.
    """
    n = A.shape[-1]
    dt = A.dtype
    idx = jnp.arange(n)
    one = jnp.ones((), dt)
    zero = jnp.zeros((), dt)

    def count1(d, mp, mn):
        mp = mp + jnp.where(d > tol, one, zero)
        mn = mn + jnp.where(d < -tol, one, zero)
        return mp, mn

    def step(carry):
        M, k, mp, mn = carry
        below = idx > k
        colk = jnp.where(below, M[:, k], zero)
        lam = jnp.max(jnp.abs(colk))
        r = jnp.argmax(jnp.abs(colk))
        akk = M[k, k]

        # column r over the active block, excluding entry (r,r)
        active = idx >= k
        colr = jnp.where(active & (idx != r), M[:, r], zero)
        sigma = jnp.max(jnp.abs(colr))

        case1 = (jnp.abs(akk) >= _ALPHA * lam) | (lam <= tol)
        case1 = case1 | (jnp.abs(akk) * sigma >= _ALPHA * lam * lam)
        case2 = jnp.abs(M[r, r]) >= _ALPHA * sigma  # 1x1 after swap k<->r

        def pivot1(args):
            M, mp, mn = args
            d = M[k, k]
            safe = jnp.where(d == 0, one, d)
            col = jnp.where(idx > k, M[:, k] / safe, zero)
            Mn = M - d * jnp.outer(col, col)
            keep = idx > k
            Mn = jnp.where(jnp.outer(keep, keep), Mn, zero)
            mp, mn = count1(d, mp, mn)
            return Mn, k + 1, mp, mn

        def pivot1_swap(args):
            M, mp, mn = args
            return pivot1((_swap_sym(M, k, r), mp, mn))

        def pivot2(args):
            # swap k+1 <-> r, then eliminate the 2x2 block at (k, k+1)
            # (k+1 is clamped: under vmap lax.cond lowers to a select
            # that executes this branch even when discarded with k=n-1,
            # and the swap must stay in bounds rather than rely on JAX's
            # OOB-drop semantics)
            M, mp, mn = args
            kk = jnp.minimum(k + 1, n - 1)
            M = _swap_sym(M, kk, r)
            a = M[k, k]
            b = M[kk, k]
            c = M[kk, kk]
            detE = a * c - b * b
            safe = jnp.where(detE == 0, one, detE)
            below2 = idx > kk
            W = jnp.where(below2[:, None],
                          jnp.stack([M[:, k], M[:, kk]], axis=1), zero)
            Einv = jnp.stack([jnp.stack([c, -b]), jnp.stack([-b, a])]) / safe
            U = W @ Einv
            Mn = M - U @ W.T
            keep = idx > kk
            Mn = jnp.where(jnp.outer(keep, keep), Mn, zero)
            # inertia of the 2x2 block: det<0 -> (+1,-1); det>0 -> both
            # eigenvalues carry the sign of the trace; det==0 -> one
            # zero + one with the sign of the trace
            tr = a + c
            both_pos = (detE > 0) & (tr > tol)
            both_neg = (detE > 0) & (tr < -tol)
            mp = mp + jnp.where(detE < 0, one, jnp.where(both_pos, 2 * one, zero))
            mn = mn + jnp.where(detE < 0, one, jnp.where(both_neg, 2 * one, zero))
            mp = mp + jnp.where((detE == 0) & (tr > tol), one, zero)
            mn = mn + jnp.where((detE == 0) & (tr < -tol), one, zero)
            return Mn, k + 2, mp, mn

        return lax.cond(
            case1, pivot1,
            lambda args: lax.cond(case2, pivot1_swap, pivot2, args),
            (M, mp, mn),
        )

    def cond(carry):
        return carry[1] < n

    A = (A + A.T) * jnp.asarray(0.5, dt)
    _, _, mp, mn = lax.while_loop(cond, step, (A, 0, zero, zero))
    return mp, mn
