"""Block cyclic reduction for symmetric block-tridiagonal systems —
the log-depth alternative to the sequential scan in kkt/tridiag.py.

Per level, all odd-indexed block rows are eliminated *in parallel*
(batched s x s solves and matmuls over the level's rows — vmapped, so
each level is a handful of large fused kernels instead of one kernel
per stage), halving the chain; log2(nb) levels reach a single root
block.  Back-substitution replays the levels in reverse.  This is the
parallel elimination SURVEY.md §2.9 calls for on the horizon axis
("parallel block-cyclic reduction ... inside the factorization").

The chain is padded with identity blocks to length 2^m - 1.

ATTENTION (numerics): unlike the sequential elimination in
kkt/tridiag.py, the odd/even elimination order amplifies pivot growth on
quasi-definite saddle (KKT) systems — in f32 the relative error on a
realistic interior-point KKT matrix is O(10) where the sequential order
achieves 2e-7.  The backend therefore computes in the matrix's own
dtype (f64 recommended); treat the f32 path as suitable only for
well-conditioned banded systems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .structure import BandedPlan
from .dense import hdot


def _solve_blocks(A, R):
    """Batched solve A[i] X[i] = R[i] for (m,s,s) blocks."""
    lu, piv = jax.vmap(jax.scipy.linalg.lu_factor)(A)
    return jax.vmap(jax.scipy.linalg.lu_solve)((lu, piv), R)


def cr_solve(A, B, b):
    """Solve the symmetric block-tridiagonal system by cyclic reduction.

    A: (nb, s, s) diagonal blocks; B: (nb, s, s) subdiagonal blocks
    (B[i] couples block i to i-1, B[0] = 0); b: (nb, s).
    Returns x: (nb, s).  All computation in the dtype of A.
    """
    nb, s, _ = A.shape
    ft = A.dtype
    # pad to 2^m - 1 with identity blocks
    m = 1
    while 2**m - 1 < nb:
        m += 1
    npad = 2**m - 1
    if npad != nb:
        eye = jnp.broadcast_to(jnp.eye(s, dtype=ft), (npad - nb, s, s))
        A = jnp.concatenate([A, eye], axis=0)
        B = jnp.concatenate([B, jnp.zeros((npad - nb, s, s), ft)], axis=0)
        b = jnp.concatenate([b, jnp.zeros((npad - nb, s), ft)], axis=0)

    # forward elimination: levels of odd-row elimination
    levels = []
    Acur, Bcur, bcur = A, B, b
    n_cur = npad
    while n_cur > 1:
        Ao = Acur[0::2]          # odd rows of the chain (0-based: the
        Ae = Acur[1::2]          # rows eliminated are the EVEN indices
        # relabel: eliminate rows 0,2,4,... (which have at most two
        # neighbors 1,3,... in the chain); keep rows 1,3,5,...
        # couplings: L[i] = B[2i] couples kept row (2i-1) -> elim row 2i?
        # Use the standard formulation: elim rows E = even indices,
        # kept rows K = odd indices.
        # row 2i:   B[2i] x_{2i-1} + A[2i] x_{2i} + B[2i+1]^T x_{2i+1} = b[2i]
        #   (x_{2i-1}, x_{2i+1} are kept rows; boundaries have zeros)
        Lc = Bcur[0::2]          # (nE, s, s): coupling to left kept row
        Rc_full = jnp.concatenate(
            [Bcur[1::2], jnp.zeros((1, s, s), ft)], axis=0
        )[: Ao.shape[0]]         # B[2i+1]: coupling of kept row to elim row
        be = bcur[0::2]

        # X = A_E^{-1} [L, R^T, b]
        sols = _solve_blocks(
            Ao,
            jnp.concatenate(
                [Lc, jnp.swapaxes(Rc_full, -1, -2), be[..., None]], axis=-1
            ),
        )
        XL = sols[..., :s]           # A^{-1} L
        XR = sols[..., s : 2 * s]    # A^{-1} R^T
        xb = sols[..., -1]           # A^{-1} b

        # substitute into kept rows 2i+1:
        # row 2i+1: B[2i+1] x_{2i} + A[2i+1] x_{2i+1} + B[2i+2] ... wait
        #   B[2i+1] couples row 2i+1 to row 2i (elim, left neighbor)
        #   B[2i+2] couples row 2i+2 (elim, right neighbor) to row 2i+1;
        #   its transpose appears in row 2i+1.
        Rk = Bcur[1::2]              # (nK, s, s) coupling kept -> left elim
        Lk_next = Bcur[2::2]         # (nK or nK-?, s, s) right elim -> kept
        nK = Ae.shape[0]
        if Lk_next.shape[0] < nK:
            Lk_next = jnp.concatenate(
                [Lk_next, jnp.zeros((nK - Lk_next.shape[0], s, s), ft)], axis=0
            )
        # kept row i (global 2i+1):
        #   (A_k - Rk A_E(left)^{-1} Rk^T... using XR of left elim row
        #    and  - Lk_next^T A_E(right)^{-1} Lk_next via XL of right)
        XR_left = XR[:nK]            # left elim row's A^{-1} R^T (R = Rk)
        XL_right = XL[1 : nK + 1]    # right elim row's A^{-1} L (L = Lk_next)
        if XL_right.shape[0] < nK:
            XL_right = jnp.concatenate(
                [XL_right, jnp.zeros((nK - XL_right.shape[0], s, s), ft)],
                axis=0,
            )
        A_new = (
            Ae
            - jnp.einsum("ijk,ikl->ijl", Rk, XR_left)
            - jnp.einsum("ikj,ikl->ijl", Lk_next, XL_right)
        )
        # new coupling between kept rows i and i-1 goes through elim row
        # 2i: -Rk A_E^{-1} L (of elim row 2i)
        B_new_full = -jnp.einsum("ijk,ikl->ijl", Rk, XL[:nK])
        B_new = B_new_full.at[0].set(jnp.zeros((s, s), ft))
        b_new = (
            bcur[1::2]
            - jnp.einsum("ijk,ik->ij", Rk, xb[:nK])
            - jnp.einsum(
                "ikj,ik->ij", Lk_next,
                jnp.concatenate([xb[1 : nK + 1],
                                 jnp.zeros((max(0, nK - (xb.shape[0] - 1)), s), ft)],
                                axis=0)[:nK],
            )
        )
        levels.append((Ao, XL, XR, xb, Rk, Lk_next))
        Acur, Bcur, bcur = A_new, B_new, b_new
        n_cur = (n_cur - 1) // 2

    # root solve
    x_root = jnp.linalg.solve(Acur[0], bcur[0])
    xs = x_root[None, :]

    # back-substitution through the levels
    for (Ao, XL, XR, xb, Rk, Lk_next) in reversed(levels):
        nE = Ao.shape[0]
        nK = xs.shape[0]
        # elim row 2i: x = A^{-1}(b - L x_left - R^T x_right)
        #   x_left = kept row i-1 (zero at boundary), x_right = kept row i
        x_left = jnp.concatenate([jnp.zeros((1, s), xs.dtype), xs], axis=0)[:nE]
        x_right = jnp.concatenate([xs, jnp.zeros((1, s), xs.dtype)], axis=0)[:nE]
        xe = (
            xb
            - jnp.einsum("ijk,ik->ij", XL, x_left)
            - jnp.einsum("ijk,ik->ij", XR, x_right)
        )
        # interleave: even positions = xe, odd = xs
        out = jnp.zeros((nE + nK, s), xs.dtype)
        out = out.at[0::2].set(xe)
        out = out.at[1::2].set(xs)
        xs = out

    return xs[:nb]


def cr_solve_permuted(WW, plan: BandedPlan, rhs, dtype=jnp.float32):
    """Convenience: permute a banded matrix per the plan, solve with
    cyclic reduction in ``dtype``, return in original ordering."""
    from .tridiag import _to_blocks

    perm = jnp.asarray(plan.perm)
    iperm = jnp.asarray(plan.iperm)
    WWp = WW[perm][:, perm].astype(dtype)
    A, B = _to_blocks(WWp, plan)
    s, nb, n = plan.block, plan.n_blocks, plan.n
    npad = nb * s
    bp = rhs[perm].astype(dtype)
    bp = jnp.concatenate([bp, jnp.zeros((npad - n,), dtype)])
    x = cr_solve(A, B, bp.reshape(nb, s))
    return x.reshape(npad)[:n][iperm]


class CyclicFactorization:
    """KKT-backend adapter (factorization recomputed per solve; the
    elimination is cheap and log-depth).  Solves in the matrix dtype —
    see the module note on f32 pivot growth."""

    def __init__(self, WW, plan: BandedPlan, n_refine: int = 1):
        self.WW = WW
        self.plan = plan
        self.n_refine = n_refine

    def solve(self, rhs):
        if rhs.ndim == 2:
            return jax.vmap(self.solve, in_axes=1, out_axes=1)(rhs)
        dt = rhs.dtype
        x = cr_solve_permuted(self.WW, self.plan, rhs, dtype=self.WW.dtype).astype(dt)
        for _ in range(self.n_refine):
            x = x + cr_solve_permuted(
                self.WW, self.plan, rhs - hdot(self.WW, x), dtype=self.WW.dtype
            ).astype(dt)
        return x

    def inertia(self, tol: float = 0.0):
        z = jnp.zeros((), jnp.result_type(self.WW))
        return z, z
