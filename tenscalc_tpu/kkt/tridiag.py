"""Block-tridiagonal KKT factorization — the structured path for MPC
horizons (Riccati-style block elimination).

The reference exploits the same structure implicitly through the
fill-reducing ordering in its unrolled symbolic LDL (SURVEY.md §5
"long-context": MPC dynamics couple only adjacent time steps so the
unrolled LDL stays O(T) for banded KKT).  Here it is explicit: after the
:mod:`structure` planner permutes the KKT matrix to half-bandwidth s,
the matrix is block-tridiagonal in s-blocks and factored by the block
recursion

    D_0 = A_0,   L_i = B_i D_{i-1}^{-1},   D_i = A_i - L_i B_i^T

(one lax.scan over stages; each step is dense s x s work on the MXU).
Factorization and substitution run in f32; accuracy is recovered by
iterative refinement against the f64 matrix — the same mixed-precision
contract as the dense path (kkt/dense.py), whose residual gate feeds the
IPM's addEye2Hessian adaptation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .structure import BandedPlan
from .dense import hdot


def _factor_dtype(WW):
    """f32 on TPU (mixed-precision contract; LuDecomposition is
    f32-only there), the matrix's own dtype elsewhere — on CPU the
    native f64 factorization costs the same and never needs the
    refinement safety net."""
    try:
        if jax.default_backend() == "tpu":
            return jnp.float32
    except Exception:  # pragma: no cover
        pass
    return WW.dtype


def _to_blocks(WWp: jax.Array, plan: BandedPlan):
    """Extract padded diagonal and subdiagonal block sequences."""
    s, nb, n = plan.block, plan.n_blocks, plan.n
    npad = nb * s
    if npad != n:
        # pad with identity so the factorization restricted to the
        # leading n x n equals that of WWp
        W = jnp.eye(npad, dtype=WWp.dtype).at[:n, :n].set(WWp)
    else:
        W = WWp
    # diag blocks A_i = W[i*s:(i+1)*s, i*s:(i+1)*s]
    idx = jnp.arange(nb)
    A = jax.vmap(
        lambda i: lax.dynamic_slice(W, (i * s, i * s), (s, s))
    )(idx)
    # subdiag blocks B_i = W[i*s:(i+1)*s, (i-1)*s:i*s], B_0 = 0
    B = jax.vmap(
        lambda i: lax.dynamic_slice(
            W, (i * s, jnp.maximum(i - 1, 0) * s), (s, s)
        )
    )(idx)
    B = B.at[0].set(jnp.zeros((s, s), W.dtype))
    return A, B


class TridiagFactorization:
    """Factor of the permuted padded block-tridiagonal matrix.

    Solves in f32 with optional f64 refinement against the full matrix.
    """

    def __init__(self, Ls, Ds, Ds_lu, plan: BandedPlan, WW, n_refine: int = 2,
                 scale=None):
        self.Ls = Ls            # (nb, s, s) L_i factors (L_0 unused)
        self.Ds = Ds            # (nb, s, s) Schur diagonal blocks
        self.Ds_lu = Ds_lu      # tuple (lu, piv) of (nb, s, s) diag LUs
        self.plan = plan
        self.WW = WW            # original (unpermuted, unpadded) f64 matrix
        self.n_refine = n_refine
        self.scale = scale      # Jacobi equilibration diag (permuted order)

    def _solve32(self, b: jax.Array) -> jax.Array:
        """One banded solve in f32 on the permuted padded system."""
        plan = self.plan
        s, nb, n = plan.block, plan.n_blocks, plan.n
        npad = nb * s
        perm = jnp.asarray(plan.perm)
        iperm = jnp.asarray(plan.iperm)
        bp = b[perm].astype(self.Ls.dtype)
        if self.scale is not None:
            bp = self.scale * bp
        bp = jnp.concatenate([bp, jnp.zeros((npad - n,), bp.dtype)])
        bb = bp.reshape(nb, s)

        Ls = self.Ls
        lu, piv = self.Ds_lu

        # forward: y_i = b_i - L_i y_{i-1}
        def fwd(carry, inp):
            yprev = carry
            L_i, b_i = inp
            y_i = b_i - L_i @ yprev
            return y_i, y_i

        _, ys = lax.scan(fwd, jnp.zeros((s,), bb.dtype), (Ls, bb))

        # diagonal: z_i = D_i^{-1} y_i
        zs = jax.vmap(
            lambda l_, p_, y_: jax.scipy.linalg.lu_solve((l_, p_), y_)
        )(lu, piv, ys)

        # backward: x_i = z_i - D_i^{-1} B_{i+1}^T x_{i+1}
        #         = z_i - D_i^{-1} (L_{i+1} D_i)^T x_{i+1}... use stored
        # relation: from W = L D L^T with unit-block-lower L:
        # (L^T x)_i = z_i  =>  x_i = z_i - L_{i+1}^T x_{i+1}
        def bwd(carry, inp):
            xnext = carry
            L_next, z_i = inp
            x_i = z_i - L_next.T @ xnext
            return x_i, x_i

        Ls_next = jnp.concatenate(
            [Ls[1:], jnp.zeros((1, s, s), Ls.dtype)], axis=0
        )
        _, xs = lax.scan(
            bwd, jnp.zeros((s,), zs.dtype), (Ls_next, zs), reverse=True
        )
        x = xs.reshape(npad)[:n]
        if self.scale is not None:
            x = self.scale[: n] * x
        return x[iperm]

    def solve(self, rhs: jax.Array) -> jax.Array:
        dt = rhs.dtype
        if rhs.ndim == 2:
            return jax.vmap(self.solve, in_axes=1, out_axes=1)(rhs)
        x = self._solve32(rhs).astype(dt)
        # safeguarded refinement: the f32 factor can be a DIVERGENT
        # preconditioner on ill-conditioned IPM-endgame systems; keep a
        # refined iterate only when it actually reduces the residual, so
        # the worst case is a large-but-finite direction error that the
        # IPM's addEye2Hessian adaptation then handles
        # (lib/ipmPD_CSsolver.c:393-548), never a NaN abort.
        x = jnp.where(jnp.isfinite(x), x, jnp.zeros((), dt))
        r = rhs - hdot(self.WW, x)
        for _ in range(self.n_refine):
            x2 = x + self._solve32(r).astype(dt)
            r2 = rhs - hdot(self.WW, x2)
            better = jnp.max(jnp.abs(r2)) < jnp.max(jnp.abs(r))
            better &= jnp.all(jnp.isfinite(x2))
            x = jnp.where(better, x2, x)
            r = jnp.where(better, r2, r)
        return x

    def inertia(self, tol: float = 0.0):
        """Eigenvalue-sign counts: inertia(W) = sum_i inertia(D_i) by
        Sylvester on the block LDL; batched eigvalsh in f32."""
        plan = self.plan
        w = jax.vmap(jnp.linalg.eigvalsh)(0.5 * (self.Ds + jnp.swapaxes(self.Ds, -1, -2)))
        w = w.reshape(-1)
        # identity padding contributes +1 eigenvalues; subtract them
        npad_extra = plan.n_blocks * plan.block - plan.n
        mp = jnp.sum(w > tol) - npad_extra
        mn = jnp.sum(w < -tol)
        return mp.astype(w.dtype), mn.astype(w.dtype)


def tridiag_factorize(WW: jax.Array, plan: BandedPlan, n_refine: int = 2) -> TridiagFactorization:
    """Permute + equilibrate + factor (f32) the block-tridiagonal KKT
    matrix.  The Jacobi equilibration (s = 1/sqrt(|diag|)) compresses
    the pivot dynamic range exactly as in kkt/fleet_banded.py — without
    it the f32 block elimination loses the IPM endgame on
    ill-conditioned systems."""
    perm = jnp.asarray(plan.perm)
    fdt = _factor_dtype(WW)
    WWp = WW[perm][:, perm].astype(fdt)
    s_eq = lax.rsqrt(jnp.maximum(jnp.abs(jnp.diagonal(WWp)), 1e-30))
    WWp = WWp * s_eq[:, None] * s_eq[None, :]
    A, B = _to_blocks(WWp, plan)

    s = plan.block
    # block-level pivot clamp (f32 only): the per-block LU pivots rows
    # WITHIN a block, but the block recursion itself is unpivoted, so a
    # Schur block D_i can become numerically singular on IPM-endgame
    # systems and lu_solve then emits inf (round-4 l1l2 finding: the
    # clamped/equilibrated fleet kernels sail through where this path
    # produced an inf direction).  Clamping the U diagonal is the
    # block-factor analog of the Cheng-Higham modification used by
    # kkt/dense.py and the Pallas kernels; refinement against the true
    # matrix recovers accuracy.
    clamp = 1e-7 if fdt == jnp.float32 else 0.0
    didx = jnp.arange(s)

    def _clamp_lu(lu):
        if clamp == 0.0:
            return lu
        d = lu[didx, didx]
        dc = jnp.where(
            jnp.abs(d) < clamp,
            jnp.where(d >= 0, clamp, -clamp).astype(lu.dtype),
            d,
        )
        return lu.at[didx, didx].set(dc)

    def step(carry, inp):
        Dprev_lu, Dprev_piv = carry
        A_i, B_i = inp
        # L_i = B_i D_{i-1}^{-1}  ->  solve D_{i-1}^T L_i^T = B_i^T
        L_i = jax.scipy.linalg.lu_solve(
            (Dprev_lu, Dprev_piv), B_i.T, trans=1
        ).T
        D_i = A_i - L_i @ B_i.T
        lu_i, piv_i = jax.scipy.linalg.lu_factor(D_i)
        lu_i = _clamp_lu(lu_i)
        return (lu_i, piv_i), (L_i, D_i, lu_i, piv_i)

    lu0, piv0 = jax.scipy.linalg.lu_factor(A[0])
    lu0 = _clamp_lu(lu0)
    # first stage: L_0 = 0, D_0 = A_0
    (_, _), (Ls_rest, Ds_rest, lus_rest, pivs_rest) = lax.scan(
        step, (lu0, piv0), (A[1:], B[1:])
    )
    Ls = jnp.concatenate([jnp.zeros((1, s, s), fdt), Ls_rest], axis=0)
    Ds = jnp.concatenate([A[0][None], Ds_rest], axis=0)
    lus = jnp.concatenate([lu0[None], lus_rest], axis=0)
    pivs = jnp.concatenate([piv0[None], pivs_rest], axis=0)
    return TridiagFactorization(
        Ls, Ds, (lus, pivs), plan, WW, n_refine=n_refine, scale=s_eq
    )
