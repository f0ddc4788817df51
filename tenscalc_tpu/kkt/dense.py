"""Dense unpivoted LDL^T factorization for symmetric-indefinite KKT systems.

TPU-native replacement for the reference's symbolic sparse LDL unrolled to
straight-line scalar C (lib/@csparse/sparsity_ldl.m:161-222).  Like the
reference we factor *without pivoting* (sparsity_ldl.m:188 errors out when
pivoting would be needed); robustness comes from the IPM's adaptive
``addEye2Hessian`` regularization with curvature/inertia monitoring
(lib/ipmPD_CSsolver.c:393-548), not from pivoting.

Two implementations with identical semantics:

* :func:`ldl_factor_unblocked` — one lax.fori_loop step per column;
  simple, used as the reference oracle in tests.
* :func:`ldl_factor` — blocked right-looking variant: the diagonal block
  is factored with the unblocked kernel, the panel is formed with a
  triangular solve, and the trailing update is a single matmul that XLA
  maps onto the MXU.  Block size is chosen to balance the sequential
  critical path against MXU utilization.

Returns (L, d) with unit lower-triangular L and diagonal d; inertia is
``(#d>0, #d<0)`` exactly as the reference computes it via
``sum(heaviside(±dHess))`` (lib/ipmPD_CS.m:277-279).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def hdot(A: jax.Array, x: jax.Array) -> jax.Array:
    """Matmul at HIGHEST precision.

    On TPU, f32 ``@`` lowers to bf16 MXU passes (~8-bit mantissa) by
    default.  That is fine for bulk Hessian/Jacobian assembly, but
    *refinement residuals* (``rhs - WW @ x``) and the *direction-error
    metric* (``||WW dx - b||_inf``, gated at maxDirectionError=1e-6,
    lib/ipmPD_CSsolver.c:393-548) must be computed exactly: a rounded
    residual caps the mixed-precision solve at bf16 accuracy, and a
    rounded metric can never pass the 1e-6 gate once ``WW`` carries the
    large lambda/F entries of a warm start, ratcheting addEye2Hessian to
    its ceiling (status 2048).  These are O(n^2) matvecs — exactness,
    not throughput, is the point.  On CPU this is a no-op."""
    return jnp.matmul(A, x, precision=jax.lax.Precision.HIGHEST)


def ldl_factor_unblocked(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Column-by-column unpivoted LDL^T: A = L diag(d) L^T.

    O(n) sequential steps, each a rank-1 masked update of the trailing
    matrix.  Shapes are static; no pivoting.
    """
    n = A.shape[-1]
    idx = jnp.arange(n)

    def body(j, carry):
        L, d, M = carry
        dj = M[j, j]
        col = jnp.where(idx > j, M[:, j] / dj, 0.0)
        L = L.at[:, j].set(col)
        d = d.at[j].set(dj)
        M = M - dj * jnp.outer(col, col)
        return L, d, M

    L0 = jnp.zeros_like(A)
    d0 = jnp.zeros(n, dtype=A.dtype)
    L, d, _ = lax.fori_loop(0, n, body, (L0, d0, A))
    return L + jnp.eye(n, dtype=A.dtype), d


_UNROLL_MAX = 64  # static unroll bound: ~6 ops/step, trace stays small


def _ldl_block(M: jax.Array, clamp: float = 0.0) -> tuple[jax.Array, jax.Array]:
    """Unblocked LDL of a small b x b block.

    For b <= 64 the elimination is STATICALLY UNROLLED: on TPU every
    ``lax.fori_loop`` iteration costs ~2-5 us of loop/region overhead
    (measured: a 32-step fori LDL of a 32x32 KKT ran at ~77 us while the
    arithmetic is ~10 us), so a python-range loop that XLA fuses into
    straight-line code is the single-instance fast path — the exact
    analog of the reference's unrolled scalar LDL
    (lib/@csparse/sparsity_ldl.m:161-222).  Larger blocks keep the
    fori_loop to bound trace size.

    ``clamp > 0`` applies Cheng-Higham-style pivot modification:
    d_j <- sign(d_j) max(|d_j|, clamp), bounding elimination growth on
    near-singular pivots (the factorization then preconditions an
    iterative refinement against the true matrix).
    """
    b = M.shape[-1]
    idx = jnp.arange(b)

    def body(j, carry):
        L, d, M = carry
        dj = M[j, j]
        if clamp > 0.0:
            s = jnp.where(dj >= 0, jnp.ones_like(dj), -jnp.ones_like(dj))
            dj = s * jnp.maximum(jnp.abs(dj), clamp)
        col = jnp.where(idx > j, M[:, j] / dj, 0.0)
        L = L.at[:, j].set(col)
        d = d.at[j].set(dj)
        M = M - dj * jnp.outer(col, col)
        return L, d, M

    carry = (jnp.zeros_like(M), jnp.zeros(b, dtype=M.dtype), M)
    if b <= _UNROLL_MAX:
        for j in range(b):
            carry = body(j, carry)
        L, d, _ = carry
    else:
        L, d, _ = lax.fori_loop(0, b, body, carry)
    return L + jnp.eye(b, dtype=M.dtype), d


@partial(jax.jit, static_argnames=("block", "clamp"))
def ldl_factor(A: jax.Array, block: int = 64, clamp: float = 0.0) -> tuple[jax.Array, jax.Array]:
    """Blocked right-looking unpivoted LDL^T.

    Processes ``block`` columns at a time: factor the diagonal block,
    compute the panel via a (unit-lower) triangular solve, then update the
    trailing submatrix with one matmul.  Masking keeps every shape static
    so the whole factorization lives in one XLA computation.
    """
    n = A.shape[-1]
    if n == 0:
        return jnp.zeros_like(A), jnp.zeros((0,), dtype=A.dtype)
    if n <= block:
        return _ldl_block(A, clamp=clamp)

    nb = -(-n // block)  # ceil
    npad = nb * block
    if npad != n:
        # pad with identity so the factorization of the padded matrix
        # restricted to the leading n x n block equals that of A
        Ap = jnp.eye(npad, dtype=A.dtype)
        Ap = Ap.at[:n, :n].set(A)
        L, d = ldl_factor(Ap, block=block, clamp=clamp)
        return L[:n, :n], d[:n]

    rows = jnp.arange(n)

    def body(k, carry):
        L, d, M = carry
        j0 = k * block
        # diagonal block factor
        Mkk = lax.dynamic_slice(M, (j0, j0), (block, block))
        Lkk, dk = _ldl_block(Mkk, clamp=clamp)
        # panel: all rows, block columns (mask rows <= j0+block-ish)
        panel = lax.dynamic_slice(M, (0, j0), (n, block))
        # solve X * (Lkk dk)^T = panel  =>  X = panel * Lkk^{-T} * dk^{-1}
        X = lax.linalg.triangular_solve(
            Lkk, panel, left_side=False, lower=True, transpose_a=True,
            unit_diagonal=True,
        )
        X = X / dk[None, :]
        below = rows[:, None] >= (j0 + block)
        Xm = jnp.where(below, X, 0.0)
        # trailing update: M -= Xm * dk * Xm^T  (one MXU matmul)
        M = M - jnp.matmul(Xm * dk[None, :], Xm.T,
                           precision=jax.lax.Precision.HIGHEST)
        # write L panel (unit diagonal handled at the end)
        Lpanel = jnp.where(below, X, 0.0)
        Lpanel = lax.dynamic_update_slice(
            Lpanel, jnp.tril(Lkk, -1), (j0, 0)
        )
        L = lax.dynamic_update_slice(L, Lpanel, (0, j0))
        d = lax.dynamic_update_slice(d, dk, (j0,))
        return L, d, M

    L0 = jnp.zeros_like(A)
    d0 = jnp.zeros(n, dtype=A.dtype)
    L, d, _ = lax.fori_loop(0, nb, body, (L0, d0, A))
    return L + jnp.eye(n, dtype=A.dtype), d


def ldl_solve(L: jax.Array, d: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L diag(d) L^T) x = b via two triangular solves.

    The analog of the reference's unrolled forward/back substitution
    (lib/@csparse/sparsity_mldivide_l1.m / _u1 / _d).
    """
    vec = b.ndim == 1
    bb = b[:, None] if vec else b
    y = lax.linalg.triangular_solve(
        L, bb, left_side=True, lower=True, unit_diagonal=True
    )
    y = y / d[:, None]
    x = lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True, unit_diagonal=True
    )
    return x[:, 0] if vec else x


def ldl_inertia(d: jax.Array, tol: float = 0.0) -> tuple[jax.Array, jax.Array]:
    """(#positive, #negative) eigenvalue counts from the LDL diagonal.

    By Sylvester's law of inertia these equal the eigenvalue signs of the
    factored matrix.  Matches the reference's
    ``sum(heaviside(dHess-tol)), sum(heaviside(-dHess-tol))``
    (lib/ipmPD_CS.m:277-279).
    """
    mp = jnp.sum(jnp.where(d > tol, 1.0, jnp.where(d == tol, 0.5, 0.0)))
    mn = jnp.sum(jnp.where(-d > tol, 1.0, jnp.where(-d == tol, 0.5, 0.0)))
    return mp, mn


def symmetric_solve(A: jax.Array, b: jax.Array, block: int = 64):
    """Factor + solve + inertia in one call: returns (x, d, L)."""
    L, d = ldl_factor(A, block=block)
    return ldl_solve(L, d, b), d, L


# ---------------------------------------------------------------------------
# factorization backend abstraction
# ---------------------------------------------------------------------------
# The reference generates unpivoted symbolic LDL because its runtime is
# straight-line scalar C (lib/@csparse/sparsity_ldl.m).  On TPU the
# trade-off flips: XLA's native blocked LU (pivoted) compiles in
# milliseconds and runs ~15x faster than a hand-rolled LDL, so the
# default IPM path — which needs only solve + curvature + direction
# error — uses LU.  The LDL path remains for useInertia=true, where the
# eigenvalue-sign counts from D are required (lib/ipmPD_CS.m:277-279).

class KKTFactorization:
    """'lu' (native dtype), 'lu_ir' (f32 factor + f64 iterative
    refinement — TPU's LuDecomposition only implements F32), or 'ldl'."""

    __slots__ = ("kind", "a", "b", "WW", "n_refine", "bk")

    def __init__(self, kind, a, b, WW=None, n_refine=0, bk=None):
        self.kind = kind
        self.a = a
        self.b = b
        self.WW = WW
        self.n_refine = n_refine
        self.bk = bk  # precomputed (mp, mn) from Bunch-Kaufman

    def solve(self, rhs: jax.Array) -> jax.Array:
        if self.kind == "lu":
            return jax.scipy.linalg.lu_solve((self.a, self.b), rhs)
        if self.kind == "ldl_ir":
            dt = rhs.dtype
            fdt = self.a.dtype

            def solve32(r):
                return ldl_solve(self.a, self.b, r.astype(fdt)).astype(dt)

            x = solve32(rhs)
            for _ in range(self.n_refine):
                x = x + solve32(rhs - hdot(self.WW, x))
            return x
        if self.kind == "lu_ir":
            # mixed-precision solve: O(n^3) factorization ran in f32 on
            # the MXU; refinement residuals are O(n^2) matvecs in the
            # full dtype.  Accuracy recovers to ~full precision while
            # cond(WW) stays below ~1/eps_f32; beyond that the IPM's
            # direction-error gate raises addEye2Hessian, which restores
            # conditioning (lib/ipmPD_CSsolver.c:393-548).
            dt = rhs.dtype

            def solve32(r):
                return jax.scipy.linalg.lu_solve(
                    (self.a, self.b), r.astype(jnp.float32)
                ).astype(dt)

            x = solve32(rhs)
            for _ in range(self.n_refine):
                x = x + solve32(rhs - hdot(self.WW, x))
            return x
        return ldl_solve(self.a, self.b, rhs)

    def inertia(self, tol: float = 0.0):
        if self.bk is not None:
            if tol != 0.0:
                # bk counts were baked at factor time with tol=0.0
                # (kkt_factorize); honoring a different tol here would
                # silently return wrong counts
                raise ValueError(
                    "inertia(tol != 0) unsupported on the Bunch-Kaufman "
                    "path: counts are precomputed at factor time with "
                    "tol=0.0"
                )
            mp, mn = self.bk
            dt = jnp.result_type(self.WW if self.WW is not None else self.a)
            return mp.astype(dt), mn.astype(dt)
        if self.kind in ("ldl", "ldl_ir"):
            return ldl_inertia(self.b, tol)
        z = jnp.zeros((), jnp.result_type(self.a))
        return z, z


def _lu_needs_f32() -> bool:
    """TPU's LuDecomposition is F32-only; CPU/GPU support f64."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def kkt_factorize(
    WW: jax.Array,
    need_inertia: bool,
    block: int = 64,
    n_refine: int = 2,
    force_ldl: bool = False,
):
    if force_ldl:
        # blocked LDL: slower than native LU for one instance, but
        # ~1.8x faster under vmap (batched fleets) because its panel
        # steps and MXU trailing updates vectorize over the batch.
        # In f32 the pivots are clamped (Cheng-Higham modification) and
        # accuracy restored by refinement against the true matrix.
        if WW.dtype != jnp.float64:
            clamp = 1e-7  # pivot modification; 1.5x more IPM iters than pivoted LU
            L, d = ldl_factor(WW, block=block, clamp=clamp)
            return KKTFactorization(
                "ldl_ir", L, d, WW=WW, n_refine=max(n_refine, 2)
            )
        if _lu_needs_f32():
            L, d = ldl_factor(WW.astype(jnp.float32), block=block, clamp=1e-7)
            return KKTFactorization("ldl_ir", L, d, WW=WW, n_refine=n_refine)
        L, d = ldl_factor(WW, block=block)
        return KKTFactorization("ldl", L, d)
    if need_inertia:
        if WW.dtype == jnp.float64 and not _lu_needs_f32():
            # CPU/GPU f64: unpivoted LDL gives solve + inertia in one
            # factorization with enough headroom against pivot growth.
            L, d = ldl_factor(WW, block=block)
            return KKTFactorization("ldl", L, d)
        # TPU fast inertia path: unpivoted LDL in f32 collapses on
        # ill-conditioned IPM endgame KKTs (pivot collapse, verified on
        # hardware) and f64 LDL is emulated and slow.  Instead solve
        # with XLA's pivoted f32 LU + refinement (robust, MXU-fast) and
        # take the inertia from a Bunch-Kaufman pivoted elimination,
        # which bounds element growth so the sign counts are exact in
        # f32 (kkt/bunchkaufman.py).
        from .bunchkaufman import bk_inertia

        W32 = WW.astype(jnp.float32)
        lu, piv = jax.scipy.linalg.lu_factor(W32)
        fac = KKTFactorization(
            "lu_ir", lu, piv, WW=WW, n_refine=n_refine,
            bk=bk_inertia(W32),
        )
        return fac
    if WW.dtype == jnp.float64 and _lu_needs_f32():
        lu, piv = jax.scipy.linalg.lu_factor(WW.astype(jnp.float32))
        return KKTFactorization("lu_ir", lu, piv, WW=WW, n_refine=n_refine)
    lu, piv = jax.scipy.linalg.lu_factor(WW)
    return KKTFactorization("lu", lu, piv)


def lu_solve_mixed(WW: jax.Array, rhs: jax.Array, n_refine: int = 2) -> jax.Array:
    """One-shot pivoted-LU solve honoring the TPU f32 restriction."""
    return kkt_factorize(WW, need_inertia=False, n_refine=n_refine).solve(rhs)
