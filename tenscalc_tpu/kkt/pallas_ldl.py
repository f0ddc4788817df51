"""Pallas TPU kernel: fused blocked unpivoted LDL^T factorization and
triangular solves.

This is the TPU-native replacement for the reference's *generated
straight-line scalar factorization code*: TensCalc unrolls the sparse
LDL to one scalar C instruction per nonzero so the whole factorization
runs with zero interpreter overhead (lib/@csparse/sparsity_ldl.m:161-222).
Here the same effect — the entire factorization in ONE kernel launch, no
per-op dispatch — is achieved with a single Pallas program: the matrix
lives in VMEM, panels are factored with VPU rank-1 steps, and each
trailing update is one MXU contraction.

Mosaic TPU constraints shape the layout: dynamic *lane* (last-dim)
indexing is illegal, so the factorization is row-oriented — it produces
``Lt = L^T`` (row c of Lt is column c of L), every dynamic access is a
sublane row read, scalars are extracted/inserted with full-width masks,
and transposed products are expressed as ``dot_general`` contractions
over the leading axis instead of materialized transposes.

Like the reference (and kkt/dense.py) there is NO pivoting; robustness
comes from the IPM's adaptive addEye2Hessian regularization.  The D
diagonal is returned for inertia (Sylvester).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from .dense import hdot

BS = 128  # panel width = MXU/VPU lane count

_DN_OUTER = (((0,), (0,)), ((), ()))  # contract leading axes: A^T @ B


def _ldl_kernel(nb: int, clamp: float, n_steps: int, A_ref, Lt_ref, d_ref, M):
    """Row-oriented LDL: Lt[c, :] = column c of L; M is updated row-wise.

    ``clamp > 0`` applies the Cheng-Higham pivot modification
    d_j <- sign(d_j) max(|d_j|, clamp), bounding elimination growth on
    near-singular pivots (same contract as kkt/dense.py _ldl_block) —
    required for f32 robustness on IPM endgame KKT matrices.

    ``n_steps`` bounds the sequential elimination to the REAL matrix
    size: the pad-to-BS region is identity (off-diagonal zero), so its
    elimination steps are no-ops — skipping them cuts the critical path
    4x for the common n~32 condensed KKT padded to 128."""
    n = nb * BS
    M[:] = A_ref[:]
    Lt_ref[:] = jnp.zeros((n, n), jnp.float32)
    d_ref[:] = jnp.ones((1, n), jnp.float32)
    cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    for k in range(nb):  # static unroll over panels
        base = k * BS
        steps = min(max(n_steps - base, 0), BS)
        if steps == 0:
            break

        def panel_step(j, _):
            c = base + j
            rowc = M[pl.ds(c, 1), :]                       # (1, n)
            dj = jnp.sum(jnp.where(cols == c, rowc, 0.0))
            if clamp > 0.0:
                s = jnp.where(dj >= 0.0, jnp.ones_like(dj), -jnp.ones_like(dj))
                dj = s * jnp.maximum(jnp.abs(dj), clamp)
            r = jnp.where(cols > c, rowc / dj, 0.0)        # (1, n) = L[:,c]^T
            Lt_ref[pl.ds(c, 1), :] = r
            d_ref[:] = jnp.where(cols == c, dj, d_ref[:])
            # rank-1 update of this panel's ROWS (full width):
            # M[base+i, :] -= dj * r[base+i] * r[:]  for i in 0..BS-1
            rp = r[:, base : base + BS]                    # (1, BS) static
            outer = lax.dot_general(
                rp, r, _DN_OUTER, preferred_element_type=jnp.float32
            )                                              # (BS, n)
            M[base : base + BS, :] = M[base : base + BS, :] - dj * outer
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(steps), panel_step, jnp.int32(0))

        if k < nb - 1 and n_steps > base + BS:
            # trailing rows update via the MXU:
            # M[t, :] -= sum_j d_j * Lt[j, t] * Lt[j, :]  (j in panel)
            Rp = Lt_ref[base : base + BS, :]               # (BS, n)
            dk = d_ref[:, base : base + BS]                # (1, BS)
            A = Rp[:, base + BS :]                         # (BS, n_trail)
            B = Rp * lax.dot_general(
                dk, jnp.ones((1, 1), jnp.float32), _DN_OUTER,
                preferred_element_type=jnp.float32,
            )                                              # dk as (BS,1) bcast
            M[base + BS :, :] = M[base + BS :, :] - lax.dot_general(
                A, B, _DN_OUTER, preferred_element_type=jnp.float32
            )

    # unit "diagonal" of L (Lt diagonal)
    rows_eq = lax.broadcasted_iota(jnp.int32, (n, n), 0) == lax.broadcasted_iota(
        jnp.int32, (n, n), 1
    )
    Lt_ref[:] = jnp.where(rows_eq, 1.0, Lt_ref[:])


def _solve_kernel(n: int, n_steps: int, Lt_ref, d_ref, b_ref, x_ref, y):
    """Substitutions with Lt = L^T, all vectors as (1, n) rows.

    ``n_steps`` bounds the sweeps to the real system size (the padded
    tail is identity with b = 0, so its steps are no-ops)."""
    cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    y[:] = b_ref[:]

    # forward L y = b, right-looking scatter:
    # after y[c] is final, y[j] -= L[j,c] y[c] = Lt[c,j] y[c] for j > c
    def fwd(c, _):
        yc = jnp.sum(jnp.where(cols == c, y[:], 0.0))
        r = Lt_ref[pl.ds(c, 1), :]                         # (1, n)
        y[:] = y[:] - yc * jnp.where(cols > c, r, 0.0)
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), fwd, jnp.int32(0))
    y[:] = y[:] / d_ref[:]

    # backward L^T x = y, left-looking:
    # x[c] = y[c] - sum_{j>c} Lt[c,j] x[j]
    def bwd(i, _):
        c = n_steps - 1 - i
        r = Lt_ref[pl.ds(c, 1), :]
        acc = jnp.sum(jnp.where(cols > c, r * y[:], 0.0))
        y[:] = jnp.where(cols == c, y[:] - acc, y[:])
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), bwd, jnp.int32(0))
    x_ref[:] = y[:]


def _factor_solve_kernel(nb: int, clamp: float, n_steps: int, A_ref,
                         b_ref, Lt_ref, d_ref, x_ref, M, y):
    """Fused LDL factor + one solve in a single launch (the factor
    stays in VMEM for the substitutions — one kernel dispatch fewer
    per IPM iteration on the latency-bound single-instance path)."""
    _ldl_kernel(nb, clamp, n_steps, A_ref, Lt_ref, d_ref, M)
    n = nb * BS
    _solve_kernel(n, n_steps, Lt_ref, d_ref, b_ref, x_ref, y)


def _pad_to_blocks(A):
    n = A.shape[-1]
    nb = -(-n // BS)
    npad = nb * BS
    if npad == n:
        return A.astype(jnp.float32), n, nb
    Ap = jnp.eye(npad, dtype=jnp.float32).at[:n, :n].set(A.astype(jnp.float32))
    return Ap, n, nb


@functools.partial(jax.jit, static_argnames=("interpret", "clamp"))
def pallas_ldl_factor(A, interpret: bool = False, clamp: float = 0.0):
    """Fused LDL^T of a symmetric matrix (f32): returns (Lt, d) with
    Lt = L^T (row c of Lt holds column c of unit-lower L)."""
    Ap, n, nb = _pad_to_blocks(A)
    npad = nb * BS
    Lt, d = pl.pallas_call(
        functools.partial(_ldl_kernel, nb, clamp, n),
        out_shape=(
            jax.ShapeDtypeStruct((npad, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((npad, npad), jnp.float32)],
        interpret=interpret,
    )(Ap)
    return Lt[:n, :n], d[0, :n]


@functools.partial(jax.jit, static_argnames=("interpret", "clamp"))
def pallas_ldl_factor_solve(A, b, interpret: bool = False,
                            clamp: float = 0.0):
    """Fused LDL^T factor + one solve: returns (Lt, d, x)."""
    Ap, n, nb = _pad_to_blocks(A)
    npad = nb * BS
    bp = jnp.zeros((1, npad), jnp.float32).at[0, :n].set(
        b.astype(jnp.float32)
    )
    Lt, d, x = pl.pallas_call(
        functools.partial(_factor_solve_kernel, nb, clamp, n),
        out_shape=(
            jax.ShapeDtypeStruct((npad, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((npad, npad), jnp.float32),
            pltpu.VMEM((1, npad), jnp.float32),
        ],
        interpret=interpret,
    )(Ap, bp)
    return Lt[:n, :n], d[0, :n], x[0, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_ldl_solve(Lt, d, b, interpret: bool = False):
    """Solve (L diag(d) L^T) x = b with one fused substitution kernel;
    ``Lt`` is the transposed factor from :func:`pallas_ldl_factor`."""
    n = Lt.shape[-1]
    nb = -(-n // BS)
    npad = nb * BS
    if npad != n:
        Ltp = jnp.eye(npad, dtype=jnp.float32).at[:n, :n].set(
            Lt.astype(jnp.float32)
        )
        dp = jnp.ones((npad,), jnp.float32).at[:n].set(d.astype(jnp.float32))
        bp = jnp.zeros((npad,), jnp.float32).at[:n].set(b.astype(jnp.float32))
    else:
        Ltp, dp, bp = (
            Lt.astype(jnp.float32),
            d.astype(jnp.float32),
            b.astype(jnp.float32),
        )
    x = pl.pallas_call(
        functools.partial(_solve_kernel, npad, n),
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, npad), jnp.float32)],
        interpret=interpret,
    )(Ltp, dp.reshape(1, npad), bp.reshape(1, npad))
    return x[0, :n]


class PallasLDLFactorization:
    """KKT-backend adapter: Pallas f32 LDL with f64 iterative refinement
    and inertia from the D diagonal."""

    def __init__(self, WW, n_refine: int = 2, interpret: bool = False,
                 clamp: float = 0.0):
        self.WW = WW
        self.n_refine = n_refine
        self.interpret = interpret
        self.Lt, self.d = pallas_ldl_factor(WW, interpret=interpret,
                                            clamp=clamp)

    def _solve32(self, rhs):
        return pallas_ldl_solve(self.Lt, self.d, rhs, interpret=self.interpret)

    def solve(self, rhs):
        if rhs.ndim == 2:
            return jax.vmap(self.solve, in_axes=1, out_axes=1)(rhs)
        dt = rhs.dtype
        x = self._solve32(rhs).astype(dt)
        for _ in range(self.n_refine):
            x = x + self._solve32(rhs - hdot(self.WW, x)).astype(dt)
        return x

    def inertia(self, tol: float = 0.0):
        mp = jnp.sum(self.d > tol).astype(jnp.result_type(self.WW))
        mn = jnp.sum(self.d < -tol).astype(jnp.result_type(self.WW))
        return mp, mn


def pallas_kkt_factorize(WW, n_refine: int = 2, interpret: bool = False,
                         clamp: float = 0.0):
    return PallasLDLFactorization(WW, n_refine=n_refine, interpret=interpret,
                                  clamp=clamp)
