"""Fleet LDL^T: batched factorization with the BATCH in the lane axis.

The TPU-native answer to TensCalc's implicit strength — solving the same
small problem thousands of times (SURVEY.md §2.9 "batch/scenario
parallelism"; the reference's Tmpc calls one scalar C solver per
timestep, lib/Tmpc.m:667).  XLA's batched ``lu_factor`` under ``vmap``
is *step-latency* bound on TPU: each of the n pivoting steps is a tiny
op, so a (B, n, n) factorization runs ~100x below peak.

Here the batch is laid out as the minor (lane) dimension: the working
set is an (n, n, TILE) VMEM block with TILE instances in the 128-wide
lanes, so every elimination step — pivot extract, column scale, rank-1
trailing update — is a full-width VPU op processing TILE matrices at
once, with **no data-dependent control flow and no per-instance
serialization**.  One kernel invocation factors TILE matrices; the grid
walks the batch.  There is no pivoting (same contract as kkt/dense.py):
robustness in f32 comes from Cheng-Higham pivot clamping + iterative
refinement, and the IPM's adaptive addEye2Hessian (reference analog:
lib/@csparse/sparsity_ldl.m:188 + lib/ipmPD_CSsolver.c:393-548).

Integration: :func:`fleet_ldl_factor` / :func:`fleet_ldl_solve` are
``jax.custom_batching.custom_vmap`` functions — per-instance semantics
(used unbatched they fall back to the dense blocked LDL), but under
``vmap`` the whole batch is routed into the fleet kernels.  This makes
them drop-in for the IPM's KKT backend inside ``vmap``-batched solves
(parallel/batch.py).

VMEM budget: the block is n*n*TILE*4 bytes; TILE is chosen as the
largest of {128, 64, 32, 16, 8} that keeps the working set under
~10 MB (v5e VMEM is ~16 MB/core).  n up to ~181 runs at full 128-lane
width — the condensed (smallerNewtonMatrix) KKT of typical MPC problems
lands well inside this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense import ldl_factor, ldl_solve
from .dense import hdot

_VMEM_BUDGET = 13 * 1024 * 1024  # bytes, leave headroom of ~16MB/core

TILE = 128  # Mosaic requires lane-dim blocks in multiples of 128


def _fits_vmem(n: int) -> bool:
    """The aliased (n, n, TILE) working set must fit VMEM; above this
    the batched entry points fall back to the dense blocked LDL."""
    return n * n * TILE * 4 <= _VMEM_BUDGET


def _pad_n(n: int) -> int:
    return max(8, -(-n // 8) * 8)  # sublane multiple


# ---------------------------------------------------------------------------
# kernels (layout: matrices (n, n, TILE), vectors (n, TILE))
# ---------------------------------------------------------------------------

def _fleet_factor_kernel(n: int, tile: int, clamp: float,
                         A_hbm, L_hbm, d_hbm, M, dv, sem):
    """In-VMEM LDL of TILE matrices at once.

    The batch slab is DMA'd HBM -> one VMEM scratch, factored in place,
    and DMA'd back — a single (n, n, TILE) working set (a pipelined
    BlockSpec would double-buffer both input and output and blow the
    ~16 MB VMEM budget).  After step j, row j of M holds L[:, j]
    (the symmetric elimination keeps rows == columns), dv the pivots.
    Every op below is a full (n, n, TILE) or (n, TILE) VPU op — nothing
    is per-instance.
    """
    i = jnp.int32(pl.program_id(0))
    cp_in = pltpu.make_async_copy(A_hbm.at[:, :, pl.ds(i * tile, tile)], M, sem)
    cp_in.start()
    cp_in.wait()
    dv[:] = jnp.ones_like(dv)
    # iota over the row axis of (n, TILE) slices
    ridx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def step(j, _):
        row = M[j, :, :]                          # (n, TILE): row j == col j
        # pivot = row[j], extracted with a full-width masked reduce
        # (dynamic lane indexing is illegal; row-axis masking is fine)
        mask_j = ridx == j
        dj = jnp.sum(jnp.where(mask_j, row, 0.0), axis=0, keepdims=True)  # (1, TILE)
        if clamp > 0.0:
            s = jnp.where(dj >= 0.0, jnp.ones_like(dj), -jnp.ones_like(dj))
            dj = s * jnp.maximum(jnp.abs(dj), clamp)
        below = ridx > j
        r = jnp.where(below, row / dj, 0.0)       # (n, TILE): L[:, j]
        # store factor row: L[:, j] below the diagonal slot, pivot at [j, j]
        M[j, :, :] = r + jnp.where(mask_j, dj, 0.0)
        dv[j, :] = dj[0]
        # trailing rank-1 update, full-width masked:
        #   M[i, k] -= dj * r[i] * r[k]   (only i, k > j contribute)
        M[:, :, :] = M[:, :, :] - (dj * r)[:, None, :] * r[None, :, :]
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(n), step, jnp.int32(0), unroll=False)
    cp_L = pltpu.make_async_copy(M, L_hbm.at[:, :, pl.ds(i * tile, tile)], sem)
    cp_L.start()
    cp_L.wait()
    cp_d = pltpu.make_async_copy(dv, d_hbm.at[:, pl.ds(i * tile, tile)], sem)
    cp_d.start()
    cp_d.wait()


def _fleet_solve_kernel(n: int, tile: int, L_hbm, d_hbm, b_hbm, x_hbm,
                        Lv, xv, dv, sem):
    """Two substitutions for TILE systems at once.

    ``L_hbm`` is the factor from :func:`_fleet_factor_kernel`: row j
    holds L[:, j] (zero above j; the pivot copy at [j, j] is masked off
    here).
    """
    i = jnp.int32(pl.program_id(0))
    cp_L = pltpu.make_async_copy(L_hbm.at[:, :, pl.ds(i * tile, tile)], Lv, sem)
    cp_L.start()
    cp_L.wait()
    cp_d = pltpu.make_async_copy(d_hbm.at[:, pl.ds(i * tile, tile)], dv, sem)
    cp_d.start()
    cp_d.wait()
    cp_b = pltpu.make_async_copy(b_hbm.at[:, pl.ds(i * tile, tile)], xv, sem)
    cp_b.start()
    cp_b.wait()
    ridx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    # forward: L y = b (unit lower), right-looking scatter
    def fwd(j, _):
        mask_j = ridx == j
        yj = jnp.sum(jnp.where(mask_j, xv[:, :], 0.0), axis=0, keepdims=True)
        col = jnp.where(ridx > j, Lv[j, :, :], 0.0)      # L[:, j]
        xv[:, :] = xv[:, :] - yj * col
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(n), fwd, jnp.int32(0), unroll=False)
    xv[:, :] = xv[:, :] / dv[:, :]

    # backward: L^T x = y, left-looking gather per row
    def bwd(i_, _):
        j = n - 1 - i_
        col = jnp.where(ridx > j, Lv[j, :, :], 0.0)      # L[:, j]
        acc = jnp.sum(col * xv[:, :], axis=0, keepdims=True)  # (1, TILE)
        mask_j = ridx == j
        xv[:, :] = jnp.where(mask_j, xv[:, :] - acc, xv[:, :])
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(n), bwd, jnp.int32(0), unroll=False)
    cp_x = pltpu.make_async_copy(xv, x_hbm.at[:, pl.ds(i * tile, tile)], sem)
    cp_x.start()
    cp_x.wait()


# ---------------------------------------------------------------------------
# batched entry points (operate on (B, n, n) / (B, n))
# ---------------------------------------------------------------------------

def _interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


@functools.partial(jax.jit, static_argnames=("clamp",))
def fleet_ldl_factor_batched(A: jax.Array, clamp: float = 0.0):
    """LDL^T of a batch: A (B, n, n) f32 -> (L (B, n, n), d (B, n)).

    ``L`` rows hold columns of the unit-lower factor (see kernel doc);
    consume it through :func:`fleet_ldl_solve_batched`.
    """
    B, n = A.shape[0], A.shape[-1]
    npad = _pad_n(n)
    if not _fits_vmem(npad):
        return jax.vmap(lambda M: ldl_factor(M.astype(jnp.float32), clamp=clamp))(A)
    tile = TILE
    Bpad = -(-B // tile) * tile
    Ap = jnp.zeros((Bpad, npad, npad), jnp.float32)
    Ap = Ap.at[:, jnp.arange(npad), jnp.arange(npad)].set(1.0)
    Ap = Ap.at[:B, :n, :n].set(A.astype(jnp.float32))
    # batch to the lanes
    Al = jnp.transpose(Ap, (1, 2, 0))            # (n, n, Bpad)

    L, d = pl.pallas_call(
        functools.partial(_fleet_factor_kernel, npad, tile, clamp),
        grid=(Bpad // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, npad, Bpad), jnp.float32),
            jax.ShapeDtypeStruct((npad, Bpad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((npad, npad, tile), jnp.float32),
            pltpu.VMEM((npad, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(Al)
    L = jnp.transpose(L, (2, 0, 1))[:B, :n, :n]
    d = jnp.transpose(d, (1, 0))[:B, :n]
    return L, d


@jax.jit
def fleet_ldl_solve_batched(L: jax.Array, d: jax.Array, b: jax.Array):
    """Solve (L diag(d) L^T) x = b for a batch: (B, n, n), (B, n), (B, n)."""
    B, n = b.shape
    npad = _pad_n(n)
    if not _fits_vmem(npad):
        # matches the factor fallback (standard unit-lower L format)
        return jax.vmap(ldl_solve)(L, d, b.astype(jnp.float32))
    tile = TILE
    Bpad = -(-B // tile) * tile
    Lp = jnp.zeros((Bpad, npad, npad), jnp.float32)
    Lp = Lp.at[:B, :n, :n].set(L.astype(jnp.float32))
    dp = jnp.ones((Bpad, npad), jnp.float32).at[:B, :n].set(d.astype(jnp.float32))
    bp = jnp.zeros((Bpad, npad), jnp.float32).at[:B, :n].set(b.astype(jnp.float32))
    Ll = jnp.transpose(Lp, (1, 2, 0))
    dl = jnp.transpose(dp, (1, 0))
    bl = jnp.transpose(bp, (1, 0))

    x = pl.pallas_call(
        functools.partial(_fleet_solve_kernel, npad, tile),
        grid=(Bpad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((npad, Bpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((npad, npad, tile), jnp.float32),
            pltpu.VMEM((npad, tile), jnp.float32),
            pltpu.VMEM((npad, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(Ll, dl, bl)
    return jnp.transpose(x, (1, 0))[:B, :n]


# ---------------------------------------------------------------------------
# custom_vmap wrappers: per-instance API, fleet execution under vmap
# ---------------------------------------------------------------------------

# single-instance Pallas LDL size cap: the fused kernel holds
# ~3 npad^2 f32 in VMEM (A + Lt + M scratch); npad <= 896 keeps it
# under ~10 MB.  Larger single instances use the XLA blocked LDL,
# whose MXU trailing updates dominate at that size anyway.
_PALLAS_SINGLE_MAX = 896


def _pallas_single_ok(n: int) -> bool:
    return not _interpret() and n <= _PALLAS_SINGLE_MAX


@functools.partial(jax.custom_batching.custom_vmap)
def fleet_ldl_factor(A: jax.Array):
    """Per-instance LDL that turns into the fleet kernel under vmap."""
    if _pallas_single_ok(A.shape[-1]):
        # unbatched on real TPU: ONE fused Mosaic kernel.  The XLA
        # blocked/unrolled LDL emits ~6 ops per elimination step and
        # each op pays ~0.5-0.7 us of TPU sequencing — measured 300
        # ops/~80 us per IPM iteration on the n=32 sls KKT (round-4
        # trace), vs a single kernel launch here.  Formats differ
        # (Lt = L^T rows) but the (factor, solve) pair is consistent
        # and opaque to callers.
        from .pallas_ldl import pallas_ldl_factor

        return pallas_ldl_factor(A, clamp=1e-7)
    # CPU / interpret: dense blocked LDL (kkt/dense.py)
    return ldl_factor(A, clamp=1e-7)


@fleet_ldl_factor.def_vmap
def _fleet_factor_vmap(axis_size, in_batched, A):
    (a_b,) = in_batched
    assert a_b, "fleet_ldl_factor: operand must be batched"
    L, d = fleet_ldl_factor_batched(A, clamp=1e-7)
    return (L, d), (True, True)


@jax.custom_batching.custom_vmap
def fleet_ldl_solve(L: jax.Array, d: jax.Array, b: jax.Array):
    # unbatched fallback path; the factor format matches whatever the
    # unbatched fleet_ldl_factor produced (Pallas Lt on TPU, standard
    # L from the dense blocked LDL elsewhere) — the gates agree because
    # both see the same n
    if _pallas_single_ok(L.shape[-1]):
        from .pallas_ldl import pallas_ldl_solve

        return pallas_ldl_solve(L, d, b)
    return ldl_solve(L, d, b)


@fleet_ldl_solve.def_vmap
def _fleet_solve_vmap(axis_size, in_batched, L, d, b):
    lb, db, bb = in_batched
    assert lb and db, "fleet_ldl_solve: factor must be batched"
    if not bb:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    return fleet_ldl_solve_batched(L, d, b), True


@jax.custom_batching.custom_vmap
def fleet_ldl_factor_solve(A: jax.Array, b: jax.Array):
    """Fused factor + one solve: unbatched on real TPU this is ONE
    Mosaic launch (pallas_ldl._factor_solve_kernel) — one dispatch
    fewer per iteration on the latency-bound single-instance path."""
    if _pallas_single_ok(A.shape[-1]):
        from .pallas_ldl import pallas_ldl_factor_solve

        return pallas_ldl_factor_solve(A, b, clamp=1e-7)
    L, d = ldl_factor(A, clamp=1e-7)
    return L, d, ldl_solve(L, d, b)


@fleet_ldl_factor_solve.def_vmap
def _fleet_factor_solve_vmap(axis_size, in_batched, A, b):
    ab, bb = in_batched
    assert ab, "fleet_ldl_factor_solve: operand must be batched"
    if not bb:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    L, d = fleet_ldl_factor_batched(A, clamp=1e-7)
    x = fleet_ldl_solve_batched(L, d, b)
    return (L, d, x), (True, True, True)


class FleetLDLFactorization:
    """KKT-backend adapter (same contract as kkt/dense.py): f32 fleet
    factor + refinement against the true matrix; inertia from d.

    The matrix is symmetrically Jacobi-equilibrated (S W S with
    S = diag(rsqrt(max_k |W[i, k]|))) before the unpivoted f32
    elimination — the same preconditioning that restored pivoted-LU
    iteration counts on the banded fleet kernel (kkt/fleet_banded.py,
    round-2 finding: 18 vs 41 lockstep iterations unequilibrated).
    Congruence preserves inertia, so the D sign counts remain valid."""

    def __init__(self, WW, n_refine: int = 2):
        self.WW = WW
        self.n_refine = n_refine
        W32 = WW.astype(jnp.float32)
        s = lax.rsqrt(jnp.maximum(jnp.max(jnp.abs(W32), axis=-1), 1e-30))
        self.s = s
        self._Ws = s[:, None] * W32 * s[None, :]
        self.L = self.d = None  # lazy: first solve fuses factor+solve

    def _solve32(self, rhs):
        bs = self.s * rhs.astype(jnp.float32)
        if self.L is None:
            self.L, self.d, y = fleet_ldl_factor_solve(self._Ws, bs)
        else:
            y = fleet_ldl_solve(self.L, self.d, bs)
        return self.s * y

    def solve(self, rhs):
        if rhs.ndim == 2:
            # unrolled loop over the (few) rhs columns — a vmap here
            # would wrap the custom_vmap rule with an axis the factor
            # isn't batched over
            cols = [self.solve(rhs[:, k]) for k in range(rhs.shape[1])]
            return jnp.stack(cols, axis=1)
        dt = rhs.dtype
        x = self._solve32(rhs).astype(dt)
        for _ in range(self.n_refine):
            x = x + self._solve32(rhs - hdot(self.WW, x)).astype(dt)
        return x

    def inertia(self, tol: float = 0.0):
        if self.d is None:
            self.L, self.d = fleet_ldl_factor(self._Ws)
        rt = jnp.result_type(self.WW)
        mp = jnp.sum(self.d > tol).astype(rt)
        mn = jnp.sum(self.d < -tol).astype(rt)
        return mp, mn


def fleet_kkt_factorize(WW, n_refine: int = 2):
    return FleetLDLFactorization(WW, n_refine=n_refine)
