"""Unsymmetric banded/block-tridiagonal LU — the structured KKT path for
the equilibrium (two-player Nash) solver.

The equilibrium first-order system stacks two different Lagrangians'
rows, so unlike the optimize/minmax KKTs it is UNSYMMETRIC; the
reference factors it with LU (useLDL=false default,
lib/private/parameters4equilibrium.m:149-150).  For horizon games
(MPC-MHE) the system is still block-banded in the stage index
(lib/ipmPDeqlat_CS.m:300-415 stacks the same banded blocks), so the
same two structured backends exist as for the symmetric case:

* :func:`tridiag_lu_factorize` — pure-XLA block-tridiagonal LU
  (lax.scan over stages, pivoted s x s block LUs) for CPU / fallback;
* :class:`FleetBandedLUFactorization` — batch-in-lanes Mosaic banded
  LU kernel (factor + two substitutions), the TPU fleet path.  Same
  playbook as kkt/fleet_banded.py (batch in the 128-wide lanes, 8-row
  fori_loop blocks with static inner unroll, concat-splices instead of
  scatters), extended to carry the superdiagonal band: storage row c is
  ``[d_c, L[c+1..c+w, c], U[c, c+1..c+w]]`` and the elimination updates
  both triangles.  No pivoting; robustness = two-sided row/col inf-norm
  equilibration + Cheng-Higham pivot clamping + iterative refinement
  against the true matrix, with the IPM's addEye2Hessian adaptation as
  the outer net.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fleet_banded import TILE, _pack_band, _pack_vec, _pad_w, _win
from .structure import BandedPlan
from .dense import hdot


# ---------------------------------------------------------------------------
# pure-XLA block-tridiagonal LU (general, unsymmetric)
# ---------------------------------------------------------------------------

def _to_blocks_lu(WWp: jax.Array, plan: BandedPlan):
    """Extract diagonal A_i, subdiagonal B_i (block (i, i-1)) and
    superdiagonal C_i (block (i-1, i)); B_0 = C_0 = 0."""
    s, nb, n = plan.block, plan.n_blocks, plan.n
    npad = nb * s
    if npad != n:
        W = jnp.eye(npad, dtype=WWp.dtype).at[:n, :n].set(WWp)
    else:
        W = WWp
    idx = jnp.arange(nb)
    A = jax.vmap(lambda i: lax.dynamic_slice(W, (i * s, i * s), (s, s)))(idx)
    B = jax.vmap(
        lambda i: lax.dynamic_slice(W, (i * s, jnp.maximum(i - 1, 0) * s), (s, s))
    )(idx)
    C = jax.vmap(
        lambda i: lax.dynamic_slice(W, (jnp.maximum(i - 1, 0) * s, i * s), (s, s))
    )(idx)
    z = jnp.zeros((s, s), W.dtype)
    return A, B.at[0].set(z), C.at[0].set(z)


class TridiagLUFactorization:
    """Block-tridiagonal LU: D_0 = A_0, L_i = B_i D_{i-1}^{-1},
    D_i = A_i - L_i C_i.  Solves in f32 + refinement in the full dtype
    (the kkt/dense.py mixed-precision contract)."""

    def __init__(self, Ls, Cs, Ds_lu, plan: BandedPlan, WW, n_refine: int = 2):
        self.Ls = Ls
        self.Cs = Cs
        self.Ds_lu = Ds_lu
        self.plan = plan
        self.WW = WW
        self.n_refine = n_refine

    def _solve32(self, b):
        plan = self.plan
        s, nb, n = plan.block, plan.n_blocks, plan.n
        npad = nb * s
        perm = jnp.asarray(plan.perm)
        iperm = jnp.asarray(plan.iperm)
        bp = b[perm].astype(self.Ls.dtype)
        bp = jnp.concatenate([bp, jnp.zeros((npad - n,), bp.dtype)])
        bb = bp.reshape(nb, s)
        Ls, Cs = self.Ls, self.Cs
        lu, piv = self.Ds_lu

        def fwd(carry, inp):
            yprev = carry
            L_i, b_i = inp
            y_i = b_i - L_i @ yprev
            return y_i, y_i

        _, ys = lax.scan(fwd, jnp.zeros((s,), bb.dtype), (Ls, bb))

        # backward: D_i x_i = y_i - C_{i+1} x_{i+1}
        def bwd(carry, inp):
            xnext = carry
            C_next, lu_i, piv_i, y_i = inp
            x_i = jax.scipy.linalg.lu_solve(
                (lu_i, piv_i), y_i - C_next @ xnext
            )
            return x_i, x_i

        Cs_next = jnp.concatenate(
            [Cs[1:], jnp.zeros((1, s, s), Cs.dtype)], axis=0
        )
        _, xs = lax.scan(
            bwd,
            jnp.zeros((s,), ys.dtype),
            (Cs_next, lu, piv, ys),
            reverse=True,
        )
        return xs.reshape(npad)[:n][iperm]

    def solve(self, rhs):
        if rhs.ndim == 2:
            return jax.vmap(self.solve, in_axes=1, out_axes=1)(rhs)
        dt = rhs.dtype
        x = self._solve32(rhs).astype(dt)
        for _ in range(self.n_refine):
            x = x + self._solve32(rhs - hdot(self.WW, x)).astype(dt)
        return x

    def inertia(self, tol: float = 0.0):
        # unsymmetric system: inertia is undefined; the equilibrium
        # driver adapts on direction error only
        z = jnp.zeros((), jnp.result_type(self.WW))
        return z, z


def tridiag_lu_factorize(WW, plan: BandedPlan, n_refine: int = 2):
    from .tridiag import _factor_dtype

    perm = jnp.asarray(plan.perm)
    fdt = _factor_dtype(WW)
    WWp = WW[perm][:, perm].astype(fdt)
    A, B, C = _to_blocks_lu(WWp, plan)
    s = plan.block

    def step(carry, inp):
        Dprev_lu, Dprev_piv = carry
        A_i, B_i, C_i = inp
        # L_i = B_i D_{i-1}^{-1}  <=>  D_{i-1}^T L_i^T = B_i^T
        L_i = jax.scipy.linalg.lu_solve((Dprev_lu, Dprev_piv), B_i.T, trans=1).T
        D_i = A_i - L_i @ C_i
        lu_i, piv_i = jax.scipy.linalg.lu_factor(D_i)
        return (lu_i, piv_i), (L_i, lu_i, piv_i)

    lu0, piv0 = jax.scipy.linalg.lu_factor(A[0])
    (_, _), (Ls_r, lus_r, pivs_r) = lax.scan(step, (lu0, piv0), (A[1:], B[1:], C[1:]))
    Ls = jnp.concatenate([jnp.zeros((1, s, s), fdt), Ls_r], axis=0)
    lus = jnp.concatenate([lu0[None], lus_r], axis=0)
    pivs = jnp.concatenate([piv0[None], pivs_r], axis=0)
    return TridiagLUFactorization(Ls, C, (lus, pivs), plan, WW, n_refine=n_refine)


# ---------------------------------------------------------------------------
# Mosaic fleet banded LU: band (npad, wpad2, TILE), batch in lanes
# ---------------------------------------------------------------------------

def _pad_w2(w: int) -> int:
    """Full-band (2w+1) storage width padded to the f32 sublane multiple."""
    return -(-(2 * w + 1) // 8) * 8


def _pad_rows2(n: int, w: int) -> int:
    return -(-(n + w) // 8) * 8 + _win(w)


def _lu_factor_kernel(nb8: int, npad: int, w: int, wpad2: int, tile: int,
                      clamp: float, band_hbm, out_hbm, Bv, sem):
    """In-place banded LU of TILE instances.

    Storage row c: [d_c, l_1..l_w (subdiag multipliers after the step),
    u_1..u_w (raw superdiagonal U entries), pad].
    """
    i = jnp.int32(pl.program_id(0))
    cp_in = pltpu.make_async_copy(
        band_hbm.at[:, :, pl.ds(i * tile, tile)], Bv, sem
    )
    cp_in.start()
    cp_in.wait()
    win = _win(w)
    wb = 2 * w + 1
    pad_tail = wpad2 - wb

    def _splice(V, j, new_row):
        parts = []
        if j > 0:
            parts.append(V[:j])
        parts.append(new_row)
        if j + 1 < win:
            parts.append(V[j + 1 :])
        return jnp.concatenate(parts, axis=0)

    def block(kb, _):
        r0 = kb * 8
        W = Bv[pl.ds(r0, win), :, :]                  # (win, wpad2, TILE)
        for j in range(8):
            row = W[j : j + 1]                        # (1, wpad2, TILE)
            dj = row[:, 0:1, :]
            if clamp > 0.0:
                sgn = jnp.where(dj >= 0.0, jnp.ones_like(dj), -jnp.ones_like(dj))
                dj = sgn * jnp.maximum(jnp.abs(dj), clamp)
            l = row[:, 1 : w + 1, :] / dj             # (1, w, TILE)
            u = row[:, w + 1 : wb, :]                 # (1, w, TILE) raw U
            parts = [dj, l, u]
            if pad_tail > 0:
                parts.append(row[:, wb:, :])
            W = _splice(W, j, jnp.concatenate(parts, axis=1))
            for m in range(1, w + 1):
                lm = l[:, m - 1 : m, :]               # (1, 1, TILE)
                um = u[:, m - 1 : m, :]
                # target row t = j+m holds column c+m of the band:
                # sub/diag positions p=0..w-m get l_{m+p} * u_m
                lseg = jnp.concatenate(
                    [l[:, m - 1 :, :], jnp.zeros((1, m, tile), jnp.float32)],
                    axis=1,
                )                                      # width w+1
                # super positions q=1..w-m get l_m * u_{m+q}
                if m < w:
                    useg = jnp.concatenate(
                        [u[:, m:, :], jnp.zeros((1, m, tile), jnp.float32)],
                        axis=1,
                    )                                  # width w
                else:
                    useg = jnp.zeros((1, w, tile), jnp.float32)
                upd_parts = [lseg * um, useg * lm]
                if pad_tail > 0:
                    upd_parts.append(
                        jnp.zeros((1, pad_tail, tile), jnp.float32)
                    )
                upd = jnp.concatenate(upd_parts, axis=1)
                t = j + m
                W = _splice(W, t, W[t : t + 1] - upd)
        Bv[pl.ds(r0, win), :, :] = W
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb8), block, jnp.int32(0), unroll=False)
    cp_out = pltpu.make_async_copy(
        Bv, out_hbm.at[:, :, pl.ds(i * tile, tile)], sem
    )
    cp_out.start()
    cp_out.wait()


def _lu_solve_kernel(nb8: int, npad: int, w: int, wpad2: int, tile: int,
                     fband_hbm, b_hbm, x_hbm, Bv, xv, sem):
    """L y = b (unit lower) then U x = y for TILE systems at once."""
    i = jnp.int32(pl.program_id(0))
    cp_L = pltpu.make_async_copy(
        fband_hbm.at[:, :, pl.ds(i * tile, tile)], Bv, sem
    )
    cp_L.start()
    cp_L.wait()
    cp_b = pltpu.make_async_copy(b_hbm.at[:, pl.ds(i * tile, tile)], xv, sem)
    cp_b.start()
    cp_b.wait()
    win = _win(w)

    # forward with the stored multipliers (right-looking scatter)
    def fwd(kb, _):
        r0 = kb * 8
        X = xv[pl.ds(r0, win), :]
        B8 = Bv[pl.ds(r0, 8), :, :]
        for j in range(8):
            yc = X[j : j + 1]
            Lcol = B8[j, 1 : w + 1, :]                # (w, TILE)
            X = jnp.concatenate(
                [
                    X[: j + 1],
                    X[j + 1 : j + 1 + w] - Lcol * yc,
                    X[j + 1 + w :],
                ],
                axis=0,
            )
        xv[pl.ds(r0, win), :] = X
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb8), fwd, jnp.int32(0), unroll=False)

    # backward with U: x_c = (y_c - sum_q u_q x_{c+q}) / d_c
    def bwd(s_, _):
        kb = nb8 - 1 - s_
        r0 = kb * 8
        X = xv[pl.ds(r0, win), :]
        B8 = Bv[pl.ds(r0, 8), :, :]
        for j in range(7, -1, -1):
            Ucol = B8[j, w + 1 : 2 * w + 1, :]        # (w, TILE)
            dj = B8[j, 0:1, :]
            acc = jnp.sum(Ucol * X[j + 1 : j + 1 + w], axis=0, keepdims=True)
            newx = (X[j : j + 1] - acc) / dj
            parts = ([X[:j]] if j > 0 else []) + [newx, X[j + 1 :]]
            X = jnp.concatenate(parts, axis=0)
        xv[pl.ds(r0, 8), :] = X[:8]
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb8), bwd, jnp.int32(0), unroll=False)
    cp_x = pltpu.make_async_copy(xv, x_hbm.at[:, pl.ds(i * tile, tile)], sem)
    cp_x.start()
    cp_x.wait()


def _lu_factor_solve_kernel(nb8: int, npad: int, w: int, wpad2: int,
                            tile: int, clamp: float, band_hbm, b_hbm,
                            fband_hbm, x_hbm, Bv, xv, sem):
    """Fused banded LU factor + ONE solve in a single launch (see
    fleet_banded._factor_solve_kernel): the factor stays in VMEM for
    the first substitution pair; the factored band is still written out
    for the later refinement solves."""
    i = jnp.int32(pl.program_id(0))
    cp_in = pltpu.make_async_copy(
        band_hbm.at[:, :, pl.ds(i * tile, tile)], Bv, sem
    )
    cp_in.start()
    cp_in.wait()
    cp_b = pltpu.make_async_copy(b_hbm.at[:, pl.ds(i * tile, tile)], xv, sem)
    cp_b.start()
    cp_b.wait()
    win = _win(w)
    wb = 2 * w + 1
    pad_tail = wpad2 - wb

    def _splice(V, j, new_row):
        parts = []
        if j > 0:
            parts.append(V[:j])
        parts.append(new_row)
        if j + 1 < win:
            parts.append(V[j + 1 :])
        return jnp.concatenate(parts, axis=0)

    def block(kb, _):
        r0 = kb * 8
        W = Bv[pl.ds(r0, win), :, :]
        for j in range(8):
            row = W[j : j + 1]
            dj = row[:, 0:1, :]
            if clamp > 0.0:
                sgn = jnp.where(dj >= 0.0, jnp.ones_like(dj), -jnp.ones_like(dj))
                dj = sgn * jnp.maximum(jnp.abs(dj), clamp)
            l = row[:, 1 : w + 1, :] / dj
            u = row[:, w + 1 : wb, :]
            parts = [dj, l, u]
            if pad_tail > 0:
                parts.append(row[:, wb:, :])
            W = _splice(W, j, jnp.concatenate(parts, axis=1))
            for m in range(1, w + 1):
                lm = l[:, m - 1 : m, :]
                um = u[:, m - 1 : m, :]
                lseg = jnp.concatenate(
                    [l[:, m - 1 :, :], jnp.zeros((1, m, tile), jnp.float32)],
                    axis=1,
                )
                if m < w:
                    useg = jnp.concatenate(
                        [u[:, m:, :], jnp.zeros((1, m, tile), jnp.float32)],
                        axis=1,
                    )
                else:
                    useg = jnp.zeros((1, w, tile), jnp.float32)
                upd_parts = [lseg * um, useg * lm]
                if pad_tail > 0:
                    upd_parts.append(
                        jnp.zeros((1, pad_tail, tile), jnp.float32)
                    )
                upd = jnp.concatenate(upd_parts, axis=1)
                t = j + m
                W = _splice(W, t, W[t : t + 1] - upd)
        Bv[pl.ds(r0, win), :, :] = W
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb8), block, jnp.int32(0), unroll=False)
    cp_out = pltpu.make_async_copy(
        Bv, fband_hbm.at[:, :, pl.ds(i * tile, tile)], sem
    )
    cp_out.start()

    def fwd(kb, _):
        r0 = kb * 8
        X = xv[pl.ds(r0, win), :]
        B8 = Bv[pl.ds(r0, 8), :, :]
        for j in range(8):
            yc = X[j : j + 1]
            Lcol = B8[j, 1 : w + 1, :]
            X = jnp.concatenate(
                [
                    X[: j + 1],
                    X[j + 1 : j + 1 + w] - Lcol * yc,
                    X[j + 1 + w :],
                ],
                axis=0,
            )
        xv[pl.ds(r0, win), :] = X
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb8), fwd, jnp.int32(0), unroll=False)

    def bwd(s_, _):
        kb = nb8 - 1 - s_
        r0 = kb * 8
        X = xv[pl.ds(r0, win), :]
        B8 = Bv[pl.ds(r0, 8), :, :]
        for j in range(7, -1, -1):
            Ucol = B8[j, w + 1 : 2 * w + 1, :]
            dj = B8[j, 0:1, :]
            acc = jnp.sum(Ucol * X[j + 1 : j + 1 + w], axis=0, keepdims=True)
            newx = (X[j : j + 1] - acc) / dj
            parts = ([X[:j]] if j > 0 else []) + [newx, X[j + 1 :]]
            X = jnp.concatenate(parts, axis=0)
        xv[pl.ds(r0, 8), :] = X[:8]
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb8), bwd, jnp.int32(0), unroll=False)
    cp_out.wait()
    cp_x = pltpu.make_async_copy(xv, x_hbm.at[:, pl.ds(i * tile, tile)], sem)
    cp_x.start()
    cp_x.wait()


def _interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


@functools.partial(jax.jit, static_argnames=("w", "clamp"))
def fleet_banded_lu_factor_batched(band: jax.Array, w: int, clamp: float = 0.0):
    """Banded LU of a batch: band (B, n, 2w+1) f32 (row c =
    [A[c,c], A[c+1..c+w, c], A[c, c+1..c+w]]) -> factored band of the
    same shape (multipliers in the sub positions, U in diag+super)."""
    B, n = band.shape[0], band.shape[1]
    npad = _pad_rows2(n, w)
    wpad2 = _pad_w2(w)
    tile = TILE
    Bpad = -(-B // tile) * tile
    bl = _pack_band(band, 2 * w + 1, npad, wpad2, Bpad)

    out = pl.pallas_call(
        functools.partial(
            _lu_factor_kernel, -(-n // 8), npad, w, wpad2, tile, clamp
        ),
        grid=(Bpad // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((npad, wpad2, Bpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((npad, wpad2, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(bl)
    return jnp.transpose(out, (2, 0, 1))[:B, :n, : 2 * w + 1]


@functools.partial(jax.jit, static_argnames=("w", "clamp"))
def fleet_banded_lu_factor_solve_batched(band: jax.Array, b: jax.Array,
                                         w: int, clamp: float = 0.0):
    """Fused LU factor + one solve: band (B, n, 2w+1), b (B, n) ->
    (factored band, x) in ONE kernel launch."""
    B, n = b.shape
    npad = _pad_rows2(n, w)
    wpad2 = _pad_w2(w)
    tile = TILE
    Bpad = -(-B // tile) * tile
    bl = _pack_band(band, 2 * w + 1, npad, wpad2, Bpad)
    rl = _pack_vec(b, npad, Bpad)

    fband, x = pl.pallas_call(
        functools.partial(
            _lu_factor_solve_kernel, -(-n // 8), npad, w, wpad2, tile,
            clamp,
        ),
        grid=(Bpad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, wpad2, Bpad), jnp.float32),
            jax.ShapeDtypeStruct((npad, Bpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((npad, wpad2, tile), jnp.float32),
            pltpu.VMEM((npad, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(bl, rl)
    return (
        jnp.transpose(fband, (2, 0, 1))[:B, :n, : 2 * w + 1],
        jnp.transpose(x, (1, 0))[:B, :n],
    )


@functools.partial(jax.jit, static_argnames=("w",))
def fleet_banded_lu_solve_batched(fband: jax.Array, b: jax.Array, w: int):
    """Solve (L U) x = b for a batch: fband (B, n, 2w+1), b (B, n)."""
    B, n = b.shape
    npad = _pad_rows2(n, w)
    wpad2 = _pad_w2(w)
    tile = TILE
    Bpad = -(-B // tile) * tile
    fl = _pack_band(fband, 2 * w + 1, npad, wpad2, Bpad)
    bl = _pack_vec(b, npad, Bpad)

    x = pl.pallas_call(
        functools.partial(
            _lu_solve_kernel, -(-n // 8), npad, w, wpad2, tile
        ),
        grid=(Bpad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((npad, Bpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((npad, wpad2, tile), jnp.float32),
            pltpu.VMEM((npad, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(fl, bl)
    return jnp.transpose(x, (1, 0))[:B, :n]


def _make_wrappers(w: int, clamp: float):
    @jax.custom_batching.custom_vmap
    def factor(band):
        return fleet_banded_lu_factor_batched(band[None], w, clamp=clamp)[0]

    @factor.def_vmap
    def _factor_vmap(axis_size, in_batched, band):
        (bb,) = in_batched
        assert bb, "fleet_banded_lu factor: operand must be batched"
        return fleet_banded_lu_factor_batched(band, w, clamp=clamp), True

    @jax.custom_batching.custom_vmap
    def solve(fband, b):
        return fleet_banded_lu_solve_batched(fband[None], b[None], w)[0]

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, fband, b):
        fb, bb = in_batched
        assert fb, "fleet_banded_lu solve: factor must be batched"
        if not bb:
            b = jnp.broadcast_to(b, (axis_size,) + b.shape)
        return fleet_banded_lu_solve_batched(fband, b, w), True

    @jax.custom_batching.custom_vmap
    def factor_solve(band, b):
        fb, x = fleet_banded_lu_factor_solve_batched(
            band[None], b[None], w, clamp=clamp
        )
        return fb[0], x[0]

    @factor_solve.def_vmap
    def _factor_solve_vmap(axis_size, in_batched, band, b):
        bb, rb = in_batched
        assert bb, "fleet_banded_lu factor_solve: band must be batched"
        if not rb:
            b = jnp.broadcast_to(b, (axis_size,) + b.shape)
        fb, x = fleet_banded_lu_factor_solve_batched(
            band, b, w, clamp=clamp
        )
        return (fb, x), (True, True)

    return factor, solve, factor_solve


_WRAPPERS: dict = {}


def _wrappers(w: int, clamp: float):
    key = (w, clamp)
    if key not in _WRAPPERS:
        _WRAPPERS[key] = _make_wrappers(w, clamp)
    return _WRAPPERS[key]


class FleetBandedLUFactorization:
    """KKT-backend adapter (kkt/dense.py contract) for the unsymmetric
    banded system.  Same pipeline as FleetBandedFactorization: one-hot
    MXU permutation (Precision.HIGHEST), stride-trick extraction of BOTH
    triangles' bands, symmetric Jacobi equilibration S M S, fleet LU,
    f32 solves + refinement against the true matrix."""

    def __init__(self, WW, plan: BandedPlan, n_refine: int = 2,
                 clamp: float = 1e-4):
        self.WW = WW
        self.plan = plan
        self.n_refine = n_refine
        n, w = plan.n, plan.bandwidth
        self.w = w
        perm = np.asarray(plan.perm)
        W32 = WW.astype(jnp.float32)
        P = jnp.asarray(np.eye(n, dtype=np.float32)[perm])
        hp = jax.lax.Precision.HIGHEST
        Wp = jnp.matmul(P, jnp.matmul(W32, P.T, precision=hp), precision=hp)
        # bands via strided diagonal slices (see fleet_banded.py: the
        # pad/flatten/reshape stride trick rewrites the full matrix
        # through layout copies under vmap — ~30 ms/iter at B=1024)
        # lower band: lb[c, i] = Wp[c+i, c] (sub-diagonals)
        lcols = []
        for i in range(w + 1):
            d = jnp.diagonal(Wp, offset=-i)
            lcols.append(jnp.concatenate(
                [d, jnp.zeros((i,), jnp.float32)]
            ) if i else d)
        lband = jnp.stack(lcols, axis=1)
        # upper band: ub[c, q] = Wp[c, c+q], q = 1..w (super-diagonals)
        ucols = []
        for q in range(1, w + 1):
            d = jnp.diagonal(Wp, offset=q)
            ucols.append(jnp.concatenate([d, jnp.zeros((q,), jnp.float32)]))
        uband = jnp.stack(ucols, axis=1)
        # two-sided row/col inf-norm equilibration.  The LDL kernel's
        # rsqrt(|diag|) scaling is wrong here: the equilibrium KKT has
        # rows whose diagonal is only the tiny -addEye2Hessian2
        # regularization (1e-9) next to O(1) off-diagonals, and
        # 1/sqrt(1e-9) scaling overflows the f32 elimination.  Row/col
        # norms keep every scaled entry <= 1.
        rn = jnp.maximum(jnp.max(jnp.abs(Wp), axis=1), 1e-30)
        cn = jnp.maximum(jnp.max(jnp.abs(Wp), axis=0), 1e-30)
        r = lax.rsqrt(rn)
        cvec = lax.rsqrt(cn)
        self.r = r
        self.c = cvec
        r_pad = jnp.concatenate([r, jnp.zeros((w,), jnp.float32)])
        r_shift = jnp.stack(
            [lax.dynamic_slice_in_dim(r_pad, i, n) for i in range(w + 1)],
            axis=1,
        )
        c_pad = jnp.concatenate([cvec, jnp.zeros((w,), jnp.float32)])
        c_shift = jnp.stack(
            [lax.dynamic_slice_in_dim(c_pad, i, n) for i in range(1, w + 1)],
            axis=1,
        )
        # lband[c,i] = Wp[c+i, c] -> r[c+i] * entry * c[c]
        lband = lband * r_shift * cvec[:, None]
        # uband[c,q] = Wp[c, c+q] -> r[c] * entry * c[c+q]
        uband = uband * r[:, None] * c_shift
        band = jnp.concatenate([lband, uband], axis=1)  # (n, 2w+1)
        self._band_scaled = band
        self._factor_fn, self._solve_fn, self._fs_fn = _wrappers(w, clamp)
        self.fband = None  # lazy: first solve fuses factor+solve
        self.P = P

    def _solve32(self, rhs):
        # M x = b  <=>  (R M C) y = R b with x = C y.  Permutations via
        # one-hot matmuls (exact at HIGHEST), not index gathers — a
        # vmapped rhs[perm] gather costs ~15 ms at B=1024/n=290
        # (round-4 trace) vs us-scale on the MXU.
        hp = jax.lax.Precision.HIGHEST
        bp = self.r * jnp.matmul(self.P, rhs.astype(jnp.float32),
                                 precision=hp)
        if self.fband is None:
            self.fband, xp = self._fs_fn(self._band_scaled, bp)
        else:
            xp = self._solve_fn(self.fband, bp)
        xp = self.c * xp
        return jnp.matmul(self.P.T, xp, precision=hp)

    def solve(self, rhs):
        if rhs.ndim == 2:
            cols = [self.solve(rhs[:, k]) for k in range(rhs.shape[1])]
            return jnp.stack(cols, axis=1)
        dt = rhs.dtype
        x = self._solve32(rhs).astype(dt)
        for _ in range(self.n_refine):
            x = x + self._solve32(rhs - hdot(self.WW, x)).astype(dt)
        return x

    def inertia(self, tol: float = 0.0):
        z = jnp.zeros((), jnp.result_type(self.WW))
        return z, z


def fleet_banded_lu_kkt_factorize(WW, plan: BandedPlan, n_refine: int = 2,
                                  clamp: float = 1e-4):
    return FleetBandedLUFactorization(WW, plan, n_refine=n_refine, clamp=clamp)


class FleetBandedLUFromBand:
    """Same contract as :class:`FleetBandedLUFactorization` but consumes
    a directly-assembled permuted band (kkt/band_assemble.BandedOperator
    with (n, 2w+1) storage [diag, sub 1..w, super 1..w]) — the dense
    KKT matrix is never formed (the game-solver analog of
    fleet_banded.FleetBandedFromBand).  The two-sided inf-norm
    equilibration is computed from the band itself; refinement
    residuals use the operator's structured matvec."""

    def __init__(self, op, plan: BandedPlan, n_refine: int = 1,
                 clamp: float = 1e-4):
        self.op = op
        self.plan = plan
        self.n_refine = n_refine
        n, w = plan.n, plan.bandwidth
        self.w = w
        band = op.band.astype(jnp.float32)
        lband, uband = band[:, : w + 1], band[:, w + 1 :]
        absl, absu = jnp.abs(lband), jnp.abs(uband)
        # row/col inf norms straight from band storage:
        # row r holds lband[r-i, i] (i=0..w) and uband[r, q-1] (q=1..w);
        # col c holds lband[c, 0..w] and uband[c-q, q-1]
        rn = absl[:, 0]
        for i in range(1, w + 1):
            rn = jnp.maximum(
                rn,
                jnp.concatenate(
                    [jnp.zeros((i,), jnp.float32), absl[: n - i, i]]
                ),
            )
        if w:
            rn = jnp.maximum(rn, jnp.max(absu, axis=1))
        cn = jnp.max(absl, axis=1)
        for q in range(1, w + 1):
            cn = jnp.maximum(
                cn,
                jnp.concatenate(
                    [jnp.zeros((q,), jnp.float32), absu[: n - q, q - 1]]
                ),
            )
        r = lax.rsqrt(jnp.maximum(rn, 1e-30))
        cvec = lax.rsqrt(jnp.maximum(cn, 1e-30))
        self.r = r
        self.c = cvec
        r_pad = jnp.concatenate([r, jnp.zeros((w,), jnp.float32)])
        r_shift = jnp.stack(
            [lax.dynamic_slice_in_dim(r_pad, i, n) for i in range(w + 1)],
            axis=1,
        )
        c_pad = jnp.concatenate([cvec, jnp.zeros((w,), jnp.float32)])
        c_shift = jnp.stack(
            [lax.dynamic_slice_in_dim(c_pad, i, n) for i in range(1, w + 1)],
            axis=1,
        )
        lband = lband * r_shift * cvec[:, None]
        uband = uband * r[:, None] * c_shift
        band = jnp.concatenate([lband, uband], axis=1)
        self._band_scaled = band
        self._factor_fn, self._solve_fn, self._fs_fn = _wrappers(w, clamp)
        self.fband = None  # lazy: first solve fuses factor+solve
        self.P = op.P.astype(jnp.float32)

    def _solve32(self, rhs):
        hp = jax.lax.Precision.HIGHEST
        bp = self.r * jnp.matmul(self.P, rhs.astype(jnp.float32),
                                 precision=hp)
        if self.fband is None:
            self.fband, xp = self._fs_fn(self._band_scaled, bp)
        else:
            xp = self._solve_fn(self.fband, bp)
        xp = self.c * xp
        return jnp.matmul(self.P.T, xp, precision=hp)

    def solve(self, rhs):
        if rhs.ndim == 2:
            cols = [self.solve(rhs[:, k]) for k in range(rhs.shape[1])]
            return jnp.stack(cols, axis=1)
        dt = rhs.dtype
        x = self._solve32(rhs).astype(dt)
        for _ in range(self.n_refine):
            x = x + self._solve32(rhs - self.op.matvec(x)).astype(dt)
        return x

    def inertia(self, tol: float = 0.0):
        z = jnp.zeros((), jnp.result_type(self.op.band))
        return z, z
