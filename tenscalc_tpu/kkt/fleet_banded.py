"""Fleet *banded* LDL^T: batched band factorization with the batch in
the lane axis — the TPU answer to the reference's fill-reducing-ordered
sparse symbolic LDL (lib/@csparse/sparsity_ldl.m:40-62 orders with
symamd so the unrolled factorization stays O(n) for banded KKTs).

MPC-style KKT matrices are block-banded in the horizon index; after the
RCM permutation from :mod:`tenscalc_tpu.kkt.structure` the condensed
(smallerNewtonMatrix) system of e.g. mpc_dcmotor has half-bandwidth 4 at
n = 149.  A banded unpivoted LDL^T costs n*w^2 multiply-adds instead of
n^3/3 — a ~2000x flop reduction — and, stored as a band, the entire
batched working set is a tiny (n, w+1, TILE) VMEM slab.

Layout and Mosaic constraints (same playbook as kkt/fleet.py):

* the BATCH lives in the 128-wide lane axis (TILE instances per kernel
  program, grid walks the batch);
* the band is stored LOWER: ``band[c, i, :] = M[c+i, c, :]`` for
  i = 0..w (symmetric matrix, so this is all of it);
* every elimination step reads one band row (dynamic *outer*-axis index
  — legal), updates the w following rows with static sublane slices, and
  never indexes lanes dynamically.

Robustness contract matches kkt/fleet.py: no pivoting; Cheng-Higham
pivot clamping + symmetric row-inf-norm equilibration (applied by the
adapters below — see _sym_equilibration for why the diagonal Jacobi
scale fails on indefinite KKTs) + iterative refinement against the
true matrix, with the IPM's addEye2Hessian adaptation as the outer
safety net (lib/ipmPD_CSsolver.c:393-548).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .structure import BandedPlan
from .dense import hdot

TILE = 128  # lane width


def _pad_rows(n: int, w: int) -> int:
    """Rows padded so every 8-row block's (8 + wpad)-row working window
    stays in bounds and sublanes align."""
    return -(-(n + w) // 8) * 8 + _win(w)


def _pad_w(w: int) -> int:
    """Band storage width padded to the f32 sublane multiple (8)."""
    return -(-(w + 1) // 8) * 8


def _win(w: int) -> int:
    """Working-window rows per block: 8 own rows + room for the w-deep
    trailing updates, rounded to the sublane multiple."""
    return 8 + _pad_w(w)


# ---------------------------------------------------------------------------
# kernels: band (npad, wpad, TILE), vectors (npad, TILE)
#
# The elimination walks 8-row blocks with a lax.fori_loop (dynamic but
# 8-ALIGNED ref offsets) and statically unrolls the 8 steps inside a
# block on a value-level working window — the combination keeps the
# traced program small (O(8) ops per block) while every VMEM load/store
# is tile-aligned.
# ---------------------------------------------------------------------------

def _factor_kernel(nb8: int, npad: int, w: int, wpad: int, tile: int,
                   clamp: float, band_hbm, out_hbm, Bv, sem):
    """In-place banded LDL of TILE instances.

    After step c, band row c holds [d_c, L[c+1,c], ..., L[c+w,c], 0...].
    """
    i = jnp.int32(pl.program_id(0))
    cp_in = pltpu.make_async_copy(
        band_hbm.at[:, :, pl.ds(i * tile, tile)], Bv, sem
    )
    cp_in.start()
    cp_in.wait()
    win = _win(w)

    def _splice(V, j, new_row):
        """V with row j replaced (static j; concat instead of scatter —
        Mosaic has no value-level scatter; zero-size pieces are illegal
        vector types and must be skipped)."""
        parts = []
        if j > 0:
            parts.append(V[:j])
        parts.append(new_row)
        if j + 1 < win:
            parts.append(V[j + 1 :])
        return jnp.concatenate(parts, axis=0)

    def block(kb, _):
        r0 = kb * 8
        W = Bv[pl.ds(r0, win), :, :]                   # (win, wpad, TILE)
        for j in range(8):  # static unroll within the block
            row = W[j : j + 1]                         # (1, wpad, TILE)
            dj = row[:, 0:1, :]
            if clamp > 0.0:
                sgn = jnp.where(dj >= 0.0, jnp.ones_like(dj), -jnp.ones_like(dj))
                dj = sgn * jnp.maximum(jnp.abs(dj), clamp)
            r = jnp.concatenate(
                [jnp.zeros((1, 1, tile), jnp.float32), row[:, 1:, :] / dj],
                axis=1,
            )                                          # (1, wpad, TILE)
            W = _splice(W, j, jnp.concatenate([dj, r[:, 1:, :]], axis=1))
            # window update: band[c+i_, k-i_] -= d * r[i_] * r[k]; the
            # left-shifted r aligns source band positions with the
            # target row, and its zero tail keeps the full-width
            # subtraction exact
            for i_ in range(1, w + 1):
                ri = r[:, i_ : i_ + 1, :]              # (1, 1, TILE)
                shifted = jnp.concatenate(
                    [r[:, i_:, :], jnp.zeros((1, i_, tile), jnp.float32)],
                    axis=1,
                )
                t = j + i_
                W = _splice(W, t, W[t : t + 1] - dj * ri * shifted)
        Bv[pl.ds(r0, win), :, :] = W
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb8), block, jnp.int32(0), unroll=False)
    cp_out = pltpu.make_async_copy(
        Bv, out_hbm.at[:, :, pl.ds(i * tile, tile)], sem
    )
    cp_out.start()
    cp_out.wait()


def _solve_kernel(nb8: int, npad: int, w: int, wpad: int, tile: int,
                  fband_hbm, b_hbm, x_hbm, Bv, xv, sem):
    """Two banded substitutions for TILE systems at once."""
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

    # forward: L y = b (unit lower), right-looking scatter per block
    def fwd(kb, _):
        r0 = kb * 8
        X = xv[pl.ds(r0, win), :]                      # (win, TILE)
        B8 = Bv[pl.ds(r0, 8), :, :]                    # (8, wpad, TILE)
        for j in range(8):
            yc = X[j : j + 1]                          # (1, TILE)
            Lcol = B8[j, 1 : w + 1, :]                 # (w, TILE)
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

    # diagonal (padding rows carry d = 1)
    xv[:, :] = xv[:, :] / Bv[:, 0, :]

    # backward: L^T x = y, left-looking gather per block (reverse order);
    # rows past the block's own 8 are already final, so only the first 8
    # window rows are stored back
    def bwd(s_, _):
        kb = nb8 - 1 - s_
        r0 = kb * 8
        X = xv[pl.ds(r0, win), :]
        B8 = Bv[pl.ds(r0, 8), :, :]
        for j in range(7, -1, -1):
            Lcol = B8[j, 1 : w + 1, :]
            acc = jnp.sum(Lcol * X[j + 1 : j + 1 + w], axis=0, keepdims=True)
            parts = ([X[:j]] if j > 0 else []) + [X[j : j + 1] - acc, X[j + 1 :]]
            X = jnp.concatenate(parts, axis=0)
        xv[pl.ds(r0, 8), :] = X[:8]
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb8), bwd, jnp.int32(0), unroll=False)
    cp_x = pltpu.make_async_copy(xv, x_hbm.at[:, pl.ds(i * tile, tile)], sem)
    cp_x.start()
    cp_x.wait()


def _factor_solve_kernel(nb8: int, npad: int, w: int, wpad: int, tile: int,
                         clamp: float, band_hbm, b_hbm, fband_hbm, x_hbm,
                         Bv, xv, sem):
    """Fused banded LDL factor + ONE solve in a single launch: the
    factor leaves the band in VMEM, so the first substitution pair
    reads it without an HBM round trip (one kernel launch fewer per
    IPM iteration; the factored band is still written out for the
    later combined/refinement solves)."""
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

    def _splice(V, j, new_row):
        parts = []
        if j > 0:
            parts.append(V[:j])
        parts.append(new_row)
        if j + 1 < win:
            parts.append(V[j + 1 :])
        return jnp.concatenate(parts, axis=0)

    # ---- factor (identical elimination to _factor_kernel) ----
    def block(kb, _):
        r0 = kb * 8
        W = Bv[pl.ds(r0, win), :, :]
        for j in range(8):
            row = W[j : j + 1]
            dj = row[:, 0:1, :]
            if clamp > 0.0:
                sgn = jnp.where(dj >= 0.0, jnp.ones_like(dj), -jnp.ones_like(dj))
                dj = sgn * jnp.maximum(jnp.abs(dj), clamp)
            r = jnp.concatenate(
                [jnp.zeros((1, 1, tile), jnp.float32), row[:, 1:, :] / dj],
                axis=1,
            )
            W = _splice(W, j, jnp.concatenate([dj, r[:, 1:, :]], axis=1))
            for i_ in range(1, w + 1):
                ri = r[:, i_ : i_ + 1, :]
                shifted = jnp.concatenate(
                    [r[:, i_:, :], jnp.zeros((1, i_, tile), jnp.float32)],
                    axis=1,
                )
                t = j + i_
                W = _splice(W, t, W[t : t + 1] - dj * ri * shifted)
        Bv[pl.ds(r0, win), :, :] = W
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb8), block, jnp.int32(0), unroll=False)
    cp_out = pltpu.make_async_copy(
        Bv, fband_hbm.at[:, :, pl.ds(i * tile, tile)], sem
    )
    cp_out.start()

    # ---- solve with the VMEM-resident factor ----
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
    xv[:, :] = xv[:, :] / Bv[:, 0, :]

    def bwd(s_, _):
        kb = nb8 - 1 - s_
        r0 = kb * 8
        X = xv[pl.ds(r0, win), :]
        B8 = Bv[pl.ds(r0, 8), :, :]
        for j in range(7, -1, -1):
            Lcol = B8[j, 1 : w + 1, :]
            acc = jnp.sum(Lcol * X[j + 1 : j + 1 + w], axis=0, keepdims=True)
            parts = ([X[:j]] if j > 0 else []) + [X[j : j + 1] - acc, X[j + 1 :]]
            X = jnp.concatenate(parts, axis=0)
        xv[pl.ds(r0, 8), :] = X[:8]
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(nb8), bwd, jnp.int32(0), unroll=False)
    cp_out.wait()
    cp_x = pltpu.make_async_copy(xv, x_hbm.at[:, pl.ds(i * tile, tile)], sem)
    cp_x.start()
    cp_x.wait()


# ---------------------------------------------------------------------------
# batched entry points: band (B, n, w+1), vectors (B, n)
# ---------------------------------------------------------------------------

def _interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def _pack_band(band: jax.Array, wb: int, npad: int, wpad: int,
               Bpad: int) -> jax.Array:
    """(B, n, wb) band -> kernel layout (npad, wpad, Bpad) with
    identity (d=1) padding rows/lanes.

    Transpose FIRST (on the unpadded tensor), then pad with concats of
    broadcasts: the previous zeros + two .at[].set writes lowered to
    full-tensor dynamic-update-slices costing ~0.44 ms per direction at
    (1024, 328, 24) f32 (round-5 mpcmhe trace)."""
    B, n = band.shape[0], band.shape[1]
    bt = jnp.transpose(band.astype(jnp.float32), (1, 2, 0))  # (n, wb, B)
    if wpad > wb:
        bt = jnp.concatenate(
            [bt, jnp.zeros((n, wpad - wb, B), jnp.float32)], axis=1
        )
    idrow = jnp.zeros((wpad, 1), jnp.float32).at[0, 0].set(1.0)
    if npad > n:
        bt = jnp.concatenate(
            [bt, jnp.broadcast_to(idrow, (npad - n, wpad, B))], axis=0
        )
    if Bpad > B:
        bt = jnp.concatenate(
            [bt, jnp.broadcast_to(idrow, (npad, wpad, Bpad - B))],
            axis=2,
        )
    return bt


def _pack_vec(b: jax.Array, npad: int, Bpad: int) -> jax.Array:
    """(B, n) rhs -> kernel layout (npad, Bpad), zero padding."""
    B, n = b.shape
    bt = jnp.transpose(b.astype(jnp.float32), (1, 0))
    if npad > n:
        bt = jnp.concatenate(
            [bt, jnp.zeros((npad - n, B), jnp.float32)], axis=0
        )
    if Bpad > B:
        bt = jnp.concatenate(
            [bt, jnp.zeros((npad, Bpad - B), jnp.float32)], axis=1
        )
    return bt


@functools.partial(jax.jit, static_argnames=("w", "clamp"))
def fleet_banded_factor_batched(band: jax.Array, w: int, clamp: float = 0.0):
    """Banded LDL of a batch: band (B, n, w+1) f32 (lower band rows) ->
    factored band of the same shape (row c = [d_c, L[c+1:c+w+1, c]])."""
    B, n = band.shape[0], band.shape[1]
    npad = _pad_rows(n, w)
    wpad = _pad_w(w)
    tile = TILE
    Bpad = -(-B // tile) * tile
    bl = _pack_band(band, w + 1, npad, wpad, Bpad)     # (npad, wpad, Bpad)

    out = pl.pallas_call(
        functools.partial(
            _factor_kernel, -(-n // 8), npad, w, wpad, tile, clamp
        ),
        grid=(Bpad // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((npad, wpad, Bpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((npad, wpad, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(bl)
    return jnp.transpose(out, (2, 0, 1))[:B, :n, : w + 1]


@functools.partial(jax.jit, static_argnames=("w", "clamp"))
def fleet_banded_factor_solve_batched(band: jax.Array, b: jax.Array,
                                      w: int, clamp: float = 0.0):
    """Fused factor + one solve: band (B, n, w+1), b (B, n) ->
    (factored band, x) in ONE kernel launch."""
    B, n = b.shape
    npad = _pad_rows(n, w)
    wpad = _pad_w(w)
    tile = TILE
    Bpad = -(-B // tile) * tile
    bl = _pack_band(band, w + 1, npad, wpad, Bpad)
    rl = _pack_vec(b, npad, Bpad)

    fband, x = pl.pallas_call(
        functools.partial(
            _factor_solve_kernel, -(-n // 8), npad, w, wpad, tile, clamp
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
            jax.ShapeDtypeStruct((npad, wpad, Bpad), jnp.float32),
            jax.ShapeDtypeStruct((npad, Bpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((npad, wpad, tile), jnp.float32),
            pltpu.VMEM((npad, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(bl, rl)
    return (
        jnp.transpose(fband, (2, 0, 1))[:B, :n, : w + 1],
        jnp.transpose(x, (1, 0))[:B, :n],
    )


@functools.partial(jax.jit, static_argnames=("w",))
def fleet_banded_solve_batched(fband: jax.Array, b: jax.Array, w: int):
    """Solve (L diag(d) L^T) x = b for a batch: fband (B, n, w+1) from
    :func:`fleet_banded_factor_batched`, b (B, n)."""
    B, n = b.shape
    npad = _pad_rows(n, w)
    wpad = _pad_w(w)
    tile = TILE
    Bpad = -(-B // tile) * tile
    fl = _pack_band(fband, w + 1, npad, wpad, Bpad)
    bl = _pack_vec(b, npad, Bpad)

    x = pl.pallas_call(
        functools.partial(
            _solve_kernel, -(-n // 8), npad, w, wpad, tile
        ),
        grid=(Bpad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((npad, Bpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((npad, wpad, tile), jnp.float32),
            pltpu.VMEM((npad, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(fl, bl)
    return jnp.transpose(x, (1, 0))[:B, :n]


# ---------------------------------------------------------------------------
# custom_vmap wrappers: per-instance API, fleet execution under vmap
# ---------------------------------------------------------------------------

def _sym_equilibration(band: jax.Array, n: int, w: int) -> jax.Array:
    """Symmetric row-inf-norm equilibration scale s = rsqrt(max_j |W_rj|)
    from lower-band storage (row r holds band[r, :] and band[r-i, i]).

    The earlier diagonal-based Jacobi scale rsqrt(|W_rr|) is equivalent
    on barrier-dominated convex KKTs (row max ~ diagonal) but explodes
    on INDEFINITE rows whose diagonal is incidentally tiny next to O(1)
    off-diagonals — round-5 finding: nonconvex unicycle fleet instances
    that the f32 dense (pivoted) backend solves in ~100 iterations
    stalled at addEye2Hessian ceiling under the unpivoted kernel; the
    row-norm scale restores the dense iteration counts exactly."""
    absb = jnp.abs(band)
    rn = jnp.max(absb, axis=1)
    for i in range(1, w + 1):
        rn = jnp.maximum(
            rn,
            jnp.concatenate(
                [jnp.zeros((i,), jnp.float32), absb[: n - i, i]]
            ),
        )
    return lax.rsqrt(jnp.maximum(rn, 1e-30))


def _make_wrappers(w: int, clamp: float):
    @jax.custom_batching.custom_vmap
    def factor(band):
        return fleet_banded_factor_batched(band[None], w, clamp=clamp)[0]

    @factor.def_vmap
    def _factor_vmap(axis_size, in_batched, band):
        (bb,) = in_batched
        assert bb, "fleet_banded factor: operand must be batched"
        return fleet_banded_factor_batched(band, w, clamp=clamp), True

    @jax.custom_batching.custom_vmap
    def solve(fband, b):
        return fleet_banded_solve_batched(fband[None], b[None], w)[0]

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, fband, b):
        fb, bb = in_batched
        assert fb, "fleet_banded solve: factor must be batched"
        if not bb:
            b = jnp.broadcast_to(b, (axis_size,) + b.shape)
        return fleet_banded_solve_batched(fband, b, w), True

    @jax.custom_batching.custom_vmap
    def factor_solve(band, b):
        fb, x = fleet_banded_factor_solve_batched(
            band[None], b[None], w, clamp=clamp
        )
        return fb[0], x[0]

    @factor_solve.def_vmap
    def _factor_solve_vmap(axis_size, in_batched, band, b):
        bb, rb = in_batched
        assert bb, "fleet_banded factor_solve: band must be batched"
        if not rb:
            b = jnp.broadcast_to(b, (axis_size,) + b.shape)
        fb, x = fleet_banded_factor_solve_batched(band, b, w, clamp=clamp)
        return (fb, x), (True, True)

    return factor, solve, factor_solve


_WRAPPERS: dict = {}


def _wrappers(w: int, clamp: float):
    key = (w, clamp)
    if key not in _WRAPPERS:
        _WRAPPERS[key] = _make_wrappers(w, clamp)
    return _WRAPPERS[key]


class FleetBandedFactorization:
    """KKT-backend adapter (contract of kkt/dense.py KKTFactorization).

    Pipeline per factorization, all vmap-compatible:

    1. symmetric permutation to banded form via the build-time RCM plan:
       one-hot permutation matmuls (MXU) + a stride-trick reshape that
       peels the w+1 sub-diagonals (batched 2-D gathers of the dense WW
       measured ~26 ms/iter at B=1024 — 88% of the IPM iteration);
    2. symmetric row-inf-norm equilibration s = rsqrt(max_j |W_rj|)
       (compresses the pivot dynamic range so the unpivoted f32
       elimination stays accurate — see _sym_equilibration);
    3. fleet banded LDL (Pallas, batch in lanes);
    4. solves run in f32 through the band, refined ``n_refine`` times
       against the true (unpermuted, unscaled) matrix.
    """

    def __init__(self, WW, plan: BandedPlan, n_refine: int = 2,
                 clamp: float = 1e-7):
        self.WW = WW
        self.plan = plan
        self.n_refine = n_refine
        n, w = plan.n, plan.bandwidth
        self.w = w
        perm = np.asarray(plan.perm)
        # band[c, i] = Wp[c+i, c] = WW[perm[c+i], perm[c]].  A direct 2-D
        # gather here costs ~26 ms/iter at B=1024 (88% of the whole IPM
        # iteration: batched random-access reads of the 91 MB WW tensor).
        # Instead: (1) permute with one-hot matmuls on the MXU (exact for
        # 0/1 operands), (2) extract the w+1 sub-diagonals with the
        # pad/flatten/reshape stride trick — pure layout ops:
        #   Y = pad(Wp^T, w zero cols)            (n, n+w)
        #   reshape(concat([Y.ravel(), zeros(n)]), (n, n+w+1))[c, j]
        #     = Y[c, c+j] = Wp[c+j, c]            for c+j < n, else 0
        W32 = WW.astype(jnp.float32)
        P = jnp.asarray(
            np.eye(n, dtype=np.float32)[perm]
        )  # P[a, perm[a]] = 1
        # Precision.HIGHEST: on TPU the default f32 dot lowers to bf16
        # MXU passes, which would silently round the extracted band (and
        # the Jacobi equilibration diagonal) to ~8 mantissa bits.  With
        # one-hot operands the HIGHEST contraction stays exact and still
        # rides the MXU.
        hp = jax.lax.Precision.HIGHEST
        Wp = jnp.matmul(
            P, jnp.matmul(W32, P.T, precision=hp), precision=hp
        )  # Wp[a, b] = WW[perm[a], perm[b]]
        # band[c, i] = Wp[c+i, c]: the i-th SUB-diagonal, extracted with
        # strided diagonal slices.  (The previous pad/flatten/reshape
        # stride trick is equivalent single-instance but under vmap it
        # rewrites the full (B, n, n+w) tensor through layout copies —
        # ~30 ms/iteration at B=1024/n=290, round-4 trace.)
        cols = []
        for i in range(w + 1):
            d = jnp.diagonal(Wp, offset=-i)          # (n - i,)
            cols.append(jnp.concatenate(
                [d, jnp.zeros((i,), jnp.float32)]
            ) if i else d)
        band = jnp.stack(cols, axis=1)               # (n, w+1)
        s = _sym_equilibration(band, n, w)
        self.s = s
        # s_shift[c, i] = s[c+i] via w+1 static slices of padded s
        s_pad = jnp.concatenate([s, jnp.zeros((w,), jnp.float32)])
        s_shift = jnp.stack(
            [lax.dynamic_slice_in_dim(s_pad, i, n) for i in range(w + 1)],
            axis=1,
        )
        # band_scaled[c, i] = s[c+i] * Wp[c+i, c] * s[c]
        band = band * s[:, None] * s_shift
        self._band_scaled = band
        self._factor_fn, self._solve_fn, self._fs_fn = _wrappers(w, clamp)
        # LAZY factor: the first solve runs the fused factor+solve
        # kernel (one launch fewer per IPM iteration, and the first
        # substitution pair reads the factor from VMEM)
        self.fband = None
        self.P = P

    def _solve32(self, rhs):
        # permutation via one-hot matmul (exact at HIGHEST), NOT index
        # gather: under vmap a rhs[perm] gather of (B, n) costs ~15 ms
        # at B=1024/n=290 (element-wise random access + layout copies,
        # round-4 trace) while the MXU contraction is ~us-scale
        hp = jax.lax.Precision.HIGHEST
        bp = self.s * jnp.matmul(self.P, rhs.astype(jnp.float32),
                                 precision=hp)
        if self.fband is None:
            self.fband, xp = self._fs_fn(self._band_scaled, bp)
        else:
            xp = self._solve_fn(self.fband, bp)
        xp = self.s * xp
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
        if self.fband is None:
            self.fband = self._factor_fn(self._band_scaled)
        rt = jnp.result_type(self.WW)
        d = self.fband[:, 0]
        mp = jnp.sum(d > tol).astype(rt)
        mn = jnp.sum(d < -tol).astype(rt)
        return mp, mn


def fleet_banded_kkt_factorize(WW, plan: BandedPlan, n_refine: int = 2,
                               clamp: float = 1e-7):
    return FleetBandedFactorization(WW, plan, n_refine=n_refine, clamp=clamp)


class FleetBandedFromBand:
    """Same contract as :class:`FleetBandedFactorization` but consumes a
    directly-assembled permuted band (ipm.solver.BandKKT) — the dense
    KKT matrix is never formed.  Refinement residuals use the BandKKT's
    structured matvec (HIGHEST-precision constituent products)."""

    def __init__(self, op, plan: BandedPlan, n_refine: int = 1,
                 clamp: float = 1e-7):
        self.op = op
        self.plan = plan
        self.n_refine = n_refine
        n, w = plan.n, plan.bandwidth
        self.w = w
        band = op.band.astype(jnp.float32)
        s = _sym_equilibration(band, n, w)
        self.s = s
        s_pad = jnp.concatenate([s, jnp.zeros((w,), jnp.float32)])
        s_shift = jnp.stack(
            [lax.dynamic_slice_in_dim(s_pad, i, n) for i in range(w + 1)],
            axis=1,
        )
        band = band * s[:, None] * s_shift
        self._band_scaled = band
        self._factor_fn, self._solve_fn, self._fs_fn = _wrappers(w, clamp)
        self.fband = None  # lazy: first solve fuses factor+solve
        self.P = op.P.astype(jnp.float32)

    def _solve32(self, rhs):
        hp = jax.lax.Precision.HIGHEST
        bp = self.s * jnp.matmul(self.P, rhs.astype(jnp.float32),
                                 precision=hp)
        if self.fband is None:
            self.fband, xp = self._fs_fn(self._band_scaled, bp)
        else:
            xp = self._solve_fn(self.fband, bp)
        xp = self.s * xp
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
        if self.fband is None:
            self.fband = self._factor_fn(self._band_scaled)
        rt = jnp.result_type(self.op.band)
        d = self.fband[:, 0]
        mp = jnp.sum(d > tol).astype(rt)
        mn = jnp.sum(d < -tol).astype(rt)
        return mp, mn
