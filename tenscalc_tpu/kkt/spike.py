"""Horizon-parallel block-tridiagonal solve over a device mesh.

This is the framework's "sequence/context parallelism" axis (SURVEY.md
§2.9, §5): long MPC horizons make the KKT block-tridiagonal, and the
horizon can be partitioned across devices.  One-level Schur-complement
domain decomposition (SPIKE-style):

1. chunk the nb stage-blocks into P partitions; the last block of each
   partition is an *interface*, the rest are *interior*;
2. every device factors its interior block-tridiagonal system and
   eliminates it from its boundary couplings (local scans, parallel
   across the mesh);
3. the reduced system over the P interface blocks (block-tridiagonal,
   size P*s) is gathered with an all_gather over ICI and solved
   redundantly on every device;
4. interiors back-substitute in parallel.

Communication: one all_gather of O(P * s^2) + O(P * s) — independent of
the horizon length; everything else rides local compute.  The reference
has no analog (single process); this is new design enabled by the mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from .dense import hdot


def _local_tridiag_factor(A, B):
    """Sequential block LDL of a local block-tridiag chain (lax.scan).

    A: (m, s, s) diagonal blocks; B: (m, s, s) subdiagonal (B[0] unused).
    Returns (Ls, Ds_lu) as in kkt/tridiag.py.
    """
    s = A.shape[-1]

    def step(carry, inp):
        lu_p, piv_p = carry
        A_i, B_i = inp
        L_i = jax.scipy.linalg.lu_solve((lu_p, piv_p), B_i.T, trans=1).T
        D_i = A_i - L_i @ B_i.T
        lu_i, piv_i = jax.scipy.linalg.lu_factor(D_i)
        return (lu_i, piv_i), (L_i, lu_i, piv_i)

    lu0, piv0 = jax.scipy.linalg.lu_factor(A[0])
    _, (Ls_r, lus_r, pivs_r) = lax.scan(step, (lu0, piv0), (A[1:], B[1:]))
    Ls = jnp.concatenate([jnp.zeros((1, s, s), A.dtype), Ls_r], axis=0)
    lus = jnp.concatenate([lu0[None], lus_r], axis=0)
    pivs = jnp.concatenate([piv0[None], pivs_r], axis=0)
    return Ls, (lus, pivs)


def _local_tridiag_solve(Ls, Ds_lu, b):
    """Solve the local chain for (possibly multiple) rhs b: (m, s, k)."""
    lus, pivs = Ds_lu
    s = Ls.shape[-1]

    def fwd(carry, inp):
        yprev = carry
        L_i, b_i = inp
        y_i = b_i - L_i @ yprev
        return y_i, y_i

    _, ys = lax.scan(fwd, jnp.zeros_like(b[0]), (Ls, b))
    zs = jax.vmap(lambda l_, p_, y_: jax.scipy.linalg.lu_solve((l_, p_), y_))(
        lus, pivs, ys
    )

    def bwd(carry, inp):
        xnext = carry
        L_next, z_i = inp
        x_i = z_i - L_next.T @ xnext
        return x_i, x_i

    Ls_next = jnp.concatenate(
        [Ls[1:], jnp.zeros((1, s, s), Ls.dtype)], axis=0
    )
    _, xs = lax.scan(bwd, jnp.zeros_like(b[0]), (Ls_next, zs), reverse=True)
    return xs


def _check_partition(nb: int, Pn: int) -> int:
    if nb % Pn != 0 or nb // Pn < 2:
        raise ValueError(f"nb={nb} must be a multiple of mesh size {Pn} (>=2 per chunk)")
    return nb // Pn


def spike_factor(A, B, mesh: Mesh, axis: str = "stages"):
    """Factor the symmetric block-tridiagonal system over the mesh,
    independent of any right-hand side.

    A: (nb, s, s) diagonal blocks; B: (nb, s, s) subdiagonal blocks
    (B[i] couples block i to i-1; B[0] = 0).  nb must be divisible by
    the mesh size P, with nb/P >= 2.

    Returns an opaque factor pytree consumed by :func:`spike_apply`.
    The expensive parts — the interior chain factorizations, the spike
    solves Zw/Zv (2s columns each), and the reduced interface-system
    factorization — happen once here; each subsequent rhs costs only
    two single-column chain sweeps plus one all_gather of O(P*s).
    """
    nb, s, _ = A.shape
    Pn = mesh.shape[axis]
    m = _check_partition(nb, Pn)

    def local_factor(A_c, B_c):
        # A_c: (m, s, s) local chunk; last block is the interface.
        mi = m - 1
        Ai = A_c[:mi]                         # interior chain diagonals
        # interior subdiagonals: B_c[0] couples to the PREVIOUS chunk's
        # interface (handled via V below), not to the interior chain
        Bi = B_c[:mi].at[0].set(jnp.zeros((s, s), A_c.dtype))
        t_diag = A_c[mi]                      # interface diagonal block
        W = B_c[mi]                           # coupling interface<-last interior
        V = B_c[0]                            # coupling first interior<-prev interface

        Ls, (lus, pivs) = _local_tridiag_factor(Ai, Bi)

        # spike columns: [e_last*W' | e_first*V]
        rhs = jnp.zeros((mi, s, 2 * s), A_c.dtype)
        rhs = rhs.at[mi - 1, :, :s].set(W.T)          # W' on last interior row
        rhs = rhs.at[0, :, s:].set(V)                 # V on first interior row
        Z = _local_tridiag_solve(Ls, (lus, pivs), rhs)  # (mi, s, 2s)
        Zw = Z[:, :, :s]                   # I^{-1} (e_last W')
        Zv = Z[:, :, s:]                   # I^{-1} (e_first V)

        # Schur contributions for interface j (ours) and the coupling to
        # interface j-1 (through our interior):
        #   S_jj -= W I^{-1} W'                       (from our interior)
        #   S_{j,j-1} = -W I^{-1} (e_first V)
        S_self = t_diag - W @ Zw[mi - 1]             # (s, s)
        S_prev = -(W @ Zv[mi - 1])                    # couples t_{j-1}
        # our interior also reduces onto the PREVIOUS interface:
        #   S_{j-1,j-1} -= V' I^{-1} V
        S_next_corr = -(Zv[0].T @ V)

        # gather the reduced block-tridiagonal system (P interfaces) and
        # factor it redundantly on every device
        Sd = jax.lax.all_gather(S_self, axis)         # (P, s, s)
        Sp = jax.lax.all_gather(S_prev, axis)         # (P, s, s) coupling j->j-1
        Sc = jax.lax.all_gather(S_next_corr, axis)    # (P, s, s) corr chunk j -> iface j-1
        Pn_ = Sd.shape[0]
        diag = Sd.at[: Pn_ - 1].add(Sc[1:])
        sub = jnp.concatenate([jnp.zeros((1, s, s), Sd.dtype), Sp[1:]], axis=0)
        Lr, (r_lus, r_pivs) = _local_tridiag_factor(diag, sub)

        return (Ls, lus, pivs, Zw, Zv, W[None], V[None],
                Lr, r_lus, r_pivs)

    from jax import shard_map

    sharded = P(axis)
    repl = P()
    return shard_map(
        local_factor,
        mesh=mesh,
        in_specs=(sharded, sharded),
        out_specs=(sharded, sharded, sharded, sharded, sharded, sharded,
                   sharded, repl, repl, repl),
        check_vma=False,
    )(A, B)


def spike_apply(factor, b, mesh: Mesh, axis: str = "stages"):
    """Solve for one rhs b: (nb, s) using a cached :func:`spike_factor`."""
    Ls, lus, pivs, Zw, Zv, W, V, Lr, r_lus, r_pivs = factor
    s = Ls.shape[-1]

    def local_apply(Ls_c, lus_c, pivs_c, Zw_c, Zv_c, W_c, V_c,
                    Lr_r, r_lus_r, r_pivs_r, b_c):
        mi = Ls_c.shape[0]
        W_ = W_c[0]
        V_ = V_c[0]
        idx = jax.lax.axis_index(axis)

        # interior solve of b (single column)
        y = _local_tridiag_solve(Ls_c, (lus_c, pivs_c), b_c[:mi, :, None])[..., 0]

        # reduced rhs at our interface and the correction we owe the
        # previous interface
        r_self = b_c[mi] - W_ @ y[mi - 1]
        r_next_corr = -(V_.T @ y[0])
        # one all_gather of the concatenated (2s,) payload — half the
        # per-rhs ICI latency of gathering the two pieces separately
        both = jax.lax.all_gather(
            jnp.concatenate([r_self, r_next_corr]), axis
        )                                             # (P, 2s)
        rs, rc = both[:, :s], both[:, s:]
        Pn_ = rs.shape[0]
        rhs_red = rs.at[: Pn_ - 1].add(rc[1:])

        # reduced interface solve with the cached factor (redundant on
        # every device)
        t = _local_tridiag_solve(Lr_r, (r_lus_r, r_pivs_r),
                                 rhs_red[..., None])[..., 0]  # (P, s)

        # back-substitute interior: x_I = y - Zw*t_j - Zv*t_{j-1}
        t_self = t[idx]
        t_prev = jnp.where(idx > 0, t[jnp.maximum(idx - 1, 0)],
                           jnp.zeros((s,), t.dtype))
        xI = y - Zw_c @ t_self - Zv_c @ t_prev
        return jnp.concatenate([xI, t_self[None]], axis=0)  # (m, s)

    from jax import shard_map

    sharded = P(axis)
    repl = P()
    return shard_map(
        local_apply,
        mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, sharded, sharded,
                  sharded, repl, repl, repl, sharded),
        out_specs=sharded,
        check_vma=False,
    )(Ls, lus, pivs, Zw, Zv, W, V, Lr, r_lus, r_pivs, b)


def spike_solve(A, B, b, mesh: Mesh, axis: str = "stages"):
    """Solve the symmetric block-tridiagonal system over the mesh
    (factor + one apply; for repeated rhs use :func:`spike_factor` +
    :func:`spike_apply` so the factorization is reused).

    A: (nb, s, s) diagonal blocks; B: (nb, s, s) subdiagonal blocks
    (B[i] couples block i to i-1; B[0] = 0); b: (nb, s) rhs.
    Returns x: (nb, s).
    """
    factor = spike_factor(A, B, mesh, axis=axis)
    return spike_apply(factor, b, mesh, axis=axis)


class SpikeFactorization:
    """KKT-backend adapter: mesh-distributed banded solve with f64
    iterative refinement against the dense matrix.

    The distributed elimination (:func:`spike_factor`) runs once per
    KKT matrix; every rhs and every refinement sweep reuses the cached
    factor through :func:`spike_apply` (single-column chain sweeps +
    one O(P*s) all_gather each).
    """

    def __init__(self, WW, plan, mesh: Mesh, axis: str = "stages",
                 n_refine: int = 2):
        self.WW = WW
        self.plan = plan
        self.mesh = mesh
        self.axis = axis
        self.n_refine = n_refine
        perm = jnp.asarray(plan.perm)
        WWp = WW[perm][:, perm].astype(jnp.float32)
        A, B = dense_to_blocks(WWp, plan.block)
        # pad the block count to a multiple of the mesh size with
        # identity blocks (>= 2 blocks per chunk)
        Pn = mesh.shape[axis]
        nb = A.shape[0]
        nb2 = max(-(-nb // Pn), 2) * Pn
        if nb2 != nb:
            s = plan.block
            eye = jnp.broadcast_to(
                jnp.eye(s, dtype=A.dtype), (nb2 - nb, s, s)
            )
            A = jnp.concatenate([A, eye], axis=0)
            B = jnp.concatenate(
                [B, jnp.zeros((nb2 - nb, s, s), A.dtype)], axis=0
            )
        self.A, self.B = A, B
        self.nb2 = nb2
        self.factor = spike_factor(A, B, mesh, axis=axis)

    def _solve32(self, rhs):
        plan = self.plan
        s, n = plan.block, plan.n
        npad = self.nb2 * s
        perm = jnp.asarray(plan.perm)
        iperm = jnp.asarray(plan.iperm)
        bp = rhs[perm].astype(jnp.float32)
        bp = jnp.concatenate([bp, jnp.zeros((npad - n,), jnp.float32)])
        x = spike_apply(self.factor, bp.reshape(self.nb2, s), self.mesh,
                        axis=self.axis)
        return x.reshape(npad)[:n][iperm]

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


def dense_to_blocks(WW, s: int):
    """Utility: chop a banded matrix (half-bandwidth <= s) into
    (nb, s, s) diagonal + subdiagonal block sequences (padded)."""
    n = WW.shape[0]
    nb = -(-n // s)
    npad = nb * s
    W = jnp.eye(npad, dtype=WW.dtype).at[:n, :n].set(WW) if npad != n else WW
    idx = jnp.arange(nb)
    A = jax.vmap(lambda i: lax.dynamic_slice(W, (i * s, i * s), (s, s)))(idx)
    B = jax.vmap(
        lambda i: lax.dynamic_slice(W, (i * s, jnp.maximum(i - 1, 0) * s), (s, s))
    )(idx)
    B = B.at[0].set(jnp.zeros((s, s), W.dtype))
    return A, B
