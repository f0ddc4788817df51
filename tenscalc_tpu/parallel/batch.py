"""Scenario-parallel batched solving over device meshes.

The reference is single-threaded, single-process (SURVEY.md §2.9); its
implicit strength is solving the same small problem thousands of times
(Tmpc at every timestep).  Here that axis is first-class:

* :func:`batched_solve_fn` — vmap the jitted IPM over a leading batch
  axis of (initial points, parameter values): one XLA program solving B
  problems in lockstep on one chip.  The while_loop runs until *all*
  instances converge; per-instance ``done`` freezes finished iterates
  (each instance's status/iteration count stays its own).
* with a :class:`jax.sharding.Mesh`, the batch is sharded across chips
  with ``shard_map`` — embarrassingly parallel, zero collectives in the
  solve itself; a single ``psum`` aggregates convergence statistics.

This is the DP-like axis; the horizon/structure (CP-like) axis lives in
``tenscalc_tpu.kkt.tridiag``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..api import OptimizeSolver


def make_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def batched_solve_fn(solver: OptimizeSolver, mesh: Optional[Mesh] = None,
                     axis: str = "batch", donate: bool = False,
                     shared: Sequence[str] = ()):
    """Return a jitted function solving a batch of problem instances.

    Signature: ``fn(u0_batch, penv_batch, mu0, max_iter, addU0, addEq0)``
    where ``u0_batch`` is [B, nU] and every leaf of ``penv_batch`` has a
    leading batch axis — EXCEPT parameters named in ``shared``, which
    are passed unbatched (vmap in_axes=None).  Sharing matters: any
    derivative matrix that depends only on shared parameters is
    computed ONCE instead of per instance — for an MPC fleet whose
    plant model is common across scenarios this removes the (B, nG, nU)
    constraint-Jacobian materialization from the prologue (round-4
    finding: 367 ms of an 834 ms MPC-MHE batch solve was per-instance
    recomputation of instance-invariant Jacobians).

    With a mesh, B must be divisible by the mesh size; the batch is
    sharded across devices and shared parameters are replicated.
    """
    shared = frozenset(shared)
    base = solver._solve_raw
    penv_axes = {
        p.name: (None if p.name in shared else 0)
        for p in solver.parameters
    }
    vmapped = jax.vmap(base, in_axes=(0, penv_axes, None, None, None, None))

    if mesh is None:
        return jax.jit(vmapped)

    penv_specs = {
        p.name: (P() if p.name in shared else P(axis))
        for p in solver.parameters
    }

    def sharded(u0, penv, mu0, max_iter, addU0, addEq0):
        def shard_body(u0s, penvs):
            return vmapped(u0s, penvs, mu0, max_iter, addU0, addEq0)

        from jax import shard_map

        res = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(axis), penv_specs),
            out_specs=P(axis),
            check_vma=False,
        )(u0, penv)
        return res

    return jax.jit(sharded)


def solve_batched(
    solver: OptimizeSolver,
    parameters: Mapping[str, Any],
    inits: Optional[Mapping[str, Any]] = None,
    mu0: float = 1.0,
    max_iter: Optional[int] = None,
    addEye2Hessian=(1e-9, 1e-9),
    mesh: Optional[Mesh] = None,
):
    """Solve a batch: every parameter/init leaf carries a leading batch
    axis B.  A parameter passed with its UNBATCHED declared shape is
    treated as shared across the batch (computed-once derivatives, see
    :func:`batched_solve_fn`).  Returns the batched IPMResult (device
    arrays)."""
    dt = solver.opts.np_dtype
    penv = {}
    shared = set()
    B = None
    for p in solver.parameters:
        if p.name not in parameters:
            raise ValueError(f"missing parameter {p.name!r}")
        v = jnp.asarray(parameters[p.name], dt)
        if tuple(v.shape) == p.shape:
            shared.add(p.name)
            penv[p.name] = v
            continue
        if tuple(v.shape[1:]) != p.shape:
            raise ValueError(
                f"parameter {p.name!r}: expected batched shape (B,)+{p.shape} "
                f"or shared shape {p.shape}, got {tuple(v.shape)}"
            )
        if B is None:
            B = v.shape[0]
        elif v.shape[0] != B:
            raise ValueError("inconsistent batch sizes")
        penv[p.name] = v
    if B is None:
        raise ValueError("at least one batched parameter required")

    inits = dict(inits or {})
    env = {}
    for v in solver.variables:
        if v.name in inits:
            arr = jnp.asarray(inits[v.name], dt)
            if tuple(arr.shape) != (B,) + v.shape:
                raise ValueError(
                    f"init {v.name!r}: expected shape (B,)+{v.shape}, got {tuple(arr.shape)}"
                )
        else:
            arr = jnp.zeros((B,) + v.shape, dt)
        env[v.name] = arr.reshape(B, -1)
    u0 = (
        jnp.concatenate([env[n] for n in solver.packing.names], axis=1)
        if solver.packing.names
        else jnp.zeros((B, 0), dt)
    )

    fn = batched_solve_fn(solver, mesh=mesh, shared=sorted(shared))
    return fn(
        u0,
        penv,
        jnp.asarray(mu0, dt),
        solver.opts.maxIter if max_iter is None else max_iter,
        jnp.asarray(addEye2Hessian[0], dt),
        jnp.asarray(addEye2Hessian[1], dt),
    )
