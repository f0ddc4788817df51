"""Fleet-scaling measurement harness (the ≥80%-efficiency target of
BASELINE.md: batched solves/s scaling from 1 chip → 1 host → ≥2 hosts).

``measure_scaling`` runs the same per-device workload on growing mesh
slices (weak scaling) and reports solves/s and efficiency relative to
the single-device rate.  On real multi-chip hardware the batch shards
over ICI with zero collectives in the solve itself, so efficiency is
expected near 1; on the virtual CPU mesh used in CI the devices share
physical cores, so only correctness (not speedup) is asserted there.

``init_distributed`` wraps jax.distributed initialization for
multi-host runs (DCN x ICI meshes) — the analog-and-more of the
reference's client-server callType (lib/cmex2optimizeCS.m:418-433).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from .batch import batched_solve_fn


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def measure_scaling(
    solver,
    make_batch,
    per_device_batch: int = 16,
    device_counts: Sequence[int] = (1, 2, 4, 8),
    mu0: float = 1e-3,
    max_iter: int = 100,
    reps: int = 3,
):
    """Weak-scaling sweep.

    ``make_batch(B)`` must return (u0[B,nU], penv with leading batch
    axis).  Returns a list of dicts with solves/s and efficiency.
    """
    devs = jax.devices()
    results = []
    base_rate = None
    for n_dev in device_counts:
        if n_dev > len(devs):
            break
        B = per_device_batch * n_dev
        mesh = Mesh(np.array(devs[:n_dev]), ("batch",))
        u0, penv = make_batch(B)
        fn = batched_solve_fn(solver, mesh=mesh)
        dt = solver.opts.np_dtype
        import jax.numpy as jnp

        args = (
            jnp.asarray(u0, dt), penv, jnp.asarray(mu0, dt),
            max_iter, jnp.asarray(1e-9, dt), jnp.asarray(1e-9, dt),
        )
        res = fn(*args)
        res.status.block_until_ready()
        statuses = np.asarray(res.status)
        t0 = time.perf_counter()
        for _ in range(reps):
            res = fn(*args)
            res.status.block_until_ready()
        elapsed = (time.perf_counter() - t0) / reps
        rate = B / elapsed
        if base_rate is None:
            base_rate = rate / n_dev
        results.append(
            dict(
                devices=n_dev,
                batch=B,
                solves_per_s=rate,
                efficiency=rate / (base_rate * n_dev),
                converged=int((statuses == 0).sum()),
            )
        )
    return results
