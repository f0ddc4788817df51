"""Perf lab: measure mpc_dcmotor batched-solve throughput across KKT
backends / IPM variants on the real TPU, plus raw factorization-kernel
microbenchmarks.  Drives the round's headline optimization (VERDICT.md
Next #1): pick the variant that reaches >= 1176 solves/s/chip with
batch_converged == B, then wire it into bench.py.

Usage:
    python tools/perf_lab.py kernels          # raw factorization bench
    python tools/perf_lab.py A B C ...        # named solver variants
    python tools/perf_lab.py all
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sync(x):
    """Reliable device sync through the axon relay (host fetch)."""
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def bench_kernels(B=1024):
    """Raw batched factorization microbenchmarks (the per-iteration
    dominant cost).  Sizes: 328 = padded large timesLambda KKT of
    mpc_dcmotor T=30; 152 = padded condensed (smallerNewtonMatrix)."""
    from tenscalc_tpu.kkt.dense import ldl_factor
    from tenscalc_tpu.kkt.fleet import fleet_ldl_factor_batched

    rng = np.random.default_rng(0)
    for n in (152, 328):
        M = rng.standard_normal((B, n, n)).astype(np.float32)
        A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 10.0 * np.eye(n, dtype=np.float32))

        def timeit(f, *args, reps=3):
            out = f(*args)
            _sync(jax.tree.leaves(out)[0])
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(*args)
                _sync(jax.tree.leaves(out)[0])
            return (time.perf_counter() - t0) / reps

        t_lu = timeit(jax.jit(jax.vmap(jax.scipy.linalg.lu_factor)), A)
        print(json.dumps({"kernel": "xla_lu", "n": n, "B": B, "ms": round(t_lu * 1e3, 2)}), flush=True)
        t_ldl = timeit(
            jax.jit(jax.vmap(lambda Mi: ldl_factor(Mi, clamp=1e-7))), A
        )
        print(json.dumps({"kernel": "blocked_ldl_vmap", "n": n, "B": B, "ms": round(t_ldl * 1e3, 2)}), flush=True)
        if n <= 180:
            t_fleet = timeit(
                lambda A_: fleet_ldl_factor_batched(A_, clamp=1e-7), A
            )
            print(json.dumps({"kernel": "fleet_ldl", "n": n, "B": B, "ms": round(t_fleet * 1e3, 2)}), flush=True)


VARIANTS = {
    # name: solver option overrides
    "A": dict(),  # round-1 bench default: timesLambda large + pivoted LU
    "B": dict(variant="standard", smallerNewtonMatrix=True),
    "C": dict(variant="standard", smallerNewtonMatrix=True, kkt_backend="ldl"),
    "D": dict(variant="standard", smallerNewtonMatrix=True, kkt_backend="fleet"),
    "E": dict(variant="standard", smallerNewtonMatrix=True, kkt_backend="fleet",
              skipAffine=False),
    "F": dict(variant="standard", smallerNewtonMatrix=True, skipAffine=False),
    "G": dict(variant="standard", smallerNewtonMatrix=True, kkt_backend="fleet",
              kkt_refine=1),
    "H": dict(variant="standard", smallerNewtonMatrix=True, kkt_backend="tridiag"),
    "I": dict(variant="standard", smallerNewtonMatrix=True, kkt_backend="fleet_banded"),
    "J": dict(variant="standard", smallerNewtonMatrix=True, kkt_backend="fleet_banded",
              kkt_refine=1),
    "K": dict(variant="standard", smallerNewtonMatrix=True, kkt_backend="fleet_banded",
              skipAffine=False),
}


def bench_variant(name: str, B: int = 1024, max_iter: int = 100):
    from examples import mpc_dcmotor
    from tenscalc_tpu.parallel import solve_batched

    opts = VARIANTS[name]
    ns = f"lab{name}_"
    t_build0 = time.perf_counter()
    solver = mpc_dcmotor.build_solver(T=30, namespace=ns, dtype="float32", **opts)
    base = mpc_dcmotor.default_params(30, ns)
    Ts = base[ns + "Ts"]
    T = 30
    rng = np.random.default_rng(0)
    bparams = {}
    for k, v in base.items():
        arr = np.asarray(v, float)
        bparams[k] = np.broadcast_to(arr, (B,) + arr.shape).copy()
    bparams[ns + "ref"] = np.stack(
        [
            mpc_dcmotor.reference_signal(t0_ + np.arange(T) * Ts)[None, :]
            for t0_ in np.linspace(0.0, 6.0, B)
        ]
    )
    bparams[ns + "xinit"] = rng.uniform(-0.15, 0.15, (B, 2, 1))
    binits = {
        ns + "x": bparams[ns + "xinit"] + 0.01 * rng.random((B, 2, T)),
        ns + "u": 0.01 * rng.random((B, 1, T - 1)),
    }
    res = solve_batched(solver, bparams, inits=binits, mu0=1e-3, max_iter=max_iter)
    _sync(res.status)
    t_compile = time.perf_counter() - t_build0
    statuses = np.asarray(res.status)
    iters = np.asarray(res.iters)
    n_ok = int((statuses == 0).sum())
    t0 = time.perf_counter()
    n_runs = 3
    for _ in range(n_runs):
        res = solve_batched(solver, bparams, inits=binits, mu0=1e-3, max_iter=max_iter)
        _sync(res.status)
    batch_time = (time.perf_counter() - t0) / n_runs
    print(
        json.dumps(
            {
                "variant": name,
                "opts": {k: str(v) for k, v in opts.items()},
                "B": B,
                "solves_per_s": round(B / batch_time, 1),
                "vs_baseline": round(B / batch_time * 850e-6, 4),
                "batch_time_s": round(batch_time, 3),
                "converged": n_ok,
                "iters_mean": round(float(iters.mean()), 1),
                "iters_max": int(iters.max()),
                "compile_s": round(t_compile, 1),
            }
        ),
        flush=True,
    )


def main():
    args = sys.argv[1:] or ["kernels"]
    if "all" in args:
        args = ["kernels"] + list(VARIANTS)
    B = int(os.environ.get("LAB_BATCH", "1024"))
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    for a in args:
        try:
            if a == "kernels":
                bench_kernels(B=B)
            else:
                bench_variant(a, B=B)
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"variant": a, "error": repr(e)[:500]}), flush=True)


if __name__ == "__main__":
    main()
