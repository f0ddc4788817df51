"""Benchmark: mpc_dcmotor IPM solve throughput (the BASELINE.json
north-star metrics: IPM iterations/s + KKT-solve µs/iter on mpc_dcmotor;
batched solves/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline for ``vs_baseline``: the reference's fastest published solve —
the cmex C solver on ``sls`` at ~850 µs/solve (README.md:117-120, see
BASELINE.md) → ~1176 solves/s on one CPU core.  The reference has no
parallel/batched mode, so its chip-level throughput equals that number.

Timing methodology: the axon relay adds ~0.2-0.5 s of latency per
host<->device transfer and its ``block_until_ready`` can return before
the computation finishes, so naive per-call timing measures the tunnel,
not the TPU.  All inputs are made device-resident once, N solves are
queued back-to-back, and the clock stops at a full host fetch of the
final statuses — total/N is the true steady-state device time per
batched solve (the MPC deployment pattern: the solver runs continuously,
parameters stream on-device).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

BASELINE_SOLVES_PER_S = 1.0 / 850e-6  # reference cmex sls solve, README.md:117

# flagship solver configuration: condensed Newton matrix + the
# batch-in-lanes banded Pallas LDL over the RCM band (kkt/fleet_banded.py)
FLAGSHIP_OPTS = dict(
    dtype="float32",
    variant="standard",
    smallerNewtonMatrix=True,
    kkt_backend="fleet_banded",
    # one refinement sweep is enough on the equilibrated band (ablation:
    # identical convergence at 17 lockstep iters, -3.2 ms/iter)
    kkt_refine=1,
    # affine-F broadcast line search (exact for this problem's bound
    # constraints)
    linesearch_affine_F=True,
)


def _device_batch_inputs(solver, B, ns, T, rng):
    import jax.numpy as jnp
    import numpy as np

    from examples import mpc_dcmotor

    base = mpc_dcmotor.default_params(T, ns)
    Ts = base[ns + "Ts"]
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
    dparams = {k: jnp.asarray(np.asarray(v), jnp.float32) for k, v in bparams.items()}
    env = {
        v.name: jnp.asarray(binits[v.name], jnp.float32).reshape(B, -1)
        for v in solver.variables
    }
    u0 = jnp.concatenate([env[n] for n in solver.packing.names], axis=1)
    return dparams, u0


def _throughput(solver, B, ns, T, rng, n_queued=5):
    """(solves/s, converged, iters_max) with queued true-sync timing."""
    import jax.numpy as jnp
    import numpy as np

    from tenscalc_tpu.parallel import batched_solve_fn

    dparams, u0 = _device_batch_inputs(solver, B, ns, T, rng)
    mu0 = jnp.asarray(1e-3, jnp.float32)
    a1 = jnp.asarray(1e-9, jnp.float32)
    a2 = jnp.asarray(1e-9, jnp.float32)
    mi = jnp.asarray(100, jnp.int32)
    fn = batched_solve_fn(solver)

    res = fn(u0, dparams, mu0, mi, a1, a2)  # compile + warm run
    statuses = np.asarray(res.status)      # full host fetch = true sync
    n_ok = int((statuses == 0).sum())
    iters_max = int(np.asarray(res.iters).max())

    t0 = time.perf_counter()
    for _ in range(n_queued):
        res = fn(u0, dparams, mu0, mi, a1, a2)
    np.asarray(res.status)                 # single final true sync
    batch_time = (time.perf_counter() - t0) / n_queued
    return B / batch_time, n_ok, iters_max, batch_time


def main():
    import jax

    cache_dir = _REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from examples import mpc_dcmotor

    dev = jax.devices()[0]
    T = 30
    rng = np.random.default_rng(0)

    # ---- batched throughput: solves/s/chip + throughput-vs-B curve ---
    B_main = int(os.environ.get("BENCH_BATCH", "1024"))
    curve_Bs = sorted({B_main, 1024, 4096})
    curve = {}
    main_stats = None
    for B in curve_Bs:
        ns = f"bench{B}_"
        solver = mpc_dcmotor.build_solver(T=T, namespace=ns, **FLAGSHIP_OPTS)
        sps, n_ok, iters_max, batch_time = _throughput(
            solver, B, ns, T, np.random.default_rng(0)
        )
        curve[str(B)] = round(sps, 1)
        if B == B_main:
            main_stats = (sps, n_ok, iters_max, batch_time, solver)
    solves_per_s, n_ok, iters_max, batch_time, solver = main_stats

    # ---- single-instance warm solve: µs/iter (queued timing) ---------
    ns1 = "bench1_"
    s1 = mpc_dcmotor.build_solver(T=T, namespace=ns1, **FLAGSHIP_OPTS)
    base = mpc_dcmotor.default_params(T, ns1)
    Ts = base[ns1 + "Ts"]
    params = dict(base)
    params[ns1 + "ref"] = mpc_dcmotor.reference_signal(np.arange(T) * Ts)[None, :]
    params[ns1 + "xinit"] = np.array([[0.2], [0.2]])
    penv = {k: jnp.asarray(np.asarray(v, float), jnp.float32)
            for k, v in s1._param_env(params).items()}
    init = {
        ns1 + "x": params[ns1 + "xinit"] + 0.01 * rng.random((2, T)),
        ns1 + "u": 0.01 * rng.random((1, T - 1)),
    }
    u0 = jnp.asarray(s1._pack_init(init), jnp.float32)
    mu0 = jnp.asarray(1e-3, jnp.float32)
    a = jnp.asarray(1e-9, jnp.float32)
    mi = jnp.asarray(100, jnp.int32)
    r = s1._solve_jit(u0, penv, mu0, mi, a, a)
    st0 = int(np.asarray(r.status))
    iters1 = int(np.asarray(r.iters))
    assert st0 == 0, f"bench problem failed: status {st0}"
    n_q = 20
    t0 = time.perf_counter()
    for _ in range(n_q):
        r = s1._solve_jit(u0, penv, mu0, mi, a, a)
    np.asarray(r.status)
    single_time = (time.perf_counter() - t0) / n_q
    us_per_iter = single_time / iters1 * 1e6
    iters_per_s = iters1 / single_time

    # ---- sls: the reference's headline ~850us benchmark --------------
    # (cmex C solver, N=400 n=32 constrained solve, README.md:117-120)
    from examples import sls as sls_mod

    sls_solver = sls_mod.build_constrained(
        ns="bsls_", dtype="float32", variant="standard",
        smallerNewtonMatrix=True,
    )
    d = sls_mod.default_data()
    sls_penv = {
        "bsls_A": jnp.asarray(d["A"], jnp.float32),
        "bsls_b": jnp.asarray(d["b"], jnp.float32),
    }
    sls_u0 = jnp.asarray(d["x0"], jnp.float32)
    sls_mu0 = jnp.asarray(1.0, jnp.float32)
    sls_mi = jnp.asarray(60, jnp.int32)
    r = sls_solver._solve_jit(sls_u0, sls_penv, sls_mu0, sls_mi, a, a)
    sls_us = None
    if int(np.asarray(r.status)) == 0:
        t0 = time.perf_counter()
        for _ in range(n_q):
            r = sls_solver._solve_jit(sls_u0, sls_penv, sls_mu0, sls_mi, a, a)
        np.asarray(r.status)
        sls_us = (time.perf_counter() - t0) / n_q * 1e6

    result = {
        "metric": "mpc_dcmotor batched solves/s/chip",
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 4),
        "device": str(dev),
        "batch": B_main,
        "batch_converged": n_ok,
        "batch_iters_max": iters_max,
        "batch_time_s": round(batch_time, 4),
        "throughput_vs_B": curve,
        "single_us_per_iter": round(us_per_iter, 1),
        "single_iters_per_s": round(iters_per_s, 1),
        "single_solve_ms": round(single_time * 1e3, 3),
        # reference cmex: ~850us for this exact solve (README.md:117)
        "sls_solve_us": round(sls_us, 0) if sls_us else None,
        "sls_vs_ref_850us": round(850.0 / sls_us, 4) if sls_us else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
