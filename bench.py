"""Benchmark: mpc_dcmotor IPM solve throughput (the BASELINE.json
north-star metrics: IPM iterations/s + KKT-solve µs/iter on mpc_dcmotor;
batched solves/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline for ``vs_baseline``: the reference's fastest published solve —
the cmex C solver on ``sls`` at ~850 µs/solve (README.md:117-120, see
BASELINE.md) → ~1176 solves/s on one CPU core.  The reference has no
parallel/batched mode, so its chip-level throughput equals that number.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

BASELINE_SOLVES_PER_S = 1.0 / 850e-6  # reference cmex sls solve, README.md:117


def main():
    import jax

    # persistent compilation cache: the driver re-runs this script every
    # round; only code changes pay the (minutes-long on TPU) compile cost
    cache_dir = _REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from examples import mpc_dcmotor
    from tenscalc_tpu.parallel import solve_batched

    dev = jax.devices()[0]
    T = 30
    ns = "bench_"
    # pure float32: converges to the reference tolerances on these
    # problems (validated vs f64: controls match to 4e-7) and avoids
    # f64 software emulation on TPU
    solver = mpc_dcmotor.build_solver(T=T, namespace=ns, dtype="float32")
    # NOTE: the blocked-LDL backend benches ~1.8x faster per batched
    # factorization, but unpivoted LDL in f32 breaks down on the real
    # KKT matrices near convergence (0/1024 converged) — partial
    # pivoting is what saves the f32 LU path.  Batched solving uses the
    # same (pivoted LU + refinement) solver as the single path.
    bsolver = solver
    base = mpc_dcmotor.default_params(T, ns)
    Ts = base[ns + "Ts"]
    rng = np.random.default_rng(0)

    # ---- single-instance warm solve: µs/iter ------------------------
    params = dict(base)
    params[ns + "ref"] = mpc_dcmotor.reference_signal(np.arange(T) * Ts)[None, :]
    params[ns + "xinit"] = np.array([[0.2], [0.2]])
    init = {
        ns + "x": params[ns + "xinit"] + 0.01 * rng.random((2, T)),
        ns + "u": 0.01 * rng.random((1, T - 1)),
    }
    sol = solver.solve(params, init=init, mu0=1e-3, max_iter=100)  # compile
    assert sol.status == 0, f"bench problem failed: {sol.describe()}"
    n_rep = 5
    t0 = time.perf_counter()
    iters = 0
    for _ in range(n_rep):
        r = solver.solve_result(params, init=init, mu0=1e-3, max_iter=100)
        iters += int(r.iters.block_until_ready())
    single_time = (time.perf_counter() - t0) / n_rep
    us_per_iter = single_time / (iters / n_rep) * 1e6
    iters_per_s = (iters / n_rep) / single_time

    # ---- batched throughput: solves/s/chip --------------------------
    # per-iteration TPU cost is dispatch-latency-bound for one instance
    # (~3-6 ms/iter regardless of f32/f64), so throughput comes from
    # batch amortization: the MXU is far from saturated at this size
    import os

    B = int(os.environ.get("BENCH_BATCH", "1024"))
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
    res = solve_batched(bsolver, bparams, inits=binits, mu0=1e-3, max_iter=100)
    res.status.block_until_ready()  # compile + first run
    statuses = np.asarray(res.status)
    n_ok = int((statuses == 0).sum())
    t0_ = time.perf_counter()
    n_runs = 3
    for _ in range(n_runs):
        res = solve_batched(
            bsolver, bparams, inits=binits, mu0=1e-3, max_iter=100
        )
        res.status.block_until_ready()
    batch_time = (time.perf_counter() - t0_) / n_runs
    solves_per_s = B / batch_time

    # ---- sls: the reference's headline ~850us benchmark -------------
    # (cmex C solver, N=400 n=32 constrained solve, README.md:117-120)
    from examples import sls as sls_mod

    sls_solver = sls_mod.build_constrained(ns="bsls_", dtype="float32")
    d = sls_mod.default_data()
    sls_params = {"bsls_A": d["A"], "bsls_b": d["b"]}
    sls_init = {"bsls_x": d["x0"]}
    s0 = sls_solver.solve(sls_params, init=sls_init, mu0=1.0, max_iter=60)
    sls_us = None
    if s0.status == 0:
        t0_ = time.perf_counter()
        for _ in range(5):
            r = sls_solver.solve_result(
                sls_params, init=sls_init, mu0=1.0, max_iter=60
            )
            r.iters.block_until_ready()
        sls_us = (time.perf_counter() - t0_) / 5 * 1e6

    result = {
        "metric": "mpc_dcmotor batched solves/s/chip",
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 4),
        "device": str(dev),
        "batch": B,
        "batch_converged": n_ok,
        "single_us_per_iter": round(us_per_iter, 1),
        "single_iters_per_s": round(iters_per_s, 1),
        "single_solve_ms": round(single_time * 1e3, 2),
        # reference cmex: ~850us for this exact solve (README.md:117)
        "sls_solve_us": round(sls_us, 0) if sls_us else None,
        "sls_vs_ref_850us": round(850.0 / sls_us, 4) if sls_us else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
