"""Measure in-loop per-iteration cost vs fixed overhead of the flagship
batched solve: time the jitted batched solve at several max_iter values
(a *runtime* argument — one compilation) and fit time = a + b*iters.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import FLAGSHIP_OPTS, _device_batch_inputs, _shared_names
from examples import mpc_dcmotor
from tenscalc_tpu.parallel import batched_solve_fn


def main():
    B = 1024
    T = 30
    ns = "bench_"  # reuse the bench solver namespace -> cached compile
    solver = mpc_dcmotor.build_solver(T=T, namespace=ns, **FLAGSHIP_OPTS)
    dparams, u0 = _device_batch_inputs(solver, B, ns, T, np.random.default_rng(0))
    fn = batched_solve_fn(solver, shared=_shared_names(solver, dparams))
    mu0 = jnp.asarray(1e-3, jnp.float32)
    a = jnp.asarray(1e-9, jnp.float32)

    # warm compile
    res = fn(u0, dparams, mu0, jnp.asarray(100, jnp.int32), a, a)
    print("iters_max(full):", int(np.asarray(res.iters).max()),
          "converged:", int((np.asarray(res.status) == 0).sum()), flush=True)

    pts = []
    for mi in (1, 3, 6, 10, 14, 18):
        miv = jnp.asarray(mi, jnp.int32)
        fn(u0, dparams, mu0, miv, a, a)  # warm queue
        n_q = 5
        t0 = time.perf_counter()
        for _ in range(n_q):
            r = fn(u0, dparams, mu0, miv, a, a)
        np.asarray(r.status)
        dt_ = (time.perf_counter() - t0) / n_q
        # actual lockstep iterations executed = max over batch of iters
        k = int(np.asarray(r.iters).max())
        pts.append((k, dt_))
        print(json.dumps({"max_iter": mi, "lockstep_iters": k,
                          "batch_s": round(dt_, 4)}), flush=True)

    ks = np.array([p[0] for p in pts], float)
    ts = np.array([p[1] for p in pts], float)
    bfit, afit = np.polyfit(ks, ts, 1)
    print(json.dumps({"per_iter_ms": round(bfit * 1e3, 3),
                      "overhead_ms": round(afit * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
