"""In-loop per-iteration cost of the batched MPC-MHE equilibrium solve:
sweep runtime max_iter and fit time = prologue + slope * iters
(same methodology as tools/iter_sweep.py for the optimize flagship)."""

from __future__ import annotations

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

from examples import mpcmhe_dcmotor


def main(B=1024, T=12, L=16):
    ns = "bmmhe_"
    solver = mpcmhe_dcmotor.build_solver(T=T, L=L, ns=ns, dtype="float32")
    print("backend:", solver.kkt_backend_resolved, flush=True)
    base = mpcmhe_dcmotor.default_params(ns)
    base[ns + "lambda_n"] = 20.0
    rng = np.random.default_rng(0)
    t = np.arange(T) * 0.05
    params = {}
    for k, v in base.items():
        arr = np.asarray(v, float)
        params[k] = np.broadcast_to(arr, (B,) + arr.shape).copy()
    params[ns + "uPast"] = 0.1 * rng.standard_normal((B, 1, L))
    params[ns + "yPast"] = 0.05 * np.sin(
        0.5 * (np.arange(-L, 0) * 0.05)
    ).reshape(1, 1, L) + 0.02 * rng.standard_normal((B, 1, L))
    params[ns + "ref"] = np.stack(
        [
            mpcmhe_dcmotor.reference_signal(t0_ + t)[None, :]
            for t0_ in np.linspace(0.0, 4.0, B)
        ]
    )
    dparams = {k: jnp.asarray(np.asarray(v), jnp.float32)
               for k, v in params.items()}

    res = solver.solve_many(dparams, mu0=1e-3, max_iter=100)
    st = np.asarray(res.status)
    print("converged:", int((st == 0).sum()), "/", B,
          "iters max:", int(np.asarray(res.iters).max()), flush=True)

    pts = []
    for mi in (1, 3, 6, 9, 12):
        r = solver.solve_many(dparams, mu0=1e-3, max_iter=mi)
        np.asarray(r.status)
        n_q = 3
        t0 = time.perf_counter()
        for _ in range(n_q):
            r = solver.solve_many(dparams, mu0=1e-3, max_iter=mi)
        np.asarray(r.status)
        tt = (time.perf_counter() - t0) / n_q
        pts.append((mi, tt))
        print(f"max_iter={mi}: {tt*1e3:.1f} ms", flush=True)
    xs = np.array([p[0] for p in pts], float)
    ys = np.array([p[1] for p in pts], float)
    b, a0 = np.polyfit(xs, ys, 1)
    print(f"fit: prologue {a0*1e3:.1f} ms + {b*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
