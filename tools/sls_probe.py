"""Probe the sls headline problem on the TPU: warm-solve status in f32
and the in-loop per-iteration slope (time = a + b*iters fit over the
runtime max_iter argument)."""

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

from examples import sls as sls_mod


def main():
    s = sls_mod.build_constrained(ns="bsls_", dtype="float32")
    print("backend:", s.kkt_backend_resolved, flush=True)
    d = sls_mod.default_data()
    penv = {
        "bsls_A": jnp.asarray(d["A"], jnp.float32),
        "bsls_b": jnp.asarray(d["b"], jnp.float32),
    }
    u_cold = jnp.asarray(d["x0"], jnp.float32)
    mu0 = jnp.asarray(1.0, jnp.float32)
    mi = jnp.asarray(30, jnp.int32)
    a = jnp.asarray(1e-9, jnp.float32)

    r = s._solve_jit(u_cold, penv, mu0, mi, a, a)
    print("cold status:", int(np.asarray(r.status)),
          "iters:", int(np.asarray(r.iters)), flush=True)
    u_warm = r.u
    rw = s._solve_jit(u_warm, penv, mu0, mi, a, a)
    print("warm status:", int(np.asarray(rw.status)),
          "iters:", int(np.asarray(rw.iters)), flush=True)

    pts = []
    for n_it in (1, 4, 8, 12, 16, 20):
        miv = jnp.asarray(n_it, jnp.int32)
        s._solve_jit(u_cold, penv, mu0, miv, a, a)
        n_q = 20
        t0 = time.perf_counter()
        rr = None
        for _ in range(n_q):
            rr = s._solve_jit(u_cold, penv, mu0, miv, a, a)
        np.asarray(rr.status)
        t = (time.perf_counter() - t0) / n_q
        pts.append((n_it, t))
        print(f"max_iter={n_it}: {t*1e6:.1f} us", flush=True)
    xs = np.array([p[0] for p in pts], float)
    ys = np.array([p[1] for p in pts], float)
    b, a0 = np.polyfit(xs, ys, 1)
    print(f"fit: prologue {a0*1e6:.1f} us + {b*1e6:.2f} us/iter")


if __name__ == "__main__":
    main()
