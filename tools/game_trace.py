"""Where does the MPC-MHE equilibrium fleet's per-iteration time go?

Round-3 VERDICT item 4: the mpcmhe fleet ran at ~92 ms/lockstep-iter at
B=1024 vs ~7 ms for the optimize fleet at similar nK — only partly
explained by the larger unsymmetric system.  This tool (a) fits
time = prologue + slope*iters over runtime max_iter, (b) captures an
xplane trace and buckets device time by occurrence rate, so the slope
decomposes into Mosaic-kernel time vs XLA glue vs assembly.

Usage: python tools/game_trace.py [B] (default 1024)
"""

from __future__ import annotations

import collections
import re
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


def build(B, T=12, L=16):
    ns = "bmmhe_"
    solver = mpcmhe_dcmotor.build_solver(T=T, L=L, ns=ns, dtype="float32")
    base = mpcmhe_dcmotor.default_params(ns)
    base[ns + "lambda_n"] = 20.0
    rng = np.random.default_rng(0)
    t = np.arange(T) * 0.05
    # shared plant/weights (unbatched) + per-instance IO windows
    params = {k: np.asarray(v, float) for k, v in base.items()}
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
    return solver, dparams


def main(B=1024):
    solver, dparams = build(B)
    print("backend:", solver.kkt_backend_resolved, flush=True)

    res = solver.solve_many(dparams, mu0=1e-3, max_iter=100)
    st = np.asarray(res.status)
    iters = int(np.asarray(res.iters).max())
    print("converged:", int((st == 0).sum()), "/", B, "iters max:", iters,
          flush=True)

    pts = []
    for mi in (1, 3, 6, 9):
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
    slope, a0 = np.polyfit(xs, ys, 1)
    print(f"fit: prologue {a0*1e3:.1f} ms + {slope*1e3:.2f} ms/iter",
          flush=True)

    from tenscalc_tpu.profiling import _trace_events

    ev = _trace_events(
        lambda: solver.solve_many(dparams, mu0=1e-3, max_iter=100),
        lambda rr: np.asarray(rr.status), n=2,
    )
    if ev is None:
        print("trace unavailable")
        return
    n = 2
    skip = re.compile(r"^(jit_|\d+$)|^%(while|cond)\.")
    kinds = collections.Counter()
    for name, (ps, cnt) in sorted(ev.items(), key=lambda kv: -kv[1][0]):
        if re.match(r"^jit_", name):
            print(f"TOTAL {name[:40]}: {ps/1e6/cnt:.0f} us/solve-batch x {cnt}")
    rows = [
        (name, ps, cnt) for name, (ps, cnt) in ev.items()
        if not skip.match(name)
    ]
    rows.sort(key=lambda v: -v[1])
    print("\ntop device ops (per batched solve, %d traced):" % n)
    for name, ps, cnt in rows[:30]:
        print(f"{ps/1e6/n:9.1f} us occ={cnt/n:7.1f}  {name[:95]}")
    # bucket by per-iteration occurrence
    per_iter = collections.Counter()
    for name, ps, cnt in rows:
        rate = cnt / n / max(iters, 1)
        if 0.7 <= rate <= 1.4:
            key = "pallas" if "pallas" in name else "xla"
            per_iter[key] += ps / 1e6 / n
    print("\nper-iteration totals (us/batch-iter):",
          {k: round(v / max(iters, 1), 1) for k, v in per_iter.items()})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
