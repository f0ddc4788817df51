"""Per-iteration kernel accounting for the sls single-solve headline.

Runs the warm sls solve (the reference's published ~850 us protocol) on
the TPU, fits time = prologue + slope*iters over the runtime max_iter
argument, then captures an xprof trace and prints every TPU op with its
self-time and occurrence count — occurrences/iteration tell us exactly
how many kernels one IPM iteration dispatches and which ones carry the
~200 us/iter found in round 3.
"""

from __future__ import annotations

import glob
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
    warm_iters = int(np.asarray(rw.iters))

    # slope fit over runtime max_iter (no recompile)
    pts = []
    for n_it in (1, 4, 8, 12, 16, 20):
        miv = jnp.asarray(n_it, jnp.int32)
        s._solve_jit(u_warm, penv, mu0, miv, a, a)
        n_q = 30
        t0 = time.perf_counter()
        rr = None
        for _ in range(n_q):
            rr = s._solve_jit(u_warm, penv, mu0, miv, a, a)
        np.asarray(rr.status)
        t = (time.perf_counter() - t0) / n_q
        pts.append((n_it, t))
        print(f"max_iter={n_it}: {t*1e6:.1f} us", flush=True)
    xs = np.array([p[0] for p in pts], float)
    ys = np.array([p[1] for p in pts], float)
    b, a0 = np.polyfit(xs, ys, 1)
    print(f"fit: prologue {a0*1e6:.1f} us + {b*1e6:.2f} us/iter", flush=True)

    # xprof trace of 20 queued warm solves
    trace_dir = str(_REPO / ".profiles_sls")
    with jax.profiler.trace(trace_dir):
        for _ in range(20):
            rr = s._solve_jit(u_warm, penv, mu0, mi, a, a)
        np.asarray(rr.status)
    n_solves = 20

    planes = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    print("xplane:", planes[-1:] if planes else "NONE", flush=True)
    if not planes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(
            [planes[-1]], "framework_op_stats^", {}
        )
        if isinstance(data, bytes):
            data = data.decode()
        rows = json.loads(data)
        # gviz: [0] device table typically {cols, rows}
        tab = rows[0] if isinstance(rows, list) else rows
        cols = [c["label"] for c in tab["cols"]]
        print("columns:", cols, flush=True)
        i_name = cols.index("Operation") if "Operation" in cols else 1
        items = []
        for rrow in tab["rows"]:
            vals = [c.get("v") for c in rrow["c"]]
            items.append(vals)

        def col(label, default=None):
            return cols.index(label) if label in cols else default

        i_total = col("Total self-time (us)") or col("Self-time (us)")
        i_occ = col("#Occurrences")
        items.sort(key=lambda v: -(v[i_total] or 0))
        per_iter = warm_iters * n_solves
        print(f"\n== top ops (self-us total over {n_solves} solves x "
              f"{warm_iters} iters) ==")
        tot = sum(v[i_total] or 0 for v in items)
        for v in items[:40]:
            occ = v[i_occ] if i_occ is not None else -1
            occ_per_iter = (occ / per_iter) if occ and per_iter else 0
            us_per_solve = (v[i_total] or 0) / n_solves
            print(f"{us_per_solve:9.1f} us/solve  occ/iter={occ_per_iter:6.2f}  "
                  f"{str(v[i_name])[:90]}")
        print(f"total device self-time: {tot/n_solves:.1f} us/solve")
    except Exception as e:
        print("convert failed:", repr(e)[:800])


if __name__ == "__main__":
    main()
