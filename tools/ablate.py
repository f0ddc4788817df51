"""Ablate the flagship solver's in-loop components on the real TPU.

For each option-override variant, time the batched solve at two
max_iter points (runtime arg — one compile per variant) and report
per-lockstep-iteration slope + fixed overhead, so each component's true
in-loop cost is isolated (microbenching phases out-of-loop was found to
under-report by ~5x — fusion behaves differently inside the while_loop).

Usage: python tools/ablate.py [names...]   (default: all)
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

# every variant must differ from the resolved flagship defaults
# (base = dtype-only flagship: condensed standard, fleet_banded via
# auto, kkt_refine->1, affine-F on, Mehrotra on (skipAffine False));
# _check_variants() guards against defaults drifting under a variant
# (the round-2 'refine1 == base' silent-noise row)
VARIANTS = {
    "base": dict(),
    "ls8": dict(linesearch_points=8),
    "ls16": dict(linesearch_points=16),
    "skipaffine": dict(skipAffine=True),
    "refine2": dict(kkt_refine=2),
    "refine0": dict(kkt_refine=0),
    "noadj": dict(adjustAddEye2Hessian=False),
    "noaffF": dict(linesearch_affine_F=False),
    "noise": dict(),  # base again, intentionally (run-to-run noise)
}
_SANITY = {"base", "noise"}


def _check_variants():
    from tenscalc_tpu import SolverOptions

    resolved = SolverOptions(**FLAGSHIP_OPTS).resolved("optimize")
    for name, ov in VARIANTS.items():
        if name in _SANITY:
            continue
        changed = {
            k for k, v in ov.items() if getattr(resolved, k) != v
        }
        if not changed:
            raise SystemExit(
                f"ablation variant {name!r} no longer differs from the "
                f"resolved flagship defaults ({ov}) — it would silently "
                "measure run-to-run noise; update VARIANTS"
            )


def run(name: str, B: int = 1024):
    T = 30
    ov = VARIANTS[name]
    ns = f"abl_{name}_"
    opts = dict(FLAGSHIP_OPTS)
    opts.update(ov)
    solver = mpc_dcmotor.build_solver(T=T, namespace=ns, **opts)
    dparams, u0 = _device_batch_inputs(solver, B, ns, T, np.random.default_rng(0))
    fn = batched_solve_fn(solver, shared=_shared_names(solver, dparams))
    mu0 = jnp.asarray(1e-3, jnp.float32)
    a = jnp.asarray(1e-9, jnp.float32)

    res = fn(u0, dparams, mu0, jnp.asarray(100, jnp.int32), a, a)
    st = np.asarray(res.status)
    n_ok = int((st == 0).sum())
    k_full = int(np.asarray(res.iters).max())

    def timed(mi):
        miv = jnp.asarray(mi, jnp.int32)
        r = fn(u0, dparams, mu0, miv, a, a)
        np.asarray(r.status)
        n_q = 5
        t0 = time.perf_counter()
        for _ in range(n_q):
            r = fn(u0, dparams, mu0, miv, a, a)
        np.asarray(r.status)
        return (time.perf_counter() - t0) / n_q, int(np.asarray(r.iters).max())

    t_lo, k_lo = timed(1)
    t_hi, k_hi = timed(k_full)
    slope = (t_hi - t_lo) / max(k_hi - k_lo, 1)
    overhead = t_lo - slope * k_lo
    print(
        json.dumps(
            {
                "variant": name,
                "overrides": {k: str(v) for k, v in ov.items()},
                "converged": n_ok,
                "iters_max": k_full,
                "per_iter_ms": round(slope * 1e3, 2),
                "overhead_ms": round(overhead * 1e3, 1),
                "full_batch_s": round(t_hi, 4),
                "solves_per_s": round(B / t_hi, 1),
            }
        ),
        flush=True,
    )


def main():
    _check_variants()
    names = sys.argv[1:] or list(VARIANTS)
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    for n in names:
        try:
            run(n)
        except Exception as e:
            print(json.dumps({"variant": n, "error": repr(e)[:400]}), flush=True)


if __name__ == "__main__":
    main()
