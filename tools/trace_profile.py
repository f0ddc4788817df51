"""Capture an xprof trace of the flagship batched solve and print the
top self-time ops (framework_op_stats), to locate the remaining
per-iteration cost that ablations can't isolate.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
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
    B, T = 1024, 30
    ns = f"bench{B}_"
    solver = mpc_dcmotor.build_solver(T=T, namespace=ns, **FLAGSHIP_OPTS)
    dparams, u0 = _device_batch_inputs(solver, B, ns, T, np.random.default_rng(0))
    fn = batched_solve_fn(solver, shared=_shared_names(solver, dparams))
    mu0 = jnp.asarray(1e-3, jnp.float32)
    a = jnp.asarray(1e-9, jnp.float32)
    mi = jnp.asarray(100, jnp.int32)

    r = fn(u0, dparams, mu0, mi, a, a)  # compile + warm
    np.asarray(r.status)

    trace_dir = str(_REPO / ".profiles")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            r = fn(u0, dparams, mu0, mi, a, a)
        np.asarray(r.status)

    # locate the xplane and convert to op stats
    planes = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    print("xplane files:", planes[-1:] if planes else "NONE", flush=True)
    if not planes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(
            [planes[-1]], "framework_op_stats^", {}
        )
        if isinstance(data, bytes):
            data = data.decode()
        out = Path(trace_dir) / "op_stats.json"
        out.write_text(data)
        rows = json.loads(data)
        # gviz table: first element may be schema; handle both layouts
        print(json.dumps(rows)[:2000])
    except Exception as e:
        print("convert failed:", repr(e)[:500])
        # fallback: trace_viewer json
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

            data, _ = rtd.xspace_to_tool_data([planes[-1]], "trace_viewer^", {})
            out = Path(trace_dir) / "trace.json.gz"
            if isinstance(data, str):
                data = data.encode()
            out.write_bytes(data)
            print("wrote", out)
        except Exception as e2:
            print("trace_viewer failed:", repr(e2)[:500])


if __name__ == "__main__":
    main()
