"""Profile the MPC-MHE fleet's PROLOGUE (everything before the IPM
loop): trace max_iter=0 batched solves and print the top device ops.
Round-4: the prologue was 367 ms of an 834 ms batch solve."""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from tools.game_trace import build


def main(B=1024):
    solver, dparams = build(B)
    print("backend:", solver.kkt_backend_resolved, flush=True)
    from tenscalc_tpu.profiling import _trace_events

    ev = _trace_events(
        lambda: solver.solve_many(dparams, mu0=1e-3, max_iter=0),
        lambda rr: np.asarray(rr.status), n=3,
    )
    if ev is None:
        print("trace unavailable")
        return
    n = 3
    for name, (ps, cnt) in ev.items():
        if re.match(r"^jit_", name) and ps > 1e6:
            print(f"TOTAL {name[:40]}: {ps/1e6/cnt:.0f} us/call x {cnt}")
    rows = [
        (name, ps, cnt) for name, (ps, cnt) in ev.items()
        if not re.match(r"^(jit_|\d+$)|^%(while|cond)\.", name)
        and "copy-start" not in name
    ]
    rows.sort(key=lambda v: -v[1])
    print("top prologue ops (us per batched call):")
    for name, ps, cnt in rows[:25]:
        print(f"{ps/1e6/n:9.1f} us occ={cnt/n:6.1f}  {name[:100]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
