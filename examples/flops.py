"""Dense-QP solve-time scaling study — port of
/root/reference/examples/flops.m, which records one-Newton-step solve
times for growing N (reference table: N=30/60/100/150 at 11.9/64/281/
1382 us with -O1; BASELINE.md).

Problem (flops.m): minimize ||A x - b||^2 + ||x||^2 over x in R^N with
N equality constraints C x == d — a dense KKT of size 2N solved each
iteration.  Reports warm-solve time and us/iter for each N.
"""

from __future__ import annotations

import time

import numpy as np

import tenscalc_tpu as tc


def build_solver(N, ns=None, **options):
    ns = ns or f"fl{N}_"
    A = tc.variable(ns + "A", (N, N))
    b = tc.variable(ns + "b", (N,))
    C = tc.variable(ns + "C", (N // 2, N))
    d = tc.variable(ns + "d", (N // 2,))
    x = tc.variable(ns + "x", (N,))
    J = tc.norm2(A @ x - b) + tc.norm2(x)
    return tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[C @ x == d],
        parameters=[A, b, C, d],
        outputExpressions={"J": J, "x": x},
        **options,
    ), ns


def run_scaling(sizes=(30, 60, 100, 200), reps=5, dtype="float64"):
    rows = []
    for N in sizes:
        solver, ns = build_solver(N, dtype=dtype)
        rng = np.random.default_rng(0)
        params = {
            ns + "A": rng.standard_normal((N, N)) / np.sqrt(N),
            ns + "b": rng.standard_normal(N),
            ns + "C": rng.standard_normal((N // 2, N)) / np.sqrt(N),
            ns + "d": 0.1 * rng.standard_normal(N // 2),
        }
        init = {ns + "x": np.zeros(N)}
        sol = solver.solve(params, init=init, mu0=1.0, max_iter=60)
        assert sol.ok, f"N={N}: {sol.describe()}"
        t0 = time.perf_counter()
        iters = 0
        for _ in range(reps):
            r = solver.solve_result(params, init=init, mu0=1.0, max_iter=60)
            iters += int(r.iters.block_until_ready())
        dt = (time.perf_counter() - t0) / reps
        # flop accounting per iteration (the analog of flops.m's counter
        # report built from the 17 generated-code counters; here from
        # tenscalc_tpu.profiling.flop_counts)
        from tenscalc_tpu.profiling import flop_counts

        fc = flop_counts(solver)
        rows.append(
            dict(N=N, solve_us=dt * 1e6, us_per_iter=dt / (iters / reps) * 1e6,
                 iters=iters // reps,
                 flops_per_iter=fc["total_per_iteration"],
                 flops_per_solve=fc["total_per_iteration"] * (iters // reps))
        )
    return rows


if __name__ == "__main__":
    # reference table format (flops.m:27-43): size, flops, time
    print(f"{'N':>5s} {'flops/solve':>12s} {'us/solve':>10s} "
          f"{'us/iter':>9s} {'iters':>6s} {'GFLOP/s':>8s}")
    for row in run_scaling():
        gflops = row["flops_per_solve"] / row["solve_us"] / 1e3
        print(
            f"{row['N']:5d} {row['flops_per_solve']:12.3e} "
            f"{row['solve_us']:10.0f} {row['us_per_iter']:9.0f} "
            f"{row['iters']:6d} {gflops:8.2f}"
        )
