"""Sparse/scalar least squares — port of /root/reference/examples/sls.m.

Four formulations of min ||Ax - b||^2: direct, slack-variable epigraph
(v >= ||Ax-b||^2), constrained, and with an l1 term.  The final
constrained solve is the reference's headline ~850 us benchmark
(README.md:117-120)."""

from __future__ import annotations

import numpy as np

import tenscalc_tpu as tc


def build_unconstrained(N=400, n=32, ns="sls_", **options):
    A = tc.variable(ns + "A", (N, n))
    b = tc.variable(ns + "b", (N,))
    x = tc.variable(ns + "x", (n,))
    J = tc.norm2(A @ x - b) / N
    return tc.optimize(
        objective=J,
        optimizationVariables=[x],
        parameters=[A, b],
        outputExpressions={"J": J, "x": x},
        **options,
    )


def build_slack(N=400, n=32, ns="slsv_", **options):
    """min v s.t. v >= ||Ax-b||^2/N (sls.m:86-124)."""
    A = tc.variable(ns + "A", (N, n))
    b = tc.variable(ns + "b", (N,))
    x = tc.variable(ns + "x", (n,))
    v = tc.variable(ns + "v", ())
    J = tc.norm2(A @ x - b) / N
    return tc.optimize(
        objective=v,
        optimizationVariables=[x, v],
        constraints=[v >= J],
        parameters=[A, b],
        outputExpressions={"J": J, "x": x},
        **options,
    )


def build_constrained(N=400, n=32, lo=0.0, hi=0.05, ns="slsc_", **options):
    """min ||Ax-b||^2/N s.t. lo <= x <= hi — the reference's timed
    benchmark formulation with its exact bounds 0 <= x <= .05
    (sls.m:134; the README's ~850 us "last optimization in sls" is the
    second, warm, call to this solver, sls.m:163-164)."""
    A = tc.variable(ns + "A", (N, n))
    b = tc.variable(ns + "b", (N,))
    x = tc.variable(ns + "x", (n,))
    J = tc.norm2(A @ x - b) / N
    return tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= lo, x <= hi],
        parameters=[A, b],
        outputExpressions={"J": J, "x": x},
        **options,
    )


def default_data(N=400, n=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "A": rng.random((N, n)),
        "b": rng.random(N),
        "x0": 0.002 * rng.random(n),
    }


if __name__ == "__main__":
    d = default_data()
    for name, build in [
        ("unconstrained", build_unconstrained),
        ("slack", build_slack),
        ("constrained", build_constrained),
    ]:
        s = build()
        pre = s.parameters[0].name[: -1]  # namespace prefix
        params = {s.parameters[0].name: d["A"], s.parameters[1].name: d["b"]}
        init = {v.name: (d["x0"] if v.shape else 1.0) for v in s.variables}
        sol = s.solve(params, init=init, mu0=1.0, max_iter=60)
        print(f"{name}: {sol.describe()} iters={sol.iters} "
              f"J={sol.outputs['J']:.6f} time={sol.time*1e3:.1f}ms")
