"""Large equality-constrained least squares — port of
/root/reference/examples/slseq.m (N=10000, n=800, m=40):

    minimize ||A x - b||^2   s.t.  C x == d

The KKT system is dense 840x840 — a good single-chip MXU workload."""

from __future__ import annotations

import numpy as np

import tenscalc_tpu as tc


def build_solver(N=10000, n=800, m=40, ns="slq_", **options):
    A = tc.variable(ns + "A", (N, n))
    b = tc.variable(ns + "b", (N,))
    C = tc.variable(ns + "C", (m, n))
    d = tc.variable(ns + "d", (m,))
    x = tc.variable(ns + "x", (n,))
    J = tc.norm2(A @ x - b)
    return tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[C @ x == d],
        parameters=[A, b, C, d],
        outputExpressions={"J": J, "x": x},
        **options,
    )


def default_data(N=10000, n=800, m=40, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.random((N, n))
    b = rng.random(N)
    C = rng.random((m, n))
    d = rng.random(m)
    # normalize like the reference (slseq.m:29-35)
    s = np.linalg.norm(b); A, b = A / s, b / s
    s = np.linalg.norm(d); C, d = C / s, d / s
    return A, b, C, d


def kkt_oracle(A, b, C, d):
    """Closed-form equality-constrained LS via the KKT system."""
    n, m = A.shape[1], C.shape[0]
    K = np.block([[2 * A.T @ A, C.T], [C, np.zeros((m, m))]])
    rhs = np.concatenate([2 * A.T @ b, d])
    return np.linalg.solve(K, rhs)[:n]


if __name__ == "__main__":
    import time

    N, n, m = 10000, 800, 40
    solver = build_solver(N, n, m)
    A, b, C, d = default_data(N, n, m)
    params = {"slq_A": A, "slq_b": b, "slq_C": C, "slq_d": d}
    init = {"slq_x": 0.01 * np.random.default_rng(1).random(n)}
    sol = solver.solve(params, init=init, mu0=1.0, max_iter=60)
    print(sol.describe(), "iters:", sol.iters, f"time {sol.time*1e3:.0f}ms")
    xref = kkt_oracle(A, b, C, d)
    print("err vs KKT oracle:", np.abs(sol.outputs["x"] - xref).max())
