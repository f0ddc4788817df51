"""Constrained matrix least squares — port of the reference example
/root/reference/examples/mls.m (minimize ||A X - B||_F^2 / N, optionally
subject to 0 <= X <= .05)."""

from __future__ import annotations

import numpy as np

import tenscalc_tpu as tc


def build_solver(N=100, n=30, k=20, constrained=True, **options):
    A = tc.variable("A", (N, n))
    B = tc.variable("B", (N, k))
    X = tc.variable("X", (n, k))
    J = tc.norm2(A @ X - B) / N
    constraints = [X >= 0, X <= 0.05] if constrained else []
    return tc.optimize(
        objective=J,
        optimizationVariables=[X],
        constraints=constraints,
        parameters=[A, B],
        outputExpressions={"J": J, "X": X},
        **options,
    )


def default_data(N=100, n=30, k=20, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "params": {"A": rng.random((N, n)), "B": rng.random((N, k))},
        "init": {"X": 0.025 + 0.02 * rng.random((n, k))},
    }


if __name__ == "__main__":
    data = default_data()
    solver = build_solver()
    sol = solver.solve(data["params"], init=data["init"])
    print(sol.describe(), "iters:", sol.iters, "J*:", sol.outputs["J"])
