"""Linear-quadratic tutorial — port of the reference
/root/reference/examples/csparse/tutorialLQ.m.

Minimize J(u) = ||A x0 + B u||^2 + ||u||^2 by compiling the cost, its
symbolic gradient/Hessian (tc.gradient / tc.hessian, the analogs of the
reference's gradient(J,u) at tutorialLQ.m:27-28) and the closed-form
Newton step ustar = -h \\ g into one fused compute function
(tc.compute ~ cmex2compute, tutorialLQ.m:47).
"""

from __future__ import annotations

import numpy as np

import tenscalc_tpu as tc
from tenscalc_tpu.ops.fns import mldivide


def build(N=100, n=2, k=10, ns="lq_"):
    A = tc.variable(ns + "A", (N, n))
    x0 = tc.variable(ns + "x0", (n,))
    B = tc.variable(ns + "B", (N, k))
    u = tc.variable(ns + "u", (k,))

    x = A @ x0 + B @ u
    J = tc.norm2(x) + tc.norm2(u)

    g = tc.gradient(J, u)      # (k,)
    h = tc.gradient(g, u)      # (k, k) — == tc.hessian(J, u)

    # Newton step from u — exact minimizer since J is quadratic
    # (tutorialLQ.m:29-33: factor=ldl(h); ustar=-(factor\g))
    ustar = u - mldivide(h, g)

    return tc.compute(
        [A, x0, B, u],
        {"J": J, "g": g, "h": h, "ustar": ustar},
    )


def main(seed=0):
    N, n, k = 100, 2, 10
    fn = build(N, n, k)
    rng = np.random.default_rng(seed)
    A = rng.random((N, n))
    x0 = rng.random(n)
    B = rng.random((N, k))
    u = np.zeros(k)

    out = fn(lq_A=A, lq_x0=x0, lq_B=B, lq_u=u)
    ustar = np.asarray(out["ustar"])

    # oracle: normal equations of the regularized LS problem
    want = -np.linalg.solve(B.T @ B + np.eye(k), B.T @ A @ x0)
    err = np.abs(ustar - want).max()
    out2 = fn(lq_A=A, lq_x0=x0, lq_B=B, lq_u=ustar)
    print(f"J(0)={float(out['J']):.6f}  J(ustar)={float(out2['J']):.6f}")
    print(f"||ustar - closed form||_inf = {err:.2e}")
    # f32 by default (x64 only when enabled by the caller)
    assert err < 1e-5, err
    assert float(out2["J"]) < float(out["J"])
    # at the optimum the gradient vanishes
    assert np.abs(np.asarray(out2["g"])).max() < 1e-4
    return ustar


if __name__ == "__main__":
    main()
