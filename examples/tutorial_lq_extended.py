"""Extended linear-quadratic tutorial — port of the reference
/root/reference/examples/csparse/tutorialLQextended.m.

Beyond tutorial_lq, this exercises the STATEFUL compute-object pattern
(csparse declareSet/declareGet/declareCopy): the control ``u`` is a
state variable on the object; two Newton-step expressions are declared
through two different factorizations (the reference's ``lu(h)`` and
``ldl(h)`` paths, tutorialLQextended.m:29-35), and named copy ops write
the optimizer back into ``u`` (``copy_ustar12u`` / ``copy_ustar22u``,
:48-49) so a later ``get`` of (J, g, h) sees the updated state.
"""

from __future__ import annotations

import jax
import numpy as np

import tenscalc_tpu as tc
from tenscalc_tpu.expr import lift
from tenscalc_tpu.ops.fns import mldivide


def build(N=100, n=2, k=10, ns="lqe_"):
    A = tc.variable(ns + "A", (N, n))
    x0 = tc.variable(ns + "x0", (n,))
    B = tc.variable(ns + "B", (N, k))
    u = tc.variable(ns + "u", (k,))

    x = A @ x0 + B @ u
    J = tc.norm2(x) + tc.norm2(u)
    g = tc.gradient(J, u)
    h = tc.gradient(g, u)

    # two factorization routes to the same Newton step, as in the
    # reference (lu vs ldl); here: pivoted LU (mldivide) vs Cholesky
    # (h = B'B + I is SPD)
    ustar1 = u - mldivide(h, g)
    chol_solve = lift(
        lambda hh, gg: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(hh), gg
        )
    )
    ustar2 = u - chol_solve(h, g)

    obj = tc.compute_object(
        inputs=[A, x0, B],
        outputs={
            "Jgh": {"J": J, "g": g, "h": h},
            "ustar1": ustar1,
            "ustar2": ustar2,
        },
        state={u: np.zeros(k)},
        updates={
            "ustar1_to_u": {u: ustar1},
            "ustar2_to_u": {u: ustar2},
        },
    )
    return obj, ns


def main(seed=0, verbose=True):
    N, n, k = 100, 2, 10
    obj, ns = build(N, n, k)
    rng = np.random.default_rng(seed)
    A = rng.random((N, n))
    x0 = rng.random(n)
    B = rng.random((N, k))
    obj.set(ns + "A", A)
    obj.set(ns + "x0", x0)
    obj.set(ns + "B", B)

    out0 = obj.get("Jgh")
    J0 = float(out0["J"])
    if verbose:
        print(f"cost for u=0 is {J0:.6f}")

    # route 1: LU Newton step, copied into the state
    obj.copy("ustar1_to_u")
    J1 = float(obj.get("Jgh")["J"])

    # reset and take route 2 (Cholesky)
    obj.set(ns + "u", np.zeros(k))
    obj.copy("ustar2_to_u")
    J2 = float(obj.get("Jgh")["J"])
    u2 = np.asarray(obj.value(ns + "u"))

    # closed form: u* = -(B'B + I)^-1 B'A x0
    H = B.T @ B + np.eye(k)
    ustar = -np.linalg.solve(H, B.T @ (A @ x0))
    if verbose:
        print(f"cost for optimal u is {J1:.6f} (LU) / {J2:.6f} (chol)")
    return dict(J0=J0, J1=J1, J2=J2, u2=u2, ustar=ustar)


if __name__ == "__main__":
    main()
