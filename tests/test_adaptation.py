"""Regularization-adaptation robustness (VERDICT round-1 item #3).

The reference recovers from ill-conditioned/singular KKT systems through
adapted regularizations: addEye2Hessian2 doubling gated on direction
error for equilibria (lib/ipmPDeq_CSsolver.c:330-374) and the
three-regularization inertia loop for min-max problems
(lib/ipmPDminmax_CSsolver.m:254-305).  These tests build deliberately
degenerate games that the fixed-epsilon solver cannot handle and assert
the adaptive solver converges.
"""

import numpy as np
import pytest

import tenscalc_tpu as tc


def _singular_game_square(ns, **opts):
    """Square but singular: two latent variables, two latent constraint
    rows that are linearly DEPENDENT (second = 2x the first), so the
    latent Jacobian block has rank 1."""
    u = tc.variable(ns + "u", (1,))
    d = tc.variable(ns + "d", (1,))
    x = tc.variable(ns + "x", (2,))
    p = tc.parameter(ns + "p", ())

    J = (
        tc.norm2(u - x[0:1])
        + 0.1 * tc.norm2(u)
        - tc.norm2(d - x[1:2])
        - 0.1 * tc.norm2(d)
    )
    r = x[0] - 0.5 * (u[0] + d[0]) - p
    latent = [r == 0, (2.0 * r) == 0]  # rank-1 Jacobian for 2 rows
    return tc.equilibrium(
        P1objective=J,
        P2objective=-J,
        P1optimizationVariables=[u],
        P2optimizationVariables=[d],
        latentVariables=[x],
        P1constraints=[u >= -5.0, u <= 5.0],
        P2constraints=[d >= -5.0, d <= 5.0],
        latentConstraints=latent,
        parameters=[p],
        **opts,
    )


def test_equilibrium_adaptation_rescues_singular_latent():
    """With a rank-deficient latent constraint Jacobian the fixed-eps
    solver fails; the derr-gated addEye2Hessian2 adaptation converges."""
    tc.expr.clear_variables()
    fixed = _singular_game_square(
        "eqsf_", addEye2Hessian=False, maxIter=60
    )
    sol_fixed = fixed.solve(parameters={"eqsf_p": 0.3}, mu0=1.0)
    # without the regularization path the Newton system is exactly
    # singular -> NaN abort or stall
    assert sol_fixed.status != 0

    adaptive = _singular_game_square(
        "eqsa_", adjustAddEye2Hessian=True, maxIter=60
    )
    sol = adaptive.solve(parameters={"eqsa_p": 0.3}, mu0=1.0)
    assert sol.status == 0, sol.describe()
    # the consistent constraint itself must hold
    assert sol.norminf_eq <= 1e-4


def test_minmax_inertia_adaptation_nonconvex():
    """min-max with an initially NONCONVEX minimizer block: the inertia
    check (mpU < desired) must raise addEye2HessianU until the saddle
    KKT factors with the right signs, then converge to the true saddle."""
    tc.expr.clear_variables()
    u = tc.variable("mmiu_u", ())
    d = tc.variable("mmiu_d", ())

    # f(u, d) = -2 u^2 + u^4 + u d - d^2: concave in u at u=0
    # (f_uu(0) = -4), so the initial Newton system has wrong inertia.
    # Saddle: d*(u) = u/2 -> g(u) = -2u^2 + u^4 + u^2/4; minimizers at
    # u = +-sqrt(7/8).
    f = -2.0 * u**2 + u**4 + u * d - d**2

    solver = tc.minmax(
        objective=f,
        minOptimizationVariables=[u],
        maxOptimizationVariables=[d],
        minConstraints=[u >= -2.0, u <= 2.0],
        maxConstraints=[d >= -2.0, d <= 2.0],
        adjustAddEye2Hessian=True,
        maxIter=100,
    )
    sol = solver.solve(init={"mmiu_u": 0.05, "mmiu_d": 0.0}, mu0=0.1)
    assert sol.status == 0, sol.describe()
    ustar = float(np.abs(sol.variables["mmiu_u"]))
    np.testing.assert_allclose(ustar, np.sqrt(7.0 / 8.0), atol=1e-3)
    dstar = float(sol.variables["mmiu_d"])
    np.testing.assert_allclose(
        abs(dstar), np.sqrt(7.0 / 8.0) / 2.0, atol=1e-3
    )


def test_minmax_adaptation_still_solves_convex_cases():
    """The richer adaptation must not disturb well-posed problems."""
    tc.expr.clear_variables()
    u = tc.variable("mmc_u", (2,))
    d = tc.variable("mmc_d", (2,))
    p = tc.parameter("mmc_p", (2,))
    f = tc.norm2(u - p) + u @ d - 0.5 * tc.norm2(d)
    solver = tc.minmax(
        objective=f,
        minOptimizationVariables=[u],
        maxOptimizationVariables=[d],
        minConstraints=[u >= -3.0, u <= 3.0],
        maxConstraints=[d >= -3.0, d <= 3.0],
        parameters=[p],
        adjustAddEye2Hessian=True,
    )
    pv = np.array([0.4, -0.2])
    sol = solver.solve(parameters={"mmc_p": pv}, mu0=1.0)
    assert sol.status == 0, sol.describe()
    # saddle: d* = u*, u* = p - d*/1... stationarity:
    # 2(u-p) + d = 0, u - d = 0 -> u* = 2p/3
    np.testing.assert_allclose(
        sol.variables["mmc_u"], 2.0 * pv / 3.0, atol=1e-4
    )
