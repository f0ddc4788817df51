"""Equilibrium (two-player Nash + latent) solver tests with analytic
oracles (reference: cmex2equilibriumLatentCS, examples/TCgames.m,
examples/mpcmhe via Tmpcmhe)."""

import numpy as np
import pytest

import tenscalc_tpu as tc


def test_quadratic_nash():
    """f = u^2 + u d + u,  g = d^2 + u d - d -> Nash (-1, 1)
    (best-response intersection, closed form)."""
    u = tc.variable("eq1_u", ())
    d = tc.variable("eq1_d", ())
    s = tc.equilibrium(
        P1objective=u**2 + u * d + u,
        P2objective=d**2 + u * d - d,
        P1optimizationVariables=[u],
        P2optimizationVariables=[d],
    )
    sol = s.solve({}, init={"eq1_u": 0.0, "eq1_d": 0.0})
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["eq1_u"], -1.0, atol=1e-4)
    np.testing.assert_allclose(sol.variables["eq1_d"], 1.0, atol=1e-4)


def test_zero_sum_matches_minmax():
    """Zero-sum game (P2objective = -P1objective) must find the same
    saddle as the minmax solver (minmaxTest.m case 2: u=-2, d=1)."""
    u = tc.variable("eq2_u", ())
    d = tc.variable("eq2_d", ())
    J = (u + d + 1) ** 2 - 2 * (d - 1) ** 2
    s = tc.equilibrium(
        P1objective=J,
        P2objective=-J,
        P1optimizationVariables=[u],
        P2optimizationVariables=[d],
    )
    sol = s.solve({}, init={"eq2_u": 0.0, "eq2_d": 0.0})
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["eq2_u"], -2.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["eq2_d"], 1.0, atol=1e-3)


def test_latent_equality():
    """Zero-sum with latent x == u + d (minmaxTest.m case 2.5 analog):
    u=-2, d=1, x=-1."""
    u = tc.variable("eq3_u", ())
    d = tc.variable("eq3_d", ())
    x = tc.variable("eq3_x", ())
    J = (x + 1) ** 2 - 2 * (d - 1) ** 2
    s = tc.equilibrium(
        P1objective=J,
        P2objective=-J,
        P1optimizationVariables=[u],
        P2optimizationVariables=[d],
        latentVariables=[x],
        latentConstraints=[x == u + d],
    )
    sol = s.solve({}, init={"eq3_u": 0.0, "eq3_d": 0.0, "eq3_x": 0.0})
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["eq3_u"], -2.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["eq3_d"], 1.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["eq3_x"], -1.0, atol=1e-3)


def test_inequality_constrained_game():
    """Nash with box constraints on both players: best responses clipped.
    f = (u - 2 d)^2, g = (d - 0.5)^2 with u in [-1,1]:
    d* = 0.5 -> u* = min(1, 2*0.5) = 1.0."""
    u = tc.variable("eq4_u", ())
    d = tc.variable("eq4_d", ())
    s = tc.equilibrium(
        P1objective=(u - 2 * d) ** 2,
        P2objective=(d - 0.5) ** 2,
        P1optimizationVariables=[u],
        P2optimizationVariables=[d],
        P1constraints=[u >= -1.0, u <= 1.0],
        P2constraints=[d >= -2.0, d <= 2.0],
        # the active bound's multiplier is tiny (grad ~ 1e-3), so the
        # default gap tolerance leaves F ~ mu/lambda ~ 1e-3 slack;
        # tighten to pin the bound
        desiredDualityGap=1e-9,
        gradTolerance=1e-7,
    )
    sol = s.solve({}, init={"eq4_u": 0.0, "eq4_d": 0.0})
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["eq4_d"], 0.5, atol=1e-3)
    np.testing.assert_allclose(sol.variables["eq4_u"], 1.0, atol=1e-3)


def test_latent_dimension_mismatch():
    u = tc.variable("eq5_u", ())
    d = tc.variable("eq5_d", ())
    x = tc.variable("eq5_x", (2,))
    with pytest.raises(ValueError, match="latent"):
        tc.equilibrium(
            P1objective=u**2,
            P2objective=d**2,
            P1optimizationVariables=[u],
            P2optimizationVariables=[d],
            latentVariables=[x],
            latentConstraints=[x[0] == u + d],  # 1 constraint, 2 latents
        )


def test_latent_inequality_rejected():
    u = tc.variable("eq6_u", ())
    d = tc.variable("eq6_d", ())
    x = tc.variable("eq6_x", ())
    with pytest.raises(ValueError, match="equality"):
        tc.equilibrium(
            P1objective=u**2,
            P2objective=d**2,
            P1optimizationVariables=[u],
            P2optimizationVariables=[d],
            latentVariables=[x],
            latentConstraints=[x >= u],
        )


def test_mehrotra_affine_equilibrium():
    """skipAffine=False: affine + sigma=rho^delta path for the
    equilibrium solver (reference ipmPDeqlat affine branch) finds the
    same constrained Nash point."""
    u = tc.variable("eq7_u", ())
    d = tc.variable("eq7_d", ())
    s = tc.equilibrium(
        P1objective=(u - 2 * d) ** 2,
        P2objective=(d - 0.5) ** 2,
        P1optimizationVariables=[u],
        P2optimizationVariables=[d],
        P1constraints=[u >= -1.0, u <= 1.0],
        P2constraints=[d >= -2.0, d <= 2.0],
        skipAffine=False,
        desiredDualityGap=1e-9,
        gradTolerance=1e-7,
    )
    sol = s.solve({}, init={"eq7_u": 0.0, "eq7_d": 0.0})
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["eq7_d"], 0.5, atol=1e-3)
    np.testing.assert_allclose(sol.variables["eq7_u"], 1.0, atol=1e-3)


def test_equilibrium_solve_many():
    """Batched Nash fleets match singles."""
    u = tc.variable("eqb_u", ())
    d = tc.variable("eqb_d", ())
    c = tc.variable("eqb_c", ())
    s = tc.equilibrium(
        P1objective=u**2 + u * d + c * u,
        P2objective=d**2 + u * d - d,
        P1optimizationVariables=[u],
        P2optimizationVariables=[d],
        parameters=[c],
    )
    B = 3
    cvals = np.array([0.5, 1.0, 1.5])
    res = s.solve_many({"eqb_c": cvals}, inits={
        "eqb_u": np.zeros(B), "eqb_d": np.zeros(B)})
    assert (np.asarray(res.status) == 0).all(), res.status
    for b in range(B):
        single = s.solve({"eqb_c": cvals[b]},
                         init={"eqb_u": 0.0, "eqb_d": 0.0})
        np.testing.assert_allclose(
            np.asarray(res.u[b]),
            np.concatenate([[single.variables["eqb_u"]],
                            [single.variables["eqb_d"]]]),
            atol=1e-6,
        )


@pytest.mark.parametrize("skip", [True, False])
def test_small_newton_matrix_equilibrium(skip):
    """Condensed (smallerNewtonMatrix) equilibrium variant matches the
    large matrix (reference ipmPDeqlat small branch), with and without
    the affine step."""
    ns = f"eqs{int(skip)}_"
    u = tc.variable(ns + "u", ())
    d = tc.variable(ns + "d", ())
    s = tc.equilibrium(
        P1objective=(u - 2 * d) ** 2,
        P2objective=(d - 0.5) ** 2,
        P1optimizationVariables=[u],
        P2optimizationVariables=[d],
        P1constraints=[u >= -1.0, u <= 1.0],
        P2constraints=[d >= -2.0, d <= 2.0],
        smallerNewtonMatrix=True,
        skipAffine=skip,
        desiredDualityGap=1e-9,
        gradTolerance=1e-7,
    )
    sol = s.solve({}, init={ns + "u": 0.0, ns + "d": 0.0})
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables[ns + "d"], 0.5, atol=1e-3)
    np.testing.assert_allclose(sol.variables[ns + "u"], 1.0, atol=1e-3)


def test_small_newton_matrix_with_latent():
    """Condensed variant with latent variables (nX>0 branch)."""
    u = tc.variable("eqsl_u", ())
    d = tc.variable("eqsl_d", ())
    x = tc.variable("eqsl_x", ())
    J = (x + 1) ** 2 - 2 * (d - 1) ** 2
    s = tc.equilibrium(
        P1objective=J,
        P2objective=-J,
        P1optimizationVariables=[u],
        P2optimizationVariables=[d],
        latentVariables=[x],
        latentConstraints=[x == u + d],
        P2constraints=[d >= -3.0, d <= 3.0],
        smallerNewtonMatrix=True,
    )
    sol = s.solve({}, init={"eqsl_u": 0.0, "eqsl_d": 0.0, "eqsl_x": 0.0})
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["eqsl_u"], -2.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["eqsl_d"], 1.0, atol=1e-3)
