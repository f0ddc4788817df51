"""Min-max solver tests replicating the reference's minmaxTest.m cases
(examples/minmaxTest.m), each with an analytic saddle-point oracle."""

import numpy as np
import pytest

import tenscalc_tpu as tc


def _solve(objective, minv, maxv, minc=(), maxc=(), init=None, **kw):
    s = tc.minmax(
        objective=objective,
        minOptimizationVariables=minv,
        maxOptimizationVariables=maxv,
        minConstraints=list(minc),
        maxConstraints=list(maxc),
        **kw,
    )
    return s.solve({}, init=init or {}, mu0=1.0, max_iter=200)


def test_case1_unconstrained_diagonal():
    """f = u^2 - 2 d^2 -> saddle at (0,0) (minmaxTest.m case 1)."""
    u = tc.variable("mm1_u", ())
    d = tc.variable("mm1_d", ())
    sol = _solve(u**2 - 2 * d**2, [u], [d],
                 init={"mm1_u": 1.0, "mm1_d": -1.0})
    assert sol.ok, sol.describe()
    assert abs(sol.variables["mm1_u"]) < 1e-4
    assert abs(sol.variables["mm1_d"]) < 1e-4


def test_case2_unconstrained_coupled():
    """f = (u+d+1)^2 - 2(d-1)^2 -> saddle u=-2, d=1 (case 2)."""
    u = tc.variable("mm2_u", ())
    d = tc.variable("mm2_d", ())
    sol = _solve((u + d + 1) ** 2 - 2 * (d - 1) ** 2, [u], [d],
                 init={"mm2_u": 0.0, "mm2_d": 0.0})
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["mm2_u"], -2.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["mm2_d"], 1.0, atol=1e-3)


def test_case2p5_latent_equality():
    """f = (x+1)^2 - 2(d-1)^2 with x == u+d as a maximizer equality
    (case 2.5) -> u=-2, d=1, x=-1."""
    u = tc.variable("mm3_u", ())
    d = tc.variable("mm3_d", ())
    x = tc.variable("mm3_x", ())
    sol = _solve(
        (x + 1) ** 2 - 2 * (d - 1) ** 2,
        [u], [d, x],
        maxc=[x == u + d],
        init={"mm3_u": 0.0, "mm3_d": 0.0, "mm3_x": 0.0},
    )
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["mm3_u"], -2.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["mm3_d"], 1.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["mm3_x"], -1.0, atol=1e-3)


def test_case3_maximizer_bounds():
    """f = (u+d)^2 - 2(d+2)^2, d in (-1,1) -> active bound d=-1, u=1
    (case 3)."""
    u = tc.variable("mm4_u", ())
    d = tc.variable("mm4_d", ())
    sol = _solve(
        (u + d) ** 2 - 2 * (d + 2) ** 2,
        [u], [d],
        maxc=[d >= -1.0, d <= 1.0],
        init={"mm4_u": 0.3, "mm4_d": 0.0},
    )
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["mm4_d"], -1.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["mm4_u"], 1.0, atol=1e-3)


def test_case4_minimizer_bounds():
    """f = (u+d+1)^2 - 2 d^2 with u in (-.25,.25) (case 4).
    Inner max: d*(u) = u+1; outer objective -2(u+1)^2 + ... decreasing
    => u pushed to a bound; oracle by grid search."""
    u = tc.variable("mm5_u", ())
    d = tc.variable("mm5_d", ())
    sol = _solve(
        (u + d + 1) ** 2 - 2 * d**2,
        [u], [d],
        minc=[u >= -0.25, u <= 0.25],
        init={"mm5_u": 0.0, "mm5_d": 0.0},
    )
    assert sol.ok, sol.describe()
    # grid-search oracle over u, analytic inner max over d
    us = np.linspace(-0.25, 0.25, 20001)
    inner = (us + (us + 1) + 1) ** 2 - 2 * (us + 1) ** 2  # d* = u+1
    ustar = us[np.argmin(inner)]
    np.testing.assert_allclose(sol.variables["mm5_u"], ustar, atol=2e-3)
    np.testing.assert_allclose(
        sol.variables["mm5_d"], sol.variables["mm5_u"] + 1.0, atol=2e-3
    )


def test_case3p5_maximizer_bounds_and_latent_equality():
    """f = x^2 - 2(d+2)^2 with d in (-1,1) and x == u+d as maximizer
    constraints (case 3.5) -> d=-1, u=1, x=0."""
    u = tc.variable("mm35_u", ())
    d = tc.variable("mm35_d", ())
    x = tc.variable("mm35_x", ())
    sol = _solve(
        x**2 - 2 * (d + 2) ** 2,
        [u], [d, x],
        maxc=[d >= -1.0, d <= 1.0, x == u + d],
        init={"mm35_u": 0.1, "mm35_d": 0.1, "mm35_x": 0.1},
    )
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["mm35_d"], -1.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["mm35_u"], 1.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["mm35_x"], 0.0, atol=1e-3)


def test_case5_bounds_both_players():
    """f = (u+d)^2 - 2(d+2)^2, u in (-2,2), d in (-1,1) (case 5)
    -> interior u=1, active bound d=-1."""
    u = tc.variable("mm50_u", ())
    d = tc.variable("mm50_d", ())
    sol = _solve(
        (u + d) ** 2 - 2 * (d + 2) ** 2,
        [u], [d],
        minc=[u >= -2.0, u <= 2.0],
        maxc=[d >= -1.0, d <= 1.0],
        init={"mm50_u": 0.1, "mm50_d": 0.1},
    )
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["mm50_u"], 1.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["mm50_d"], -1.0, atol=1e-3)


def test_case5p5_full_combination():
    """f = x^2 - 2(d+2)^2, u in (-2,2), d in (-1,1), x == u+d — the
    reference's shipping configuration (minmaxTest.m case 5.5, the
    `switch 5.5` default) -> u=1, d=-1, x=0."""
    u = tc.variable("mm55_u", ())
    d = tc.variable("mm55_d", ())
    x = tc.variable("mm55_x", ())
    sol = _solve(
        x**2 - 2 * (d + 2) ** 2,
        [u], [d, x],
        minc=[u >= -2.0, u <= 2.0],
        maxc=[d >= -1.0, d <= 1.0, x == u + d],
        init={"mm55_u": 0.1, "mm55_d": 0.1, "mm55_x": 0.1},
    )
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.variables["mm55_u"], 1.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["mm55_d"], -1.0, atol=1e-3)
    np.testing.assert_allclose(sol.variables["mm55_x"], 0.0, atol=1e-3)


def test_min_constraints_cannot_depend_on_max_vars():
    u = tc.variable("mm6_u", ())
    d = tc.variable("mm6_d", ())
    with pytest.raises(ValueError, match="maximizer"):
        tc.minmax(
            objective=u**2 - d**2,
            minOptimizationVariables=[u],
            maxOptimizationVariables=[d],
            minConstraints=[u + d >= 0],
        )


def test_robust_least_squares():
    """Robust LS: min_x max_{||delta|| small} ||A x - b + delta*e||^2 —
    a small parametric robust regression exercising vector u and d."""
    rng = np.random.default_rng(0)
    N, n = 12, 3
    A = rng.standard_normal((N, n))
    b = rng.standard_normal(N)
    Av = tc.variable("mm7_A", (N, n))
    bv = tc.variable("mm7_b", (N,))
    x = tc.variable("mm7_x", (n,))
    delta = tc.variable("mm7_delta", (N,))
    resid = Av @ x - bv + delta
    J = tc.norm2(resid) - 50.0 * tc.norm2(delta)  # penalized adversary
    s = tc.minmax(
        objective=J,
        minOptimizationVariables=[x],
        maxOptimizationVariables=[delta],
        parameters=[Av, bv],
    )
    sol = s.solve(
        {"mm7_A": A, "mm7_b": b},
        init={"mm7_x": np.zeros(n), "mm7_delta": np.zeros(N)},
    )
    assert sol.ok, sol.describe()
    # saddle condition: grad_x = 0 and grad_delta = 0 analytically:
    # delta* = r/49 where r = Ax-b+delta => delta = (Ax*-b)/48... verify
    # numerically instead via first-order conditions
    xs = sol.variables["mm7_x"]
    ds = sol.variables["mm7_delta"]
    r = A @ xs - b + ds
    np.testing.assert_allclose(2 * A.T @ r, 0, atol=1e-3)
    np.testing.assert_allclose(2 * r - 100.0 * ds, 0, atol=1e-3)


def test_minmax_solve_many():
    """Batched saddle solves (vmapped fleet) match singles."""
    import jax.numpy as jnp

    u = tc.variable("mmb_u", ())
    d = tc.variable("mmb_d", ())
    a = tc.variable("mmb_a", ())
    s = tc.minmax(
        objective=(u + d + a) ** 2 - 2 * (d - 1) ** 2,
        minOptimizationVariables=[u],
        maxOptimizationVariables=[d],
        parameters=[a],
    )
    B = 4
    avals = np.linspace(0.5, 2.0, B)
    res = s.solve_many({"mmb_a": avals}, inits={
        "mmb_u": np.zeros(B), "mmb_d": np.zeros(B)})
    assert (np.asarray(res.status) == 0).all(), res.status
    for b in range(B):
        single = s.solve({"mmb_a": avals[b]},
                         init={"mmb_u": 0.0, "mmb_d": 0.0})
        np.testing.assert_allclose(
            np.asarray(res.u[b]),
            np.concatenate([[single.variables["mmb_u"]],
                            [single.variables["mmb_d"]]]),
            atol=1e-6,
        )
