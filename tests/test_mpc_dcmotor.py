"""mpc_dcmotor end-to-end: the flagship banded-KKT problem
(reference: examples/mpcmhe/mpc_dcmotor.m; part of examples/basicTests.m)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples import mpc_dcmotor


@pytest.fixture(scope="module")
def solver():
    return mpc_dcmotor.build_solver(T=30, namespace="m1_")


def _one_instance(T=30, t=0.0, ns="m1_"):
    params = mpc_dcmotor.default_params(T, ns)
    Ts = params[ns + "Ts"]
    params[ns + "ref"] = mpc_dcmotor.reference_signal(t + np.arange(T) * Ts)[None, :]
    params[ns + "xinit"] = np.array([[0.2], [0.2]])
    rng = np.random.default_rng(0)
    init = {
        ns + "x": params[ns + "xinit"] + 0.01 * rng.random((2, T)),
        ns + "u": 0.01 * rng.random((1, T - 1)),
    }
    return params, init


def test_single_solve_kkt(solver):
    params, init = _one_instance()
    sol = solver.solve(params, init=init, mu0=1e-3, max_iter=100)
    assert sol.ok, sol.describe()
    # reference tolerances (parameters4all.m)
    assert sol.norminf_grad <= 1e-4
    assert sol.norminf_eq <= 1e-4
    assert sol.gap <= 1e-5 * 1.05
    # constraints hold
    x = sol.outputs["x"]
    u = sol.outputs["u"]
    assert (x[:, 1:] >= np.array([[-0.4], [-0.3]]) - 1e-6).all()
    assert (x[:, 1:] <= np.array([[0.4], [0.3]]) + 1e-6).all()
    assert (np.abs(u) <= 1 + 1e-6).all()
    # dynamics satisfied
    Ts, p, k = 0.1, -2.0, 1.0
    A = np.array([[0, 1], [0, p]])
    B = np.array([[0], [k]])
    resid = x[:, 1:] - (x[:, :-1] + Ts * (A @ x[:, :-1] + B @ u))
    assert np.abs(resid).max() <= 1e-4


def test_against_slsqp_oracle():
    """Cross-check the optimum against scipy SLSQP on the same QP
    (the reference's oracle pattern, e.g. sls.m vs quadprog/CVX).

    Individual controls near active bounds are only determined to
    O(gap), so the comparison solve runs at tightened tolerances (the
    default gap=1e-5 leaves ~1e-2 slack in weakly-determined u entries)."""
    from scipy.optimize import minimize as sp_minimize

    solver = mpc_dcmotor.build_solver(
        T=30, namespace="m1o_", desiredDualityGap=1e-8, gradTolerance=1e-6,
    )
    params, init = _one_instance(ns="m1o_")
    sol = solver.solve(params, init=init, mu0=1e-3, max_iter=100)
    assert sol.ok

    T = 30
    Ts, p, k = 0.1, -2.0, 1.0
    ref = params["m1o_ref"][0]
    lam_u = 1.0 / 50.0
    xinit = params["m1o_xinit"][:, 0]

    nu_ = T - 1

    w = np.ones(T) * Ts
    w[0] = w[-1] = Ts / 2

    A = np.array([[0, 1], [0, p]])
    B = np.array([[0], [k]])

    bounds = [(-1, 1)] * nu_ + [(None, None)] * 2  # x(:,0) free (pinned by eq)
    for _ in range(T - 1):
        bounds += [(-0.4, 0.4), (-0.3, 0.3)]
    z0 = np.concatenate([init["m1o_u"].ravel(), init["m1o_x"].T.ravel()])

    # pack x in column-major time order to match bounds layout above
    def unpack2(z):
        return z[:nu_].reshape(1, T - 1), z[nu_:].reshape(T, 2).T

    def obj2(z):
        u, x = unpack2(z)
        wu = np.ones(T - 1) * Ts
        wu[0] = wu[-1] = Ts / 2
        return w @ (x[0] - ref) ** 2 + lam_u * (wu @ u[0] ** 2)

    def eq2(z):
        u, x = unpack2(z)
        r1 = x[:, 1:] - (x[:, :-1] + Ts * (A @ x[:, :-1] + B @ u))
        r2 = x[:, 0] - xinit
        return np.concatenate([r1.ravel(), r2])

    res = sp_minimize(
        obj2,
        z0,
        method="SLSQP",
        constraints={"type": "eq", "fun": eq2},
        bounds=bounds,
        options={"maxiter": 500, "ftol": 1e-12},
    )
    assert res.success, res.message
    np.testing.assert_allclose(sol.objective, res.fun, atol=1e-5)
    u_ref, x_ref = unpack2(res.x)
    # individual controls can differ slightly where the QP is nearly
    # degenerate (SLSQP ftol); objectives match to 1e-5 above
    np.testing.assert_allclose(sol.outputs["u"], u_ref, atol=5e-3)


def test_closed_loop_tracking(solver):
    """Short receding-horizon run: all solves clean, warm starts keep
    iteration counts low, and theta tracks the reference
    (mpc_dcmotor.m:189-251)."""
    hist = mpc_dcmotor.run_closed_loop(solver, n_steps=40)
    assert (hist["status"] == 0).all(), hist["status"]
    assert len(hist["t"]) == 40
    # after the transient, theta tracks ref between switches
    err = np.abs(hist["x"][25:, 0] - hist["ref"][25:])
    assert err.mean() < 0.1, err.mean()
    # warm-started solves should converge in few iterations
    assert np.mean(hist["iters"][5:]) < 40
