"""LTI-MPC convenience builders (reference: lib/TltiConstraints.m,
lib/TvariablesMPC.m)."""

import numpy as np
import pytest

import tenscalc_tpu as tc
from tenscalc_tpu.apps.lti import lti_constraints, variables_mpc


def test_lti_constraints_shapes_and_semantics():
    nx, nu, Tu = 2, 1, 5
    A = np.array([[1.0, 0.1], [0.0, 0.9]])
    B = np.array([[0.0], [0.1]])
    C = np.array([[1.0, 0.0]])
    D = np.zeros((1, 1))
    x = tc.variable("lt_x", (nx, Tu))
    u = tc.variable("lt_u", (nu, Tu))
    x0 = tc.variable("lt_x0", (nx, 1))
    sc, y, z = lti_constraints(A, B, C, D, x0=x0, x=x, u=u, Ty=Tu)
    assert isinstance(sc, tc.Constraint) and sc.kind == "eq"
    assert y.shape == (1, Tu)
    assert z is None

    # residual is zero exactly on a simulated trajectory
    rng = np.random.default_rng(0)
    x0v = rng.random((nx, 1))
    uv = rng.random((nu, Tu))
    xs = np.zeros((nx, Tu))
    xc = x0v[:, 0]
    for t in range(Tu):
        xc = A @ xc + B @ uv[:, t]
        xs[:, t] = xc
    env = {"lt_x": xs, "lt_u": uv, "lt_x0": x0v}
    np.testing.assert_allclose(np.asarray(sc.expr(env)), 0.0, atol=1e-12)
    # y(t) = C x(t) + D u(t) for t = 0..Ty-1 (x(0) = x0)
    xprev = np.concatenate([x0v, xs[:, :-1]], axis=1)
    np.testing.assert_allclose(
        np.asarray(y(env)), C @ xprev + D @ uv, atol=1e-12
    )


def test_variables_mpc_trapezoidal_dynamics():
    nX, nU, T, delay = 2, 1, 6, 2
    p = -2.0

    def fdot(x, u):
        from tenscalc_tpu.expr import concat

        return concat([x[1:2, :], p * x[1:2, :] + u], axis=0)

    Ts, xMeas, xFut, uPast, uFut, dyn = variables_mpc(
        nX, nU, T, delay, fdot, namespace="vm_"
    )
    assert Ts.shape == () and xMeas.shape == (nX, 1)
    assert xFut.shape == (nX, T)
    assert uPast.shape == (nU, delay) and uFut.shape == (nU, T - delay)
    assert isinstance(dyn, tc.Constraint) and dyn.kind == "eq"

    # trapezoidal residual oracle
    rng = np.random.default_rng(1)
    env = {
        "vm_Ts": 0.1,
        "vm_xMeas": rng.random((nX, 1)),
        "vm_xFut": rng.random((nX, T)),
        "vm_uPast": rng.random((nU, delay)),
        "vm_uFut": rng.random((nU, T - delay)),
    }
    xm, xf = env["vm_xMeas"], env["vm_xFut"]
    ua = np.concatenate([env["vm_uPast"], env["vm_uFut"]], axis=1)
    xp = np.concatenate([xm, xf[:, :-1]], axis=1)

    def f_np(x, u):
        return np.concatenate([x[1:2], p * x[1:2] + u], axis=0)

    want = (xf - xp) - 0.05 * (f_np(xf, ua) + f_np(xp, ua))
    np.testing.assert_allclose(np.asarray(dyn.expr(env)), want, atol=1e-12)

    # delay=0: no uPast
    _, _, _, uP0, uF0, _ = variables_mpc(nX, nU, T, 0, fdot, namespace="vm0_")
    assert uP0 is None and uF0.shape == (nU, T)

    with pytest.raises(ValueError):
        variables_mpc(nX, nU, T, T, fdot, namespace="vmbad_")


def test_lti_mpc_example_closed_loop():
    from examples import mpc_lti

    solver = mpc_lti.build_solver(T=12, delay=1, namespace="tlti_")
    hist = mpc_lti.run_closed_loop(solver, n_steps=8)
    assert set(hist["status"].tolist()) == {0}
    assert len(hist["x"]) == 8
    # states respect the box
    assert (np.abs(hist["x"][:, 0]) <= 0.4 + 1e-6).all()
