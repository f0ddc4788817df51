"""Time-series calculus tests against numeric oracles (reference analog:
the embedded `function test` blocks in lib/ts*.m)."""

import numpy as np

import tenscalc_tpu as tc
from tenscalc_tpu.ops import tseries


def test_integral_scalar_ts():
    ts = np.pi / 10
    t = np.arange(0, np.pi + 1e-9, ts)
    x = np.sin(t)[None, :]
    val = tseries.tsIntegral(x, ts)
    np.testing.assert_allclose(np.asarray(val), [2.0], atol=2e-2)


def test_integral_vector_ts():
    t = np.linspace(0, np.pi, 41)
    x = np.sin(t)[None, :]
    val = tseries.tsIntegral(x, t)
    np.testing.assert_allclose(np.asarray(val), [2.0], atol=2e-3)


def test_derivative_scalar_ts():
    h = 0.01
    t = np.arange(0, 1, h)
    x = np.vstack([np.sin(t), np.cos(t)])
    dx = np.asarray(tseries.tsDerivative(x, h))
    np.testing.assert_allclose(dx[0], np.cos(t), atol=1e-3)
    np.testing.assert_allclose(dx[1], -np.sin(t), atol=1e-3)


def test_derivative_vector_ts():
    t = np.sort(np.random.default_rng(0).uniform(0, 1, 60))
    x = (t**2)[None, :]
    dx = np.asarray(tseries.tsDerivative(x, t))
    np.testing.assert_allclose(dx[0], 2 * t, atol=1e-8)  # exact for quadratics


def test_derivative2():
    h = 0.01
    t = np.arange(0, 1, h)
    x = (t**3)[None, :]
    ddx = np.asarray(tseries.tsDerivative2(x, h))
    np.testing.assert_allclose(ddx[0][1:-1], 6 * t[1:-1], atol=1e-6)


def test_integrate_euler():
    h = 0.001
    t = np.arange(0, 1, h)
    x = np.ones((1, t.size))
    ix = np.asarray(tseries.tsIntegrate(x, np.zeros(1), h, method="euler"))
    np.testing.assert_allclose(ix[0], t, atol=1e-9)


def test_ode_forward_euler_constraint():
    """tsODE builds the forward-Euler equality constraint
    (reference lib/tsODE.m:44-53)."""
    T, h = 5, 0.1
    x = tc.variable("x", (1, T))
    con = tseries.tsODE(x, None, None, h, lambda xs, u, d, t: xs, "forwardEuler")
    assert con.kind == "eq"
    # satisfied exactly by x[k+1] = x[k] + h*x[k]
    xv = (1 + h) ** np.arange(T)[None, :]
    np.testing.assert_allclose(np.asarray(con.expr({"x": xv})), 0, atol=1e-12)


def test_cross_dot():
    r = np.random.default_rng(1)
    a = r.standard_normal((3, 7))
    b = r.standard_normal((3, 7))
    np.testing.assert_allclose(
        np.asarray(tseries.tsCross(a, b)), np.cross(a, b, axis=0), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(tseries.tsDot(a, b)), (a * b).sum(0), rtol=1e-12
    )


def _quat_mult(q, p):
    w = q[0] * p[0] - q[1:] @ p[1:]
    v = q[0] * p[1:] + p[0] * q[1:] + np.cross(q[1:], p[1:])
    return np.concatenate([[w], v])


def test_qdot():
    r = np.random.default_rng(2)
    q1 = r.standard_normal((4, 5))
    q2 = r.standard_normal((4, 5))
    out = np.asarray(tseries.tsQdot(q1, q2))
    for k in range(5):
        np.testing.assert_allclose(out[:, k], _quat_mult(q1[:, k], q2[:, k]), rtol=1e-10)


def test_rotation_roundtrip():
    r = np.random.default_rng(3)
    q = r.standard_normal((4, 6))
    q /= np.linalg.norm(q, axis=0, keepdims=True)
    x = r.standard_normal((3, 6))
    y = np.asarray(tseries.tsRotation(q, x))
    back = np.asarray(tseries.tsRotationT(q, y))
    np.testing.assert_allclose(back, x, atol=1e-10)
    # rotation preserves norms
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=0), np.linalg.norm(x, axis=0), rtol=1e-10
    )
