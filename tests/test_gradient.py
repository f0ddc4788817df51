"""User-facing symbolic gradient/jacobian/hessian on Expr.

Reference: lib/@Tcalculus/gradient.m (shape [size(f), size(x)]),
hessian at lib/@Tcalculus/Tcalculus.m:3049-3101.  Oracle: jax.jacrev /
jax.jacfwd on the env-closed function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tenscalc_tpu as tc


def test_gradient_scalar_wrt_vector():
    x = tc.variable("tg_x", (5,))
    A = tc.variable("tg_A", (5, 5))
    f = tc.norm2(A @ x)  # x'A'Ax
    g = tc.gradient(f, x)
    assert g.shape == (5,)
    rng = np.random.default_rng(0)
    env = {"tg_x": rng.random(5), "tg_A": rng.random((5, 5))}
    got = np.asarray(g(env))
    want = 2.0 * env["tg_A"].T @ env["tg_A"] @ env["tg_x"]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gradient_tensor_shapes():
    # gradient of an [n1,n2] expr w.r.t. an [m1,m2] variable has shape
    # [n1,n2,m1,m2] (gradient.m:9-17)
    W = tc.variable("tg_W", (3, 4))
    v = tc.variable("tg_v", (4,))
    f = W @ v  # (3,)
    g = tc.gradient(f, W)
    assert g.shape == (3, 3, 4)
    rng = np.random.default_rng(1)
    env = {"tg_W": rng.random((3, 4)), "tg_v": rng.random(4)}
    got = np.asarray(g(env))
    # d (Wv)_i / d W_jk = delta_ij v_k
    want = np.einsum("ij,k->ijk", np.eye(3), env["tg_v"])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_jacobian_alias():
    x = tc.variable("tg_jx", (4,))
    f = tc.to_expr(2.0) * x
    J = tc.jacobian(f, x)
    assert J.shape == (4, 4)
    env = {"tg_jx": np.arange(4.0)}
    np.testing.assert_allclose(np.asarray(J(env)), 2.0 * np.eye(4), rtol=1e-6)


def test_hessian_matches_reference_composition():
    # hessian == gradient of gradient (Tcalculus.m:3095-3100)
    x = tc.variable("tg_hx", (3,))
    Q = tc.variable("tg_hQ", (3, 3))
    f = x @ (Q @ x)
    h = tc.hessian(f, x)
    assert h.shape == (3, 3)
    rng = np.random.default_rng(2)
    env = {"tg_hx": rng.random(3), "tg_hQ": rng.random((3, 3))}
    got = np.asarray(h(env))
    Qv = env["tg_hQ"]
    np.testing.assert_allclose(got, Qv + Qv.T, rtol=1e-6)


def test_hessian_mixed_variables():
    x = tc.variable("tg_mx", (3,))
    y = tc.variable("tg_my", (2,))
    C = tc.variable("tg_mC", (3, 2))
    f = x @ (C @ y)
    h = tc.hessian(f, x, y)
    assert h.shape == (3, 2)
    rng = np.random.default_rng(3)
    env = {
        "tg_mx": rng.random(3),
        "tg_my": rng.random(2),
        "tg_mC": rng.random((3, 2)),
    }
    np.testing.assert_allclose(np.asarray(h(env)), env["tg_mC"], rtol=1e-6)


def test_gradient_of_independent_variable_is_zero():
    x = tc.variable("tg_zx", (3,))
    z = tc.variable("tg_zz", (2,))
    f = tc.norm2(x)
    g = tc.gradient(f, z)
    assert g.shape == (2,)
    env = {"tg_zx": np.ones(3), "tg_zz": np.ones(2)}
    np.testing.assert_allclose(np.asarray(g(env)), np.zeros(2))


def test_gradient_requires_variable():
    x = tc.variable("tg_rx", (3,))
    with pytest.raises(TypeError):
        tc.gradient(tc.norm2(x), x + 1.0)


def test_gradient_through_compute():
    # the tutorialLQ pattern: compiled cost/gradient/hessian evaluation
    # (reference: examples/csparse/tutorialLQ.m:27-28 with cmex2compute)
    A = tc.variable("tg_cA", (10, 3))
    u = tc.variable("tg_cu", (3,))
    J = tc.norm2(A @ u)
    g = tc.gradient(J, u)
    h = tc.hessian(J, u)
    fn = tc.compute([A, u], {"J": J, "g": g, "h": h})
    rng = np.random.default_rng(4)
    Av, uv = rng.random((10, 3)), rng.random(3)
    out = fn(tg_cA=Av, tg_cu=uv)
    np.testing.assert_allclose(
        np.asarray(out["g"]), 2 * Av.T @ Av @ uv, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out["h"]), 2 * Av.T @ Av, rtol=1e-5)
