"""Math library tests against numpy/scipy oracles (reference analog:
examples/testing/testNorms.m, testLogdet.m, testTprod.m)."""

import jax.numpy as jnp
import numpy as np
import scipy.linalg

import tenscalc_tpu as tc
from tenscalc_tpu.ops import fns


def test_norms(rng):
    v = rng.standard_normal((3, 4))
    np.testing.assert_allclose(fns.norm1(v), np.abs(v).sum(), rtol=1e-12)
    np.testing.assert_allclose(fns.norm2(v), (v**2).sum(), rtol=1e-12)
    np.testing.assert_allclose(fns.norminf(v), np.abs(v).max(), rtol=1e-12)


def test_norms_on_expr(rng):
    x = tc.variable("x", (4,))
    v = rng.standard_normal(4)
    np.testing.assert_allclose(tc.norm2(x)({"x": v}), (v**2).sum(), rtol=1e-12)


def test_logdet_traceinv(rng):
    A = rng.standard_normal((5, 5))
    A = A @ A.T + 5 * np.eye(5)
    np.testing.assert_allclose(fns.logdet(A), np.linalg.slogdet(A)[1], rtol=1e-10)
    np.testing.assert_allclose(
        fns.traceinv(A), np.trace(np.linalg.inv(A)), rtol=1e-10
    )


def test_componentwise(rng):
    v = rng.standard_normal(6)
    np.testing.assert_allclose(fns.relu(v), np.maximum(v, 0))
    np.testing.assert_allclose(fns.srelu(v), np.log1p(np.exp(v)), rtol=1e-10)
    np.testing.assert_allclose(fns.sqr(v), v * v)
    np.testing.assert_allclose(fns.cube(v), v**3, rtol=1e-12)
    np.testing.assert_allclose(
        fns.heaviside(np.array([-1.0, 0.0, 2.0])), [0.0, 0.5, 1.0]
    )


def test_clp():
    # max alpha such that x + alpha*dx >= 0
    x = np.array([1.0, 2.0, 3.0])
    dx = np.array([-1.0, 1.0, -6.0])
    np.testing.assert_allclose(fns.clp(x, dx), 0.5)
    # no limiting direction
    assert np.isinf(float(fns.clp(x, np.abs(dx))))


def test_tprod_matmul(rng):
    A = rng.standard_normal((4, 3))
    B = rng.standard_normal((3, 5))
    np.testing.assert_allclose(fns.tprod(A, [1, -1], B, [-1, 2]), A @ B, rtol=1e-12)


def test_tprod_inner(rng):
    a = rng.standard_normal(7)
    b = rng.standard_normal(7)
    np.testing.assert_allclose(fns.tprod(a, [-1], b, [-1]), a @ b, rtol=1e-12)


def test_tprod_transpose_outer(rng):
    A = rng.standard_normal((4, 3))
    np.testing.assert_allclose(fns.tprod(A, [2, 1]), A.T, rtol=1e-12)
    a = rng.standard_normal(3)
    b = rng.standard_normal(5)
    np.testing.assert_allclose(fns.tprod(a, [1], b, [2]), np.outer(a, b), rtol=1e-12)


def test_tprod_on_expr(rng):
    x = tc.variable("x", (3,))
    A = rng.standard_normal((3, 3))
    e = fns.tprod(x, [-1], fns.tprod(tc.constant(A), [1, -1], x, [-1]), [-1])
    v = rng.standard_normal(3)
    np.testing.assert_allclose(e({"x": v}), v @ A @ v, rtol=1e-12)


def test_vec2tensor(rng):
    v = np.arange(6.0)
    out = fns.vec2tensor(v, (2, 3))
    np.testing.assert_allclose(out, v.reshape((2, 3), order="F"))


def test_pdist2t(rng):
    x = rng.standard_normal((3, 4))
    y = rng.standard_normal((3, 5))
    expected = ((x[:, :, None] - y[:, None, :]) ** 2).sum(0)
    np.testing.assert_allclose(fns.pdist2t(x, y), expected, rtol=1e-12)
