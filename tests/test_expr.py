"""Front-end expression layer tests (reference analog:
examples/testing/testTprod.m, testSum.m, testComponentwise.m — each
primitive checked against a dense numpy oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tenscalc_tpu as tc
from tenscalc_tpu.expr import substitute, concat, Constraint


def test_variable_eval(rng):
    x = tc.variable("x", (3, 2))
    v = rng.standard_normal((3, 2))
    np.testing.assert_allclose(x({"x": v}), v)
    assert x.shape == (3, 2)


def test_arithmetic(rng):
    x = tc.variable("x", (4,))
    y = tc.variable("y", (4,))
    e = 2.0 * x + y / 3.0 - x * y + x**2
    xv = rng.standard_normal(4)
    yv = rng.standard_normal(4)
    expected = 2 * xv + yv / 3 - xv * yv + xv**2
    np.testing.assert_allclose(e({"x": xv, "y": yv}), expected, rtol=1e-12)
    assert e.deps == {"x", "y"}


def test_matmul_shapes(rng):
    A = tc.variable("A", (5, 3))
    x = tc.variable("x", (3,))
    e = A @ x
    assert e.shape == (5,)
    Av = rng.standard_normal((5, 3))
    xv = rng.standard_normal(3)
    np.testing.assert_allclose(e({"A": Av, "x": xv}), Av @ xv, rtol=1e-12)


def test_indexing_reshape(rng):
    x = tc.variable("x", (2, 6))
    e = x[:, 1:4].reshape(6).sum()
    v = rng.standard_normal((2, 6))
    np.testing.assert_allclose(e({"x": v}), v[:, 1:4].reshape(6).sum(), rtol=1e-12)


def test_constraints_parse():
    x = tc.variable("x", (3,))
    c1 = x >= 0
    c2 = x <= 0.05
    c3 = x == 1.0
    assert isinstance(c1, Constraint) and c1.kind == "ineq"
    assert isinstance(c2, Constraint) and c2.kind == "ineq"
    assert isinstance(c3, Constraint) and c3.kind == "eq"
    v = np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(c1.expr({"x": v}), v)
    np.testing.assert_allclose(c2.expr({"x": v}), 0.05 - v)
    np.testing.assert_allclose(c3.expr({"x": v}), v - 1.0)


def test_substitute(rng):
    x = tc.variable("x", (3,))
    d = tc.variable("d", (3,))
    e = (x * x).sum()
    e2 = substitute(e, x, x + 2.0 * d)
    xv = rng.standard_normal(3)
    dv = rng.standard_normal(3)
    np.testing.assert_allclose(
        e2({"x": xv, "d": dv}), np.sum((xv + 2 * dv) ** 2), rtol=1e-12
    )


def test_shape_redeclare_mismatch():
    tc.variable("z", (3,))
    with pytest.raises(ValueError):
        tc.variable("z", (4,))
    tc.variable("z", (3,))  # same shape ok


def test_concat():
    x = tc.variable("x", (3,))
    y = tc.variable("y", (2,))
    e = concat([x, y])
    assert e.shape == (5,)


def test_grad_through_expr(rng):
    """jax.grad drives the Expr the way the reference's symbolic
    gradient drives Tcalculus (lib/@Tcalculus/gradient.m)."""
    A = tc.variable("A", (5, 3))
    x = tc.variable("x", (3,))
    b = tc.variable("b", (5,))
    J = tc.norm2(A @ x - b)
    Av = rng.standard_normal((5, 3))
    bv = rng.standard_normal(5)

    def f(xv):
        return J({"A": Av, "b": bv, "x": xv})

    xv = rng.standard_normal(3)
    g = jax.grad(f)(xv)
    np.testing.assert_allclose(g, 2 * Av.T @ (Av @ xv - bv), rtol=1e-10)


def test_zeros_ones_eye():
    assert tc.Tzeros((2, 3))({}).shape == (2, 3)
    np.testing.assert_allclose(tc.Tones(4)({}), np.ones(4))
    np.testing.assert_allclose(tc.Teye(3)({}), np.eye(3))


def test_at_indexed_assignment(rng):
    """Expr.at[...] — the subsasgn analog (reference Tcalculus.m:590-667)
    — composes and differentiates through the solver-facing surface."""
    import jax

    tc.expr.clear_variables()
    x = tc.variable("at_x", (4,))
    v = rng.standard_normal(4)
    e = x.at[1].set(0.0)
    out = np.asarray(e({"at_x": v}))
    exp = v.copy()
    exp[1] = 0.0
    np.testing.assert_allclose(out, exp)
    e2 = x.at[:2].add(x[2:] * 3.0)
    out2 = np.asarray(e2({"at_x": v}))
    exp2 = v.copy()
    exp2[:2] += 3.0 * v[2:]
    np.testing.assert_allclose(out2, exp2, rtol=1e-12)
    # gradient flows through both the base and the inserted value
    g = jax.grad(lambda val: float(0) + (x.at[0].set(x[3] * 2.0) ** 2).sum()({"at_x": val}))(v)
    exp_g = 2 * exp_g_base(v)
    np.testing.assert_allclose(g, exp_g, rtol=1e-10)


def exp_g_base(v):
    w = v.copy()
    w[0] = 2 * v[3]
    g = w.copy()
    g[0] = 0.0
    g[3] = v[3] * 4 + g[3]
    return g
