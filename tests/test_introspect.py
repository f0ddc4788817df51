"""Tests for tenscalc_tpu.introspect (the spy.m analog)."""

import io

import numpy as np

import tenscalc_tpu as tc


def test_sparsity_structural_jacobian():
    x = tc.variable("spy_x", (4,))
    y = tc.variable("spy_y", (3,))
    # expr[i] depends only on x[i] (elementwise) and all of y via sum
    e = x * x + tc.Tones((4,)) * tc.norm2(y)
    pat_x = tc.sparsity(e, x)
    assert pat_x.shape == (4, 4)
    assert np.array_equal(pat_x, np.eye(4, dtype=bool))
    pat_y = tc.sparsity(e, y)
    assert pat_y.shape == (4, 3)
    assert pat_y.all()


def test_sparsity_banded_dynamics():
    # MPC-style chain: r[k] = x[k+1] - 0.9 x[k] is block-banded in k
    x = tc.variable("spy_chain", (5,))
    r = x[1:] - 0.9 * x[:-1]
    pat = tc.sparsity(r, x)
    assert pat.shape == (4, 5)
    expect = np.zeros((4, 5), dtype=bool)
    for k in range(4):
        expect[k, k] = expect[k, k + 1] = True
    assert np.array_equal(pat, expect)


def test_sparsity_independent_variable_is_empty():
    x = tc.variable("spy_ind_x", (2,))
    z = tc.variable("spy_ind_z", (3,))
    pat = tc.sparsity(x + 1.0, z)
    assert pat.shape == (2, 3)
    assert not pat.any()


def test_spy_report_contents():
    x = tc.variable("spy_rep_x", (3, 3))
    e = tc.norm2(x @ x)
    buf = io.StringIO()
    rep = tc.spy(e, file=buf)
    assert rep == buf.getvalue().rstrip("\n")
    assert "computation graph" in rep
    assert "d vec(expr)/d vec(spy_rep_x)" in rep
    assert "nnz=9" in rep  # scalar output depends on all 9 entries
    # op tree lists real primitives with shapes
    assert "dot_general" in rep or "reduce" in rep


def test_op_tree_caps_output():
    x = tc.variable("spy_cap_x", (2,))
    e = x
    for _ in range(10):
        e = e + 1.0
    s = tc.op_tree(e, max_eqns=3)
    assert len(s.splitlines()) <= 4
