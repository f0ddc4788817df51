"""Structured (block-tridiagonal) KKT path: oracle tests against the
dense factorization, plan detection on MPC problems, and full-solver
equivalence (the reference's oracle pattern for factorizations,
examples/testing/testFactorizations.m)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tenscalc_tpu.kkt.structure import plan_banded, probe_pattern
from tenscalc_tpu.kkt.tridiag import tridiag_factorize


def _banded_spd(rng, n, bw):
    A = np.zeros((n, n))
    for k in range(-bw, bw + 1):
        v = rng.standard_normal(n - abs(k))
        A += np.diag(v, k)
    A = 0.5 * (A + A.T)
    A += (2 * bw + 2) * np.eye(n)
    return A


def test_plan_detects_band(rng):
    A = _banded_spd(rng, 120, 6)
    # scramble with a random permutation; RCM should recover a small band
    p = rng.permutation(120)
    Ap = A[p][:, p]
    plan = plan_banded(np.abs(Ap) > 0)
    assert plan.worthwhile
    assert plan.bandwidth <= 14  # small band recovered


def test_tridiag_matches_dense(rng):
    n, bw = 150, 8
    A = _banded_spd(rng, n, bw)
    plan = plan_banded(np.abs(A) > 0)
    assert plan.worthwhile
    b = rng.standard_normal(n)
    fac = tridiag_factorize(jnp.asarray(A), plan)
    x = fac.solve(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-8)
    # matrix rhs
    B = rng.standard_normal((n, 3))
    X = fac.solve(jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(A, B), rtol=1e-8)


def test_tridiag_indefinite_inertia(rng):
    """Saddle-structured banded matrix: inertia from the Schur blocks."""
    n, bw = 60, 4
    A = _banded_spd(rng, n, bw)
    # flip the sign of a trailing sub-block -> indefinite
    A[40:, 40:] *= -1.0
    w = np.linalg.eigvalsh(A)
    plan = plan_banded(np.abs(A) > 0)
    fac = tridiag_factorize(jnp.asarray(A), plan)
    mp, mn = fac.inertia()
    assert int(mp) == (w > 0).sum()
    assert int(mn) == (w < 0).sum()


def test_mpc_solver_uses_tridiag_and_matches_dense():
    """mpc_dcmotor with kkt_backend='tridiag' vs 'dense': same optimum,
    and the plan must have found real banded structure."""
    from examples import mpc_dcmotor

    T = 20
    dense = mpc_dcmotor.build_solver(
        T=T, namespace="td1_", kkt_backend="dense",
        desiredDualityGap=1e-8, gradTolerance=1e-6,
    )
    tri = mpc_dcmotor.build_solver(
        T=T, namespace="td2_", kkt_backend="tridiag",
        desiredDualityGap=1e-8, gradTolerance=1e-6,
    )
    assert tri.kkt_plan is not None
    nK = tri.nU + tri.nG + tri.nF
    assert tri.kkt_plan.bandwidth < nK // 4, tri.kkt_plan

    def inst(ns):
        params = mpc_dcmotor.default_params(T, ns)
        Ts = params[ns + "Ts"]
        params[ns + "ref"] = mpc_dcmotor.reference_signal(
            np.arange(T) * Ts
        )[None, :]
        params[ns + "xinit"] = np.array([[0.2], [0.2]])
        rng = np.random.default_rng(0)
        init = {
            ns + "x": params[ns + "xinit"] + 0.01 * rng.random((2, T)),
            ns + "u": 0.01 * rng.random((1, T - 1)),
        }
        return params, init

    p1, i1 = inst("td1_")
    p2, i2 = inst("td2_")
    s1 = dense.solve(p1, init=i1, mu0=1e-3, max_iter=100)
    s2 = tri.solve(p2, init=i2, mu0=1e-3, max_iter=100)
    assert s1.ok and s2.ok, (s1.describe(), s2.describe())
    np.testing.assert_allclose(
        s2.outputs["u"], s1.outputs["u"], atol=1e-5
    )
    np.testing.assert_allclose(s2.objective, s1.objective, atol=1e-7)


def test_auto_backend_picks_tridiag_for_mpc():
    from examples import mpc_dcmotor

    s = mpc_dcmotor.build_solver(T=20, namespace="td3_", kkt_backend="auto")
    assert s.kkt_plan is not None and s.kkt_plan.worthwhile


def test_auto_backend_stays_dense_for_dense_problem(rng):
    import tenscalc_tpu as tc

    n = 40
    Q = tc.variable("td4_Q", (n, n))
    x = tc.variable("td4_x", (n,))
    J = tc.tprod(x, [-1], Q @ x, [-1]) + tc.norm2(x - 1.0)
    s = tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= -10.0, x <= 10.0],
        parameters=[Q],
        kkt_backend="auto",
    )
    assert s.kkt_plan is None  # dense Hessian -> no banded structure
