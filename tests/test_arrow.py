"""Arrow-plus-band KKT path: plan detection + oracle solves + full IPM
(SURVEY.md §7 step 4: block-tridiagonal + arrow KKT)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import tenscalc_tpu as tc
from tenscalc_tpu.kkt.arrow import ArrowFactorization, plan_arrow


def _band_plus_arrow(rng, n_band, bw, n_arrow):
    n = n_band + n_arrow
    A = np.zeros((n, n))
    for k in range(-bw, bw + 1):
        v = rng.standard_normal(n_band - abs(k))
        A[:n_band, :n_band] += np.diag(v, k)
    A[:n_band, :n_band] = 0.5 * (A[:n_band, :n_band] + A[:n_band, :n_band].T)
    C = rng.standard_normal((n_band, n_arrow))
    A[:n_band, n_band:] = C
    A[n_band:, :n_band] = C.T
    D = rng.standard_normal((n_arrow, n_arrow))
    A[n_band:, n_band:] = D + D.T
    A += 4 * (bw + n_arrow + 2) * np.eye(n)
    return A


def test_plan_detects_arrow(rng):
    A = _band_plus_arrow(rng, 120, 4, 3)
    # scramble
    p = rng.permutation(A.shape[0])
    Ap = A[p][:, p]
    plan = plan_arrow(np.abs(Ap) > 0)
    assert plan is not None and plan.worthwhile
    assert len(plan.arrow) == 3
    assert plan.band_plan.bandwidth <= 12


def test_arrow_solve_matches_dense(rng):
    A = _band_plus_arrow(rng, 150, 5, 4)
    p = rng.permutation(A.shape[0])
    Ap = A[p][:, p]
    plan = plan_arrow(np.abs(Ap) > 0)
    assert plan is not None
    b = rng.standard_normal(A.shape[0])
    fac = ArrowFactorization(jnp.asarray(Ap), plan)
    x = fac.solve(jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(Ap, b), rtol=1e-8
    )


def test_auto_backend_picks_arrow_for_global_variable():
    """MPC-like problem with a global variable in every stage cost: the
    banded plan fails (dense coupling) but arrow+band succeeds, and the
    full solve matches the dense backend."""
    # T large enough that the CONDENSED (default) KKT of size T+1
    # clears the structured-path threshold (nK >= 64)
    T = 80
    x = tc.variable("ar_x", (T,))
    g = tc.variable("ar_g", ())        # global variable -> arrow
    r = tc.variable("ar_r", (T,))
    # chain smoothness + every stage couples to g
    J = (
        tc.norm2(x[1:] - x[:-1])
        + tc.norm2(x - r - g)
        + 10.0 * g**2
    )
    def build(backend):
        return tc.optimize(
            objective=J,
            optimizationVariables=[x, g],
            constraints=[x >= -2.0, x <= 2.0],
            parameters=[r],
            outputExpressions={"x": x, "g": g},
            kkt_backend=backend,
        )

    auto = build("auto")
    from tenscalc_tpu.kkt.arrow import ArrowPlan

    assert isinstance(auto.kkt_plan, ArrowPlan), type(auto.kkt_plan)
    dense = build("dense")
    rng = np.random.default_rng(0)
    rv = np.sin(np.linspace(0, 3, T)) + 0.1 * rng.standard_normal(T)
    s1 = auto.solve({"ar_r": rv}, init={"ar_x": np.zeros(T), "ar_g": 0.0})
    s2 = dense.solve({"ar_r": rv}, init={"ar_x": np.zeros(T), "ar_g": 0.0})
    assert s1.ok and s2.ok, (s1.describe(), s2.describe())
    np.testing.assert_allclose(s1.outputs["x"], s2.outputs["x"], atol=1e-6)
    np.testing.assert_allclose(s1.outputs["g"], s2.outputs["g"], atol=1e-6)
