"""Block cyclic reduction vs dense oracle (log-depth structured solver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tenscalc_tpu.kkt.cyclic import CyclicFactorization, cr_solve
from tenscalc_tpu.kkt.spike import dense_to_blocks
from tenscalc_tpu.kkt.structure import plan_banded


def _block_tridiag_dense(rng, nb, s, indefinite=False):
    n = nb * s
    A = np.zeros((n, n))
    for i in range(nb):
        D = rng.standard_normal((s, s))
        A[i * s : (i + 1) * s, i * s : (i + 1) * s] = D + D.T
        if i > 0:
            Bc = rng.standard_normal((s, s))
            A[i * s : (i + 1) * s, (i - 1) * s : i * s] = Bc
            A[(i - 1) * s : i * s, i * s : (i + 1) * s] = Bc.T
    A += 4 * s * np.eye(n)
    if indefinite:
        for i in range(nb):
            sl = slice(i * s + s // 2, (i + 1) * s)
            A[sl, sl] -= 9 * s * np.eye(s - s // 2)
    return A


@pytest.mark.parametrize("nb,s", [(3, 4), (7, 3), (10, 5), (16, 4), (33, 2)])
def test_cr_matches_dense(rng, nb, s):
    A = _block_tridiag_dense(rng, nb, s)
    b = rng.standard_normal(nb * s)
    Ab, Bb = dense_to_blocks(jnp.asarray(A), s)
    x = cr_solve(Ab, Bb, jnp.asarray(b).reshape(nb, s))
    np.testing.assert_allclose(
        np.asarray(x).reshape(-1), np.linalg.solve(A, b), rtol=1e-8, atol=1e-10
    )


def test_cr_indefinite(rng):
    nb, s = 12, 4
    A = _block_tridiag_dense(rng, nb, s, indefinite=True)
    b = rng.standard_normal(nb * s)
    Ab, Bb = dense_to_blocks(jnp.asarray(A), s)
    x = cr_solve(Ab, Bb, jnp.asarray(b).reshape(nb, s))
    np.testing.assert_allclose(
        np.asarray(x).reshape(-1), np.linalg.solve(A, b), rtol=1e-7, atol=1e-9
    )


def test_cyclic_factorization_adapter(rng):
    """f32 CR + f64 refinement through the KKT-backend adapter."""
    nb, s = 14, 4
    A = _block_tridiag_dense(rng, nb, s)
    plan = plan_banded(np.abs(A) > 0)
    assert plan.worthwhile
    b = rng.standard_normal(nb * s)
    fac = CyclicFactorization(jnp.asarray(A), plan)
    x = fac.solve(jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(A, b), rtol=1e-9
    )


def test_mpc_solver_with_cyclic_backend():
    """Full MPC solve through the cyclic-reduction backend matches dense."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from examples import mpc_dcmotor

    T = 20
    cy = mpc_dcmotor.build_solver(
        T=T, namespace="cy1_", kkt_backend="cyclic",
        desiredDualityGap=1e-8, gradTolerance=1e-6,
    )
    de = mpc_dcmotor.build_solver(
        T=T, namespace="cy2_", kkt_backend="dense",
        desiredDualityGap=1e-8, gradTolerance=1e-6,
    )
    assert cy.kkt_plan is not None

    def inst(ns):
        params = mpc_dcmotor.default_params(T, ns)
        params[ns + "ref"] = mpc_dcmotor.reference_signal(
            np.arange(T) * 0.1
        )[None, :]
        params[ns + "xinit"] = np.array([[0.2], [0.2]])
        r = np.random.default_rng(0)
        init = {
            ns + "x": params[ns + "xinit"] + 0.01 * r.random((2, T)),
            ns + "u": 0.01 * r.random((1, T - 1)),
        }
        return params, init

    p1, i1 = inst("cy1_")
    p2, i2 = inst("cy2_")
    s1 = cy.solve(p1, init=i1, mu0=1e-3, max_iter=100)
    s2 = de.solve(p2, init=i2, mu0=1e-3, max_iter=100)
    assert s1.ok and s2.ok, (s1.describe(), s2.describe())
    np.testing.assert_allclose(s1.outputs["u"], s2.outputs["u"], atol=2e-3)
    np.testing.assert_allclose(s1.objective, s2.objective, atol=1e-6)
