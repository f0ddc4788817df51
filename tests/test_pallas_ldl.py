"""Pallas fused LDL kernel vs dense oracles (interpret mode on CPU; the
same kernel compiles for real TPUs).  Reference analog:
examples/testing/testFactorizations.m checks L*D*L' == A."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tenscalc_tpu.kkt.pallas_ldl import (
    PallasLDLFactorization,
    pallas_ldl_factor,
    pallas_ldl_solve,
)

INTERP = jax.default_backend() != "tpu"


def _sym(rng, n, indefinite=False):
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = 0.5 * (A + A.T) + n * np.eye(n, dtype=np.float32)
    if indefinite:
        A[n // 2 :, n // 2 :] -= 3 * n * np.eye(n - n // 2, dtype=np.float32)
    return A


@pytest.mark.parametrize("n", [64, 128, 200, 325])
def test_factor_reconstruction(rng, n):
    A = _sym(rng, n)
    Lt, d = pallas_ldl_factor(jnp.asarray(A), interpret=INTERP)
    L = np.asarray(Lt).T
    R = L @ np.diag(np.asarray(d)) @ L.T
    np.testing.assert_allclose(R, A, atol=5e-3 * n)
    # unit diagonal
    np.testing.assert_allclose(np.diag(L), 1.0, atol=1e-6)


def test_matches_unblocked_ldl(rng):
    from tenscalc_tpu.kkt.dense import ldl_factor_unblocked

    n = 192
    A = _sym(rng, n)
    Lt1, d1 = pallas_ldl_factor(jnp.asarray(A), interpret=INTERP)
    L2, d2 = ldl_factor_unblocked(jnp.asarray(A, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(Lt1).T, np.asarray(L2), atol=2e-3)


def test_solve(rng):
    n = 150
    A = _sym(rng, n)
    b = rng.standard_normal(n).astype(np.float32)
    Lt, d = pallas_ldl_factor(jnp.asarray(A), interpret=INTERP)
    x = pallas_ldl_solve(Lt, d, jnp.asarray(b), interpret=INTERP)
    ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-3, atol=1e-4)


def test_indefinite_inertia(rng):
    n = 96
    A = _sym(rng, n, indefinite=True)
    w = np.linalg.eigvalsh(A.astype(np.float64))
    fac = PallasLDLFactorization(
        jnp.asarray(A, dtype=jnp.float64), interpret=INTERP
    )
    mp, mn = fac.inertia()
    assert int(mp) == (w > 0).sum()
    assert int(mn) == (w < 0).sum()


def test_refined_solve_f64_accuracy(rng):
    """f32 kernel + f64 refinement reaches near-f64 accuracy."""
    n = 130
    A = _sym(rng, n).astype(np.float64)
    b = rng.standard_normal(n)
    fac = PallasLDLFactorization(jnp.asarray(A), interpret=INTERP)
    x = fac.solve(jnp.asarray(b))
    ref = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-9)
