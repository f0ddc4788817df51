"""LDL factorization tests against dense oracles, following the
reference's oracle pattern (examples/testing/testFactorizations.m checks
L*D*L' == A to 1e3*eps; testLDL.m checks against MATLAB ldl/mldivide)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tenscalc_tpu.kkt.dense import (
    ldl_factor,
    ldl_factor_unblocked,
    ldl_inertia,
    ldl_solve,
)


def _random_symmetric(rng, n, definite=False):
    A = rng.standard_normal((n, n))
    A = 0.5 * (A + A.T)
    if definite:
        A = A @ A.T + n * np.eye(n)
    else:
        A = A + n * np.eye(n)  # diagonally dominant => no pivoting needed
    return A


@pytest.mark.parametrize("n", [1, 5, 17, 64, 130])
def test_unblocked_reconstruction(rng, n):
    A = _random_symmetric(rng, n)
    L, d = ldl_factor_unblocked(jnp.asarray(A))
    R = np.asarray(L) @ np.diag(np.asarray(d)) @ np.asarray(L).T
    np.testing.assert_allclose(R, A, atol=1e-10 * n)


@pytest.mark.parametrize("n", [5, 64, 65, 128, 200, 325])
def test_blocked_matches_unblocked(rng, n):
    A = _random_symmetric(rng, n)
    L1, d1 = ldl_factor_unblocked(jnp.asarray(A))
    L2, d2 = ldl_factor(jnp.asarray(A), block=64)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(L2), np.asarray(L1), rtol=1e-8, atol=1e-10)


def test_solve(rng):
    n = 90
    A = _random_symmetric(rng, n)
    b = rng.standard_normal(n)
    L, d = ldl_factor(jnp.asarray(A))
    x = ldl_solve(L, d, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-8)
    # matrix rhs
    B = rng.standard_normal((n, 3))
    X = ldl_solve(L, d, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(A, B), rtol=1e-8)


def test_indefinite_inertia(rng):
    """Saddle KKT matrix: inertia must match (nU, nG) — the check the IPM
    uses (lib/ipmPD_CSsolver.c:164-169 mpDesired/mnDesired)."""
    nU, nG = 12, 5
    H = _random_symmetric(rng, nU, definite=True)
    G = rng.standard_normal((nG, nU))
    eps = 1e-8
    K = np.block([[H, G.T], [G, -eps * np.eye(nG)]])
    L, d = ldl_factor(jnp.asarray(K))
    mp, mn = ldl_inertia(d)
    assert int(mp) == nU
    assert int(mn) == nG
    # eigenvalue cross-check
    w = np.linalg.eigvalsh(K)
    assert (w > 0).sum() == nU and (w < 0).sum() == nG


def test_vmap_batched(rng):
    """Batched factorization — the scale-out path (SURVEY.md §2.9:
    vmap over problem instances)."""
    As = np.stack([_random_symmetric(rng, 32) for _ in range(4)])
    Ls, ds = jax.vmap(lambda A: ldl_factor(A))(jnp.asarray(As))
    for i in range(4):
        R = np.asarray(Ls[i]) @ np.diag(np.asarray(ds[i])) @ np.asarray(Ls[i]).T
        np.testing.assert_allclose(R, As[i], atol=1e-8)


def test_grad_through_solve(rng):
    """Differentiability of the solve (needed for sensitivity outputs,
    reference lib/ipmPD_CS.m:478-503)."""
    n = 10
    A = _random_symmetric(rng, n, definite=True)
    b = rng.standard_normal(n)

    def f(bv):
        L, d = ldl_factor_unblocked(jnp.asarray(A))
        return jnp.sum(ldl_solve(L, d, bv) ** 2)

    g = jax.grad(f)(jnp.asarray(b))
    x = np.linalg.solve(A, b)
    expected = 2 * np.linalg.solve(A, x)  # A symmetric
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-7)
