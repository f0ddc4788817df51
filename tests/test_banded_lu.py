"""Unsymmetric banded LU backends (kkt/banded_lu.py) vs dense oracles —
the reference's kernel-oracle pattern (SURVEY.md §4: every structured
kernel tested against a dense reference)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tenscalc_tpu.kkt.banded_lu import (
    FleetBandedLUFactorization,
    fleet_banded_lu_factor_batched,
    fleet_banded_lu_solve_batched,
    tridiag_lu_factorize,
)
from tenscalc_tpu.kkt.structure import BandedPlan, plan_banded


def _random_banded_unsym(rng, n, w, dom=4.0):
    """Unsymmetric banded matrix, diagonally dominant enough for
    unpivoted elimination."""
    A = np.zeros((n, n))
    for i in range(n):
        lo, hi = max(0, i - w), min(n, i + w + 1)
        A[i, lo:hi] = rng.standard_normal(hi - lo)
        A[i, i] += np.sign(A[i, i] or 1.0) * dom
    return A


def _band_of(A, w):
    n = A.shape[0]
    band = np.zeros((n, 2 * w + 1))
    for c in range(n):
        for i in range(0, w + 1):
            if c + i < n:
                band[c, i] = A[c + i, c]
        for q in range(1, w + 1):
            if c + q < n:
                band[c, w + q] = A[c, c + q]
    return band


@pytest.mark.parametrize("n,w", [(24, 3), (50, 5), (40, 1)])
def test_fleet_lu_factor_solve_matches_dense(rng, n, w):
    B = 3
    As = np.stack([_random_banded_unsym(rng, n, w) for _ in range(B)])
    bands = jnp.asarray(np.stack([_band_of(A, w) for A in As]), jnp.float32)
    bs = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    fband = fleet_banded_lu_factor_batched(bands, w)
    xs = fleet_banded_lu_solve_batched(fband, bs, w)
    for b in range(B):
        x_ref = np.linalg.solve(As[b], np.asarray(bs[b], float))
        np.testing.assert_allclose(np.asarray(xs[b]), x_ref, atol=2e-4)


def test_fleet_lu_adapter_refinement(rng):
    """Full adapter: permutation plan + equilibration + refinement gives
    near-f64 accuracy on an unsymmetric banded system."""
    n, w = 48, 4
    A = _random_banded_unsym(rng, n, w)
    # scramble with a random symmetric permutation; the plan recovers it
    p = rng.permutation(n)
    As = A[np.ix_(p, p)]
    plan = plan_banded(As != 0)
    assert plan.worthwhile
    WW = jnp.asarray(As)
    rhs = jnp.asarray(rng.standard_normal(n))
    fac = FleetBandedLUFactorization(WW, plan, n_refine=2)
    x = fac.solve(rhs)
    x_ref = np.linalg.solve(As, np.asarray(rhs, float))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=0, atol=1e-9)


def test_tridiag_lu_matches_dense(rng):
    n, w = 60, 4
    A = _random_banded_unsym(rng, n, w)
    plan = plan_banded(A != 0)
    assert plan.worthwhile
    WW = jnp.asarray(A)
    fac = tridiag_lu_factorize(WW, plan, n_refine=2)
    rhs = jnp.asarray(rng.standard_normal(n))
    x = fac.solve(rhs)
    x_ref = np.linalg.solve(A, np.asarray(rhs, float))
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-9)
    # multi-rhs path
    R = jnp.asarray(rng.standard_normal((n, 2)))
    X = fac.solve(R)
    np.testing.assert_allclose(
        np.asarray(X), np.linalg.solve(A, np.asarray(R, float)), atol=1e-9
    )


def test_fleet_lu_vmap_wrappers(rng):
    """custom_vmap: unbatched call == one row of the batched kernel, and
    vmap routes into the fleet."""
    from tenscalc_tpu.kkt.banded_lu import _wrappers

    n, w = 32, 2
    B = 4
    As = np.stack([_random_banded_unsym(rng, n, w) for _ in range(B)])
    bands = jnp.asarray(np.stack([_band_of(A, w) for A in As]), jnp.float32)
    bs = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    factor_fn, solve_fn, fs_fn = _wrappers(w, 0.0)
    fb = jax.vmap(factor_fn)(bands)
    xs = jax.vmap(solve_fn)(fb, bs)
    for b in range(B):
        x_ref = np.linalg.solve(As[b], np.asarray(bs[b], float))
        np.testing.assert_allclose(np.asarray(xs[b]), x_ref, atol=2e-4)
    # single-instance
    x0 = solve_fn(factor_fn(bands[0]), bs[0])
    np.testing.assert_allclose(np.asarray(x0), np.asarray(xs[0]), atol=1e-6)
    # fused factor+solve == separate factor, solve (batched and single)
    fb2, xs2 = jax.vmap(fs_fn)(bands, bs)
    np.testing.assert_allclose(np.asarray(fb2), np.asarray(fb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xs2), np.asarray(xs), atol=1e-6)
    fb0, x0f = fs_fn(bands[0], bs[0])
    np.testing.assert_allclose(np.asarray(x0f), np.asarray(x0), atol=1e-6)
