"""Horizon-parallel (SPIKE/Schur) block-tridiagonal solve over the
8-device virtual mesh, validated against dense oracles — the framework's
sequence/context-parallel axis (SURVEY.md §2.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tenscalc_tpu.kkt.spike import dense_to_blocks, spike_solve


def _block_tridiag_dense(rng, nb, s, spd_shift=None):
    n = nb * s
    A = np.zeros((n, n))
    for i in range(nb):
        D = rng.standard_normal((s, s))
        A[i * s : (i + 1) * s, i * s : (i + 1) * s] = D + D.T
        if i > 0:
            B = rng.standard_normal((s, s))
            A[i * s : (i + 1) * s, (i - 1) * s : i * s] = B
            A[(i - 1) * s : i * s, i * s : (i + 1) * s] = B.T
    A += (spd_shift if spd_shift is not None else 4 * s) * np.eye(n)
    return A


@pytest.fixture
def mesh():
    devs = jax.devices()
    assert len(devs) == 8
    return Mesh(np.array(devs), ("stages",))


@pytest.mark.parametrize("nb,s", [(16, 4), (32, 6), (64, 3)])
def test_spike_matches_dense(rng, mesh, nb, s):
    A = _block_tridiag_dense(rng, nb, s)
    b = rng.standard_normal(nb * s)
    Ab, Bb = dense_to_blocks(jnp.asarray(A), s)
    x = spike_solve(Ab, Bb, jnp.asarray(b).reshape(nb, s), mesh)
    x = np.asarray(x).reshape(nb * s)
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=2e-6, atol=1e-8)


def test_spike_indefinite_kkt_style(rng, mesh):
    """Saddle-structured (KKT-like) block-tridiagonal system."""
    nb, s = 16, 4
    A = _block_tridiag_dense(rng, nb, s)
    # make trailing half of each block's diagonal negative (KKT saddle)
    for i in range(nb):
        sl = slice(i * s + s // 2, (i + 1) * s)
        A[sl, sl] -= 8 * s * np.eye(s - s // 2)
    b = rng.standard_normal(nb * s)
    Ab, Bb = dense_to_blocks(jnp.asarray(A), s)
    x = spike_solve(Ab, Bb, jnp.asarray(b).reshape(nb, s), mesh)
    np.testing.assert_allclose(
        np.asarray(x).reshape(-1), np.linalg.solve(A, b), rtol=5e-6, atol=1e-7
    )


def test_spike_scaling_efficiency(rng):
    """The same solve partitioned over 1 vs 8 devices gives identical
    results (numerical equivalence of the decomposition)."""
    devs = jax.devices()
    nb, s = 32, 4
    A = _block_tridiag_dense(rng, nb, s)
    b = rng.standard_normal(nb * s)
    Ab, Bb = dense_to_blocks(jnp.asarray(A), s)
    bb = jnp.asarray(b).reshape(nb, s)
    x8 = spike_solve(Ab, Bb, bb, Mesh(np.array(devs), ("stages",)))
    x1 = spike_solve(Ab, Bb, bb, Mesh(np.array(devs[:1]), ("stages",)))
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), rtol=1e-5, atol=1e-8)


def test_spike_rejects_bad_partition(rng, mesh):
    Ab = jnp.zeros((10, 3, 3))  # 10 not divisible by 8
    Bb = jnp.zeros((10, 3, 3))
    with pytest.raises(ValueError, match="multiple of mesh size"):
        spike_solve(Ab, Bb, jnp.zeros((10, 3)), mesh)
