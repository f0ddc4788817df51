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


def test_spike_backend_in_ipm():
    """Full MPC solve with the KKT system distributed over the 8-device
    mesh (kkt_backend='spike') matches the dense backend."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from examples import mpc_dcmotor

    devs = jax.devices()
    mesh8 = Mesh(np.array(devs), ("stages",))
    T = 20
    sp = mpc_dcmotor.build_solver(
        T=T, namespace="spk_", kkt_backend="spike", kkt_mesh=mesh8,
        desiredDualityGap=1e-8, gradTolerance=1e-6,
    )
    de = mpc_dcmotor.build_solver(
        T=T, namespace="spd_", kkt_backend="dense",
        desiredDualityGap=1e-8, gradTolerance=1e-6,
    )
    assert sp.kkt_plan is not None

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

    p1, i1 = inst("spk_")
    p2, i2 = inst("spd_")
    s1 = sp.solve(p1, init=i1, mu0=1e-3, max_iter=100)
    s2 = de.solve(p2, init=i2, mu0=1e-3, max_iter=100)
    assert s1.ok and s2.ok, (s1.describe(), s2.describe())
    # different elimination orders/precisions land on the optimum within
    # solver tolerance, not bitwise-identical iterates
    np.testing.assert_allclose(s1.outputs["u"], s2.outputs["u"], atol=2e-3)
    np.testing.assert_allclose(s1.objective, s2.objective, atol=1e-6)


def test_spike_factor_apply_reuse(rng, mesh):
    """A cached spike_factor serves many rhs and matches the dense
    oracle for each (the IPM's repeated-rhs pattern)."""
    from tenscalc_tpu.kkt.spike import spike_apply, spike_factor

    nb, s = 16, 4
    A = _block_tridiag_dense(rng, nb, s)
    Ab, Bb = dense_to_blocks(jnp.asarray(A), s)
    fac = spike_factor(Ab, Bb, mesh)
    for _ in range(3):
        b = rng.standard_normal(nb * s)
        x = spike_apply(fac, jnp.asarray(b).reshape(nb, s), mesh)
        np.testing.assert_allclose(
            np.asarray(x).reshape(-1), np.linalg.solve(A, b), rtol=2e-6, atol=1e-8
        )


def test_ipm_spike_backend_end_to_end(rng, mesh):
    """kkt_backend='spike' through the public API: an MPC-style QP whose
    KKT matrix is block-banded in the horizon, solved with the
    mesh-distributed cached factorization, matches the dense backend."""
    import tenscalc_tpu as tc

    T, n = 40, 2
    tc.expr.clear_variables()
    x = tc.variable("sx", (T, n))
    u = tc.variable("su", (T,))
    x0 = tc.parameter("sx0", (n,))
    A = np.array([[0.95, 0.1], [0.0, 0.9]])
    Bm = np.array([0.0, 1.0])
    dyn = x[1:] - (x[:-1] @ A.T + u[:-1, None] * Bm)
    J = tc.norm2(x) + 0.1 * tc.norm2(u)
    common = dict(
        constraints=[dyn == 0, x[0] == x0, u >= -1.0, u <= 1.0],
        parameters=[x0],
    )
    x0v = np.array([1.0, -0.5])
    init = {"sx": np.zeros((T, n)), "su": np.zeros(T)}

    sol_d = tc.optimize(J, [x, u], **common, kkt_backend="dense").solve(
        parameters={"sx0": x0v}, init=init
    )
    sol_s = tc.optimize(
        J, [x, u], **common, kkt_backend="spike", kkt_mesh=mesh
    ).solve(parameters={"sx0": x0v}, init=init)
    assert int(sol_d.status) == 0 and int(sol_s.status) == 0
    np.testing.assert_allclose(
        float(sol_s.objective), float(sol_d.objective), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sol_s.variables["su"]), np.asarray(sol_d.variables["su"]),
        atol=1e-6,
    )
