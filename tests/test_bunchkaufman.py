"""Bunch-Kaufman pivoted inertia vs eigenvalue oracles — the fast f32
inertia path for useInertia on TPU (reference computes inertia from its
unpivoted LDL diagonal, lib/ipmPD_CS.m:277-279, and errors on zero
pivots, sparsity_ldl.m:188; BK pivoting removes that fragility)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tenscalc_tpu as tc
from tenscalc_tpu.kkt.bunchkaufman import bk_inertia


def _cases(rng, trial):
    n = int(rng.integers(2, 32))
    A = rng.standard_normal((n, n))
    A = A + A.T
    kind = trial % 4
    if kind == 1:  # zero diagonal: unpivoted LDL fails, BK must pivot
        np.fill_diagonal(A, 0.0)
    elif kind == 2:  # KKT saddle [H G'; G 0]
        m = n // 2
        H = rng.standard_normal((n - m, n - m))
        H = H @ H.T + np.eye(n - m)
        G = rng.standard_normal((m, n - m))
        A = np.block([[H, G.T], [G, np.zeros((m, m))]])
    elif kind == 3:  # wide eigenvalue spread
        w = np.abs(rng.standard_normal(n)) * (10.0 ** rng.uniform(-5, 2, n))
        s = rng.choice([-1.0, 1.0], n)
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        A = (Q * (w * s)) @ Q.T
        A = (A + A.T) / 2
    return A


@pytest.mark.parametrize("dt,floor", [(jnp.float32, 3e-5), (jnp.float64, 1e-12)])
def test_bk_inertia_oracle(rng, dt, floor):
    for trial in range(24):
        A = _cases(rng, trial)
        ev = np.linalg.eigvalsh(A)
        scale = max(np.abs(ev).max(), 1.0)
        # eigenvalues below the dtype noise floor are numerically zero:
        # their sign is unknowable in that precision, so bound the counts
        lo_p, hi_p = int((ev > floor * scale).sum()), int((ev > -floor * scale).sum())
        lo_n, hi_n = int((ev < -floor * scale).sum()), int((ev < floor * scale).sum())
        mp, mn = bk_inertia(jnp.asarray(A, dt))
        assert lo_p <= int(mp) <= hi_p and lo_n <= int(mn) <= hi_n, (
            trial, dt, int(mp), int(mn), (lo_p, hi_p), (lo_n, hi_n))


def test_bk_inertia_vmap(rng):
    As = np.stack(
        [(lambda B: B + B.T)(rng.standard_normal((8, 8))) for _ in range(5)]
    )
    mps, mns = jax.vmap(bk_inertia)(jnp.asarray(As, jnp.float32))
    for i in range(5):
        ev = np.linalg.eigvalsh(As[i])
        assert int(mps[i]) == (ev > 0).sum()
        assert int(mns[i]) == (ev < 0).sum()


def test_ipm_useinertia_f32(rng):
    """useInertia in f32 goes through the BK fast path end-to-end and
    converges to the f64 solution (mls-style bound-constrained LS)."""
    tc.expr.clear_variables()
    N, n = 40, 6
    A = rng.standard_normal((N, n))
    b = rng.standard_normal(N)
    x = tc.variable("bk_x", (n,))
    pA = tc.parameter("bk_A", (N, n))
    pb = tc.parameter("bk_b", (N,))
    J = tc.norm2(pA @ x - pb)
    common = dict(constraints=[x >= -0.5, x <= 0.5], parameters=[pA, pb])
    params = {"bk_A": A, "bk_b": b}
    init = {"bk_x": np.zeros(n)}
    s64 = tc.optimize(J, [x], **common, variant="standard", useInertia=True).solve(
        parameters=params, init=init
    )
    s32 = tc.optimize(
        J, [x], **common, variant="standard", useInertia=True, dtype="float32"
    ).solve(parameters=params, init=init)
    assert int(s64.status) == 0 and int(s32.status) == 0
    np.testing.assert_allclose(
        np.asarray(s32.variables["bk_x"]),
        np.asarray(s64.variables["bk_x"]),
        atol=2e-4,
    )
