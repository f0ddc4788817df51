"""Fleet (batch-in-lanes) LDL kernel tests — interpret mode on CPU,
oracle = numpy dense algebra (reference analog:
examples/testing/testFactorizations.m verifying L*D*L' == A)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tenscalc_tpu.kkt.fleet import (
    FleetLDLFactorization,
    fleet_ldl_factor,
    fleet_ldl_factor_batched,
    fleet_ldl_solve,
    fleet_ldl_solve_batched,
)


def _spd_batch(rng, B, n):
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A = A + np.swapaxes(A, 1, 2) + 3 * n * np.eye(n, dtype=np.float32)
    return A


def test_factor_reconstructs(rng):
    """Row j of the factor holds column j of unit-lower L (pivot at
    [j,j]): L D L^T must reproduce A."""
    B, n = 5, 13  # unaligned on purpose (padding paths)
    A = _spd_batch(rng, B, n)
    L, d = fleet_ldl_factor_batched(jnp.asarray(A))
    L, d = np.asarray(L), np.asarray(d)
    for k in range(B):
        Lu = np.tril(L[k].T, -1) + np.eye(n)
        np.testing.assert_allclose(Lu @ np.diag(d[k]) @ Lu.T, A[k], atol=2e-3)


def test_batched_solve(rng):
    B, n = 6, 24
    A = _spd_batch(rng, B, n)
    b = rng.standard_normal((B, n)).astype(np.float32)
    L, d = fleet_ldl_factor_batched(jnp.asarray(A))
    x = np.asarray(fleet_ldl_solve_batched(L, d, jnp.asarray(b)))
    res = np.einsum("bij,bj->bi", A, x) - b
    assert np.abs(res).max() < 1e-3


def test_inertia_matches_eigs(rng):
    B, n = 4, 11
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A = A + np.swapaxes(A, 1, 2)
    A = A + np.diag(
        np.concatenate([np.full(6, 10.0), np.full(n - 6, -10.0)])
    ).astype(np.float32)[None]
    _, d = fleet_ldl_factor_batched(jnp.asarray(A), clamp=1e-7)
    d = np.asarray(d)
    for k in range(B):
        w = np.linalg.eigvalsh(A[k])
        assert ((w > 0).sum(), (w < 0).sum()) == ((d[k] > 0).sum(), (d[k] < 0).sum())


def test_custom_vmap_routes_to_fleet(rng):
    """vmap of the per-instance API must produce the same answers as the
    explicit batched entry point."""
    B, n = 4, 16
    A = _spd_batch(rng, B, n)
    b = rng.standard_normal((B, n)).astype(np.float32)
    xv = jax.vmap(lambda Ai, bi: fleet_ldl_solve(*fleet_ldl_factor(Ai), bi))(
        jnp.asarray(A), jnp.asarray(b)
    )
    L, d = fleet_ldl_factor_batched(jnp.asarray(A), clamp=1e-7)
    xb = fleet_ldl_solve_batched(L, d, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(xv), np.asarray(xb), rtol=1e-5, atol=1e-6)


def test_unbatched_fallback(rng):
    """Without vmap the API falls back to the dense blocked LDL."""
    n = 9
    A = _spd_batch(rng, 1, n)[0].astype(np.float64)
    b = rng.standard_normal(n)
    x = fleet_ldl_solve(*fleet_ldl_factor(jnp.asarray(A)), jnp.asarray(b))
    np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-9)


def test_backend_adapter_refinement(rng):
    """FleetLDLFactorization refines to tighter residual than raw f32."""
    n = 32
    A = _spd_batch(rng, 1, n)[0].astype(np.float64)
    b = rng.standard_normal(n)

    def solve_one(Aj, bj):
        fac = FleetLDLFactorization(Aj, n_refine=2)
        return fac.solve(bj)

    x = jax.vmap(solve_one)(jnp.asarray(A)[None], jnp.asarray(b)[None])[0]
    assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-5


def test_ipm_fleet_backend_end_to_end(rng):
    """Batched constrained LS through the public API with
    kkt_backend='fleet' (condensed): converges and matches the dense
    backend to solver tolerance."""
    import tenscalc_tpu as tc
    from tenscalc_tpu.parallel import solve_batched

    N, n, B = 20, 6, 3
    A = tc.variable("flt_A", (N, n))
    b = tc.variable("flt_b", (N,))
    x = tc.variable("flt_x", (n,))
    J = tc.norm2(A @ x - b)

    def build(ns_suffix, **opts):
        Av = tc.variable(f"flt{ns_suffix}_A", (N, n))
        bv = tc.variable(f"flt{ns_suffix}_b", (N,))
        xv = tc.variable(f"flt{ns_suffix}_x", (n,))
        return tc.optimize(
            objective=tc.norm2(Av @ xv - bv),
            optimizationVariables=[xv],
            constraints=[xv >= -0.5, xv <= 0.5],
            parameters=[Av, bv],
            outputExpressions={"x": xv},
            dtype="float32",
            **opts,
        )

    s_fleet = build("f", variant="standard", smallerNewtonMatrix=True,
                    kkt_backend="fleet")
    s_dense = build("d")
    Ab = rng.standard_normal((B, N, n))
    bb = rng.standard_normal((B, N))
    x0 = np.zeros((B, n))
    rf = solve_batched(s_fleet, {"fltf_A": Ab, "fltf_b": bb},
                       inits={"fltf_x": x0}, mu0=1.0, max_iter=80)
    rd = solve_batched(s_dense, {"fltd_A": Ab, "fltd_b": bb},
                       inits={"fltd_x": x0}, mu0=1.0, max_iter=80)
    assert (np.asarray(rf.status) == 0).all()
    assert (np.asarray(rd.status) == 0).all()
    np.testing.assert_allclose(np.asarray(rf.u), np.asarray(rd.u), atol=5e-3)


def test_flagship_bench_config_batched():
    """Regression: the exact flagship bench configuration (condensed
    Newton + fleet_banded backend, f32) solves a batched mpc_dcmotor
    fleet on CPU — covers the structured nu-init path that reuses the
    planned banded factorization in the solve prologue."""
    import numpy as np

    from examples import mpc_dcmotor
    from tenscalc_tpu.parallel import solve_batched

    T, B, ns = 30, 8, "flagcfg_"
    solver = mpc_dcmotor.build_solver(
        T=T, namespace=ns, dtype="float32", variant="standard",
        smallerNewtonMatrix=True, kkt_backend="fleet_banded",
    )
    base = mpc_dcmotor.default_params(T, ns)
    rng = np.random.default_rng(0)
    bp = {
        k: np.broadcast_to(np.asarray(v, float), (B,) + np.asarray(v, float).shape).copy()
        for k, v in base.items()
    }
    bp[ns + "ref"] = np.stack(
        [
            mpc_dcmotor.reference_signal(t0 + np.arange(T) * base[ns + "Ts"])[None, :]
            for t0 in np.linspace(0, 6, B)
        ]
    )
    bp[ns + "xinit"] = rng.uniform(-0.15, 0.15, (B, 2, 1))
    bi = {
        ns + "x": bp[ns + "xinit"] + 0.01 * rng.random((B, 2, T)),
        ns + "u": 0.01 * rng.random((B, 1, T - 1)),
    }
    res = solve_batched(solver, bp, inits=bi, mu0=1e-3, max_iter=100)
    st = np.asarray(res.status)
    assert (st == 0).all(), st.tolist()
    assert int(np.asarray(res.iters).max()) <= 40
