"""Batched + sharded solve tests on the 8-device virtual CPU mesh
(SURVEY.md §2.9: vmap over problem instances, shard_map over chips)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import tenscalc_tpu as tc
from tenscalc_tpu.parallel import make_mesh, solve_batched


@pytest.fixture(scope="module")
def qp_solver():
    n = 6
    Q = tc.variable("bQ", (n, n))
    c = tc.variable("bc", (n,))
    x = tc.variable("bx", (n,))
    J = 0.5 * tc.tprod(x, [-1], Q @ x, [-1]) + tc.tprod(c, [-1], x, [-1])
    return tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= -1.0, x <= 1.0],
        parameters=[Q, c],
        outputExpressions={"x": x},
    ), n


def _batch_data(n, B, seed=0):
    rng = np.random.default_rng(seed)
    Qs = np.zeros((B, n, n))
    cs = rng.standard_normal((B, n))
    for b in range(B):
        M = rng.standard_normal((n, n))
        Qs[b] = M @ M.T + n * np.eye(n)
    return Qs, cs


def _oracle(Q, c):
    from scipy.optimize import minimize as sp_minimize

    res = sp_minimize(
        lambda xv: 0.5 * xv @ Q @ xv + c @ xv,
        np.zeros(Q.shape[0]),
        jac=lambda xv: Q @ xv + c,
        bounds=[(-1, 1)] * Q.shape[0],
        method="L-BFGS-B",
        tol=1e-12,
    )
    return res.x


def test_vmap_batch(qp_solver):
    solver, n = qp_solver
    B = 8
    Qs, cs = _batch_data(n, B)
    res = solve_batched(
        solver, {"bQ": Qs, "bc": cs},
        inits={"bx": np.zeros((B, n))},
    )
    assert res.status.shape == (B,)
    assert (np.asarray(res.status) == 0).all(), res.status
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(res.u[b]), _oracle(Qs[b], cs[b]), atol=1e-4
        )
    # per-instance iteration counts stay individual (finished instances
    # are frozen while the batched loop drains the rest)
    singles = [
        solver.solve(
            {"bQ": Qs[b], "bc": cs[b]}, init={"bx": np.zeros(n)}
        ).iters
        for b in range(B)
    ]
    np.testing.assert_array_equal(np.asarray(res.iters), singles)


def test_shard_map_mesh(qp_solver):
    """Sharded over the 8 virtual devices — results identical to the
    unsharded batch."""
    solver, n = qp_solver
    assert len(jax.devices()) == 8, "conftest should provide 8 cpu devices"
    mesh = make_mesh(8)
    B = 16
    Qs, cs = _batch_data(n, B, seed=1)
    res_sharded = solve_batched(
        solver, {"bQ": Qs, "bc": cs},
        inits={"bx": np.zeros((B, n))},
        mesh=mesh,
    )
    res_plain = solve_batched(
        solver, {"bQ": Qs, "bc": cs},
        inits={"bx": np.zeros((B, n))},
    )
    assert (np.asarray(res_sharded.status) == 0).all()
    np.testing.assert_allclose(
        np.asarray(res_sharded.u), np.asarray(res_plain.u), atol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(res_sharded.iters), np.asarray(res_plain.iters)
    )


def test_batched_mpc():
    """Batched MPC solves — the Tmpc-fleet pattern (SURVEY.md §2.9)."""
    from examples import mpc_dcmotor

    T = 10
    # tightened tolerances: the batched-vs-single comparison below needs
    # the iterates determined well inside the default tolerance ball
    solver = mpc_dcmotor.build_solver(
        T=T, namespace="pb_", desiredDualityGap=1e-8, gradTolerance=1e-6,
    )
    base = mpc_dcmotor.default_params(T, "pb_")
    B = 4
    rng = np.random.default_rng(0)
    params = {}
    for k, v in base.items():
        arr = np.asarray(v, float)
        params[k] = np.broadcast_to(arr, (B,) + arr.shape).copy()
    refs = np.stack(
        [
            mpc_dcmotor.reference_signal(t0 + np.arange(T) * 0.1)[None, :]
            for t0 in np.linspace(0, 3, B)
        ]
    )
    params["pb_ref"] = refs
    params["pb_xinit"] = rng.uniform(-0.1, 0.1, (B, 2, 1))
    inits = {
        "pb_x": params["pb_xinit"] + 0.01 * rng.random((B, 2, T)),
        "pb_u": 0.01 * rng.random((B, 1, T - 1)),
    }
    res = solve_batched(solver, params, inits=inits, mu0=1e-3, max_iter=100)
    assert (np.asarray(res.status) == 0).all(), res.status
    # verify each against its own single solve
    for b in range(B):
        single = solver.solve(
            {k: v[b] for k, v in params.items()},
            init={k: v[b] for k, v in inits.items()},
            mu0=1e-3,
            max_iter=100,
        )
        # batched XLA fusion/reduction orders differ from single-solve,
        # so the two IPM paths stop at (slightly) different points inside
        # the same tolerance ball; gradTolerance=1e-4 ⇒ allow a few e-4
        np.testing.assert_allclose(
            np.asarray(res.u[b]),
            np.concatenate(
                [single.variables["pb_u"].ravel(), single.variables["pb_x"].ravel()]
            ),
            atol=5e-4,
        )


def test_scaling_harness(qp_solver):
    """Weak-scaling sweep runs and keeps correctness across mesh sizes
    (efficiency numbers are only meaningful on real multi-chip)."""
    from tenscalc_tpu.parallel.scaling import measure_scaling

    solver, n = qp_solver

    def make_batch(B):
        Qs, cs = _batch_data(n, B, seed=2)
        penv = {"bQ": jnp.asarray(Qs), "bc": jnp.asarray(cs)}
        u0 = jnp.zeros((B, n))
        return u0, penv

    rows = measure_scaling(
        solver, make_batch, per_device_batch=2,
        device_counts=(1, 2, 4), mu0=1.0, max_iter=60, reps=1,
    )
    assert [r["devices"] for r in rows] == [1, 2, 4]
    for r in rows:
        assert r["converged"] == r["batch"], rows


def test_solve_many_api(qp_solver):
    """solver.solve_many sugar matches solve_batched."""
    solver, n = qp_solver
    B = 4
    Qs, cs = _batch_data(n, B, seed=3)
    res = solver.solve_many(
        {"bQ": Qs, "bc": cs}, inits={"bx": np.zeros((B, n))}
    )
    assert (np.asarray(res.status) == 0).all()
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(res.u[b]), _oracle(Qs[b], cs[b]), atol=1e-4
        )


def test_fleet_mpc_closed_loop():
    """Fleet of heterogeneous plants controlled in lockstep with
    solve_many, warm-started each period (examples/mpc_fleet.py)."""
    from examples import mpc_fleet

    hist = mpc_fleet.run_fleet(B=8, T=10, n_steps=6, ns="flt_")
    assert (hist["status"] == 0).all()
    assert hist["x"].shape == (6, 8, 2)
    # states stay inside the box
    assert np.abs(hist["x"]).max() < 0.45


def test_shared_parameters_match_batched():
    """A parameter passed with its unbatched declared shape is shared
    across the batch (vmap in_axes=None); results must match the fully
    batched call on identical data."""
    from examples import mpc_dcmotor

    T = 10
    solver = mpc_dcmotor.build_solver(T=T, namespace="ps_")
    base = mpc_dcmotor.default_params(T, "ps_")
    B = 4
    rng = np.random.default_rng(0)
    refs = np.stack(
        [
            mpc_dcmotor.reference_signal(t0 + np.arange(T) * 0.1)[None, :]
            for t0 in np.linspace(0, 3, B)
        ]
    )
    xinit = rng.uniform(-0.1, 0.1, (B, 2, 1))
    inits = {
        "ps_x": xinit + 0.01 * rng.random((B, 2, T)),
        "ps_u": 0.01 * rng.random((B, 1, T - 1)),
    }
    # shared: every base parameter unbatched; batched: ref + xinit
    params_shared = dict(base)
    params_shared["ps_ref"] = refs
    params_shared["ps_xinit"] = xinit
    res_s = solve_batched(
        solver, params_shared, inits=inits, mu0=1e-3, max_iter=100
    )
    assert (np.asarray(res_s.status) == 0).all(), res_s.status

    params_full = {
        k: np.broadcast_to(np.asarray(v, float), (B,) + np.asarray(v).shape).copy()
        for k, v in base.items()
    }
    params_full["ps_ref"] = refs
    params_full["ps_xinit"] = xinit
    res_f = solve_batched(
        solver, params_full, inits=inits, mu0=1e-3, max_iter=100
    )
    np.testing.assert_allclose(
        np.asarray(res_s.u), np.asarray(res_f.u), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(res_s.iters), np.asarray(res_f.iters)
    )


def test_shared_parameter_wrong_shape_raises(qp_solver):
    solver, n = qp_solver
    B = 4
    Qs, cs = _batch_data(n, B)
    with pytest.raises(ValueError, match="expected batched shape"):
        solve_batched(
            solver, {"bQ": Qs, "bc": cs[:, : n - 1]}, mu0=1.0
        )
