"""Smoke/integration driver over the ported reference examples —
the analog of examples/basicTests.m (runs mls, sls, l1l2estimationCS,
mpc_dcmotor end-to-end and errors on failure)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples import l1l2estimation, mls, robust_regress_l1, sls


def test_sls_constrained():
    """The reference's headline benchmark formulation (sls.m, ~850us
    cmex): N=400, n=32, box-constrained."""
    d = sls.default_data()
    s = sls.build_constrained()
    sol = s.solve(
        {"slsc_A": d["A"], "slsc_b": d["b"]},
        init={"slsc_x": d["x0"]},
        mu0=1.0,
        max_iter=60,
    )
    assert sol.ok, sol.describe()
    x = sol.outputs["x"]
    assert (x >= -1e-8).all() and (x <= 0.05 + 1e-8).all()
    # oracle: box-constrained LS (reference bounds 0 <= x <= .05)
    from scipy.optimize import lsq_linear

    ref = lsq_linear(d["A"], d["b"], bounds=(0.0, 0.05), tol=1e-12)
    np.testing.assert_allclose(
        sol.outputs["J"], np.sum((d["A"] @ ref.x - d["b"]) ** 2) / 400, rtol=1e-4
    )


def test_sls_slack_matches_unconstrained():
    d = sls.default_data()
    su = sls.build_unconstrained()
    sv = sls.build_slack()
    solu = su.solve(
        {"sls_A": d["A"], "sls_b": d["b"]}, init={"sls_x": d["x0"]}, max_iter=60
    )
    solv = sv.solve(
        {"slsv_A": d["A"], "slsv_b": d["b"]},
        init={"slsv_x": d["x0"], "slsv_v": 10.0},
        max_iter=60,
    )
    assert solu.ok and solv.ok
    np.testing.assert_allclose(solu.outputs["J"], solv.outputs["J"], atol=1e-4)


def test_l1l2_estimation_outlier_rejection():
    """The l1l2 estimator should beat plain l2 in the presence of
    outliers (l1l2estimationCS.m's point)."""
    N = 120
    t, true_pos, meas, dt1, outliers = l1l2estimation.make_data(N)
    s2 = l1l2estimation.build_l2(N)
    sol2 = s2.solve(
        {"l2e_measurement": meas, "l2e_dt1": dt1, "l2e_weight2acceleration": 10.0},
        init={"l2e_position": np.zeros(N)},
        mu0=0.1,
        max_iter=100,
    )
    assert sol2.ok, sol2.describe()

    s12 = l1l2estimation.build_l1l2(N)
    sol12 = s12.solve(
        {
            "l12e_measurement": meas,
            "l12e_dt1": dt1,
            "l12e_weight2acceleration": 10.0,
            "l12e_weight1acceleration": 2.0,
            "l12e_weight1noise": 2.0,
        },
        init={
            "l12e_position": np.zeros(N),
            "l12e_noise1": np.zeros(N),
            "l12e_acceleration1": np.zeros(N - 2),
            "l12e_noise1abs": np.ones(N),
            "l12e_acceleration1abs": np.ones(N - 2),
        },
        mu0=0.1,
        max_iter=150,
    )
    assert sol12.ok, sol12.describe()
    err2 = np.abs(sol2.outputs["position"] - true_pos).mean()
    err12 = np.abs(sol12.outputs["position"] - true_pos).mean()
    assert err12 < err2  # outliers absorbed by the l1 noise term
    # the sparse l1 noise is mostly zero off-outliers
    n1 = sol12.outputs["noise1"]
    off = np.ones(N, bool)
    off[outliers] = False
    assert np.median(np.abs(n1[off])) < 0.05


def test_robust_regress_l1():
    """scaleCost=1 + sqrt objective (robustRegressL1.m)."""
    m, n = 300, 8
    solver = robust_regress_l1.build_solver(m, n, ns="rrt_")
    th, th0, H, y = robust_regress_l1.make_data(m, n)
    # with scaleCost=1 the cost (and thus the gap scale) shrinks by
    # ~1/J0, so mu0 should be commensurate (the reference's example uses
    # the full m=1000 sizing where mu0=1 happens to work)
    sol = solver.solve(
        {"rrt_lambda": 5.0, "rrt_y": y, "rrt_H": H},
        init={
            "rrt_theta0": 0.0,
            "rrt_theta": np.zeros(n),
            "rrt_absTheta": np.ones(n),
        },
        mu0=0.01,
        max_iter=200,
    )
    assert sol.ok, sol.describe()
    # nonzero true coefficients recovered within noise+shrinkage
    big = np.abs(th) > 0.5
    assert np.abs(sol.outputs["theta"][big] - th[big]).max() < 0.25


def test_matrix_game_value():
    """Zero-sum matrix game vs LP oracle (examples/TCgames.m)."""
    from examples import games

    N1, N2 = 20, 10
    solver = games.build_matrix_game(N1, N2, ns="gt_")
    rng = np.random.default_rng(0)
    A = rng.random((N1, N2))
    sol = solver.solve(
        {"gt_A1": A},
        init={"gt_u": np.full(N1, 1 / N1), "gt_d": np.full(N2, 1 / N2)},
        mu0=0.1,
        max_iter=300,
    )
    assert sol.ok, sol.describe()
    v_lp = games.game_value_lp(A)
    np.testing.assert_allclose(sol.outputs["J"], v_lp, atol=1e-3)
    # strategies on the simplex
    np.testing.assert_allclose(sol.outputs["u"].sum(), 1.0, atol=1e-5)
    np.testing.assert_allclose(sol.outputs["d"].sum(), 1.0, atol=1e-5)
    assert sol.outputs["u"].min() >= -1e-8


def test_dist2convex():
    """Simplex-constrained projection vs scipy oracle
    (examples/dist2convex.m)."""
    from examples import dist2convex
    from scipy.optimize import minimize as sp_minimize

    N, d = 40, 5
    solver = dist2convex.build_solver(N, d, ns="d2t_")
    rng = np.random.default_rng(0)
    A = rng.standard_normal((d, N))
    b = 2 * rng.standard_normal(d)
    sol = solver.solve(
        {"d2t_A": A, "d2t_b": b},
        init={"d2t_x": np.full(N, 1 / N)},
        mu0=0.1,
        max_iter=200,
    )
    assert sol.ok, sol.describe()
    ref = sp_minimize(
        lambda x: np.sum((A @ x - b) ** 2),
        np.full(N, 1 / N),
        jac=lambda x: 2 * A.T @ (A @ x - b),
        constraints={"type": "eq", "fun": lambda x: x.sum() - 1},
        bounds=[(0, None)] * N,
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-14},
    )
    np.testing.assert_allclose(sol.outputs["J"], ref.fun, atol=1e-4)


def test_mpcmhe_dcmotor_closed_loop():
    """Output-feedback MPC-MHE game closed loop: clean solves, the
    state estimate tracks the true state, controls bounded
    (examples/mpcmhe/mpcmhe_dcmotor.m; part of basicTests.m)."""
    from examples import mpcmhe_dcmotor

    # L must dominate the future-error pressure for the game to have a
    # saddle (see run_closed_loop docstring); lambda_n raised to match
    T, L = 12, 16
    solver = mpcmhe_dcmotor.build_solver(T=T, L=L, ns="mmt_")
    hist = mpcmhe_dcmotor.run_closed_loop(
        solver, n_steps=30, seed=0, param_overrides={"lambda_n": 20.0}
    )
    assert (hist["status"] == 0).all(), hist["status"]
    assert len(hist["t"]) == 30
    # after the backward window fills, the MHE estimate of x(0) tracks
    # the true state (clean measurements, small true disturbance)
    live = slice(L + 2, None)
    est_err = np.abs(hist["xEst"][live, 0] - hist["x"][live, 0])
    # the equilibrium estimate is adversarially biased by design; it
    # must still track the true position closely with clean measurements
    assert np.nanmean(est_err) < 0.1, np.nanmean(est_err)
    assert (np.abs(hist["u"]) <= 5.0 + 1e-8).all()


def test_mpc_unicycle_nonlinear():
    """Nonlinear (trig dynamics) MPC with useInertia — the pursuer
    closes on the moving target (examples/mpcmhe/mpc_unicycle.m,
    part of basicTests.m)."""
    from examples import mpc_unicycle

    solver = mpc_unicycle.build_solver(T=30, ns="unt_")
    hist = mpc_unicycle.run_closed_loop(solver, n_steps=30)
    assert (hist["status"] == 0).all(), hist["status"]
    # closes at ~ (v - |d|) per unit time; 3s horizon -> big reduction
    assert hist["dist"][-1] < 0.5 * hist["dist"][0]
    assert (np.abs(hist["u"]) <= 2.0 + 1e-8).all()


def test_slseq_equality_ls():
    """Large equality-constrained LS vs the KKT closed form
    (examples/slseq.m at reduced size)."""
    from examples import slseq

    N, n, m = 500, 80, 8
    solver = slseq.build_solver(N, n, m, ns="slqt_")
    A, b, C, d = slseq.default_data(N, n, m)
    sol = solver.solve(
        {"slqt_A": A, "slqt_b": b, "slqt_C": C, "slqt_d": d},
        init={"slqt_x": np.zeros(n)},
        mu0=1.0,
        max_iter=60,
    )
    assert sol.ok, sol.describe()
    xref = slseq.kkt_oracle(A, b, C, d)
    np.testing.assert_allclose(sol.outputs["x"], xref, atol=1e-5)
    assert np.abs(C @ sol.outputs["x"] - d).max() < 1e-6


def test_mpc_quadcopter():
    """Quadcopter trajectory optimization: thrust-magnitude bounds via
    the slack trick, altitude constraint, tsDerivative/tsDerivative2
    dynamics (examples/mpcmhe/mpc_quadcopter.m)."""
    from examples import mpc_quadcopter

    T = 40
    solver = mpc_quadcopter.build_solver(T, ns="qt_")
    params = mpc_quadcopter.default_params("qt_")
    sol = solver.solve(
        params, init=mpc_quadcopter.hover_init(T, "qt_"),
        mu0=1e-1, max_iter=300,
    )
    assert sol.ok, sol.describe()
    m = sol.outputs["m_thrust"]
    assert m.min() >= 5.0 - 1e-5 and m.max() <= 20.0 + 1e-5
    p = sol.outputs["p"]
    assert (p[2, :] <= 0.1 + 1e-6).all()  # altitude constraint
    # moves toward the target
    tgt = params["qt_pdesired"][:, 0]
    d0 = np.linalg.norm(p[:, 0] - tgt)
    d1 = np.linalg.norm(p[:, -1] - tgt)
    assert d1 < 0.6 * d0


def test_mpcmhe_unicycle_pursuit():
    """Nonlinear MPC-MHE pursuit game: all solves clean, control within
    bounds, pursuer closes on the evader
    (examples/mpcmhe/mpcmhe_unicycle.m)."""
    from examples import mpcmhe_unicycle

    T, L = 10, 8
    solver = mpcmhe_unicycle.build_solver(T=T, L=L, ns="unit_")
    hist = mpcmhe_unicycle.run_closed_loop(solver, n_steps=30, seed=0)
    assert (hist["status"] == 0).all(), hist["status"]
    assert len(hist["t"]) == 30
    assert (np.abs(hist["u"]) <= 1.5 + 1e-6).all()
    # pursuer gains on the evader once the measurement window fills
    assert hist["dist"][-1] < 0.75 * hist["dist"][L], hist["dist"]


def test_tutorial_fim():
    """Batched Fisher-information accumulation matches the per-sample
    jax oracle (examples/csparse/tutorialFIM.m:18-24,57-64)."""
    from examples import tutorial_fim

    FIM = tutorial_fim.main(S=2000, seed=1)
    # information matrix of a sum of PSD terms is PSD
    w = np.linalg.eigvalsh(FIM)
    assert w.min() >= -1e-6 * max(abs(w).max(), 1.0)
