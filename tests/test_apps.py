"""Application-layer tests: Mpc (vs the hand-built mpc_dcmotor example),
Lasso (vs sklearn-style coordinate-descent oracle via scipy), NLSS
simulation, Sysid parameter recovery, Mpcmhe disturbance estimation.
Reference analogs: lib/Tmpc.m, lib/TClasso.m, lib/nlss.m,
lib/@TCsysid, lib/Tmpcmhe.m."""

import numpy as np
import pytest

import tenscalc_tpu as tc
from tenscalc_tpu.ops.tseries import tsIntegral


# ---------------------------------------------------------------------------
# Mpc
# ---------------------------------------------------------------------------

def _build_dcmotor_mpc(T=15, ns="app1_"):
    nX, nU = 2, 1
    x = tc.variable(ns + "x", (nX, T))
    u = tc.variable(ns + "u", (nU, T))
    ref = tc.variable(ns + "ref", (1, T))
    p = tc.variable(ns + "p", ())
    k = tc.variable(ns + "k", ())

    def f(xs, us, ref_, p_, k_):
        # dot x = [x2; p x2 + k u] — works on Expr and numpy
        from tenscalc_tpu.expr import concat, Expr

        x2 = xs[1:2, :]
        if isinstance(xs, Expr) or isinstance(us, Expr):
            return concat([x2, p_ * x2 + k_ * us], axis=0)
        return np.concatenate([x2, np.asarray(p_) * x2 + np.asarray(k_) * us], axis=0)

    Ts = 0.1
    J = tsIntegral(((x[0:1, :] - ref) ** 2).sum(axis=0), Ts) + (1 / 50.0) * tsIntegral(
        (u**2).sum(axis=0), Ts
    )
    mpc = tc.Mpc(
        objective=J,
        control_variable=u,
        state_variable=x,
        state_derivative=f,
        sample_time=Ts,
        parameters=[ref, p, k],
        constraints=[u >= -1.0, u <= 1.0, x >= -0.45, x <= 0.45],
        output_expressions={"J": J},
    )
    return mpc, T, Ts


def test_mpc_closed_loop():
    mpc, T, Ts = _build_dcmotor_mpc()
    mpc.set_parameter("app1_p", -2.0)
    mpc.set_parameter("app1_k", 1.0)
    mpc.set_initial_state(0.0, [0.2, 0.1])

    rng = np.random.default_rng(0)
    u_warm = 0.01 * rng.random((1, T))
    t = 0.0
    for step in range(15):
        mpc.set_parameter(
            "app1_ref", -0.3 * np.sign(np.sin(0.5 * (t + np.arange(T) * Ts)))[None, :]
        )
        state = mpc.set_solver_warm_start(u_warm)
        # move warm state away from the box constraints (reference advice)
        mpc.set_solver_state_start(np.clip(state[:, 1:], -0.42, 0.42))
        sol = mpc.solve(mu0=1e-3, max_iter=100)
        assert sol.status == 0, f"step {step}: status {sol.status}"
        t, u_warm, u_applied = mpc.apply_controls(sol)
        assert np.abs(u_applied) <= 1 + 1e-6
    hist = mpc.get_history()
    assert hist["x"].shape[1] == 16
    assert (np.abs(hist["x"]) <= 0.47).all()  # states kept near the box
    assert (hist["status"] == 0).all()


def test_mpc_control_delay():
    """control_delay=1: first control is a parameter (Tmpc.m:376-395)."""
    T = 8
    ns = "app2_"
    x = tc.variable(ns + "x", (1, T))
    u = tc.variable(ns + "u", (1, T))

    def f(xs, us):
        return -xs + us

    J = tc.norm2(x) + 0.1 * tc.norm2(u)
    mpc = tc.Mpc(
        objective=J,
        control_variable=u,
        state_variable=x,
        state_derivative=f,
        sample_time=0.1,
        constraints=[u >= -2.0, u <= 2.0],
        control_delay=1,
    )
    mpc.set_initial_state(0.0, [1.0], uinit=np.zeros((1, 1)))
    mpc.set_solver_warm_start(np.zeros((1, T - 1)))
    sol = mpc.solve(mu0=1e-2, max_iter=100)
    assert sol.status == 0
    assert sol.control.shape == (1, T - 1)  # only optimized controls


# ---------------------------------------------------------------------------
# Lasso
# ---------------------------------------------------------------------------

def test_lasso_recovers_sparse_weights(rng):
    n, m = 8, 60
    w_true = np.zeros(n)
    w_true[[1, 4]] = [2.0, -1.5]
    X = rng.standard_normal((m, n))
    y = X @ w_true + 1.0 + 0.01 * rng.standard_normal(m)

    lasso = tc.Lasso(n_features=n, n_points=m)
    sol = lasso.fit(X, y, l1weight=1.0)
    assert sol.ok, sol.describe()
    W = sol.outputs["W"]
    c = sol.outputs["c"]
    # support recovery + shrinkage toward zero elsewhere
    assert abs(W[1] - 2.0) < 0.2 and abs(W[4] + 1.5) < 0.2
    mask = np.ones(n, bool)
    mask[[1, 4]] = False
    assert np.abs(W[mask]).max() < 0.1
    assert abs(c - 1.0) < 0.2

    # oracle: compare objective against scipy-optimized lasso objective
    from scipy.optimize import minimize as sp_minimize

    def obj(z):
        w, cc = z[:n], z[n]
        return np.sum((X @ w + cc - y) ** 2) + 1.0 * np.abs(w).sum()

    ref = sp_minimize(obj, np.zeros(n + 1), method="Nelder-Mead",
                      options={"maxiter": 20000, "xatol": 1e-10, "fatol": 1e-12})
    ours = obj(np.concatenate([W, [float(c)]]))
    assert ours <= ref.fun + 1e-3


# ---------------------------------------------------------------------------
# NLSS
# ---------------------------------------------------------------------------

def test_nlss_discrete_simulation():
    sys = tc.NLSS(
        f=lambda x, u, t: 0.9 * x + u,
        g=lambda x, u, t: 2.0 * x,
        discrete=True,
        x0=[1.0],
    )
    u = np.ones((1, 5))
    xs, ys = sys.simulate(u)
    expect = [1.0]
    for _ in range(5):
        expect.append(0.9 * expect[-1] + 1.0)
    np.testing.assert_allclose(xs[0], expect, rtol=1e-12)
    np.testing.assert_allclose(ys[0], 2.0 * np.asarray(expect[:-1]), rtol=1e-12)


def test_nlss_continuous_simulation():
    sys = tc.NLSS(
        f=lambda x, u, t: -x, discrete=False, x0=[1.0]
    )
    xs, _ = sys.simulate(np.zeros((1, 10)), ts=0.1)
    np.testing.assert_allclose(xs[0, -1], np.exp(-1.0), rtol=1e-3)


def test_nlss_symbolic_constraints():
    sys = tc.NLSS(f=lambda x, u, t: 0.5 * x + u, discrete=True, x0=[0.0])
    x = sys.symbolic_state(4)
    u = tc.variable("nl_u", (1, 3))
    cons = sys.dynamics_constraints(x, u)
    assert cons[0].kind == "eq"
    xv = np.array([[1.0, 0.5 + 1, 0.25 + 0.5 + 1, 3.0]])
    # residual zero iff dynamics hold
    uv = np.ones((1, 3))
    r = np.asarray(cons[0].expr({"x": xv, "nl_u": uv}))
    np.testing.assert_allclose(r[0, :2], 0.0, atol=1e-12)
    assert abs(r[0, 2]) > 0.1


# ---------------------------------------------------------------------------
# Sysid
# ---------------------------------------------------------------------------

def test_sysid_recovers_parameters(rng):
    """Identify a and b of x+ = a x + b u from noisy output data."""
    N = 40
    a_true, b_true = 0.8, 0.5
    u_seq = rng.standard_normal((1, N))
    x_seq = np.zeros((1, N))
    for k in range(N - 1):
        x_seq[0, k + 1] = a_true * x_seq[0, k] + b_true * u_seq[0, k]
    y_seq = x_seq + 0.001 * rng.standard_normal((1, N))

    sysid = tc.Sysid(
        f=lambda x, u, a, b: a * x + b * u,
        g=lambda x, a, b: x,
        n_states=1,
        n_outputs=1,
        n_inputs=1,
        horizon=N,
        parameters=[
            tc.ParameterSpec("a", (), lower=0.0, upper=1.0),
            tc.ParameterSpec("b", (), lower=-2.0, upper=2.0),
        ],
    )
    sol, est = sysid.fit(u_seq, y_seq, x0=y_seq)
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(float(est["a"]), a_true, atol=5e-3)
    np.testing.assert_allclose(float(est["b"]), b_true, atol=5e-3)


# ---------------------------------------------------------------------------
# Mpcmhe
# ---------------------------------------------------------------------------

def test_mpcmhe_estimates_state_and_controls(rng):
    """Scalar system x+ = a x + u + d with past outputs measured; the
    MPC-MHE game should reconstruct the past state trajectory from
    clean measurements and drive the future state toward zero."""
    L, T = 4, 6
    nX = nU = nD = nY = 1
    a = 0.9
    Ts = 1.0  # discrete-time via derivative (x+ - x)/Ts = f

    xv = tc.variable("mh_x", (nX, L + T + 1))
    yv = tc.variable("mh_y", (nY, L + 1))
    up = tc.variable("mh_up", (nU, L))
    uf = tc.variable("mh_uf", (nU, T))
    dv = tc.variable("mh_d", (nD, L + T))

    # "derivative" encoding the discrete map under trapezoidal rule:
    # (x+ - x) == Ts/2 (f(x) + f(x+)) with f chosen so the map is exact
    # for this linear system: f(x,u,d) = c1 x + c2 (u + d) solves
    # x+ = a x + u + d when c1 = 2(a-1)/(1+a), c2 = 2/(1+a).
    c1 = 2 * (a - 1) / (1 + a)
    c2 = 2 / (1 + a)

    def f(xs, us, ds):
        return c1 * xs + c2 * (us + ds)

    def g(xs):
        return xs

    J = (
        tc.norm2(yv - xv[:, : L + 1])        # MHE fit
        + tc.norm2(xv[:, L + 1 :])           # MPC: drive future to zero
        + 0.1 * tc.norm2(uf)
        - 20.0 * tc.norm2(dv)                # adversary penalty
    )

    mhe = tc.Mpcmhe(
        objective=J,
        state_variable=xv,
        past_output_variable=yv,
        past_control_variable=up,
        future_control_variable=uf,
        disturbance_variable=dv,
        state_derivative=f,
        output_function=g,
        sample_time=Ts,
        backward_horizon=L,
        forward_horizon=T,
        control_constraints=[uf >= -5.0, uf <= 5.0],
        disturbance_constraints=[dv >= -1.0, dv <= 1.0],
    )

    # simulate truth with zero disturbance
    x_true = [0.7]
    u_past = 0.1 * rng.standard_normal((1, L))
    for k in range(L):
        x_true.append(a * x_true[-1] + u_past[0, k])
    y_past = np.asarray(x_true)[None, :]

    sol = mhe.solve(y_past, u_past, mu0=1e-1, max_iter=300)
    assert sol.status == 0, f"status {sol.status}"
    # estimated past states match the truth (clean measurements)
    np.testing.assert_allclose(
        sol.state[0, : L + 1], np.asarray(x_true), atol=1e-2
    )
    # future states decay toward zero under the planned controls
    assert abs(sol.state[0, -1]) < abs(sol.state[0, L]) + 1e-9


# ---------------------------------------------------------------------------
# Sysid probabilistic extensions (TCsysid noise models + forecasts)
# ---------------------------------------------------------------------------

def test_sysid_estimates_noise_variance(rng):
    """noise_std='estimate': the inverse variance becomes an optimization
    variable (TCsysid nStochasticInputsUnknownVariance); with hard
    dynamics and y = x + e the MLE is w = N / ||e_resid||^2, so the
    reported noiseStdDev must track the injected sigma."""
    N, a_true, b_true, sigma = 60, 0.8, 0.5, 0.05
    u_seq = rng.standard_normal((1, N))
    x_seq = np.zeros((1, N))
    for k in range(N - 1):
        x_seq[0, k + 1] = a_true * x_seq[0, k] + b_true * u_seq[0, k]
    y_seq = x_seq + sigma * rng.standard_normal((1, N))

    sysid = tc.Sysid(
        f=lambda x, u, a, b: a * x + b * u,
        g=lambda x, a, b: x,
        n_states=1, n_outputs=1, n_inputs=1, horizon=N,
        parameters=[
            tc.ParameterSpec("a", (), lower=0.0, upper=1.0),
            tc.ParameterSpec("b", (), lower=-2.0, upper=2.0),
        ],
        name="sysv",
        noise_std="estimate",
    )
    sol, est = sysid.fit(u_seq, y_seq, x0=y_seq)
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(float(est["a"]), a_true, atol=0.05)
    np.testing.assert_allclose(float(est["b"]), b_true, atol=0.05)
    shat = float(np.asarray(sol.outputs["noiseStdDev"]))
    assert 0.5 * sigma < shat < 1.6 * sigma, shat
    assert np.isfinite(float(np.asarray(sol.outputs["logJoint"])))


def test_sysid_forecast_laplace_oracle(rng):
    """Soft-dynamics fit + forecast: Laplace CI against the exact
    linear-Gaussian Hessian assembled in numpy (the model is quadratic
    so the Laplace approximation is exact)."""
    N, a_true, sigma_y, sigma_v = 40, 0.9, 0.1, 0.05
    u_seq = rng.standard_normal((1, N))
    x_seq = np.zeros((1, N))
    for k in range(N - 1):
        x_seq[0, k + 1] = (a_true * x_seq[0, k] + 0.5 * u_seq[0, k]
                           + sigma_v * rng.standard_normal())
    y_seq = x_seq + sigma_y * rng.standard_normal((1, N))
    inst = np.array([5, 20, 35])

    sysid = tc.Sysid(
        f=lambda x, u, a: a * x + 0.5 * u,
        g=lambda x, a: x,
        n_states=1, n_outputs=1, n_inputs=1, horizon=N,
        parameters=[tc.ParameterSpec("a", (), lower=-2.0, upper=2.0)],
        name="sysf",
        noise_std=sigma_y,
        disturbance_std=sigma_v,
        forecast_instants=inst,
    )
    sol, est = sysid.fit(u_seq, y_seq, x0=y_seq, mu0=1.0)
    assert sol.ok, sol.describe()
    rep = sysid.forecast(sol, u_seq, y_seq)
    assert rep["H_sign"] > 0
    assert np.isfinite(rep["logMarginal"])
    # forecast mean = smoothed output at the instants
    xs = np.asarray(sol.outputs["x"])
    np.testing.assert_allclose(rep["mean"], xs[:, inst], rtol=1e-8)

    # exact-H oracle: z = [x, fvec], quadratic neg-log-joint
    a = float(est["a"])
    wY, wV = 1.0 / sigma_y**2, 1.0 / sigma_v**2
    D = np.zeros((N - 1, N))
    for k in range(N - 1):
        D[k, k], D[k, k + 1] = -a, 1.0
    S = np.zeros((len(inst), N))
    S[np.arange(len(inst)), inst] = 1.0
    H = np.zeros((N + len(inst), N + len(inst)))
    H[:N, :N] = wY * np.eye(N) + wV * D.T @ D + wY * S.T @ S
    H[:N, N:] = -wY * S.T
    H[N:, :N] = -wY * S
    H[N:, N:] = wY * np.eye(len(inst))
    var = np.diag(np.linalg.inv(H))[N:]
    np.testing.assert_allclose(
        rep["std"].ravel(), np.sqrt(var), rtol=1e-6
    )
    # and the variance decomposition: fvar = posterior var + 1/wY
    assert (rep["std"].ravel() ** 2 > 1.0 / wY).all()


def test_sysid_forecast_requires_soft_dynamics():
    with pytest.raises(ValueError, match="stochastic"):
        tc.Sysid(
            f=lambda x, u, a: a * x,
            g=lambda x, a: x,
            n_states=1, n_outputs=1, n_inputs=1, horizon=10,
            parameters=[tc.ParameterSpec("a", ())],
            name="sysh",
            forecast_instants=[3],
        )


# ---------------------------------------------------------------------------
# Sysid post-fit reporting surface (TCsysid.m:858-1034 report* parity)
# ---------------------------------------------------------------------------

def _fit_soft_sysid(rng, N=40, a_true=0.8, b_true=0.5, sy=0.05, sv=0.02,
                    upper_a=1.0, name="sidr"):
    import tenscalc_tpu as tc

    u_seq = rng.standard_normal((1, N))
    x_seq = np.zeros((1, N))
    for k in range(N - 1):
        x_seq[0, k + 1] = (
            a_true * x_seq[0, k] + b_true * u_seq[0, k]
            + sv * rng.standard_normal()
        )
    y_seq = x_seq + sy * rng.standard_normal((1, N))
    sysid = tc.Sysid(
        f=lambda x, u, a, b: a * x + b * u,
        g=lambda x, a, b: x,
        n_states=1, n_outputs=1, n_inputs=1, horizon=N,
        parameters=[
            tc.ParameterSpec("a", (), lower=0.0, upper=upper_a),
            tc.ParameterSpec("b", (), lower=-2.0, upper=2.0),
        ],
        name=name,
        noise_std=sy,
        disturbance_std=sv,
    )
    sol, est = sysid.fit(u_seq, y_seq, x0=y_seq, restarts=2)
    return sysid, sol, est


def test_sysid_parameter_std_calibrated(rng):
    """The reported Laplace standard error must match the actual
    estimator dispersion: over M independent data realizations the
    sample std of a-hat should agree with the mean reported std (the
    report is 'correct' in the frequentist-calibration sense, not just
    reproducible)."""
    import tenscalc_tpu as tc

    M = 14
    a_hats, stds = [], []
    for m in range(M):
        tc.expr.clear_variables()
        r = np.random.default_rng(100 + m)
        sysid, sol, est = _fit_soft_sysid(r, name=f"sidc{m}_")
        assert sol.ok, sol.describe()
        std = sysid.parameter_std(sol)
        a_hats.append(float(est["a"]))
        stds.append(float(std["theta"]["a"]))
        assert np.isfinite(std["theta"]["b"]).all()
        assert (std["x"] > 0).all()
    sample_std = np.std(a_hats, ddof=1)
    mean_reported = np.mean(stds)
    # M=14 realizations put ~20% noise on sample_std; a 2x band is a
    # real calibration check (an unscaled or squared Hessian would miss
    # it by orders of magnitude)
    assert 0.5 * mean_reported < sample_std < 2.0 * mean_reported, (
        sample_std, mean_reported,
    )


def test_sysid_report_text_and_bound_warning(rng, capsys):
    """report() prints cost/parameters/states/outputs with stds; an
    active bound produces the reference's hitting-upper warning
    (TCsysid.m hitBounds :165-200)."""
    import tenscalc_tpu as tc

    tc.expr.clear_variables()
    # clamp a's upper bound BELOW the true value -> active bound
    sysid, sol, est = _fit_soft_sysid(
        rng, upper_a=0.6, name="sidb_"
    )
    assert sol.ok, sol.describe()
    assert float(est["a"]) == pytest.approx(0.6, abs=1e-3)
    sysid.report(sol)
    out = capsys.readouterr().out
    assert "Parameter estimates" in out
    assert "State estimates" in out
    assert "Outputs" in out
    assert "hitting upper" in out
    assert "[std =" in out
    assert "model std" in out
    # plotCost terminal analog renders panels for both noise signals
    sysid.plot_cost(sol)
    out2 = capsys.readouterr().out
    assert "measurementNoise" in out2
    assert "disturbance" in out2
    assert "histogram" in out2


def test_sysid_report_hard_dynamics(rng, capsys):
    """Hard-equality models get error stds from the reduced (x0, theta)
    rollout Hessian; report() still renders."""
    import tenscalc_tpu as tc

    tc.expr.clear_variables()
    N = 40
    a_true, b_true = 0.8, 0.5
    u_seq = rng.standard_normal((1, N))
    x_seq = np.zeros((1, N))
    for k in range(N - 1):
        x_seq[0, k + 1] = a_true * x_seq[0, k] + b_true * u_seq[0, k]
    y_seq = x_seq + 0.001 * rng.standard_normal((1, N))
    sysid = tc.Sysid(
        f=lambda x, u, a, b: a * x + b * u,
        g=lambda x, a, b: x,
        n_states=1, n_outputs=1, n_inputs=1, horizon=N,
        parameters=[
            tc.ParameterSpec("a", (), lower=0.0, upper=1.0),
            tc.ParameterSpec("b", (), lower=-2.0, upper=2.0),
        ],
        name="sidh_",
    )
    sol, est = sysid.fit(u_seq, y_seq, x0=y_seq)
    assert sol.ok
    std = sysid.parameter_std(sol)
    assert std["x"] is None
    assert np.isfinite(std["theta"]["a"]).all()
    assert (std["theta"]["a"] > 0).all()
    sysid.report(sol)
    out = capsys.readouterr().out
    assert "Parameter estimates" in out
