"""MPC-MHE output-feedback pursuit: a unicycle pursuer chasing a
velocity-controlled evader — port of
/root/reference/examples/mpcmhe/mpcmhe_unicycle.m.

Pursuer (unicycle, constant speed v, turning-rate control u):
    dot x1 = v cos x3,  dot x2 = v sin x3,  dot x3 = u,  |u| <= max_u
Evader (integrator driven by adversarial velocity d):
    dot x4 = d1,  dot x5 = d2,  ||d|| <= max_d

Only noisy positions y = [x1; x2; x4; x5] are measured (the heading x3
is estimated).  Each step solves the Nash game
    min_{uFuture} max_{x(-L), d, n}  ∫ ||pursuer - evader||^2
        + lambda_u ∫ u^2 - lambda_d ∫ ||d||^2 - lambda_n ∫ ||n||^2
with the state trajectory latent, pinned by forward-Euler dynamics
(mpcmhe_unicycle.m:104-141), exactly the Tmpcmhe pattern
(/root/reference/lib/Tmpcmhe.m:420-524)."""

from __future__ import annotations

import numpy as np

import tenscalc_tpu as tc
from tenscalc_tpu.expr import concat
from tenscalc_tpu.ops.fns import cos, sin
from tenscalc_tpu.ops.tseries import tsIntegral

nX, nU, nD, nY = 5, 1, 2, 4


def build_solver(T=20, L=10, ns="uni_", **options):
    Ts = tc.variable(ns + "Ts", ())
    x0 = tc.variable(ns + "x0", (nX, 1))          # P2 var: state x(-L)
    x1 = tc.variable(ns + "x1", (nX, L + T))      # latent: x(-L+1)..x(T)
    uPast = tc.variable(ns + "uPast", (nU, L))
    uFuture = tc.variable(ns + "uFuture", (nU, T))
    d = tc.variable(ns + "d", (nD, L + T))        # P2 var: evader velocity
    yPast = tc.variable(ns + "yPast", (nY, L))
    v = tc.variable(ns + "v", ())
    max_u = tc.variable(ns + "max_u", ())
    max_d = tc.variable(ns + "max_d", ())
    lambda_u = tc.variable(ns + "lambda_u", ())
    lambda_d = tc.variable(ns + "lambda_d", ())
    lambda_n = tc.variable(ns + "lambda_n", ())

    x = concat([x0, x1], axis=1)                  # x(-L)..x(T)
    u = concat([uPast, uFuture], axis=1)          # u(-L)..u(T-1)

    # forward-Euler dynamics (mpcmhe_unicycle.m:104-110)
    xk = x[:, :-1]
    rhs = concat(
        [v * cos(xk[2:3, :]), v * sin(xk[2:3, :]), u, d], axis=0
    )
    dynamics = [x[:, 1:] == xk + Ts * rhs]

    # constraints (mpcmhe_unicycle.m:123-128): box on u, 2-norm ball on d
    P1constraints = [uFuture**2 <= max_u**2]
    P2constraints = [(d**2).sum(axis=0) <= max_d**2]

    # criterion (mpcmhe_unicycle.m:131-145)
    errFuture = x[0:2, L + 1 :] - x[3:5, L + 1 :]
    Jerr2 = tsIntegral((errFuture**2).sum(axis=0), Ts)
    Ju2 = tsIntegral((uFuture**2).sum(axis=0), Ts)
    Jd2 = tsIntegral((d**2).sum(axis=0), Ts)
    n = x[np.array([0, 1, 3, 4]), :L] - yPast     # measurement noise
    Jn2 = tsIntegral((n**2).sum(axis=0), Ts)
    J = Jerr2 + lambda_u * Ju2 - lambda_d * Jd2 - lambda_n * Jn2

    outputs = {
        "J": J, "Jerr2": Jerr2, "Ju2": Ju2, "Jd2": Jd2, "Jn2": Jn2,
        "uFuture": uFuture, "d": d, "x": x,
        "xEst": x1[:, L - 1 : L],                 # estimate of x(0)
    }

    solver = tc.equilibrium(
        P1objective=J,
        P2objective=-J,
        P1optimizationVariables=[uFuture],
        P1constraints=P1constraints,
        P2optimizationVariables=[x0, d],
        P2constraints=P2constraints,
        latentVariables=[x1],
        latentConstraints=dynamics,
        parameters=[Ts, v, uPast, yPast, max_u, max_d,
                    lambda_u, lambda_d, lambda_n],
        outputExpressions=outputs,
        scaleCost=0.0,
        muFactorConservative=0.99,
        **options,
    )
    solver.ns = ns
    solver.dims = (T, L)
    return solver


def default_params(ns="uni_"):
    """Physical parameters (mpcmhe_unicycle.m:222-233)."""
    return {
        ns + "Ts": 0.1,
        ns + "v": 1.0,
        ns + "max_u": 1.5,
        ns + "max_d": 0.5,
        ns + "lambda_u": 1.0,
        ns + "lambda_d": 1.0,
        ns + "lambda_n": 1e3,
    }


def _plant_step(x, u, d_true, v, Ts, substeps=4):
    """True continuous plant, RK-ish via sub-stepped forward Euler
    (the reference integrates with ode23, mpcmhe_unicycle.m:330-334)."""
    h = Ts / substeps
    for _ in range(substeps):
        x = x + h * np.concatenate(
            [v * np.cos(x[2:3]), v * np.sin(x[2:3]), u, d_true]
        )
    return x


def run_closed_loop(solver, n_steps=60, mu0=1e-1, max_iter=300, seed=0,
                    noise_level=0.005, param_overrides=None):
    """Receding-horizon pursuit loop (mpcmhe_unicycle.m:247-346).  Until
    L measurements accumulate, zero control is applied; afterwards each
    step solves the game warm-started from the shifted previous solution
    (x0Warm/x1Warm/uWarm/dWarm, mpcmhe_unicycle.m:148-157)."""
    T, L = solver.dims
    ns = solver.ns
    base = default_params(ns)
    base.update({ns + k_: v_ for k_, v_ in (param_overrides or {}).items()})
    Ts, v = base[ns + "Ts"], base[ns + "v"]
    max_u, max_d = base[ns + "max_u"], base[ns + "max_d"]
    rng = np.random.default_rng(seed)

    # pursuer at origin facing right; evader ahead and above
    # (mpcmhe_unicycle.m:237-241)
    xinit = np.array([0.0, 0.0, 0.0, 2 + L * Ts * v, 2.0])
    evader_guess = np.concatenate([xinit[3:5], [0.0], xinit[3:5]])
    x0Warm = evader_guess[:, None] + 0.01 * rng.random((nX, 1))
    x1Warm = evader_guess[:, None] + 0.01 * rng.random((nX, T + L))
    uWarm = max_u / 6 * rng.standard_normal((nU, T))
    dWarm = max_d / 6 * rng.standard_normal((nD, T + L))
    d_plan = np.zeros((nD, L + T))

    t = 0.0
    uPast = np.zeros((nU, 0))
    yPast = np.zeros((nY, 0))
    hist = {"t": [], "x": [], "u": [], "dist": [], "status": [], "iters": []}
    for step in range(n_steps):
        y = xinit[[0, 1, 3, 4], None] + noise_level * rng.standard_normal((nY, 1))
        if yPast.shape[1] < L:
            u_apply = np.zeros((nU, 1))
            status, iters = 0, 0
        else:
            params = dict(base)
            params[ns + "uPast"] = uPast[:, -L:]
            params[ns + "yPast"] = yPast[:, -L:]
            sol = solver.solve(
                params,
                init={ns + "x0": x0Warm, ns + "x1": x1Warm,
                      ns + "uFuture": uWarm, ns + "d": dWarm},
                mu0=mu0,
                max_iter=max_iter,
            )
            status, iters = sol.status, sol.iters
            if status != 0:
                hist["status"].append(status)
                break
            u_apply = np.asarray(sol.outputs["uFuture"])[:, 0:1]
            d_plan = np.asarray(sol.outputs["d"])
            # shift warm start (mpcmhe_unicycle.m:148-157)
            xfull = np.asarray(sol.outputs["x"])
            x0Warm = xfull[:, 1:2]
            x1Warm = np.concatenate([xfull[:, 2:], xfull[:, -1:]], axis=1)
            uWarm = np.concatenate(
                [sol.outputs["uFuture"][:, 1:], np.zeros((nU, 1))], axis=1)
            uWarm = np.clip(uWarm, -0.9 * max_u, 0.9 * max_u)
            dWarm = np.concatenate(
                [sol.outputs["d"][:, 1:], np.zeros((nD, 1))], axis=1)
            dWarm = np.clip(dWarm, -0.9 * max_d / np.sqrt(2),
                            0.9 * max_d / np.sqrt(2))

        hist["t"].append(t)
        hist["x"].append(xinit.copy())
        hist["u"].append(u_apply[:, 0].copy())
        hist["dist"].append(float(np.hypot(xinit[0] - xinit[3],
                                           xinit[1] - xinit[4])))
        hist["status"].append(status)
        hist["iters"].append(iters)

        # true evader: moves left until the window fills, then plays the
        # adversarial plan at t=0 (mpcmhe_unicycle.m:322-328)
        if step < L:
            d_true = np.array([max_d, 0.0])
        else:
            d_true = d_plan[:, L]
        xinit = _plant_step(xinit, u_apply[:, 0], d_true, v, Ts)
        uPast = np.concatenate([uPast, u_apply], axis=1)
        yPast = np.concatenate([yPast, y], axis=1)  # one-step output delay
        t += Ts
    return {k_: np.asarray(v_) for k_, v_ in hist.items()}


if __name__ == "__main__":
    T, L = 20, 10
    solver = build_solver(T=T, L=L)
    hist = run_closed_loop(solver, n_steps=80)
    print("statuses:", set(hist["status"].tolist()))
    print("pursuer-evader distance: start %.2f -> end %.2f"
          % (hist["dist"][0], hist["dist"][-1]))
    print("mean iters:", float(np.mean(hist["iters"][L:])))
