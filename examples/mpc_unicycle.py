"""Nonlinear MPC: unicycle pursuit — port of
/root/reference/examples/mpcmhe/mpc_unicycle.m.

A unicycle with constant forward speed v and bounded turning rate u
pursues a target moving with constant velocity d.  State
x = [px, py, theta, tx, ty]; trapezoidal discretization of the
*nonlinear* heading kinematics makes this a genuinely nonconvex NLP —
the reference enables useInertia for it (mpc_unicycle.m:70-73)."""

from __future__ import annotations

import numpy as np

import tenscalc_tpu as tc
from tenscalc_tpu.expr import concat, lift
from tenscalc_tpu.ops import fns
from tenscalc_tpu.ops.tseries import tsIntegral


def build_solver(T=40, ns="uni_", **options):
    nX, nU, nD = 5, 1, 2
    Ts = tc.variable(ns + "Ts", ())
    x = tc.variable(ns + "x", (nX, T))
    u = tc.variable(ns + "u", (nU, T - 1))
    d = tc.variable(ns + "d", (nD, 1))
    xinit = tc.variable(ns + "xinit", (nX, 1))
    v = tc.variable(ns + "v", ())
    max_u = tc.variable(ns + "max_u", ())

    th0, th1 = x[2:3, :-1], x[2:3, 1:]
    # trapezoidal heading kinematics, ZOH for u and d
    # (mpc_unicycle.m:28-33)
    dynamics = [
        x[0:1, 1:] == x[0:1, :-1] + Ts * v * (fns.cos(th0) + fns.cos(th1)) / 2,
        x[1:2, 1:] == x[1:2, :-1] + Ts * v * (fns.sin(th0) + fns.sin(th1)) / 2,
        x[2:3, 1:] == x[2:3, :-1] + Ts * u,
        x[3:5, 1:] == x[3:5, :-1] + Ts * d,
        x[:, 0:1] == xinit,
    ]
    constraints = [u >= -max_u, u <= max_u]

    J = tsIntegral(((x[0:2, :] - x[3:5, :]) ** 2).sum(axis=0), Ts)

    import jax.numpy as jnp

    uWarm = concat([u[:, 1:], tc.Tzeros((nU, 1))], axis=1)
    uWarm = lift(lambda uu, m: jnp.clip(uu, -0.9 * m, 0.9 * m))(uWarm, max_u)
    xWarm = concat([x[:, 1:], x[:, -1:]], axis=1)

    opts = dict(useInertia=True, adjustAddEye2Hessian=True,
                scaleInequalities=True)
    opts.update(options)
    solver = tc.optimize(
        objective=J,
        optimizationVariables=[u, x],
        constraints=dynamics + constraints,
        parameters=[Ts, v, d, xinit, max_u],
        outputExpressions={
            "J": J, "u": u, "x": x, "uWarm": uWarm, "xWarm": xWarm
        },
        **opts,
    )
    solver.ns = ns
    solver.T = T
    return solver


def default_params(ns="uni_"):
    return {
        ns + "Ts": 0.1,
        ns + "v": 1.0,
        ns + "d": np.array([[0.3], [0.2]]),
        ns + "max_u": 2.0,
    }


def run_closed_loop(solver, n_steps=40, mu0=1e-1, max_iter=200, seed=0):
    T, ns = solver.T, solver.ns
    base = default_params(ns)
    Ts = base[ns + "Ts"]
    v = base[ns + "v"]
    dval = base[ns + "d"]
    rng = np.random.default_rng(seed)

    xinit = np.array([0.0, 0.0, 0.5, 2.0, 1.0])[:, None]
    xWarm = np.tile(xinit, (1, T)) + 0.01 * rng.random((5, T))
    uWarm = 0.01 * rng.random((1, T - 1))
    hist = {"t": [], "x": [], "u": [], "dist": [], "status": [], "iters": []}
    t = 0.0
    for step in range(n_steps):
        params = dict(base)
        params[ns + "xinit"] = xinit
        sol = solver.solve(
            params, init={ns + "x": xWarm, ns + "u": uWarm},
            mu0=mu0, max_iter=max_iter,
        )
        hist["status"].append(sol.status)
        if sol.status != 0:
            break
        u0 = np.asarray(sol.outputs["u"])[:, 0:1]
        hist["t"].append(t)
        hist["x"].append(xinit[:, 0].copy())
        hist["u"].append(u0[:, 0].copy())
        hist["dist"].append(
            float(np.hypot(xinit[0, 0] - xinit[3, 0], xinit[1, 0] - xinit[4, 0]))
        )
        hist["iters"].append(sol.iters)
        # true plant: trapezoidal step matching the model
        th = xinit[2, 0]
        th_new = th + Ts * u0[0, 0]
        xinit = xinit + Ts * np.array(
            [
                [v * (np.cos(th) + np.cos(th_new)) / 2],
                [v * (np.sin(th) + np.sin(th_new)) / 2],
                [u0[0, 0]],
                [dval[0, 0]],
                [dval[1, 0]],
            ]
        )
        xWarm = np.asarray(sol.outputs["xWarm"])
        uWarm = np.asarray(sol.outputs["uWarm"])
        t += Ts
    return {k: np.asarray(v_) for k, v_ in hist.items()}


if __name__ == "__main__":
    solver = build_solver(T=40)
    hist = run_closed_loop(solver, n_steps=40)
    print("statuses:", set(hist["status"].tolist()))
    print("distance: start %.2f end %.2f" % (hist["dist"][0], hist["dist"][-1]))
