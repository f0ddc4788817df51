"""MPC state-feedback control of a brushed DC motor — port of the
reference example /root/reference/examples/mpcmhe/mpc_dcmotor.m.

Continuous-time model (theta = shaft angle, omega = angular velocity):

    [dot x1] = [0  1][x1] + [0] u
    [dot x2]   [0  p][x2]   [k]

discretized with forward Euler over a T-step horizon; criterion is the
trapezoidal integral of (theta - ref)^2 + lambda_u * u^2 subject to box
constraints on states and input (mpc_dcmotor.m:52-143).

This is the framework's flagship/bench problem: the KKT matrix is
block-banded in the horizon index (dynamics couple x_k, x_{k+1}).
"""

from __future__ import annotations

import numpy as np

import tenscalc_tpu as tc
from tenscalc_tpu.ops.tseries import tsIntegral


def build_solver(T=30, nX=2, nU=1, namespace="", **options):
    """Create the receding-horizon MPC solver (mpc_dcmotor.m:62-143).

    ``namespace`` prefixes variable names so several instances can
    coexist in the shared shape registry.
    """
    p_ = namespace

    Ts = tc.variable(p_ + "Ts", ())
    x = tc.variable(p_ + "x", (nX, T))
    u = tc.variable(p_ + "u", (nU, T - 1))
    xinit = tc.variable(p_ + "xinit", (nX, 1))
    p = tc.variable(p_ + "p", ())
    k = tc.variable(p_ + "k", ())
    min_x = tc.variable(p_ + "min_x", (nX, 1))
    max_x = tc.variable(p_ + "max_x", (nX, 1))
    min_u = tc.variable(p_ + "min_u", (nU, 1))
    max_u = tc.variable(p_ + "max_u", (nU, 1))
    ref = tc.variable(p_ + "ref", (1, T))
    lambda_u = tc.variable(p_ + "lambda_u", ())

    # forward-Euler dynamics (mpc_dcmotor.m:77-84);
    # A = [0 1; 0 p], B = [0; k] expressed row-wise
    theta, omega = x[0:1, :], x[1:2, :]
    dynamics = [
        theta[:, 1:] == theta[:, :-1] + Ts * omega[:, :-1],
        omega[:, 1:] == omega[:, :-1] + Ts * (p * omega[:, :-1] + k * u),
        x[:, 0:1] == xinit,
    ]

    constraints = [
        x[:, 1:] >= min_x,  # broadcast over the horizon (repmat in ref)
        x[:, 1:] <= max_x,
        u >= min_u,
        u <= max_u,
    ]

    # criterion (mpc_dcmotor.m:100-106)
    Jx2 = tsIntegral(((theta - ref) ** 2).sum(axis=0), Ts)
    Ju2 = tsIntegral((u**2).sum(axis=0), Ts)
    J = Jx2 + lambda_u * Ju2

    # warm start for the next optimization: shift and move away from the
    # constraints (mpc_dcmotor.m:110-115)
    from tenscalc_tpu.expr import concat, lift
    import jax.numpy as jnp

    uWarm = concat([u[:, 1:], tc.Tzeros((nU, 1))], axis=1)
    xWarm = concat([x[:, 1:], x[:, -1:]], axis=1)
    clamp = lift(
        lambda v, lo, hi: jnp.clip(v, lo + 0.05 * (hi - lo), hi - 0.05 * (hi - lo))
    )
    xWarm = clamp(xWarm, min_x, max_x)
    uWarm = clamp(uWarm, min_u, max_u)

    outputs = {
        "J": J,
        "Jx2": Jx2,
        "Ju2": Ju2,
        "u": u,
        "x": x,
        "ref": ref,
        "xWarm": xWarm,
        "uWarm": uWarm,
    }

    solver = tc.optimize(
        objective=J,
        optimizationVariables=[u, x],
        constraints=dynamics + constraints,
        parameters=[Ts, p, k, xinit, ref, min_x, max_x, min_u, max_u, lambda_u],
        outputExpressions=outputs,
        **options,
    )
    solver.namespace = p_
    # NOTE: use distinct names — OptimizeSolver.nU is the packed primal
    # dimension and must not be clobbered
    solver.T = T
    solver.n_states = nX
    solver.n_controls = nU
    return solver


def default_params(T=30, namespace=""):
    """Physical parameters from the reference script (mpc_dcmotor.m:163-171)."""
    p_ = namespace
    return {
        p_ + "Ts": 0.1,
        p_ + "p": -2.0,
        p_ + "k": 1.0,
        p_ + "min_x": np.array([[-0.4], [-0.3]]),
        p_ + "max_x": np.array([[0.4], [0.3]]),
        p_ + "min_u": np.array([[-1.0]]),
        p_ + "max_u": np.array([[1.0]]),
        p_ + "lambda_u": 1.0 / 50.0,
    }


def reference_signal(t):
    """ref(t) = -.35*sign(sin(.5 t)) (mpc_dcmotor.m:161)."""
    return -0.35 * np.sign(np.sin(0.5 * np.asarray(t)))


def run_closed_loop(
    solver,
    n_steps=150,
    mu0=1e-3,
    max_iter=100,
    xinit=(0.2, 0.2),
    seed=0,
):
    """Receding-horizon loop with warm starting and exact discrete-time
    plant propagation (mpc_dcmotor.m:189-251 uses ode23; the linear
    system's exact ZOH discretization is used here)."""
    import scipy.linalg

    T, nX, nU = solver.T, solver.n_states, solver.n_controls
    ns = solver.namespace
    base = default_params(T, ns)
    Ts = base[ns + "Ts"]
    p, k = base[ns + "p"], base[ns + "k"]
    A = np.array([[0.0, 1.0], [0.0, p]])
    B = np.array([[0.0], [k]])
    # exact ZOH discretization via the augmented matrix exponential
    M = scipy.linalg.expm(np.block([[A, B], [np.zeros((nU, nX + nU))]]) * Ts)
    Ad, Bd = M[:nX, :nX], M[:nX, nX:]

    rng = np.random.default_rng(seed)
    xinit = np.asarray(xinit, float).reshape(nX, 1)
    xWarm = xinit + 0.01 * rng.random((nX, T))
    uWarm = 0.01 * rng.random((nU, T - 1))

    t = 0.0
    history = {
        "t": [], "x": [], "u": [], "ref": [], "J": [],
        "iters": [], "status": [], "time": [],
    }
    for step in range(n_steps):
        params = dict(base)
        params[ns + "ref"] = reference_signal(t + np.arange(T) * Ts)[None, :]
        params[ns + "xinit"] = xinit
        sol = solver.solve(
            params,
            init={ns + "u": uWarm, ns + "x": xWarm},
            mu0=mu0,
            max_iter=max_iter,
        )
        history["t"].append(t)
        history["x"].append(xinit[:, 0].copy())
        history["u"].append(np.asarray(sol.outputs["u"])[:, 0])
        history["ref"].append(float(np.asarray(sol.outputs["ref"])[0, 0]))
        history["J"].append(float(sol.outputs["J"]))
        history["iters"].append(sol.iters)
        history["status"].append(sol.status)
        history["time"].append(sol.time)
        if sol.status != 0:
            break
        # apply first control to the exact plant
        u0 = np.asarray(sol.outputs["u"])[:, 0:1]
        xinit = Ad @ xinit + Bd @ u0
        t += Ts
        xWarm = np.asarray(sol.outputs["xWarm"])
        uWarm = np.asarray(sol.outputs["uWarm"])
    history = {k: np.asarray(v) for k, v in history.items()}
    return history


if __name__ == "__main__":
    solver = build_solver()
    hist = run_closed_loop(solver, n_steps=50)
    print("steps:", len(hist["t"]), "statuses:", set(hist["status"].tolist()))
    print("mean iters:", hist["iters"].mean(), "mean solve ms:", 1e3 * hist["time"][1:].mean())
    err = np.abs(hist["x"][:, 0] - hist["ref"])
    print("tracking error (last 20 steps):", err[-20:].mean())
