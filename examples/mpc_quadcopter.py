"""Quadcopter trajectory optimization — port of
/root/reference/examples/mpcmhe/mpc_quadcopter.m.

Minimum-effort point-to-point flight: position trajectory p (3, T) with
velocity/acceleration from the time-series differentiation operators,
double-integrator-with-drag dynamics driven by the thrust vector u,
thrust-magnitude bounds (with the reference's slack trick so an
infeasible initial guess still works), and a minimum-altitude constraint
(NED convention: altitude = -p_z)."""

from __future__ import annotations

import numpy as np

import tenscalc_tpu as tc
from tenscalc_tpu.ops.fns import sqrt as tsqrt
from tenscalc_tpu.ops.tseries import tsDerivative, tsDerivative2, tsIntegral


def build_solver(T=100, ns="quad_", **options):
    Ts = tc.variable(ns + "Ts", ())
    p = tc.variable(ns + "p", (3, T))
    u = tc.variable(ns + "u", (3, T))
    positive2 = tc.variable(ns + "positive2", (T,))  # slack for max thrust
    pinit = tc.variable(ns + "pinit", (3, 1))
    vinit = tc.variable(ns + "vinit", (3, 1))
    pdesired = tc.variable(ns + "pdesired", (3, 1))
    vdesired = tc.variable(ns + "vdesired", (3, 1))
    b_drag = tc.variable(ns + "b_drag", ())
    min_thrust = tc.variable(ns + "min_thrust", ())
    max_thrust = tc.variable(ns + "max_thrust", ())
    min_altitude = tc.variable(ns + "min_altitude", ())
    lambda_v = tc.variable(ns + "lambda_v", ())
    lambda_thrust = tc.variable(ns + "lambda_thrust", ())

    g = tc.constant(np.array([[0.0], [0.0], [9.8]]))  # NED gravity

    v = tsDerivative(p, Ts)
    a = tsDerivative2(p, Ts)

    dynamics = [
        a == -b_drag * v + g + u,     # (mpc_quadcopter.m:27)
        p[:, 0:1] == pinit,
        v[:, 0:1] == vinit,
    ]

    m_thrust = tsqrt((u**2).sum(axis=0))  # thrust magnitude per step
    constraints = [
        m_thrust >= min_thrust,
        # slack reformulation works even when the initial guess violates
        # the max-thrust bound (mpc_quadcopter.m:39-41)
        max_thrust - m_thrust == positive2,
        positive2 >= 0.0,
        p[2, :] <= -min_altitude,
    ]

    Jp2 = tsIntegral(((p - pdesired) ** 2).sum(axis=0), Ts)
    Jv2 = tsIntegral(((v - vdesired) ** 2).sum(axis=0), Ts)
    Jthrust = tsIntegral(m_thrust, Ts)
    J = Jp2 + lambda_v * Jv2 + lambda_thrust * Jthrust

    return tc.optimize(
        objective=J,
        optimizationVariables=[p, u, positive2],
        constraints=dynamics + constraints,
        parameters=[Ts, pinit, vinit, pdesired, vdesired, b_drag,
                    min_thrust, max_thrust, min_altitude,
                    lambda_v, lambda_thrust],
        outputExpressions={
            "J": J, "Jp2": Jp2, "u": u, "p": p, "m_thrust": m_thrust,
        },
        **{**dict(adjustAddEye2Hessian=True, scaleInequalities=True),
           **options},
    )


def default_params(ns="quad_"):
    """(mpc_quadcopter.m:115-132)"""
    return {
        ns + "Ts": 0.02,
        ns + "b_drag": 0.1,
        ns + "min_altitude": -0.1,
        ns + "min_thrust": 5.0,
        ns + "max_thrust": 20.0,
        ns + "lambda_v": 0.05,
        ns + "lambda_thrust": 0.05,
        ns + "pinit": np.zeros((3, 1)),
        ns + "vinit": np.zeros((3, 1)),
        ns + "pdesired": np.array([[0.0], [5.0], [-2.5]]),
        ns + "vdesired": np.zeros((3, 1)),
    }


def hover_init(T, ns="quad_"):
    """Strictly feasible initial guess: hover thrust, straight-line path."""
    params = default_params(ns)
    p0 = params[ns + "pinit"]
    pd = params[ns + "pdesired"]
    frac = np.linspace(0, 1, T)[None, :]
    p_init = p0 + (pd - p0) * frac
    u_init = np.tile(np.array([[0.0], [0.0], [-9.8]]), (1, T))
    pos2 = np.full(T, 20.0 - 9.8)
    return {
        ns + "p": p_init,
        ns + "u": u_init,
        ns + "positive2": pos2,
    }


if __name__ == "__main__":
    T = 50
    solver = build_solver(T)
    params = default_params()
    sol = solver.solve(params, init=hover_init(T), mu0=1e-1, max_iter=300)
    print(sol.describe(), "iters:", sol.iters)
    p = sol.outputs["p"]
    print("final position:", p[:, -1], "(target", params["quad_pdesired"][:, 0], ")")
    print("thrust range:", sol.outputs["m_thrust"].min(), sol.outputs["m_thrust"].max())
