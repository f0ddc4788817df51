"""Robust l1/l2 trajectory estimation — port of
/root/reference/examples/l1l2estimationCS.m.

Estimates a smooth position trajectory from integer-rounded noisy
measurements with outliers, by least squares on measurement noise and
acceleration (l2 variant), optionally adding sparse l1 noise /
acceleration terms that absorb outliers (l1l2 variant)."""

from __future__ import annotations

import numpy as np

import tenscalc_tpu as tc


def make_data(N=200, noise=1.0, p_outlier=0.1, seed=1):
    rng = np.random.default_rng(seed)
    t = np.cumsum(np.ceil(rng.random(N)))
    true_position = 5 * np.sin(np.abs(t - 100) / 5)
    measurement = np.round(true_position + noise * rng.standard_normal(N))
    k_outlier = np.nonzero(rng.random(N) < p_outlier)[0]
    measurement[k_outlier] = np.round(10 * rng.standard_normal(len(k_outlier)))
    dt1 = 1.0 / (t[1:] - t[:-1])
    return t, true_position, measurement, dt1, k_outlier


def build_l2(N=200, ns="l2e_", **options):
    measurement = tc.variable(ns + "measurement", (N,))
    dt1 = tc.variable(ns + "dt1", (N - 1,))
    w2acc = tc.variable(ns + "weight2acceleration", ())
    position = tc.variable(ns + "position", (N,))

    velocity = (position[1:] - position[:-1]) * dt1
    acceleration = (velocity[1:] - velocity[:-1]) * dt1[:-1]
    J = tc.norm2(measurement - position) + w2acc * tc.norm2(acceleration)
    return tc.optimize(
        objective=J,
        optimizationVariables=[position],
        parameters=[measurement, dt1, w2acc],
        outputExpressions={"J": J, "position": position},
        **options,
    )


def build_l1l2(N=200, ns="l12e_", **options):
    """l1 terms absorb outliers: epigraph variables noise1abs /
    acceleration1abs with box constraints (l1l2estimationCS.m:113-160)."""
    measurement = tc.variable(ns + "measurement", (N,))
    dt1 = tc.variable(ns + "dt1", (N - 1,))
    w2acc = tc.variable(ns + "weight2acceleration", ())
    w1acc = tc.variable(ns + "weight1acceleration", ())
    w1noise = tc.variable(ns + "weight1noise", ())
    position = tc.variable(ns + "position", (N,))
    noise1 = tc.variable(ns + "noise1", (N,))
    acc1 = tc.variable(ns + "acceleration1", (N - 2,))
    noise1abs = tc.variable(ns + "noise1abs", (N,))
    acc1abs = tc.variable(ns + "acceleration1abs", (N - 2,))

    velocity = (position[1:] - position[:-1]) * dt1
    acceleration = (velocity[1:] - velocity[:-1]) * dt1[:-1]
    noise2 = measurement - position - noise1
    acceleration2 = acceleration - acc1
    J = (
        tc.norm2(noise2)
        + w2acc * tc.norm2(acceleration2)
        + w1noise * noise1abs.sum()
        + w1acc * acc1abs.sum()
    )
    constraints = [
        noise1 <= noise1abs,
        noise1 >= -noise1abs,
        acc1 <= acc1abs,
        acc1 >= -acc1abs,
    ]
    return tc.optimize(
        objective=J,
        optimizationVariables=[position, noise1, acc1, noise1abs, acc1abs],
        constraints=constraints,
        parameters=[measurement, dt1, w2acc, w1acc, w1noise],
        outputExpressions={
            "J": J,
            "position": position,
            "noise1": noise1,
            "acceleration1": acc1,
        },
        **options,
    )


if __name__ == "__main__":
    N = 200
    t, true_pos, meas, dt1, outliers = make_data(N)
    s2 = build_l2(N)
    sol2 = s2.solve(
        {"l2e_measurement": meas, "l2e_dt1": dt1, "l2e_weight2acceleration": 10.0},
        init={"l2e_position": np.zeros(N)},
        mu0=0.1,
    )
    err2 = np.abs(sol2.outputs["position"] - true_pos).mean()
    print(f"l2:   {sol2.describe()} iters={sol2.iters} mean err={err2:.3f}")

    s12 = build_l1l2(N)
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
    )
    err12 = np.abs(sol12.outputs["position"] - true_pos).mean()
    print(f"l1l2: {sol12.describe()} iters={sol12.iters} mean err={err12:.3f}")
