"""Time-series calculus for discretizing continuous-time criteria/dynamics.

TPU-native equivalents of the reference helpers used inside MPC/MHE costs
and constraints: lib/tsDerivative.m (piecewise-quadratic differentiation),
lib/tsDerivative2.m, lib/tsIntegral.m (trapezoidal), lib/tsIntegrate.m,
lib/tsODE.m (forwardEuler/backwardEuler/midPoint constraint builders),
lib/tsCross.m, lib/tsDot.m, and the quaternion kinematics helpers
lib/tsQdot.m / lib/tsQdotStar.m / lib/tsRotation.m / lib/tsRotationT.m.

Convention matches the reference: a time series of n-vectors is an
``[n, N]`` array, one sample per column; ``ts`` is either a scalar
sampling period or an ``[N]`` vector of times.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..expr import Expr, lift, Constraint


def _is_scalar_ts(ts) -> bool:
    if isinstance(ts, Expr):
        return ts.ndim == 0
    return np.ndim(ts) == 0 or np.size(ts) == 1


def _trapezoid_weights(ts, N: int):
    """Trapezoid weights dt (reference lib/tsIntegral.m)."""
    if _is_scalar_ts(ts):
        w = jnp.concatenate(
            [jnp.array([0.5]), jnp.ones(N - 2), jnp.array([0.5])]
        )
        return ts * w
    t = jnp.ravel(ts)
    return 0.5 * jnp.concatenate(
        [t[1:2] - t[0:1], t[2:] - t[:-2], t[-1:] - t[-2:-1]]
    )


def tsIntegral(x, ts):
    """Trapezoidal integral over the last axis (reference lib/tsIntegral.m)."""

    def impl(x_, ts_):
        N = x_.shape[-1]
        dt = _trapezoid_weights(ts_, N)
        return jnp.tensordot(x_, dt, axes=([-1], [0]))

    return lift(impl)(x, ts)


def tsDerivative(x, ts):
    """Piecewise-quadratic time derivative (reference lib/tsDerivative.m).

    Interior points use the centered 3-point stencil for nonuniform grids;
    endpoints use one-sided quadratic stencils.  Output shape = input shape.
    """

    def impl(x_, ts_):
        N = x_.shape[-1]
        if _is_scalar_ts(ts_):
            h = ts_
            first = (-1.5 * x_[..., 0] + 2.0 * x_[..., 1] - 0.5 * x_[..., 2]) / h
            inner = (x_[..., 2:] - x_[..., :-2]) / (2.0 * h)
            last = (0.5 * x_[..., -3] - 2.0 * x_[..., -2] + 1.5 * x_[..., -1]) / h
            return jnp.concatenate(
                [first[..., None], inner, last[..., None]], axis=-1
            )
        t = jnp.ravel(ts_)
        t0, t1, t2 = t[:-2], t[1:-1], t[2:]
        # interior stencil coefficients (Lagrange-quadratic derivative at t1)
        c0 = (t1 - t2) / ((t0 - t2) * (t0 - t1))
        c1 = (t0 + t2 - 2 * t1) / ((t1 - t2) * (t0 - t1))
        c2 = (t0 - t1) / ((t0 - t2) * (t2 - t1))
        inner = c0 * x_[..., :-2] + c1 * x_[..., 1:-1] + c2 * x_[..., 2:]
        # one-sided stencils at the endpoints
        a, b, c = t[0], t[1], t[2]
        f0 = (
            (2 * a - b - c) / ((a - c) * (a - b)) * x_[..., 0]
            + (c - a) / ((b - c) * (a - b)) * x_[..., 1]
            + (a - b) / ((a - c) * (b - c)) * x_[..., 2]
        )
        a, b, c = t[-3], t[-2], t[-1]
        fN = (
            (c - b) / ((a - b) * (a - c)) * x_[..., -3]
            + (c - a) / ((b - a) * (b - c)) * x_[..., -2]
            + (2 * c - a - b) / ((c - a) * (c - b)) * x_[..., -1]
        )
        return jnp.concatenate([f0[..., None], inner, fN[..., None]], axis=-1)

    return lift(impl)(x, ts)


def tsDerivative2(x, ts):
    """Second time derivative (reference lib/tsDerivative2.m)."""

    def impl(x_, ts_):
        if _is_scalar_ts(ts_):
            inv = 1.0 / (ts_ * ts_)
            core = x_[..., :-2] - 2.0 * x_[..., 1:-1] + x_[..., 2:]
            first = (x_[..., 0] - 2.0 * x_[..., 1] + x_[..., 2])[..., None]
            last = (x_[..., -3] - 2.0 * x_[..., -2] + x_[..., -1])[..., None]
            return inv * jnp.concatenate([first, core, last], axis=-1)
        # nonuniform grid: derivative of the quadratic through 3 points (constant)
        t = jnp.ravel(ts_)
        t0, t1, t2 = t[:-2], t[1:-1], t[2:]
        c0 = 2.0 / ((t0 - t1) * (t0 - t2))
        c1 = 2.0 / ((t1 - t0) * (t1 - t2))
        c2 = 2.0 / ((t2 - t0) * (t2 - t1))
        core = c0 * x_[..., :-2] + c1 * x_[..., 1:-1] + c2 * x_[..., 2:]
        return jnp.concatenate(
            [core[..., :1], core, core[..., -1:]], axis=-1
        )

    return lift(impl)(x, ts)


def tsIntegrate(x, x0, ts, method: str = "euler"):
    """Cumulative integral time series (reference lib/tsIntegrate.m)."""

    def impl(x_, x0_, ts_):
        x0c = jnp.reshape(x0_, x_.shape[:-1] + (1,))
        if _is_scalar_ts(ts_):
            if method == "euler":
                acc = ts_ * jnp.cumsum(x_[..., :-1], axis=-1)
            elif method in ("trapesoidal", "trapezoidal"):
                acc = (ts_ / 2.0) * jnp.cumsum(
                    x_[..., :-1] + x_[..., 1:], axis=-1
                )
            else:
                raise ValueError(f"tsIntegrate: unknown method {method!r}")
        else:
            t = jnp.ravel(ts_)
            dt = t[1:] - t[:-1]
            if method == "euler":
                acc = jnp.cumsum(dt * x_[..., :-1], axis=-1)
            elif method in ("trapesoidal", "trapezoidal"):
                acc = jnp.cumsum(0.5 * dt * (x_[..., :-1] + x_[..., 1:]), axis=-1)
            else:
                raise ValueError(f"tsIntegrate: unknown method {method!r}")
        return jnp.concatenate([x0c, x0c + acc], axis=-1)

    return lift(impl)(x, x0, ts)


def tsODE(x, uZOH, uC, ts, fun, method: str = "forwardEuler") -> Constraint:
    """Build an equality constraint encoding ``dot x = f(x, uZOH, uC, t)``
    (reference lib/tsODE.m:1-90).

    ``fun(x, uZOH, uC, t)`` must accept Exprs (or arrays) with the time
    axis last.  Returns a :class:`Constraint`.
    """
    if method == "forwardEuler":
        def step(xs, us, ds, tprev, dt):
            return xs + _scale_time(dt, fun(xs, us, ds, tprev))
        lhs = x[..., 1:]
        rhs = step(
            x[..., :-1],
            uZOH[..., :-1] if uZOH is not None else None,
            uC[..., :-1] if uC is not None else None,
            _times(ts, x, start=0),
            _dts(ts, x),
        )
        return lhs == rhs
    if method == "backwardEuler":
        lhs = x[..., 1:]
        rhs = x[..., :-1] + _scale_time(
            _dts(ts, x),
            fun(
                x[..., 1:],
                uZOH[..., :-1] if uZOH is not None else None,
                uC[..., 1:] if uC is not None else None,
                _times(ts, x, start=1),
            ),
        )
        return lhs == rhs
    if method == "midPoint":
        lhs = tsDerivative(x, ts)[..., :-1]
        rhs = fun(x, uZOH, uC, _times(ts, x, start=1))[..., :-1]
        return lhs == rhs
    raise ValueError(f"tsODE: method {method!r} not implemented")


def _dts(ts, x):
    if _is_scalar_ts(ts):
        return ts
    f = lift(lambda t: jnp.ravel(t)[1:] - jnp.ravel(t)[:-1])
    return f(ts)


def _times(ts, x, start: int):
    N = x.shape[-1]
    if _is_scalar_ts(ts):
        f = lift(lambda t: t * jnp.arange(start, N - 1 + start))
        return f(ts)
    if start == 0:
        return lift(lambda t: jnp.ravel(t)[:-1])(ts)
    return lift(lambda t: jnp.ravel(t)[1:])(ts)


def _scale_time(dt, v):
    """Multiply a time series by per-step dt (scalar or [N-1] vector)."""
    if isinstance(dt, (int, float)) or (not isinstance(dt, Expr) and np.ndim(dt) == 0):
        return dt * v
    if isinstance(dt, Expr) and dt.ndim == 0:
        return dt * v
    return lift(lambda d, v_: d * v_)(dt, v)


# ---------------------------------------------------------------------------
# vector / quaternion helpers
# ---------------------------------------------------------------------------

def tsCross(x1, x2, ts=None):
    """Columnwise cross product of 3-vector time series (lib/tsCross.m)."""
    return lift(lambda a, b: jnp.cross(a, b, axis=0))(x1, x2)


def tsDot(x1, x2, ts=None):
    """Columnwise dot product → [N] (reference lib/tsDot.m)."""
    return lift(lambda a, b: jnp.sum(a * b, axis=0))(x1, x2)


def tsQdot(q1, q2, ts=None):
    """Columnwise quaternion product (reference lib/tsQdot.m).

    Supports full(4) x full(4), full(4) x pure(3), pure(3) x full(4).
    Scalar part first, as in the reference.
    """

    def impl(a, b):
        if a.shape[0] == 4 and b.shape[0] == 4:
            a0, av = a[0:1], a[1:4]
            b0, bv = b[0:1], b[1:4]
            s = a0 * b0 - jnp.sum(av * bv, axis=0, keepdims=True)
            v = a0 * bv + b0 * av + jnp.cross(av, bv, axis=0)
            return jnp.concatenate([s, v], axis=0)
        if a.shape[0] == 4 and b.shape[0] == 3:
            a0, av = a[0:1], a[1:4]
            s = -jnp.sum(av * b, axis=0, keepdims=True)
            v = a0 * b + jnp.cross(av, b, axis=0)
            return jnp.concatenate([s, v], axis=0)
        if a.shape[0] == 3 and b.shape[0] == 4:
            b0, bv = b[0:1], b[1:4]
            s = -jnp.sum(a * bv, axis=0, keepdims=True)
            v = b0 * a + jnp.cross(a, bv, axis=0)
            return jnp.concatenate([s, v], axis=0)
        raise ValueError("tsQdot: inputs must be time series of 3- or 4-vectors")

    return lift(impl)(q1, q2)


def tsQdotStar(q1, q2, ts=None):
    """Columnwise conj(q1) * q2 (reference lib/tsQdotStar.m)."""

    def conj(a):
        return jnp.concatenate([a[0:1], -a[1:4]], axis=0)

    return tsQdot(lift(conj)(q1), q2)


def tsRotation(q, x, ts=None):
    """Rotate 3-vector series x by unit-quaternion series q: q*x*conj(q)
    (reference lib/tsRotation.m)."""

    def impl(q_, x_):
        q0, qv = q_[0:1], q_[1:4]
        t = 2.0 * jnp.cross(qv, x_, axis=0)
        return x_ + q0 * t + jnp.cross(qv, t, axis=0)

    return lift(impl)(q, x)


def tsRotationT(q, x, ts=None):
    """Inverse rotation conj(q)*x*q (reference lib/tsRotationT.m)."""

    def impl(q_, x_):
        q0, qv = q_[0:1], -q_[1:4]
        t = 2.0 * jnp.cross(qv, x_, axis=0)
        return x_ + q0 * t + jnp.cross(qv, t, axis=0)

    return lift(impl)(q, x)
