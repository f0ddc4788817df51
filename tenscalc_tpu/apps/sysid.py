"""Nonlinear system identification / state estimation over a horizon —
the analog of lib/@TCsysid (TCsysid.m, createSolver.m, callSolver.m).

Given sampled inputs u_k and measurements y_k, jointly estimates model
parameters theta (with optional bounds and scaling, TCsysid parameter
tables) and the state trajectory, subject to the discrete-time dynamics
x_{k+1} = f(x_k, u_k, theta) (+ optional process noise), minimizing the
negative log joint of the Gaussian noise model (TCsysid.logNormal,
TCsysid.m:324-326):

    logNormal(e, w) = 0.5 log(2*pi) numel(e) - 0.5 numel(e) log(w)
                      + 0.5 w ||e||^2        (negative log pdf, w = 1/sigma^2)

Noise model knobs (mirroring addMeasurement / addDynamics,
TCsysid.m:480-640):

* ``noise_std``: measurement noise sigma.  ``0`` = plain least squares
  (legacy), ``sigma > 0`` = known variance, ``"estimate"`` = unknown —
  the inverse variance becomes an optimization variable with the
  -0.5 N log(w) likelihood term (nStochasticInputsUnknownVariance).
* ``disturbance_std``: process noise sigma.  ``0`` = hard equality
  dynamics (default), ``sigma > 0`` / ``"estimate"`` = soft dynamics
  with penalized disturbance v_k = x_{k+1} - f(x_k, u_k, theta).

Forecasting (addMeasurementForecast, TCsysid.m:542-565): output
predictions at requested time instants, with Laplace-approximation
confidence intervals — the Hessian H of the negative log joint over the
marginalized variables (states + forecast variables) gives
forecast variance = diag(H^{-1})_forecast and
``logMarginal = logJoint + 0.5 logdet(H) - 0.5 nH log(2*pi)``
(createSolver.m:93-167)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from ..expr import Expr, Variable, variable
from ..ipm.options import SolverOptions
from ..ops.fns import norm2, log as tclog


@dataclasses.dataclass
class ParameterSpec:
    """One estimated parameter (TCsysid parameters table: bounds+scaling)."""

    name: str
    shape: Tuple[int, ...] = ()
    lower: Optional[float] = None
    upper: Optional[float] = None
    scale: float = 1.0
    prior: Optional[float] = None
    prior_weight: float = 0.0


_LOG2PI = float(np.log(2.0 * np.pi))


def _is_estimate(v) -> bool:
    return isinstance(v, str) and v == "estimate"


class Sysid:
    def __init__(
        self,
        f: Callable,   # f(x, u, **theta) -> next state, columnwise over time
        g: Callable,   # g(x, **theta) -> output, columnwise over time
        n_states: int,
        n_outputs: int,
        n_inputs: int,
        horizon: int,
        parameters: Sequence[ParameterSpec],
        name: str = "sysid",
        state_bounds: Optional[Tuple[float, float]] = None,
        noise_std: Union[float, str] = 0.0,
        disturbance_std: Union[float, str] = 0.0,
        forecast_instants: Optional[Sequence[int]] = None,
        options: Optional[SolverOptions] = None,
        **option_kwargs,
    ):
        from ..api import optimize

        self.nX, self.nY, self.nU, self.N = n_states, n_outputs, n_inputs, horizon
        self.specs = list(parameters)
        self._name = name
        self._f, self._g = f, g
        self.noise_std = noise_std
        self.disturbance_std = disturbance_std
        self.forecast_instants = (
            None if forecast_instants is None else np.asarray(forecast_instants, int)
        )
        if self.forecast_instants is not None and not self._soft_dynamics:
            raise ValueError(
                "forecast confidence intervals need a stochastic model: "
                "set disturbance_std > 0 or 'estimate' (the Laplace "
                "marginalization over states is singular under hard "
                "equality dynamics)"
            )

        x = variable(f"{name}_x", (n_states, horizon))
        u = variable(f"{name}_u", (n_inputs, horizon))
        y = variable(f"{name}_y", (n_outputs, horizon))
        self._xname, self._uname, self._yname = x.name, u.name, y.name

        theta_vars = {}
        constraints = []
        reg_terms = []
        for spec in self.specs:
            tv = variable(f"{name}_{spec.name}", spec.shape)
            theta_vars[spec.name] = tv
            if spec.lower is not None:
                constraints.append(tv >= spec.lower)
            if spec.upper is not None:
                constraints.append(tv <= spec.upper)
            if spec.prior is not None and spec.prior_weight > 0:
                reg_terms.append(spec.prior_weight * norm2(tv - spec.prior))
        self._theta_vars = theta_vars

        extra_vars = []
        nMeas = n_outputs * horizon
        noise = y - g(x, **theta_vars)

        # -- measurement noise term ------------------------------------
        if _is_estimate(noise_std):
            wY = variable(f"{name}_noiseInvVariance", ())
            extra_vars.append(wY)
            constraints.append(wY >= 1e-8)
            constraints.append(wY <= 1e12)
            J = 0.5 * wY * norm2(noise) - 0.5 * nMeas * tclog(wY)
            self._wY = wY.name
        elif noise_std and float(noise_std) > 0.0:
            wY = 1.0 / float(noise_std) ** 2
            J = 0.5 * wY * norm2(noise) - 0.5 * nMeas * float(np.log(wY))
            self._wY = wY
        else:
            # legacy plain least squares
            J = norm2(noise) / horizon
            self._wY = None

        # -- dynamics: hard equality or penalized disturbance ----------
        v = x[:, 1:] - f(x[:, :-1], u[:, :-1], **theta_vars)
        nDist = n_states * (horizon - 1)
        if _is_estimate(disturbance_std):
            wV = variable(f"{name}_disturbanceInvVariance", ())
            extra_vars.append(wV)
            constraints.append(wV >= 1e-8)
            constraints.append(wV <= 1e12)
            J = J + 0.5 * wV * norm2(v) - 0.5 * nDist * tclog(wV)
            self._wV = wV.name
        elif disturbance_std and float(disturbance_std) > 0.0:
            wV = 1.0 / float(disturbance_std) ** 2
            J = J + 0.5 * wV * norm2(v) - 0.5 * nDist * float(np.log(wV))
            self._wV = wV
        else:
            constraints.append(v == 0.0)
            self._wV = None

        if state_bounds is not None:
            lo, hi = state_bounds
            constraints += [x >= lo, x <= hi]
        for t in reg_terms:
            J = J + t

        outputs = {"J": J, "x": x}
        if self._probabilistic:
            # logJoint = negative log joint incl. the Gaussian constants
            # (createSolver.m:105-107 logJoint; constants from logNormal)
            nTot = nMeas + (nDist if self._soft_dynamics else 0)
            outputs["logJoint"] = J + 0.5 * _LOG2PI * nTot
        outputs.update(theta_vars)
        if _is_estimate(noise_std):
            # TCsysid.m:536 outputs 1/sqrt(noiseInvVariance)
            from ..ops.fns import sqrt as tcsqrt

            outputs["noiseStdDev"] = 1.0 / tcsqrt(wY)
        self._extra_names = [ev.name for ev in extra_vars]

        self.solver = optimize(
            objective=J,
            optimizationVariables=[x] + list(theta_vars.values()) + extra_vars,
            constraints=constraints,
            parameters=[u, y],
            outputExpressions=outputs,
            options=options,
            **option_kwargs,
        )

    # -- noise-model helpers -------------------------------------------
    @property
    def _soft_dynamics(self) -> bool:
        return _is_estimate(self.disturbance_std) or (
            not isinstance(self.disturbance_std, str)
            and float(self.disturbance_std) > 0.0
        )

    @property
    def _probabilistic(self) -> bool:
        return _is_estimate(self.noise_std) or (
            not isinstance(self.noise_std, str) and float(self.noise_std) > 0.0
        )

    def fit(
        self,
        u_seq,
        y_seq,
        theta0: Optional[Mapping[str, np.ndarray]] = None,
        x0=None,
        mu0: float = 1.0,
        max_iter: int = 300,
    ):
        """Estimate (theta, x) from data.  ``x0`` defaults to a rough
        trajectory initialization from the measurements when g is the
        identity-like map, else zeros."""
        u_seq = np.asarray(u_seq, float).reshape(self.nU, self.N)
        y_seq = np.asarray(y_seq, float).reshape(self.nY, self.N)
        init = {}
        if x0 is None:
            x0 = np.zeros((self.nX, self.N))
            x0[: min(self.nX, self.nY), :] = y_seq[: min(self.nX, self.nY), :]
        init[self._xname] = np.asarray(x0, float)
        theta0 = dict(theta0 or {})
        for spec in self.specs:
            v = theta0.get(spec.name)
            if v is None:
                lo = spec.lower if spec.lower is not None else 0.0
                hi = spec.upper if spec.upper is not None else lo + 1.0
                v = np.full(spec.shape, 0.5 * (lo + hi))
            init[f"{self._name}_{spec.name}"] = np.asarray(v, float)
        for nm in self._extra_names:
            init[nm] = np.asarray(1.0)
        sol = self.solver.solve(
            {self._uname: u_seq, self._yname: y_seq},
            init=init,
            mu0=mu0,
            max_iter=max_iter,
        )
        estimates = {spec.name: sol.outputs[spec.name] for spec in self.specs}
        self._last_fit = (u_seq, y_seq, sol)
        return sol, estimates

    # -- Laplace marginalization + forecasting --------------------------
    def _inv_variances(self, sol):
        wY = (
            float(np.asarray(sol.variables[self._wY]))
            if isinstance(self._wY, str)
            else self._wY
        )
        wV = (
            float(np.asarray(sol.variables[self._wV]))
            if isinstance(self._wV, str)
            else self._wV
        )
        return wY, wV

    def forecast(self, sol=None, u_seq=None, y_seq=None):
        """Measurement forecasts with Laplace confidence intervals.

        Returns ``{"mean": (nY, nf), "std": (nY, nf), "logJoint": s,
        "logMarginal": s, "logdetH": s}``.  Mirrors the reference: the
        forecast variables are appended to the marginalization pack
        together with the states, H = hessian of the negative log joint
        over that pack (createSolver.m:133-167), forecast variance =
        the forecast block of diag(H^{-1}), and
        logMarginal = logJoint + 0.5 logdet H - 0.5 nH log(2 pi)."""
        import jax
        import jax.numpy as jnp

        if self.forecast_instants is None:
            raise ValueError("construct Sysid with forecast_instants=[...]")
        if sol is None:
            u_seq, y_seq, sol = self._last_fit
        inst = self.forecast_instants
        nX, N, nY = self.nX, self.N, self.nY
        nf = nY * len(inst)
        wY, wV = self._inv_variances(sol)
        theta = {
            spec.name: jnp.asarray(sol.variables[f"{self._name}_{spec.name}"])
            for spec in self.specs
        }
        u_j = jnp.asarray(u_seq)
        y_j = jnp.asarray(y_seq)
        f_, g_ = self._f, self._g

        def neg_log_joint(z):
            xs = z[: nX * N].reshape(nX, N)
            fvec = z[nX * N :]
            noise = y_j - g_(xs, **theta)
            nlj = 0.5 * wY * jnp.sum(noise**2) - 0.5 * noise.size * jnp.log(wY)
            v = xs[:, 1:] - f_(xs[:, :-1], u_j[:, :-1], **theta)
            nlj += 0.5 * wV * jnp.sum(v**2) - 0.5 * v.size * jnp.log(wV)
            fmean = g_(xs, **theta)[:, inst].ravel()
            nlj += 0.5 * wY * jnp.sum((fvec - fmean) ** 2) - 0.5 * nf * jnp.log(wY)
            nlj += 0.5 * _LOG2PI * (noise.size + v.size + nf)
            return nlj

        xstar = jnp.asarray(sol.variables[self._xname]).ravel()
        fstar = jnp.asarray(self._g(np.asarray(sol.variables[self._xname]).reshape(nX, N), **{k: np.asarray(v) for k, v in theta.items()}))[:, inst]
        z0 = jnp.concatenate([xstar, jnp.asarray(fstar).ravel()])
        H = jax.hessian(neg_log_joint)(z0)
        nH = z0.size
        sign, logdetH = jnp.linalg.slogdet(H)
        Hinv = jnp.linalg.inv(H)
        fvar = jnp.diag(Hinv)[nX * N :].reshape(nY, len(inst))
        # reference logJoint excludes the forecast PDFs
        # (createSolver.m:105-111: logJoint vs logJointForecasts); at the
        # optimum the forecast noise is 0, leaving only its constant part
        log_joint = neg_log_joint(z0) - 0.5 * nf * (_LOG2PI - jnp.log(wY))
        log_marginal = log_joint + 0.5 * logdetH - 0.5 * nH * _LOG2PI
        return {
            "mean": np.asarray(fstar),
            "std": np.asarray(jnp.sqrt(fvar)),
            "logJoint": float(log_joint),
            "logMarginal": float(log_marginal),
            "logdetH": float(logdetH),
            "H_sign": float(sign),
        }
