"""Nonlinear system identification / state estimation over a horizon —
the analog of lib/@TCsysid (TCsysid.m, createSolver.m, callSolver.m).

Given sampled inputs u_k and measurements y_k, jointly estimates model
parameters theta (with optional bounds and scaling, TCsysid parameter
tables) and the state trajectory, subject to the discrete-time dynamics
x_{k+1} = f(x_k, u_k, theta) as hard equality constraints, minimizing
the measurement misfit  sum_k || y_k - g(x_k, theta) ||^2  (+ optional
Tikhonov regularization of theta around a prior)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Mapping, Optional, Sequence, Tuple

import numpy as np

from ..expr import Expr, Variable, variable
from ..ipm.options import SolverOptions
from ..ops.fns import norm2


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
        options: Optional[SolverOptions] = None,
        **option_kwargs,
    ):
        from ..api import optimize

        self.nX, self.nY, self.nU, self.N = n_states, n_outputs, n_inputs, horizon
        self.specs = list(parameters)
        self._name = name

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

        # dynamics as hard equality constraints over the horizon
        constraints.append(
            x[:, 1:] == f(x[:, :-1], u[:, :-1], **theta_vars)
        )
        if state_bounds is not None:
            lo, hi = state_bounds
            constraints += [x >= lo, x <= hi]

        J = norm2(y - g(x, **theta_vars)) / horizon
        for t in reg_terms:
            J = J + t

        outputs = {"J": J, "x": x}
        outputs.update(theta_vars)

        self.solver = optimize(
            objective=J,
            optimizationVariables=[x] + list(theta_vars.values()),
            constraints=constraints,
            parameters=[u, y],
            outputExpressions=outputs,
            options=options,
            **option_kwargs,
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
        sol = self.solver.solve(
            {self._uname: u_seq, self._yname: y_seq},
            init=init,
            mu0=mu0,
            max_iter=max_iter,
        )
        estimates = {spec.name: sol.outputs[spec.name] for spec in self.specs}
        return sol, estimates
