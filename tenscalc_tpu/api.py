"""Problem-definition API — the generator layer (reference L5).

:func:`optimize` is the TPU-native analog of ``cmex2optimizeCS`` /
``class2optimizeCS`` (lib/cmex2optimizeCS.m:10-24): it takes a symbolic
objective, optimization variables, constraints, parameters and output
expressions, and returns a solver object whose ``solve`` method runs the
compiled primal-dual IPM.  Where the reference generates and compiles C
code per problem (taking 10-200 s, README.md:104-109), here "generation"
is a jit trace: the first solve compiles, later solves hit the XLA
executable cache — and the compiled solve can additionally be vmapped
over batches of parameter values and sharded over device meshes.

:func:`minmax` ↔ cmex2minmaxCS, :func:`equilibrium` ↔
cmex2equilibriumLatentCS, :func:`compute` ↔ cmex2compute.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .expr import Constraint, Expr, Variable
from .ipm.options import SolverOptions
from .ipm.solver import IPMFunctions, IPMResult, build_ipm
from .ipm.status import describe_status
from .pack import Packing


def _ensure_x64(opts: SolverOptions) -> None:
    if opts.dtype == "float64" and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)


def _prefer_fleet() -> bool:
    """Whether kkt_backend='auto' should select the batch-in-lanes
    Pallas fleet kernels.  True on real TPU hardware (where XLA's
    batched small-matrix linalg is uniformly slow — CLAUDE.md round-2
    findings); on CPU the kernels would run in interpret mode, so auto
    picks the pure-XLA structured paths instead.  Overridable for tests
    via TENSCALC_AUTO_FLEET=1/0."""
    import os

    env = os.environ.get("TENSCALC_AUTO_FLEET")
    if env in ("0", "1"):
        return env == "1"
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _split_constraints(constraints) -> tuple[list[Expr], list[Expr]]:
    """Split into (F >= 0 list, G == 0 list)
    (reference: lib/private/parseConstraints.m:74-135)."""
    Fs: list[Expr] = []
    Gs: list[Expr] = []
    for c in constraints or []:
        if not isinstance(c, Constraint):
            raise TypeError(
                f"constraints must be built with >=, <= or == on Expr; got {c!r}"
            )
        (Fs if c.kind == "ineq" else Gs).append(c.expr)
    return Fs, Gs


def _stack_eval(exprs: Sequence[Expr], env) -> jax.Array:
    if not exprs:
        return jnp.zeros((0,))
    return jnp.concatenate([jnp.ravel(e(env)) for e in exprs])


@dataclasses.dataclass
class Solution:
    """Result of one solve (analog of the reference's
    [status,iter,time]=solve(...) plus getOutputs)."""

    status: int
    iters: int
    outputs: Dict[str, Any]
    # solver internals
    variables: Dict[str, Any]
    mu: float
    norminf_grad: float
    norminf_eq: float
    gap: float
    objective: float
    lam: Any
    nu: Any
    time: float = 0.0
    # per-iteration trace (profiling=True): array [iters, 8] with columns
    # tenscalc_tpu.ipm.solver.HISTORY_COLUMNS
    history: Any = None
    # scaling factors used internally (to unscale duals post hoc)
    scale_ineq: Any = None
    scale_cost: Any = None

    @property
    def ok(self) -> bool:
        return int(self.status) == 0

    def describe(self) -> str:
        return describe_status(int(self.status))


class OptimizeSolver:
    """A compiled constrained-minimization solver instance.

    Mirrors the generated class from cmex2optimizeCS: parameter sets
    (``setP_*``) become entries of the ``parameters`` dict, primal
    initialization (``setV_*``) becomes ``init``, and
    ``outputExpressions`` are evaluated at the optimum.
    """

    def __init__(
        self,
        objective: Expr,
        optimizationVariables: Sequence[Variable],
        constraints: Sequence[Constraint] = (),
        parameters: Sequence[Variable] = (),
        outputExpressions: Optional[Mapping[str, Expr]] = None,
        options: Optional[SolverOptions] = None,
        kkt_mesh=None,
        **option_kwargs,
    ):
        self.opts = (
            (options or SolverOptions())
            .replace(**option_kwargs)
            .resolved("optimize")
        )
        _ensure_x64(self.opts)
        dt = self.opts.np_dtype
        self.kkt_mesh = kkt_mesh

        self.variables = list(optimizationVariables)
        self.parameters = list(parameters)
        self.objective = objective
        self.outputExpressions = dict(outputExpressions or {})
        self.packing = Packing(self.variables)

        F_exprs, G_exprs = _split_constraints(constraints)
        self.nU = self.packing.total
        self.nF = int(sum(e.size for e in F_exprs))
        self.nG = int(sum(e.size for e in G_exprs))

        param_names = {p.name for p in self.parameters}
        var_names = set(self.packing.names)
        # validate dependencies (analog of checkParameters.m)
        for e in [objective] + F_exprs + G_exprs:
            extra = e.deps - param_names - var_names
            if extra:
                raise ValueError(
                    f"expression depends on undeclared symbols {sorted(extra)}; "
                    "declare them as parameters or optimization variables"
                )

        packing = self.packing

        def f_fn(u, penv):
            env = {**penv, **packing.unpack(u)}
            return jnp.asarray(objective(env), dt).reshape(())

        def F_fn(u, penv):
            env = {**penv, **packing.unpack(u)}
            return _stack_eval(F_exprs, env).astype(dt)

        def G_fn(u, penv):
            env = {**penv, **packing.unpack(u)}
            return _stack_eval(G_exprs, env).astype(dt)

        self._fns = IPMFunctions(f=f_fn, F=F_fn, G=G_fn)
        # build-time invariance analysis: QP-like problems get their
        # Hessian / constraint Jacobians hoisted out of the IPM loop
        # (ipm/hoist.py; the reference's dependency-group reactivity)
        from .ipm.hoist import analyze_hoistable

        self._hoist = analyze_hoistable(
            self._fns, self.nU, self.nF, self.nG, dt,
            {p.name: p.shape for p in self.parameters},
        )
        # scale-independence of the hoisted Hessian (band fast path can
        # then evaluate it at unit scales + dummy iterate -> a pure
        # function of the parameters, shared across fleets)
        from .ipm.hoist import analyze_scale_free

        self._hoist_scale_free = bool(self._hoist[0]) and analyze_scale_free(
            self._fns, self.nU, self.nF, self.nG, dt,
            {p.name: p.shape for p in self.parameters},
            taint_ineq=bool(self.opts.scaleInequalities) and self.nF > 0,
            taint_cost=self.opts.scaleCost > 0,
        )
        # parameter-VALUE dependencies of each hoisted derivative (band
        # fast path masks the irrelevant parameters to constants so the
        # hoisted tensors stay batch-free under vmapped fleets)
        self._hoist_param_deps = None
        if self._hoist_scale_free and self._hoist[1]:
            from .ipm.hoist import param_value_deps

            try:
                penv_d = {
                    p.name: jnp.zeros(p.shape, dt) for p in self.parameters
                }
                u_d = jnp.zeros((self.nU,), dt)
                nu_d = jnp.zeros((self.nG,), dt)
                lam_d = jnp.ones((self.nF,), dt)
                fns_ = self._fns

                def Hfun(penv, u, nu, lam):
                    def lagr(uu):
                        val = fns_.f(uu, penv)
                        if self.nF > 0:
                            val = val - lam @ fns_.F(uu, penv)
                        if self.nG > 0:
                            val = val + nu @ fns_.G(uu, penv)
                        return val

                    return jax.jacfwd(jax.grad(lagr))(u)

                h_deps = param_value_deps(Hfun, penv_d, u_d, nu_d, lam_d)
                fu_deps = param_value_deps(
                    lambda penv, u: jax.jacfwd(
                        lambda uu: fns_.F(uu, penv)
                    )(u),
                    penv_d, u_d,
                ) if self.nF > 0 else set()
                gu_deps = param_value_deps(
                    lambda penv, u: jax.jacfwd(
                        lambda uu: fns_.G(uu, penv)
                    )(u),
                    penv_d, u_d,
                ) if self.nG > 0 else set()
                self._hoist_param_deps = (h_deps, fu_deps, gu_deps)
            except Exception:  # pragma: no cover - analysis best-effort
                self._hoist_param_deps = None
        self._solve_raw = build_ipm(
            self._fns, self.nU, self.nF, self.nG, self.opts,
            hoist=self._hoist,
        )
        self.kkt_plan = None
        self.kkt_backend_resolved = "dense"
        self._kkt_solver = None
        self._band_plan = None
        if self.opts.kkt_backend == "ldl":
            from .kkt.dense import kkt_factorize

            blk = self.opts.ldl_block
            self._install_backend(
                lambda WW: kkt_factorize(
                    WW, need_inertia=self.opts.useInertia, block=blk,
                    force_ldl=True,
                ),
                "ldl",
            )
        elif self.opts.kkt_backend == "pallas":
            from .kkt.pallas_ldl import pallas_kkt_factorize

            interp = jax.default_backend() != "tpu"
            # pivot clamping (Cheng-Higham) keeps the f32 kernel from
            # collapsing on IPM endgame KKT matrices (same setting as the
            # 'ldl' backend in kkt/dense.py)
            self._install_backend(
                lambda WW: pallas_kkt_factorize(
                    WW, interpret=interp, clamp=1e-7
                ),
                "pallas",
            )
        elif self.opts.kkt_backend == "fleet":
            self._use_fleet_dense()
        elif self.opts.kkt_backend in (
            "auto", "tridiag", "cyclic", "spike", "fleet_banded",
        ):
            self._plan_structure()
        # single-instance solve: guard-less build (the lax.cond(st.done)
        # freeze wrapper is vmap-only machinery and costs ~6 us/iter of
        # TPU sequencing); _solve_raw keeps the guard for vmapped fleets
        self._solve_jit = jax.jit(
            build_ipm(
                self._fns, self.nU, self.nF, self.nG, self.opts,
                hoist=self._hoist,
                kkt_solver=self._kkt_solver,
                fleet_init=self.kkt_backend_resolved
                in ("fleet", "fleet_banded"),
                batch_guard=False,
                band_plan=getattr(self, "_band_plan", None),
                hoist_scale_free=self._hoist_scale_free,
                hoist_param_deps=self._hoist_param_deps,
            )
        )
        if self.opts.verboseLevel >= 2:
            self._report_kkt_plan()

    def _report_kkt_plan(self) -> None:
        """Planner report, the analog of the reference's codegen
        statistics (lib/@csparse/sparsity_ldl.m:290-297)."""
        nK = self.nU + self.nG + (
            0 if self.opts.smallerNewtonMatrix else self.nF
        )
        msg = (
            f"[kkt plan] nU={self.nU} nG={self.nG} nF={self.nF} nK={nK} "
            f"variant={'condensed' if self.opts.smallerNewtonMatrix else 'large'} "
            f"backend={self.kkt_backend_resolved}"
        )
        plan = self.kkt_plan
        if plan is not None:
            for attr in ("bandwidth", "block", "n_blocks", "n_arrow"):
                v = getattr(plan, attr, None)
                if v is not None:
                    msg += f" {attr}={v}"
        print(msg)

    def _install_backend(self, kkt_solver, name: str,
                         band_plan=None) -> None:
        """Rebuild the solve function with a structured KKT backend.
        ``fleet_init`` enables the CG nu-initializer on fleet backends
        (avoids a second Mosaic call site / slow XLA batched LU in the
        prologue — see build_ipm); ``band_plan`` enables direct banded
        assembly for hoisted problems (BandKKT)."""
        self.kkt_backend_resolved = name
        self._kkt_solver = kkt_solver
        self._band_plan = band_plan
        self._solve_raw = build_ipm(
            self._fns, self.nU, self.nF, self.nG, self.opts,
            hoist=self._hoist,
            kkt_solver=kkt_solver,
            fleet_init=name in ("fleet", "fleet_banded"),
            band_plan=band_plan,
            hoist_scale_free=self._hoist_scale_free,
            hoist_param_deps=self._hoist_param_deps,
        )

    def _plan_structure(self) -> None:
        """Probe the KKT sparsity pattern and pick the factorization
        backend: the batch-in-lanes banded fleet kernel on TPU (or the
        pure-XLA block-tridiagonal elimination on CPU) when block-banded
        structure is worthwhile (MPC horizons), arrow when a few global
        variables couple all stages, dense otherwise.  The analog of the
        reference's fill-reducing ordering over an instantiated pattern
        (lib/@csparse/sparsity_ldl.m:40-62)."""
        from .kkt.structure import plan_banded, probe_pattern
        from .kkt.tridiag import tridiag_factorize

        dt = self.opts.np_dtype
        auto_fleet = self.opts.kkt_backend == "auto" and _prefer_fleet()
        nK = self.nU + self.nG + (0 if self.opts.smallerNewtonMatrix else self.nF)
        if nK < 64:  # too small for a structured path to matter
            if self.opts.kkt_backend == "fleet_banded" or auto_fleet:
                self._use_fleet_dense()
            return

        def assemble(trial: int):
            rng = np.random.default_rng(trial)
            penv = {
                p.name: jnp.asarray(rng.standard_normal(p.shape), dt)
                for p in self.parameters
            }
            u = jnp.asarray(rng.standard_normal(self.nU), dt)
            lam = jnp.asarray(rng.uniform(0.5, 1.5, self.nF), dt)
            nu = jnp.asarray(rng.standard_normal(self.nG), dt)
            a = self._solve_raw._assemble_ww(
                u, nu, lam,
                jnp.asarray(0.1, dt), jnp.asarray(1e-3, dt), jnp.asarray(1e-3, dt),
                penv,
                jnp.ones((self.nF,), dt), jnp.ones((), dt),
            )
            return a["WW"]

        try:
            # probe on the host CPU backend: it's a one-off eager pass of
            # many small ops — dispatching those to a TPU would be slow
            # and would pollute its compile cache
            # local devices only: under jax.distributed,
            # devices("cpu")[0] may belong to another process and is
            # not addressable here
            cpus = jax.local_devices(backend="cpu")
            if cpus:
                with jax.default_device(cpus[0]):
                    pattern = probe_pattern(assemble, nK)
            else:
                pattern = probe_pattern(assemble, nK)
        except Exception as exc:
            if self.opts.kkt_backend == "tridiag":
                raise
            # best-effort under 'auto', but NEVER silent: a typo'd
            # assemble or a shape bug in a new problem class would
            # otherwise degrade to the slow dense path with zero signal
            # (the reference's planner errors loudly,
            # lib/@csparse/sparsity_ldl.m:188)
            import warnings

            warnings.warn(
                "KKT structure probe failed "
                f"({type(exc).__name__}: {exc}); falling back to the "
                "dense-family backend",
                RuntimeWarning,
                stacklevel=2,
            )
            if self.opts.kkt_backend == "fleet_banded" or auto_fleet:
                self._use_fleet_dense()
            return
        plan = plan_banded(pattern)
        if self.opts.kkt_backend == "fleet_banded" or auto_fleet:
            # batch-in-lanes banded Pallas LDL over the RCM band
            # (kkt/fleet_banded.py); dense fleet when no band structure
            if not plan.worthwhile:
                self._use_fleet_dense()
                return
            from .ipm.solver import BandKKT
            from .kkt.fleet_banded import (
                FleetBandedFromBand,
                fleet_banded_kkt_factorize,
            )

            self.kkt_plan = plan
            n_ref = self.opts.refine_for("fleet_banded")

            def _kkt(WW, _plan=plan, _n=n_ref):
                # band mode (QP-like hoisted problems) hands over the
                # directly-assembled band; otherwise the dense matrix
                if isinstance(WW, BandKKT):
                    return FleetBandedFromBand(WW, _plan, n_refine=_n)
                return fleet_banded_kkt_factorize(WW, _plan, n_refine=_n)

            self._install_backend(_kkt, "fleet_banded", band_plan=plan)
            return
        if (
            not plan.worthwhile
            and self.opts.kkt_backend == "auto"
        ):
            # banded failed: look for arrow-plus-band structure (a few
            # global variables coupling all stages)
            from .kkt.arrow import ArrowFactorization, plan_arrow

            aplan = plan_arrow(pattern)
            if aplan is not None and aplan.worthwhile:
                self.kkt_plan = aplan
                self._install_backend(
                    lambda WW: ArrowFactorization(WW, aplan), "arrow"
                )
                return
        if self.opts.kkt_backend == "spike":
            # horizon-parallel elimination across a device mesh
            from .kkt.spike import SpikeFactorization

            if self.kkt_mesh is None:
                raise ValueError(
                    "kkt_backend='spike' requires kkt_mesh=Mesh(...)"
                )
            mesh, axis = self.kkt_mesh, "stages"
            if axis not in mesh.axis_names:
                axis = mesh.axis_names[0]
            self.kkt_plan = plan
            self._install_backend(
                lambda WW: SpikeFactorization(WW, plan, mesh, axis=axis),
                "spike",
            )
            return
        if not plan.worthwhile and self.opts.kkt_backend not in ("tridiag", "cyclic"):
            return
        self.kkt_plan = plan
        if self.opts.kkt_backend == "cyclic":
            from .kkt.cyclic import CyclicFactorization

            self._install_backend(
                lambda WW: CyclicFactorization(WW, plan), "cyclic"
            )
        else:
            self._install_backend(
                lambda WW: tridiag_factorize(WW, plan), "tridiag"
            )

    def _use_fleet_dense(self) -> None:
        """Dense batch-in-lanes fleet kernel (kkt/fleet.py) — for fleet
        problems without band structure, and for small problems under
        'auto' on TPU."""
        from .kkt.fleet import fleet_kkt_factorize

        n_ref = self.opts.refine_for("fleet")
        self._install_backend(
            lambda WW: fleet_kkt_factorize(WW, n_refine=n_ref), "fleet"
        )

    # -- parameter/init handling --------------------------------------
    def _param_env(self, parameters: Optional[Mapping[str, Any]]):
        parameters = dict(parameters or {})
        dt = self.opts.np_dtype
        env = {}
        for p in self.parameters:
            if p.name not in parameters:
                raise ValueError(f"missing parameter {p.name!r}")
            v = jnp.asarray(parameters[p.name], dt)
            if tuple(v.shape) != p.shape:
                raise ValueError(
                    f"parameter {p.name!r}: expected shape {p.shape}, got {tuple(v.shape)}"
                )
            env[p.name] = v
        extra = set(parameters) - set(env)
        if extra:
            raise ValueError(f"unknown parameters {sorted(extra)}")
        return env

    def _pack_init(self, init: Optional[Mapping[str, Any]]):
        init = dict(init or {})
        dt = self.opts.np_dtype
        env = {}
        for v in self.variables:
            env[v.name] = jnp.asarray(init.get(v.name, jnp.zeros(v.shape)), dt)
        return self.packing.pack(env, dtype=dt)

    # -- solving -------------------------------------------------------
    def solve(
        self,
        parameters: Optional[Mapping[str, Any]] = None,
        init: Optional[Mapping[str, Any]] = None,
        mu0: float = 1.0,
        max_iter: Optional[int] = None,
        addEye2Hessian: tuple[float, float] = (1e-9, 1e-9),
    ) -> Solution:
        import time as _time

        penv = self._param_env(parameters)
        u0 = self._pack_init(init)
        t0 = _time.perf_counter()
        res: IPMResult = self._solve_jit(
            u0, penv, mu0, self.opts.maxIter if max_iter is None else max_iter,
            addEye2Hessian[0], addEye2Hessian[1],
        )
        res = jax.tree.map(lambda x: x.block_until_ready(), res)
        elapsed = _time.perf_counter() - t0
        return self._make_solution(res, penv, elapsed)

    def solve_many(
        self,
        parameters: Mapping[str, Any],
        inits: Optional[Mapping[str, Any]] = None,
        mu0: float = 1.0,
        max_iter: Optional[int] = None,
        mesh=None,
    ):
        """Solve a batch of instances: every parameter/init leaf carries
        a leading batch axis.  Sugar over
        :func:`tenscalc_tpu.parallel.solve_batched` (optionally sharded
        over a device mesh).  Returns the batched IPMResult."""
        from .parallel import solve_batched

        return solve_batched(
            self, parameters, inits=inits, mu0=mu0, max_iter=max_iter,
            mesh=mesh,
        )

    def solve_result(self, parameters=None, init=None, mu0=1.0,
                     max_iter=None, addEye2Hessian=(1e-9, 1e-9),
                     save_iter=-1) -> IPMResult:
        """Raw jitted solve returning device arrays (no host sync) —
        building block for batched/sharded solving."""
        penv = self._param_env(parameters)
        u0 = self._pack_init(init)
        return self._solve_jit(
            u0, penv, mu0, self.opts.maxIter if max_iter is None else max_iter,
            addEye2Hessian[0], addEye2Hessian[1], save_iter,
        )

    def capture_ww(self, parameters, init=None, it: Optional[int] = None,
                   mu0: float = 1.0, max_iter: Optional[int] = None,
                   addEye2Hessian=(1e-9, 1e-9)) -> Dict[str, Any]:
        """Capture the KKT matrix at a chosen iterate of an actual solve
        — the analog of the reference's allowSave/saveIter dump
        (saveWW__, lib/ipmPD_CS.m:511-515; driver arg saveIter,
        lib/ipmPD_CSsolver.c:132-141).

        Requires ``allowSave=True``.  With ``it=None`` (needs
        ``profiling=True``) the iterate with the WORST direction error
        is selected automatically — i.e. where the solver actually
        struggled.  Returns the assembled system plus the structural
        report of :func:`tenscalc_tpu.diagnostics.analyze_assembled`.
        """
        if not self.opts.allowSave:
            raise ValueError("capture_ww requires SolverOptions(allowSave=True)")
        penv = self._param_env(parameters)
        u0 = self._pack_init(init)
        mi = self.opts.maxIter if max_iter is None else max_iter
        if it is None:
            if not self.opts.profiling:
                raise ValueError(
                    "capture_ww(it=None) selects the worst-direction-error "
                    "iterate from the profiling history; set profiling=True "
                    "or pass an explicit iteration"
                )
            res0 = self._solve_jit(
                u0, penv, mu0, mi, addEye2Hessian[0], addEye2Hessian[1]
            )
            hist = np.asarray(res0.history)[: max(int(res0.iters) - 1, 0)]
            if hist.size == 0:
                raise ValueError("solve recorded no iterations")
            it = int(np.nanargmax(np.nan_to_num(hist[:, 7], nan=-1.0))) + 1
        res = self._solve_jit(
            u0, penv, mu0, mi, addEye2Hessian[0], addEye2Hessian[1], int(it)
        )
        u, nu, lam, mu, addU, addEq = res.saved
        a = self._solve_raw._assemble_ww(
            u, nu, lam, mu, addU, addEq, penv,
            res.scale_ineq, res.scale_cost,
        )
        from .diagnostics import analyze_assembled

        return {
            "it": int(it),
            "WW": np.asarray(a["WW"]),
            "state": {
                "u": np.asarray(u), "nu": np.asarray(nu),
                "lam": np.asarray(lam), "mu": float(mu),
                "addU": float(addU), "addEq": float(addEq),
            },
            "report": analyze_assembled(self, a),
        }

    def _make_solution(self, res: IPMResult, penv, elapsed: float) -> Solution:
        var_env = self.packing.unpack(res.u)
        out_env = {**penv, **var_env, **self._internal_env(res)}
        outputs = {
            name: np.asarray(e(out_env)) if isinstance(e, Expr) else e
            for name, e in self.outputExpressions.items()
        }
        return Solution(
            status=int(res.status),
            iters=int(res.iters),
            outputs=outputs,
            variables={k: np.asarray(v) for k, v in var_env.items()},
            mu=float(res.mu),
            norminf_grad=float(res.norminf_grad),
            norminf_eq=float(res.norminf_eq),
            gap=float(res.gap),
            objective=float(res.f),
            lam=np.asarray(res.lam),
            nu=np.asarray(res.nu),
            time=elapsed,
            # the final iteration only runs the exit tests (no step), so
            # it contributes no history row
            history=(
                np.asarray(res.history)[: max(int(res.iters) - 1, 0)]
                if res.history is not None
                else None
            ),
            scale_ineq=(
                np.asarray(res.scale_ineq) if res.scale_ineq is not None else None
            ),
            scale_cost=(
                np.asarray(res.scale_cost) if res.scale_cost is not None else None
            ),
        )

    # -- parameter sensitivity (reference: sensitivityVariables,
    #    lib/ipmPD_CS.m:478-503; here via the implicit function theorem
    #    on the KKT conditions, differentiated with jax) --------------
    def sensitivity(
        self,
        solution: "Solution",
        parameters: Mapping[str, Any],
        wrt: Optional[Sequence[str]] = None,
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """d(u*)/d(parameter) at a converged solution.

        Implicit differentiation of the stationarity system
            r(u, nu, lam; p) = [grad_u L; G; lam*F - mu] = 0
        (unscaled; duals recovered from the solver's internal scaling).
        Returns {variable_name: {parameter_name: array of shape
        var.shape + param.shape}}.
        """
        from .kkt.dense import lu_solve_mixed

        dt = self.opts.np_dtype
        penv = self._param_env(parameters)
        packing = self.packing
        nU, nF, nG = self.nU, self.nF, self.nG

        u_star = packing.pack(
            {k: jnp.asarray(v, dt) for k, v in solution.variables.items()},
            dtype=dt,
        )
        sc = jnp.asarray(
            solution.scale_cost if solution.scale_cost is not None else 1.0, dt
        )
        si = jnp.asarray(
            solution.scale_ineq
            if solution.scale_ineq is not None
            else np.ones(nF),
            dt,
        )
        # unscale duals: lam_u = si*lam_s/sc, nu_u = nu_s/sc; the
        # complementarity target becomes mu_s/sc (see scaled stationarity)
        lam_u = (si * jnp.asarray(solution.lam, dt)) / sc
        nu_u = jnp.asarray(solution.nu, dt) / sc
        mu_u = jnp.asarray(solution.mu, dt) / sc
        z_star = jnp.concatenate([u_star, nu_u, lam_u])

        fns = self._fns

        def residual(z, pv):
            u = z[:nU]
            nu = z[nU : nU + nG]
            lam = z[nU + nG :]

            def lagr(uu):
                val = fns.f(uu, pv)
                if nG:
                    val = val + nu @ fns.G(uu, pv)
                if nF:
                    val = val - lam @ fns.F(uu, pv)
                return val

            r1 = jax.grad(lagr)(u)
            r2 = fns.G(u, pv) if nG else jnp.zeros((0,), dt)
            r3 = (
                lam * fns.F(u, pv) - mu_u if nF else jnp.zeros((0,), dt)
            )
            return jnp.concatenate([r1, r2, r3])

        K = jax.jacfwd(residual, argnums=0)(z_star, penv)
        dR = jax.jacfwd(residual, argnums=1)(z_star, penv)

        names = list(wrt) if wrt is not None else [p.name for p in self.parameters]
        out: Dict[str, Dict[str, np.ndarray]] = {
            v: {} for v in packing.names
        }
        for pname in names:
            Rp = dR[pname].reshape(z_star.shape[0], -1)
            dz = -lu_solve_mixed(K, Rp)
            for vname in packing.names:
                sl = packing.slice_of(vname)
                vshape = self.variables[packing.names.index(vname)].shape
                pshape = penv[pname].shape
                out[vname][pname] = np.asarray(dz[sl]).reshape(
                    vshape + pshape
                )
        return out

    def _internal_env(self, res: IPMResult):
        """Solver internals exposed to outputExpressions, mirroring the
        reference's special variables (lambda_, nu_, mu_, ... —
        lib/cmex2optimizeCS.m outputExpressions docs)."""
        return {
            "lambda_": res.lam,
            "nu_": res.nu,
            "mu_": res.mu,
            "status_": res.status,
            "iter_": res.iters,
        }


def optimize(
    objective: Expr,
    optimizationVariables: Sequence[Variable],
    constraints: Sequence[Constraint] = (),
    parameters: Sequence[Variable] = (),
    outputExpressions: Optional[Mapping[str, Expr]] = None,
    options: Optional[SolverOptions] = None,
    **option_kwargs,
) -> OptimizeSolver:
    """Create a constrained-minimization solver
    (reference: cmex2optimizeCS / class2optimizeCS)."""
    return OptimizeSolver(
        objective,
        optimizationVariables,
        constraints,
        parameters,
        outputExpressions,
        options,
        **option_kwargs,
    )


def minmax(*args, **kwargs):
    from .ipm.minmax import MinMaxSolver

    return MinMaxSolver(*args, **kwargs)


def equilibrium(*args, **kwargs):
    from .ipm.equilibrium import EquilibriumSolver

    return EquilibriumSolver(*args, **kwargs)


class ComputeFunction:
    """Compiled evaluation of a set of expressions — the analog of
    cmex2compute/class2compute (lib/cmex2compute.m:10-17): declare inputs
    (sets), get outputs, all fused in one jitted function."""

    def __init__(self, inputs: Sequence[Variable], outputs: Mapping[str, Expr]):
        self.inputs = list(inputs)
        self.outputs = dict(outputs)
        names = [v.name for v in self.inputs]

        def run(env):
            return {k: e(env) for k, e in self.outputs.items()}

        self._jit = jax.jit(run)
        self._names = names

    def __call__(self, **values):
        missing = set(self._names) - set(values)
        if missing:
            raise ValueError(f"missing inputs {sorted(missing)}")
        return self._jit({k: jnp.asarray(v) for k, v in values.items()})


def compute(inputs: Sequence[Variable], outputs: Mapping[str, Expr]) -> ComputeFunction:
    return ComputeFunction(inputs, outputs)


class ComputeObject:
    """Stateful compiled compute object — the full csparse declare API:
    ``declareSet`` -> :meth:`set`, ``declareGet`` -> :meth:`get`,
    ``declareCopy`` -> :meth:`copy` (lib/@csparse/csparse.m:296,345,406).

    The reference's generated classes keep all values in a persistent
    scratchbook between calls; here inputs and state variables live as
    device arrays on the object, every named get/copy is one jitted
    function over that environment, and ``copy`` updates are ATOMIC
    (all right-hand sides are evaluated before any state variable is
    assigned — exactly declareCopy's multi-assign semantics).

    This is the online-retraining pattern of the extended tutorials
    (tutorialNN1.m / tutorialNNextended.m: resetGradient /
    updateGradient / updateParameters copies driving an SGD loop).

    Parameters
    ----------
    inputs : set-able variables (parameters / streaming data).
    outputs : name -> Expr or dict of Exprs (named get groups).
    state : mapping ``Variable -> initial value`` (persist across calls).
    updates : name -> mapping ``Variable -> Expr``: named copy ops; each
        target must be a declared state variable.
    """

    def __init__(
        self,
        inputs: Sequence[Variable],
        outputs: Mapping[str, Any],
        state: Optional[Mapping[Variable, Any]] = None,
        updates: Optional[Mapping[str, Mapping[Variable, Expr]]] = None,
    ):
        self.inputs = list(inputs)
        self.state_vars = list((state or {}).keys())
        self._names = [v.name for v in self.inputs]
        state_names = {v.name for v in self.state_vars}
        self.outputs = dict(outputs)
        self.updates = {
            name: {v.name: e for v, e in upd.items()}
            for name, upd in (updates or {}).items()
        }
        for name, upd in self.updates.items():
            bad = set(upd) - state_names
            if bad:
                raise ValueError(
                    f"copy {name!r} targets non-state variables {sorted(bad)}"
                )

        self._values: Dict[str, Any] = {}
        for v, init in (state or {}).items():
            arr = jnp.asarray(init)
            if tuple(arr.shape) != v.shape:
                arr = jnp.broadcast_to(arr, v.shape)
            self._values[v.name] = arr

        def _eval_group(group, env):
            if isinstance(group, Expr):
                return group(env)
            if isinstance(group, Mapping):
                return {k: _eval_group(g, env) for k, g in group.items()}
            return [_eval_group(g, env) for g in group]

        def _group_deps(group):
            if isinstance(group, Expr):
                return set(group.deps)
            if isinstance(group, Mapping):
                groups = group.values()
            else:
                groups = group
            out = set()
            for g in groups:
                out |= _group_deps(g)
            return out

        # each get/copy only requires the variables its expressions
        # actually read (the reference's reactive dependency groups
        # likewise only pull the groups a get depends on)
        self._get_jits = {
            name: (
                jax.jit(lambda env, g=group: _eval_group(g, env)),
                frozenset(_group_deps(group)),
            )
            for name, group in self.outputs.items()
        }
        self._copy_jits = {
            name: (
                jax.jit(lambda env, u=upd: {k: e(env) for k, e in u.items()}),
                frozenset().union(*(e.deps for e in upd.values()))
                if upd else frozenset(),
            )
            for name, upd in self.updates.items()
        }

    def set(self, name: str, value) -> None:
        """Load an input or state variable (declareSet)."""
        if name not in self._names and name not in {
            v.name for v in self.state_vars
        }:
            raise ValueError(f"unknown variable {name!r}")
        self._values[name] = jnp.asarray(value)

    def _env(self, needed: frozenset):
        missing = needed - set(self._values)
        if missing:
            raise ValueError(f"inputs not set: {sorted(missing)}")
        return {k: self._values[k] for k in needed}

    def get(self, name: str):
        """Evaluate a named output group at the current environment."""
        fn, deps = self._get_jits[name]
        return fn(self._env(deps))

    def copy(self, name: str) -> None:
        """Run a named atomic state update (declareCopy)."""
        fn, deps = self._copy_jits[name]
        new = fn(self._env(deps))
        self._values.update(new)

    def value(self, var) -> jax.Array:
        """Current value of an input/state variable."""
        name = var.name if isinstance(var, Variable) else var
        return self._values[name]


def compute_object(
    inputs: Sequence[Variable],
    outputs: Mapping[str, Any],
    state: Optional[Mapping[Variable, Any]] = None,
    updates: Optional[Mapping[str, Mapping[Variable, Expr]]] = None,
) -> ComputeObject:
    """Create a stateful compute object (csparse declareSet/Get/Copy)."""
    return ComputeObject(inputs, outputs, state=state, updates=updates)
