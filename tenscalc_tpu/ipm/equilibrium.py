"""Primal-dual IPM for two-player Nash equilibria with shared latent
variables (used for coupled MPC-MHE):

    P1:  min_{u,x} f(u,d,x)   s.t. Fu >= 0, Gu == 0, H == 0
    P2:  min_{d,x} g(u,d,x)   s.t. Fd >= 0, Gd == 0, H == 0

Each player optimizes over its own variables *and* the shared latent x,
subject to the shared latent equality constraints H (each player gets its
own multiplier for H: P1xnu / P2xnu).  Reference: lib/ipmPDeqlat_CS.m
(structure :1-110, stacked-KKT assembly :560-700), driver loop
lib/ipmPDeq_CSsolver.c, math doc/ipm.tex:1151-1592; generator
lib/cmex2equilibriumLatentCS.m:10-32.

The stacked first-order system is *unsymmetric* (two different
Lagrangians share rows), so the default factorization is pivoted LU —
mirroring the reference's default useLDL=false for this problem class
(lib/private/parameters4equilibrium.m:149-150).
"""

from __future__ import annotations

from typing import Any, Mapping, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..expr import Constraint, Expr, Variable
from ..pack import Packing
from .options import SolverOptions
from ..kkt.dense import hdot
from .solver import (
    STEPBACK,
    IPMResult,
    _clp,
    _norminf,
    line_search_combined,
)


# regularization-adaptation constants (lib/ipmPDeq_CSsolver.c:313-316).
# The direction-error gate is dtype-aware: the reference's 1e-9 assumes
# f64 factorizations; the f32 fleet paths (clamped unpivoted banded LU +
# refinement) bottom out around ~1e-6-1e-7 absolute, and an unreachable
# gate makes the adaptation loop burn its full MAX_ADAPT_STEPS re-solves
# EVERY iteration (measured: ~20x the per-iteration cost at B=1024 on
# TPU) while ratcheting addE2 to its ceiling for nothing.
ADDE_MAX = 1e-2
ADDE_MIN = 1e-20
MAX_DIRECTION_ERROR = 1e-9        # f64 (reference value)
MAX_DIRECTION_ERROR_F32 = 1e-6
MAX_ADAPT_STEPS = 20


def _derr_tol(dt):
    import jax.numpy as _jnp

    return (
        MAX_DIRECTION_ERROR
        if _jnp.dtype(dt) == _jnp.float64
        else MAX_DIRECTION_ERROR_F32
    )


class EqState(NamedTuple):
    z: jax.Array       # [u; d; x]
    nu: jax.Array      # [P1nu; P1xnu; P2nu; P2xnu]
    lam: jax.Array     # [P1lambda; P2lambda]
    mu: jax.Array
    addE2: jax.Array   # adapted addEye2Hessian2 (equality regularization)
    addE2_next: jax.Array
    alphaPrimal: jax.Array
    alphaDualIneq: jax.Array
    alphaDualEq: jax.Array
    status: jax.Array
    it: jax.Array
    done: jax.Array


class _EqFns(NamedTuple):
    f: Any   # P1 objective (z, penv) -> scalar
    g: Any   # P2 objective
    Fu: Any
    Fd: Any
    Gu: Any
    Gd: Any
    H: Any


def build_equilibrium_ipm(fns: _EqFns, dims, opts: SolverOptions,
                          kkt_solver=None, param_shapes=None,
                          band_plan=None):
    """``param_shapes`` (name -> shape) enables the build-time jaxpr
    taint analysis (ipm/hoist.py): when the stationarity Jacobians
    Sz/Sn/Sl and the constraint Jacobians Gz/Fz are certified
    iteration-invariant (linear-quadratic games — every horizon MPC-MHE
    with linear dynamics), they are computed once per solve before the
    while_loop instead of by five jacfwd passes per iteration (the
    reference's reactive dependency groups give the same behavior,
    lib/@csparse/dependencyGroups.m).

    ``band_plan`` (with a FromBand-capable ``kkt_solver``) enables
    DIRECT banded assembly for fully-hoisted games: the large stacked
    KKT's only iteration-varying pieces are the inequality scale
    factors (which multiply whole rows/columns of the F blocks:
    Sl_s = Sl_u diag(s), Fz_s = diag(s) Fz_u — exact bilinearity of the
    Lagrangian in lambda and s) and three diagonals (addE1, -addE2,
    Fv/lam), so the permuted band is ``const_band * g[c+i] * g[c] +
    diagonal updates`` and the dense (nK, nK) matrix is never
    materialized (the round-4 optimize-path BandKKT architecture,
    ipm/solver.py; same banded blocks: lib/ipmPDeqlat_CS.m:300-415)."""
    nUu, nD, nX, nFu, nFd, nGu, nGd, nH = dims
    dt = opts.np_dtype
    nZ = nUu + nD + nX
    nF = nFu + nFd
    nGres = nGu + nGd + nH        # equality residual length [Gu;Gd;H]
    nNu = nGu + nH + nGd + nH     # dual length (H gets two multipliers)
    nS = nUu + nD + 2 * nX        # stationarity rows
    if nS + nGres + nF != nZ + nNu + nF:
        raise ValueError(
            "equilibrium KKT system is not square: need "
            "#latentConstraints == #latentVariables "
            f"(nH={nH}, nX={nX})"
        )

    def scaled_fns(penv, sFu, sFd, sc):
        def Fu(z):
            return sFu * fns.Fu(z, penv) if nFu else jnp.zeros((0,), dt)

        def Fd(z):
            return sFd * fns.Fd(z, penv) if nFd else jnp.zeros((0,), dt)

        def Fall(z):
            return jnp.concatenate([Fu(z), Fd(z)])

        def Gall(z):
            gu = fns.Gu(z, penv) if nGu else jnp.zeros((0,), dt)
            gd = fns.Gd(z, penv) if nGd else jnp.zeros((0,), dt)
            h = fns.H(z, penv) if nH else jnp.zeros((0,), dt)
            return jnp.concatenate([gu, gd, h])

        def Lf(z, nu, lam):
            # P1 Lagrangian (ipmPDeqlat_CS.m:193-208)
            val = sc * fns.f(z, penv)
            if nFu:
                val = val - lam[:nFu] @ Fu(z)
            if nGu:
                val = val + nu[:nGu] @ fns.Gu(z, penv)
            if nH:
                val = val + nu[nGu : nGu + nH] @ fns.H(z, penv)
            return val

        def Lg(z, nu, lam):
            # P2 Lagrangian
            val = sc * fns.g(z, penv)
            if nFd:
                val = val - lam[nFu:] @ Fd(z)
            if nGd:
                val = val + nu[nGu + nH : nGu + nH + nGd] @ fns.Gd(z, penv)
            if nH:
                val = val + nu[nGu + nH + nGd :] @ fns.H(z, penv)
            return val

        def stat(z, nu, lam):
            """Stationarity rows [Lf_u; Lg_d; Lf_x; Lg_x]
            (ipmPDeqlat_CS.m:568-583)."""
            gf = jax.grad(Lf, argnums=0)(z, nu, lam)
            gg = jax.grad(Lg, argnums=0)(z, nu, lam)
            return jnp.concatenate(
                [
                    gf[:nUu],
                    gg[nUu : nUu + nD],
                    gf[nUu + nD :],
                    gg[nUu + nD :],
                ]
            )

        return Fu, Fd, Fall, Gall, Lf, Lg, stat

    # the equality-regularization diagonal of the (nGres x nNu) dual
    # block: each equality residual row is paired with "its" multiplier
    # column (Gu <-> P1nu, Gd <-> P2nu, H <-> P1xnu).  When nH == 0 this
    # is exactly the reference's -addEye2Hessian2*eye(nG)
    # (lib/ipmPDeqlat_CS.m:367); with latent constraints (which the
    # reference leaves unregularized) it generalizes the same recovery.
    _eq_rows = np.concatenate(
        [
            np.arange(nGu),                       # Gu rows
            nGu + np.arange(nGd),                 # Gd rows
            nGu + nGd + np.arange(nH),            # H rows
        ]
    ).astype(np.int32)
    _eq_cols = np.concatenate(
        [
            np.arange(nGu),                       # P1nu
            nGu + nH + np.arange(nGd),            # P2nu
            nGu + np.arange(nH),                  # P1xnu
        ]
    ).astype(np.int32)

    # build-time certification of iteration-invariant Jacobians
    hoist_S = hoist_Gz = hoist_Fz = False
    # scale-independence of (Sz, Sn) + parameter-value dependencies:
    # when certified, the hoisted blocks evaluate at dummy iterates,
    # unit scales, and masked parameters — pure functions of their TRUE
    # parameter dependencies, so a fleet with shared parameters keeps
    # them batch-free (round-4: per-instance (B, nS, nZ) hoists were
    # most of the 100 ms MPC-MHE fleet prologue)
    hoist_S_sf = False
    deps_S = deps_G = None
    if param_shapes is not None:
        from .hoist import output_independent_of, param_value_deps

        _penv_d = {k: jnp.zeros(s, dt) for k, s in param_shapes.items()}
        _fns_d = scaled_fns(
            _penv_d, jnp.ones((nFu,), dt), jnp.ones((nFd,), dt),
            jnp.ones((), dt),
        )
        _, _, _Fall_d, _Gall_d, _, _, _stat_d = _fns_d
        _z = jnp.zeros((nZ,), dt)
        _nu = jnp.zeros((nNu,), dt)
        _lam = jnp.ones((nF,), dt)
        try:
            hoist_S = output_independent_of(
                lambda z, nu, lam: (
                    jax.jacfwd(_stat_d, argnums=0)(z, nu, lam),
                    jax.jacfwd(_stat_d, argnums=1)(z, nu, lam),
                    jax.jacfwd(_stat_d, argnums=2)(z, nu, lam),
                ),
                3, _z, _nu, _lam,
            )
        except Exception:  # pragma: no cover - non-differentiable corner
            hoist_S = False
        if hoist_S:
            # (Sz, Sn) additionally independent of the inequality
            # scales?  (True for linear F — the scaled terms contribute
            # no curvature.  Sl = -(s o Fz)' is always scale-dependent
            # and is excluded.)  Scales that are statically constant
            # (scaleInequalities off / scaleCost == 0) are not tainted.
            _t_ineq = bool(opts.scaleInequalities) and nF > 0
            _t_cost = opts.scaleCost > 0

            def _SzSn(z, nu, lam, sfu, sfd, sc):
                fns_s = scaled_fns(_penv_d, sfu, sfd, sc)
                st = fns_s[6]
                return (
                    jax.jacfwd(st, argnums=0)(z, nu, lam),
                    jax.jacfwd(st, argnums=1)(z, nu, lam),
                )

            try:
                n_t = 3 + (2 if _t_ineq else 0) + (1 if _t_cost else 0)
                if _t_ineq and _t_cost:
                    hoist_S_sf = output_independent_of(
                        _SzSn, 6, _z, _nu, _lam,
                        jnp.ones((nFu,), dt), jnp.ones((nFd,), dt),
                        jnp.ones((), dt),
                    )
                elif _t_ineq:
                    hoist_S_sf = output_independent_of(
                        lambda z, nu, lam, sfu, sfd: _SzSn(
                            z, nu, lam, sfu, sfd, jnp.ones((), dt)
                        ),
                        5, _z, _nu, _lam,
                        jnp.ones((nFu,), dt), jnp.ones((nFd,), dt),
                    )
                elif _t_cost:
                    hoist_S_sf = output_independent_of(
                        lambda z, nu, lam, sc: _SzSn(
                            z, nu, lam, jnp.ones((nFu,), dt),
                            jnp.ones((nFd,), dt), sc
                        ),
                        4, _z, _nu, _lam, jnp.ones((), dt),
                    )
                else:
                    hoist_S_sf = True
            except Exception:  # pragma: no cover
                hoist_S_sf = False
        if hoist_S_sf:
            try:
                deps_S = param_value_deps(
                    lambda penv, z, nu, lam: (
                        lambda st: (
                            jax.jacfwd(st, argnums=0)(z, nu, lam),
                            jax.jacfwd(st, argnums=1)(z, nu, lam),
                        )
                    )(
                        scaled_fns(
                            penv, jnp.ones((nFu,), dt),
                            jnp.ones((nFd,), dt), jnp.ones((), dt),
                        )[6]
                    ),
                    _penv_d, _z, _nu, _lam,
                )
            except Exception:  # pragma: no cover
                deps_S = None
        if nGres:
            try:
                hoist_Gz = output_independent_of(
                    lambda z: jax.jacfwd(_Gall_d)(z), 1, _z
                )
            except Exception:  # pragma: no cover
                hoist_Gz = False
            if hoist_Gz:
                try:
                    deps_G = param_value_deps(
                        lambda penv, z: jax.jacfwd(
                            scaled_fns(
                                penv, jnp.ones((nFu,), dt),
                                jnp.ones((nFd,), dt), jnp.ones((), dt),
                            )[3]
                        )(z),
                        _penv_d, _z,
                    )
                except Exception:  # pragma: no cover
                    deps_G = None
        if nF:
            try:
                hoist_Fz = output_independent_of(
                    lambda z: jax.jacfwd(_Fall_d)(z), 1, _z
                )
            except Exception:  # pragma: no cover
                hoist_Fz = False

    # direct banded assembly (large-matrix branch): see docstring.
    # Requires every block of the stacked KKT to be hoisted — Sz/Sn
    # additionally scale-free (hoist_S_sf) since they enter the constant
    # band verbatim; Sl/Fz need only z-independence because their scale
    # dependence is an exact row/column scaling folded in at runtime.
    band_mode = (
        band_plan is not None
        and kkt_solver is not None
        and not opts.smallerNewtonMatrix
        and nF > 0
        and hoist_S
        and hoist_S_sf
        and hoist_Fz
        and (nGres == 0 or hoist_Gz)
    )
    deps_Sl = deps_Fz = None
    if band_mode:
        from .hoist import param_value_deps as _pvd

        _penv_d2 = {k: jnp.zeros(s_, dt) for k, s_ in param_shapes.items()}
        _z2 = jnp.zeros((nZ,), dt)
        _nu2 = jnp.zeros((nNu,), dt)
        _lam2 = jnp.ones((nF,), dt)
        try:
            deps_Sl = _pvd(
                lambda penv, z, nu, lam: jax.jacfwd(
                    scaled_fns(
                        penv, jnp.ones((nFu,), dt), jnp.ones((nFd,), dt),
                        jnp.ones((), dt),
                    )[6],
                    argnums=2,
                )(z, nu, lam),
                _penv_d2, _z2, _nu2, _lam2,
            )
        except Exception:  # pragma: no cover
            deps_Sl = None
        try:
            deps_Fz = _pvd(
                lambda penv, z: jax.jacfwd(
                    scaled_fns(
                        penv, jnp.ones((nFu,), dt), jnp.ones((nFd,), dt),
                        jnp.ones((), dt),
                    )[2]
                )(z),
                _penv_d2, _z2,
            )
        except Exception:  # pragma: no cover
            deps_Fz = None

    def assemble_ww(z, nu, lam, penv, sFu, sFd, sc, addE1, addE2,
                    cached=None, pre=None, band=False):
        """KKT matrix + derivatives for the active branch (no solves).
        Exposed as ``solve._assemble_ww`` for build-time structure
        probing (kkt/structure.py) — same hook as build_ipm's."""
        pre = pre or {}
        Fu, Fd, Fall, Gall, Lf, Lg, stat = scaled_fns(penv, sFu, sFd, sc)
        if cached is not None:
            # (stat, Fall, Gall at this iterate) computed once by the
            # driver's exit tests; independent of the addE* regularizations
            sv, Fv, Gv = cached
        else:
            sv = stat(z, nu, lam)
            Fv = Fall(z)
            Gv = Gall(z)

        if band:
            # direct banded assembly (see build docstring): the permuted
            # band is const_band * g[row] * g[col] + diagonal updates,
            # with g = 1 except on the F rows/cols where g = s (the
            # inequality scales).  SelF maps F index k to its permuted
            # band position; diagonals: +addE1 on the z block, -addE2 on
            # the nu block, Fv/lam on the F block
            # (lib/ipmPDeqlat_CS.m:300-415 large branch).
            from ..kkt.band_assemble import BandedOperator, shifted_cols
            from ..kkt.dense import hdot as _hd

            s_all = jnp.concatenate([sFu, sFd])
            w_b = band_plan.bandwidth
            gp = pre["m_notF"] + _hd(pre["SelF"], s_all)
            gsh = shifted_cols(gp, w_b)                    # gp[c+i]
            lb = pre["band_const_l"] * gsh * gp[:, None]
            ub = pre["band_const_u"] * gp[:, None] * gsh[:, 1:]
            d3 = Fv / lam
            diag_add = (
                addE1 * pre["m_e1"] - addE2 * pre["m_e2"]
                + _hd(pre["SelF"], d3)
            )
            lb = lb.at[:, 0].add(diag_add)
            band_arr = jnp.concatenate([lb, ub], axis=1)
            Sz_u, Sn_u, Sl_u = pre["Sz"], pre["Sn"], pre["Sl_u"]
            Gz_u, Fz_u = pre["Gz_b"], pre["Fz_u"]

            def mv(x):
                xz = x[:nZ]
                xn = x[nZ : nZ + nNu]
                xf = x[nZ + nNu :]
                r1 = _hd(Sz_u, xz) + _hd(Sn_u, xn) + _hd(Sl_u, s_all * xf)
                r2 = _hd(Gz_u, xz)
                r3 = s_all * _hd(Fz_u, xz) + d3 * xf
                out = jnp.concatenate([r1, r2, r3])
                # the addE1/-addE2 recovery regularization acts on the
                # GLOBAL diagonal (crossing block-row boundaries when
                # nX > 0), exactly like the dense branch's jnp.diag(shift)
                shift = jnp.concatenate(
                    [
                        addE1 * jnp.ones((nZ,), dt),
                        -addE2 * jnp.ones((nNu,), dt),
                        jnp.zeros((nF,), dt),
                    ]
                )
                return out + shift * x

            op = BandedOperator(band_arr, pre["Pm"], mv)

            def fz_mv(x):
                return s_all * _hd(Fz_u, x)

            # row-sum upper bound max_r sum_c |WW[r, c]| through the
            # constituents (the f32 backward-error scale; the constant
            # pieces are loop-invariant and XLA hoists them)
            r1_ub = (
                jnp.sum(jnp.abs(Sz_u), axis=1)
                + jnp.sum(jnp.abs(Sn_u), axis=1)
                + _hd(jnp.abs(Sl_u), s_all)
                + jnp.abs(addE1)
            )
            r2_ub = (
                jnp.sum(jnp.abs(Gz_u), axis=1) + jnp.abs(addE2)
                if nGres else jnp.zeros((0,), dt)
            )
            r3_ub = (
                s_all * jnp.sum(jnp.abs(Fz_u), axis=1) + jnp.abs(d3)
            )
            rowsum_ub = jnp.max(
                jnp.concatenate([r1_ub, r2_ub, r3_ub])
            )
            return dict(WW=op, sv=sv, Fv=Fv, Gv=Gv, Sl=None, Gz=None,
                        Fz=None, LFF=None, fz_mv=fz_mv,
                        rowsum_ub=rowsum_ub)

        Sz = pre.get("Sz")
        if Sz is None:
            Sz = jax.jacfwd(stat, argnums=0)(z, nu, lam)
        Sn = pre.get("Sn")
        if Sn is None:
            Sn = jax.jacfwd(stat, argnums=1)(z, nu, lam)
        Sl = pre.get("Sl")
        if Sl is None:
            Sl = jax.jacfwd(stat, argnums=2)(z, nu, lam)
        Gz = pre.get("Gz")
        if Gz is None:
            Gz = jax.jacfwd(Gall)(z) if nGres else jnp.zeros((0, nZ), dt)
        Fz = pre.get("Fz")
        if Fz is None:
            Fz = jax.jacfwd(Fall)(z) if nF else jnp.zeros((0, nZ), dt)

        if opts.smallerNewtonMatrix and nF:
            # condensed system: eliminate dLambda
            # (ipmPDeqlat_CS.m:300-415 small-matrix branch):
            # +addEye2Hessian1 on the stationarity diagonal and
            # -addEye2Hessian2 on the equality-dual diagonal
            # (ipmPDeqlat_CS.m:366-367; the reference writes them in the
            # nX=0 branch, and its commented-out full-eye shows the same
            # intent for nX>0)
            LFF = (lam / Fv)[:, None] * Fz          # (nF, nZ)
            top_left = Sz - Sl @ LFF                # (nS, nZ): rectangular
            if opts.addEye2Hessian:
                # +addE1 on the leading diagonal (exactly eye(nZ) when
                # nX == 0, matching ipmPDeqlat_CS.m:366; the extra Lg_x
                # rows with nX > 0 have no z-column partner)
                didx = jnp.arange(nZ)
                top_left = top_left.at[didx, didx].add(addE1)
            dual_blk = jnp.zeros((nGres, nNu), dt)
            if opts.addEye2Hessian and nGres:
                dual_blk = dual_blk.at[_eq_rows, _eq_cols].add(-addE2)
            WWs = jnp.concatenate(
                [
                    jnp.concatenate([top_left, Sn], axis=1),
                    jnp.concatenate([Gz, dual_blk], axis=1),
                ],
                axis=0,
            )
            return dict(WW=WWs, sv=sv, Fv=Fv, Gv=Gv, Sl=Sl, Gz=Gz,
                        Fz=Fz, LFF=LFF)

        row1 = jnp.concatenate([Sz, Sn, Sl], axis=1)
        row2 = jnp.concatenate(
            [Gz, jnp.zeros((nGres, nNu + nF), dt)], axis=1
        )
        row3 = jnp.concatenate(
            [Fz, jnp.zeros((nF, nNu), dt), jnp.diag(Fv / lam) if nF else jnp.zeros((0, 0), dt)],
            axis=1,
        )
        WW = jnp.concatenate([row1, row2, row3], axis=0)
        if opts.addEye2Hessian:
            # recovery regularization for the large matrix: +addE1 on
            # the primal diagonal, -addE2 on the dual diagonal.  The
            # reference leaves its large branch unregularized (the
            # commented-out WW+addEye2Hessian*Teye at
            # ipmPDeqlat_CS.m:374 shows the intended device); without
            # it an ill-conditioned game has no recovery path, so the
            # same derr-gated adaptation as the condensed branch is
            # applied here.
            nKK = WW.shape[0]
            shift = jnp.concatenate(
                [
                    addE1 * jnp.ones((nZ,), dt),
                    -addE2 * jnp.ones((nNu,), dt),
                    jnp.zeros((nKK - nZ - nNu,), dt),
                ]
            )
            WW = WW + jnp.diag(shift)
        return dict(WW=WW, sv=sv, Fv=Fv, Gv=Gv, Sl=Sl, Gz=Gz, Fz=Fz,
                    LFF=None)

    def _factor(WW):
        if kkt_solver is not None:
            return kkt_solver(WW)
        # unsymmetric system -> pivoted LU (reference default
        # useLDL=false); on TPU this runs as f32 LU + f64 iterative
        # refinement
        from ..kkt.dense import kkt_factorize

        return kkt_factorize(WW, need_inertia=False)

    def compute_direction(z, nu, lam, mu, penv, sFu, sFd, sc,
                          addE1, addE2, cached=None, pre=None):
        a = assemble_ww(z, nu, lam, penv, sFu, sFd, sc, addE1, addE2,
                        cached=cached, pre=pre, band=band_mode)
        sv, Fv, Gv = a["sv"], a["Fv"], a["Gv"]
        Sl, Gz, Fz = a["Sl"], a["Gz"], a["Fz"]
        # the scaled inequality Jacobian as an operator: band mode never
        # materializes Fz (fz_mv applies diag(s) Fz_u)
        fz_mv = a.get("fz_mv") or (lambda x: Fz @ x)
        _, _, Fall, _, _, _, _ = scaled_fns(penv, sFu, sFd, sc)
        if opts.smallerNewtonMatrix and nF:
            WWs, LFF = a["WW"], a["LFF"]
            fac_s = _factor(WWs)
            muF = mu / Fv
            stat_ff = sv - Sl @ lam
            b_top = -stat_ff - Sl @ muF
            if opts.skipAffine:
                b_s = jnp.concatenate([b_top, -Gv])
                dxz = fac_s.solve(b_s)
                dZ_s = dxz[:nZ]
                dLam = muF - lam - LFF @ dZ_s
                mu_new = mu
            else:
                from .solver import line_search_affine

                from .solver import _rough_solve

                b_a = jnp.concatenate([-stat_ff, -Gv])
                dxz_a = _rough_solve(fac_s, b_a)
                dZ_a = dxz_a[:nZ]
                dLam_a = -lam - LFF @ dZ_a
                maxAlphaP_a = _clp(Fv, fz_mv(dZ_a))
                maxAlphaDI_a = _clp(lam, dLam_a)
                aMax = jnp.minimum(
                    jnp.minimum(maxAlphaP_a, opts.alphaMax), maxAlphaDI_a
                )

                if hoist_Fz and opts.linesearch_affine_F:
                    # F affine in z (certified at build): one broadcast, exact
                    FdZ_a = fz_mv(dZ_a)

                    def minF_a(alpha):
                        return jnp.min(Fv + alpha * FdZ_a)
                else:
                    FdZ_a = None

                    def minF_a(alpha):
                        return jnp.min(Fall(z + alpha * dZ_a))

                alpha_a = line_search_affine(minF_a, aMax, opts, dt)
                newF_a = (
                    Fv + alpha_a * FdZ_a
                    if FdZ_a is not None
                    else Fall(z + alpha_a * dZ_a)
                )
                newLam_a = lam + alpha_a * dLam_a
                gap_now = lam @ Fv
                rho = (newF_a @ newLam_a) / gap_now
                sigma = jnp.clip(rho, 0.0, 1.0)
                sigma = sigma**2 if opts.delta == 2 else sigma**3
                eq_now = _norminf(Gv)
                eq_ok = (
                    jnp.asarray(True)
                    if nGres == 0
                    else (eq_now < 100 * opts.equalTolerance)
                    | (eq_now < 1e-3)
                )
                do_sigma = (alpha_a > opts.alphaMax / 2) & eq_ok
                mu_new = jnp.where(do_sigma, sigma * gap_now / nF, mu)
                muF2 = mu_new / Fv
                Meh = fz_mv(dZ_a) * dLam_a / Fv
                b_s = jnp.concatenate(
                    [-stat_ff - Sl @ muF2 - Sl @ Meh, -Gv]
                )
                dxz = fac_s.solve(b_s)
                dZ_s = dxz[:nZ]
                dLam = muF2 - lam - LFF @ dZ_s - Meh
            derr = _norminf(hdot(WWs, dxz) - b_s)
            if jnp.dtype(dt) == jnp.float64:
                bscale = jnp.ones((), dt)
            else:
                rs = jnp.max(jnp.sum(jnp.abs(WWs), axis=-1))
                bscale = jnp.maximum(
                    rs * _norminf(dxz) + _norminf(b_s), 1.0
                )
            dx = jnp.concatenate([dxz, dLam])
            return dx, mu_new, derr, sv, fz_mv(dx[:nZ]), Fv, Gv, bscale

        WW = a["WW"]
        fac = _factor(WW)

        def wmv(v):
            return WW.matvec(v) if band_mode else hdot(WW, v)

        if opts.skipAffine or nF == 0:
            b = jnp.concatenate(
                [-sv, -Gv, -Fv + mu / lam if nF else jnp.zeros((0,), dt)]
            )
            dx = fac.solve(b)
            mu_new = mu
        else:
            # affine direction, sigma = rho^delta mu update, then the
            # Mehrotra-corrected combined direction — same ordering as
            # the reference driver (affine solve -> setMu -> combined;
            # ipmPDeqlat_CS.m:660-716 + ipmPDeq_CSsolver.c)
            from .solver import line_search_affine

            from .solver import _rough_solve

            b_a = jnp.concatenate([-sv, -Gv, -Fv])
            dx_a = _rough_solve(fac, b_a)
            dZ_a = dx_a[:nZ]
            dLam_a = dx_a[nZ + nNu :]

            maxAlphaP_a = _clp(Fv, fz_mv(dZ_a))
            maxAlphaDI_a = _clp(lam, dLam_a)
            aMax = jnp.minimum(
                jnp.minimum(maxAlphaP_a, opts.alphaMax), maxAlphaDI_a
            )

            if hoist_Fz and opts.linesearch_affine_F:
                # F affine in z (certified at build): one broadcast, exact
                FdZ_a = fz_mv(dZ_a)

                def minF_a(alpha):
                    return jnp.min(Fv + alpha * FdZ_a)
            else:
                FdZ_a = None

                def minF_a(alpha):
                    return jnp.min(Fall(z + alpha * dZ_a))

            alpha_a = line_search_affine(minF_a, aMax, opts, dt)
            newF_a = (
                Fv + alpha_a * FdZ_a
                if FdZ_a is not None
                else Fall(z + alpha_a * dZ_a)
            )
            newLam_a = lam + alpha_a * dLam_a
            gap_now = lam @ Fv
            rho = (newF_a @ newLam_a) / gap_now
            sigma = jnp.clip(rho, 0.0, 1.0)
            sigma = sigma**2 if opts.delta == 2 else sigma**3
            eq_now = _norminf(Gv)
            eq_ok = (
                jnp.asarray(True)
                if nGres == 0
                else (eq_now < 100 * opts.equalTolerance) | (eq_now < 1e-3)
            )
            do_sigma = (alpha_a > opts.alphaMax / 2) & eq_ok
            mu_new = jnp.where(do_sigma, sigma * gap_now / nF, mu)

            Meh = fz_mv(dZ_a) * dLam_a / lam
            b = jnp.concatenate([-sv, -Gv, -Fv - Meh + mu_new / lam])
            dx = fac.solve(b)
        derr = _norminf(wmv(dx) - b)
        # f32 backward-error scale: the residual floor is
        # ~eps32 * || |WW| |dx| ||, not the absolute 1e-6 the f64
        # reference gate assumes — an absolute gate makes the adapt
        # loop re-solve EVERY iteration on healthy systems (round-5
        # trace: 2.2 directions/lockstep-iteration on the MPC-MHE
        # fleet).  Same device as build_ipm's bscale (ipm/solver.py).
        if jnp.dtype(dt) == jnp.float64:
            bscale = jnp.ones((), dt)
        else:
            if band_mode:
                rs = a["rowsum_ub"]
            else:
                rs = jnp.max(jnp.sum(jnp.abs(WW), axis=-1))
            bscale = jnp.maximum(rs * _norminf(dx) + _norminf(b), 1.0)
        return dx, mu_new, derr, sv, fz_mv(dx[:nZ]), Fv, Gv, bscale

    def solve(z0, penv, mu0=1.0, max_iter=None, addE10=1e-9,
              addE20=1e-9) -> IPMResult:
        max_iter_v = jnp.asarray(
            opts.maxIter if max_iter is None else max_iter, jnp.int32
        )
        z0 = jnp.asarray(z0, dt)
        mu0 = jnp.asarray(mu0, dt)
        addE1 = jnp.asarray(addE10 if opts.addEye2Hessian else 0.0, dt)
        addE20 = jnp.asarray(addE20 if opts.addEye2Hessian else 0.0, dt)

        if nFu and opts.scaleInequalities:
            sFu = jnp.abs(1.0 / fns.Fu(z0, penv)).astype(dt)
        else:
            sFu = jnp.ones((nFu,), dt)
        if nFd and opts.scaleInequalities:
            sFd = jnp.abs(1.0 / fns.Fd(z0, penv)).astype(dt)
        else:
            sFd = jnp.ones((nFd,), dt)
        if opts.scaleCost > 0:
            sc = jnp.abs(opts.scaleCost / fns.f(z0, penv)).astype(dt)
        else:
            sc = jnp.ones((), dt)

        Fu, Fd, Fall, Gall, Lf, Lg, stat = scaled_fns(penv, sFu, sFd, sc)

        desired_gap = (
            opts.desiredDualityGap * sc
            if opts.scaleCost > 0
            else jnp.asarray(opts.desiredDualityGap, dt)
        )
        mu_min = desired_gap / max(nF, 1) / 2.0

        lam0 = mu0 / Fall(z0) if nF else jnp.zeros((0,), dt)
        nu0 = jnp.ones((nNu,), dt)

        # hoisted iteration-invariant Jacobians (certified at build
        # time).  All certified blocks evaluate at the DUMMY iterate
        # (value-equal by certification; computed from the batched z0
        # they would carry a spurious batch axis under vmap); (Sz, Sn)
        # additionally at unit scales with value-irrelevant parameters
        # masked to constants when certified scale-free — batch-free
        # for fleets with shared parameters.  Sl and Fz are genuinely
        # scale-dependent (row/column scalings of the raw Jacobians)
        # and keep the runtime scales.
        pre = {}
        z_d = jnp.zeros((nZ,), dt)
        nu_d = jnp.zeros((nNu,), dt)
        lam_d = jnp.ones((nF,), dt)

        def _mask_env(deps):
            if deps is None:
                return penv
            return {
                k: (v if k in deps else jnp.zeros_like(v))
                for k, v in penv.items()
            }

        if hoist_S:
            if hoist_S_sf:
                fns_u = scaled_fns(
                    _mask_env(deps_S), jnp.ones((nFu,), dt),
                    jnp.ones((nFd,), dt), jnp.ones((), dt),
                )
                stat_u = fns_u[6]
                pre["Sz"] = jax.jacfwd(stat_u, argnums=0)(z_d, nu_d, lam_d)
                pre["Sn"] = jax.jacfwd(stat_u, argnums=1)(z_d, nu_d, lam_d)
            else:
                pre["Sz"] = jax.jacfwd(stat, argnums=0)(z_d, nu_d, lam_d)
                pre["Sn"] = jax.jacfwd(stat, argnums=1)(z_d, nu_d, lam_d)
            if not band_mode:
                # runtime scales (band mode hoists Sl at UNIT scales and
                # folds the scale in operator-style — a runtime-scaled
                # hoist would drag a batch axis through the band)
                pre["Sl"] = jax.jacfwd(stat, argnums=2)(z_d, nu_d, lam_d)
        if hoist_Gz and nGres:
            Gall_u = scaled_fns(
                _mask_env(deps_G), jnp.ones((nFu,), dt),
                jnp.ones((nFd,), dt), jnp.ones((), dt),
            )[3]
            pre["Gz"] = jax.jacfwd(Gall_u)(z_d)
        if hoist_Fz and nF and not band_mode:
            pre["Fz"] = jax.jacfwd(Fall)(z_d)

        if band_mode:
            # banded-assembly precompute (once per solve): unit-scale
            # masked Sl/Fz hoists, the permuted constant band of
            # [[Sz, Sn, Sl_u], [Gz, 0, 0], [Fz_u, 0, 0]], and the
            # diagonal-placement masks.  All tensors here are pure
            # functions of their true parameter dependencies — batch-free
            # under shared-parameter fleets.
            from ..kkt.band_assemble import (
                extract_band_lower,
                extract_band_upper,
                perm_onehot,
            )

            stat_sl = scaled_fns(
                _mask_env(deps_Sl), jnp.ones((nFu,), dt),
                jnp.ones((nFd,), dt), jnp.ones((), dt),
            )[6]
            pre["Sl_u"] = jax.jacfwd(stat_sl, argnums=2)(z_d, nu_d, lam_d)
            Fall_u = scaled_fns(
                _mask_env(deps_Fz), jnp.ones((nFu,), dt),
                jnp.ones((nFd,), dt), jnp.ones((), dt),
            )[2]
            pre["Fz_u"] = jax.jacfwd(Fall_u)(z_d)
            pre["Gz_b"] = pre.get("Gz", jnp.zeros((0, nZ), dt))

            perm_np = np.asarray(band_plan.perm)
            w_b = int(band_plan.bandwidth)
            nK_b = nZ + nNu + nF
            Pm = perm_onehot(perm_np, dt)
            hp_ = jax.lax.Precision.HIGHEST
            Wconst = jnp.concatenate(
                [
                    jnp.concatenate(
                        [pre["Sz"], pre["Sn"], pre["Sl_u"]], axis=1
                    ),
                    jnp.concatenate(
                        [
                            pre["Gz_b"],
                            jnp.zeros((nGres, nNu + nF), dt),
                        ],
                        axis=1,
                    ),
                    jnp.concatenate(
                        [pre["Fz_u"], jnp.zeros((nF, nNu + nF), dt)],
                        axis=1,
                    ),
                ],
                axis=0,
            )
            Wp0 = jnp.matmul(
                Pm, jnp.matmul(Wconst, Pm.T, precision=hp_), precision=hp_
            )
            pre["band_const_l"] = extract_band_lower(Wp0, w_b)
            pre["band_const_u"] = extract_band_upper(Wp0, w_b)
            pre["m_e1"] = jnp.asarray(perm_np < nZ, dt)
            pre["m_e2"] = jnp.asarray(
                (perm_np >= nZ) & (perm_np < nZ + nNu), dt
            )
            pre["m_notF"] = jnp.asarray(perm_np < nZ + nNu, dt)
            SelF = np.zeros((nK_b, nF))
            fmask = perm_np >= nZ + nNu
            SelF[np.arange(nK_b)[fmask], perm_np[fmask] - nZ - nNu] = 1.0
            pre["SelF"] = jnp.asarray(SelF, dt)
            pre["Pm"] = Pm

        st0 = EqState(
            z=z0, nu=nu0, lam=lam0, mu=mu0,
            addE2=addE20, addE2_next=addE20,
            alphaPrimal=jnp.zeros((), dt),
            alphaDualIneq=jnp.zeros((), dt),
            alphaDualEq=jnp.zeros((), dt),
            status=jnp.zeros((), jnp.int32),
            it=jnp.zeros((), jnp.int32),
            done=jnp.asarray(False),
        )

        def exit_metrics(st):
            # sum of the four stationarity norms (ipmPDeqlat_CS.m:243-246)
            gf = jax.grad(Lf, argnums=0)(st.z, st.nu, st.lam)
            gg = jax.grad(Lg, argnums=0)(st.z, st.nu, st.lam)
            g = (
                _norminf(gf[:nUu])
                + _norminf(gg[nUu : nUu + nD])
                + (_norminf(gf[nUu + nD :]) if nX else 0.0)
                + (_norminf(gg[nUu + nD :]) if nX else 0.0)
            )
            Gv = Gall(st.z)
            eq = _norminf(Gv)
            Fv = Fall(st.z)
            if nF:
                gap = st.lam @ Fv
                ineq = jnp.min(Fv)
                dual = jnp.min(st.lam)
            else:
                gap = jnp.zeros((), dt)
                ineq = jnp.asarray(jnp.inf, dt)
                dual = jnp.asarray(jnp.inf, dt)
            # stationarity vector reassembled from the same gf/gg
            # (stat(), scaled_fns) for reuse by compute_direction
            sv = jnp.concatenate(
                [
                    gf[:nUu],
                    gg[nUu : nUu + nD],
                    gf[nUu + nD :],
                    gg[nUu + nD :],
                ]
            )
            return g, eq, gap, ineq, dual, (sv, Fv, Gv)

        def body(st):
            return lax.cond(st.done, lambda s: s, _step, st)

        def _step(st):
            it = st.it + 1
            addE2 = st.addE2_next  # delayed update (ipmPDeq_CSsolver.c:318-329)
            g, eq, gap, ineq, dual, cached_vals = exit_metrics(st)

            status = jnp.zeros((), jnp.int32)
            fail_maxiter = it > max_iter_v
            status = jnp.where(fail_maxiter, 8, status)
            fail_nan = jnp.isnan(g)
            status = jnp.where(fail_nan & (status == 0), 4, status)
            fail_ineq = jnp.asarray(False) if nF == 0 else (ineq <= 0)
            status = jnp.where(fail_ineq & (status == 0), 1, status)
            fail_dual = jnp.asarray(False) if nF == 0 else (dual <= 0)
            status = jnp.where(fail_dual & (status == 0), 2, status)

            converged = g <= opts.gradTolerance
            if nF:
                converged &= gap <= desired_gap
            if nGres:
                converged &= eq <= opts.equalTolerance
            early = fail_maxiter | fail_nan | fail_ineq | fail_dual | converged

            def stop(_):
                return st._replace(
                    it=it, addE2=addE2, addE2_next=addE2,
                    status=status, done=jnp.asarray(True),
                )

            def iterate(_):
                return _iterate(
                    st._replace(it=it, addE2=addE2), g, eq, gap, cached_vals
                )

            return lax.cond(early, stop, iterate, None)

        def _iterate(st, g, eq, gap, cached_vals):
            z, nu, lam, mu, addE2 = st.z, st.nu, st.lam, st.mu, st.addE2

            def direction(aE2):
                return compute_direction(
                    z, nu, lam, mu, penv, sFu, sFd, sc, addE1, aE2,
                    cached=cached_vals, pre=pre,
                )

            if not (opts.addEye2Hessian and opts.adjustAddEye2Hessian):
                (dx, mu_aff, derr, sv, FzdZ, Fv, Gv,
                 bscale) = direction(addE2)
                addE2_next = addE2
            else:
                # the reference driver's adjust loop
                # (lib/ipmPDeq_CSsolver.c:330-374): while the direction
                # error exceeds tolerance, double addEye2Hessian2 and
                # re-solve (bounded); when accurate, schedule a x0.75
                # decrease for the next iteration.  Solve-at-least-once
                # while_loop keeps the KKT solve traced exactly once.
                shapes = jax.eval_shape(direction, addE2)
                zeros = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes
                )

                def adapt_cond(carry):
                    k, aE, res, derr_prev = carry
                    # NaN-safe: a NaN direction error must count as bad, or a
                    # blown-up factorization escapes the recovery loop.
                    # The f32 gate is RELATIVE to the backward-error
                    # scale res[7] (1.0 in f64 -> exact reference gate)
                    bad = ~(res[2] < _derr_tol(dt) * res[7]) & (aE < ADDE_MAX)
                    # progress guard: only keep doubling addE2 while the
                    # re-solves actually reduce derr.  In f32 the
                    # factorization has an arithmetic floor (~1e-6 abs on
                    # well-conditioned systems, worse when ||x|| is
                    # large) that NO regularization can cross — without
                    # this guard the loop burns all MAX_ADAPT_STEPS
                    # re-solves every iteration (measured 20x the
                    # per-iteration cost at B=1024 on TPU)
                    # The guard targets the f32 arithmetic floor ONLY:
                    # in f64 the 1e-9 gate is reachable and the
                    # reference keeps doubling up to ADDE_MAX, so no
                    # progress requirement is imposed there (advisor
                    # round-3: a first doubling from ~1e-9 can improve
                    # derr <2x even though larger regularization would
                    # cross the gate).
                    if jnp.dtype(dt) == jnp.float64:
                        improving = jnp.asarray(True)
                    else:
                        improving = (k <= 1) | (res[2] < 0.5 * derr_prev)
                    return (k == 0) | (
                        bad & improving & (k <= MAX_ADAPT_STEPS)
                    )

                def adapt_body(carry):
                    k, aE, res_prev, _ = carry
                    aE2 = jnp.where(
                        k == 0,
                        aE,
                        jnp.minimum(2.0 * jnp.maximum(aE, ADDE_MIN), ADDE_MAX),
                    )
                    res = direction(aE2)
                    derr_prev = jnp.where(
                        k == 0, jnp.asarray(jnp.inf, dt), res_prev[2]
                    )
                    return k + 1, aE2, res, derr_prev

                k, addE2, res, _ = lax.while_loop(
                    adapt_cond, adapt_body,
                    (jnp.zeros((), jnp.int32), addE2, zeros,
                     jnp.asarray(jnp.inf, dt)),
                )
                dx, mu_aff, derr, sv, FzdZ, Fv, Gv, bscale = res
                addE2_next = jnp.where(
                    (derr < _derr_tol(dt) * bscale) & (addE2 > ADDE_MIN),
                    jnp.maximum(0.75 * addE2, ADDE_MIN),
                    addE2,
                )
            if not opts.skipAffine:
                mu = jnp.maximum(mu_aff, mu_min)
            dZ = dx[:nZ]
            dNu = dx[nZ : nZ + nNu]
            dLam = dx[nZ + nNu :]

            if nF and hoist_Fz and opts.linesearch_affine_F:
                def minF_at(alpha):
                    return jnp.min(Fv + alpha * FzdZ)
            else:
                def minF_at(alpha):
                    return (
                        jnp.min(Fall(z + alpha * dZ))
                        if nF else jnp.asarray(jnp.inf, dt)
                    )

            nan_fail = jnp.any(jnp.isnan(dx))
            if nF == 0:
                alphaPrimal = jnp.asarray(opts.alphaMax, dt)
                alphaDualEq = jnp.asarray(opts.alphaMax, dt)
                alphaDualIneq = jnp.zeros((), dt)
                new_z = z + alphaPrimal * dZ
                new_nu = nu + alphaDualEq * dNu
                new_lam = lam
                new_mu = mu
            else:
                maxAlphaP = _clp(Fv, FzdZ)
                maxAlphaDI = _clp(lam, dLam)
                alphaP = maxAlphaP
                if opts.coupledAlphas:
                    alphaP = jnp.minimum(alphaP, maxAlphaDI)
                alpha_bt = jnp.minimum(alphaP * STEPBACK, opts.alphaMax)
                alphaPrimal, nan2 = line_search_combined(minF_at, alpha_bt, opts, dt)
                nan_fail |= nan2
                if opts.coupledAlphas:
                    alphaDualIneq = alphaPrimal
                    alphaDualEq = alphaPrimal
                else:
                    alphaDualIneq = jnp.minimum(maxAlphaDI * STEPBACK, alpha_bt)
                    alphaDualEq = alphaDualIneq

                new_z = z + alphaPrimal * dZ
                new_nu = nu + alphaDualEq * dNu
                new_lam = lam + alphaDualIneq * dLam

                th_grad = g < jnp.maximum(1e-6, opts.gradTolerance)
                th_eq = (
                    jnp.asarray(True)
                    if nGres == 0
                    else eq < jnp.maximum(1e-5, opts.equalTolerance)
                )
                aggressive = (alphaPrimal > alpha_bt / 2) & th_grad & th_eq
                mu_aggr = jnp.maximum(
                    mu * jnp.minimum(opts.muFactorAggressive, jnp.sqrt(mu)), mu_min
                )
                tiny = alphaPrimal < 0.1
                mu_tiny = jnp.minimum(mu * 1.1, mu0)
                conservative = (alphaPrimal > 0.99) & th_eq
                mu_cons = jnp.maximum(mu * opts.muFactorConservative, mu_min)
                new_mu = jnp.where(
                    aggressive, mu_aggr,
                    jnp.where(tiny, mu_tiny, jnp.where(conservative, mu_cons, mu)),
                )
                new_lam = jnp.where(tiny, mu_tiny / Fall(new_z), new_lam)
                stalled = (
                    (alphaPrimal < opts.alphaMin)
                    & (alphaDualIneq < opts.alphaMin)
                    & (alphaDualEq < opts.alphaMin)
                )
                new_mu = jnp.where(
                    stalled,
                    jnp.maximum(new_mu / opts.muFactorConservative**2, mu_min),
                    new_mu,
                )

            status = jnp.where(nan_fail, 4, 0).astype(jnp.int32)
            done = nan_fail
            return EqState(
                z=jnp.where(done, z, new_z),
                nu=jnp.where(done, nu, new_nu) if nNu else nu,
                lam=jnp.where(done, lam, new_lam) if nF else lam,
                mu=new_mu,
                addE2=addE2,
                addE2_next=addE2_next,
                alphaPrimal=alphaPrimal if nF else jnp.asarray(opts.alphaMax, dt),
                alphaDualIneq=alphaDualIneq if nF else jnp.zeros((), dt),
                alphaDualEq=alphaDualEq if nF else jnp.asarray(opts.alphaMax, dt),
                status=status,
                it=st.it,
                done=done,
            )

        final = lax.while_loop(lambda s: ~s.done, body, st0)

        g, eq, gap, ineq, dual, _ = exit_metrics(final)
        status = final.status
        is8 = status == 8

        def add_flag(cond, flag, s):
            return jnp.where(is8 & cond, s | flag, s)

        status = add_flag(g > opts.gradTolerance, 16, status)
        if nGres:
            status = add_flag(eq > opts.equalTolerance, 32, status)
        if nF:
            status = add_flag(gap > desired_gap, 64, status)
            status = add_flag(final.mu > mu_min, 128, status)
            aP, aDI, aDE = final.alphaPrimal, final.alphaDualIneq, final.alphaDualEq
            negl = (aP <= opts.alphaMin) & (aDI < opts.alphaMin) & (aDE < opts.alphaMin)
            small_a = (aP <= 0.1) & (aDI < 0.1) & (aDE < 0.1)
            med_a = (aP <= 0.5) & (aDI < 0.5) & (aDE < 0.5)
            status = add_flag(negl, 1792, status)
            status = add_flag(~negl & small_a, 1536, status)
            status = add_flag(~negl & ~small_a & med_a, 1024, status)

        Fu_, Fd_, Fall_, Gall_, Lf_, Lg_, stat_ = scaled_fns(penv, sFu, sFd, sc)
        return IPMResult(
            u=final.z,
            nu=final.nu,
            lam=final.lam,
            mu=final.mu,
            status=status,
            iters=final.it,
            norminf_grad=g,
            norminf_eq=eq,
            gap=gap,
            f=fns.f(final.z, penv),
            addU=addE1,
            addEq=final.addE2,
        )

    solve._assemble_ww = assemble_ww  # exposed for structure probing
    solve._band_mode = "hoisted" if band_mode else None  # introspection
    return solve


class EquilibriumSolver:
    """Two-player equilibrium solver instance (reference:
    cmex2equilibriumLatentCS / class2equilibriumLatentCS)."""

    def __init__(
        self,
        P1objective: Expr,
        P2objective: Expr,
        P1optimizationVariables: Sequence[Variable],
        P2optimizationVariables: Sequence[Variable],
        latentVariables: Sequence[Variable] = (),
        P1constraints: Sequence[Constraint] = (),
        P2constraints: Sequence[Constraint] = (),
        latentConstraints: Sequence[Constraint] = (),
        parameters: Sequence[Variable] = (),
        outputExpressions: Optional[Mapping[str, Expr]] = None,
        options: Optional[SolverOptions] = None,
        **option_kwargs,
    ):
        from ..api import _ensure_x64, _split_constraints, _stack_eval, Solution

        # 'variant' concerns the optimize solver only; force 'standard'
        # so timesLambda's option restrictions don't trip (e.g. the
        # Mehrotra path here with skipAffine=False)
        self.opts = (
            (options or SolverOptions())
            .replace(**{"variant": "standard", **option_kwargs})
            .resolved("equilibrium")
        )
        _ensure_x64(self.opts)
        dt = self.opts.np_dtype

        self.p1_vars = list(P1optimizationVariables)
        self.p2_vars = list(P2optimizationVariables)
        self.lat_vars = list(latentVariables)
        self.parameters = list(parameters)
        self.outputExpressions = dict(outputExpressions or {})
        self.pack_u = Packing(self.p1_vars)
        self.pack_d = Packing(self.p2_vars)
        self.pack_x = Packing(self.lat_vars)

        Fu_e, Gu_e = _split_constraints(P1constraints)
        Fd_e, Gd_e = _split_constraints(P2constraints)
        H_ineq, H_e = [], []
        for c in latentConstraints:
            if not isinstance(c, Constraint):
                raise TypeError("latentConstraints must be Constraint objects")
            (H_ineq if c.kind == "ineq" else H_e).append(c.expr)
        if H_ineq:
            raise ValueError(
                "latentConstraints must be equality constraints "
                "(reference: parseConstraints with err on inequalities)"
            )

        dims = (
            self.pack_u.total,
            self.pack_d.total,
            self.pack_x.total,
            int(sum(e.size for e in Fu_e)),
            int(sum(e.size for e in Fd_e)),
            int(sum(e.size for e in Gu_e)),
            int(sum(e.size for e in Gd_e)),
            int(sum(e.size for e in H_e)),
        )
        self._ipm_dims = dims  # private: examples attach their own .dims
        nUu, nD, nX = dims[0], dims[1], dims[2]
        pu, pd, px = self.pack_u, self.pack_d, self.pack_x

        def env_of(z, penv):
            return {
                **penv,
                **pu.unpack(z[:nUu]),
                **pd.unpack(z[nUu : nUu + nD]),
                **px.unpack(z[nUu + nD :]),
            }

        def mk_scalar(expr):
            def fn(z, penv):
                return jnp.asarray(expr(env_of(z, penv)), dt).reshape(())

            return fn

        def mk_stack(exprs):
            def fn(z, penv):
                return _stack_eval(exprs, env_of(z, penv)).astype(dt)

            return fn

        self._fns = _EqFns(
            f=mk_scalar(P1objective),
            g=mk_scalar(P2objective),
            Fu=mk_stack(Fu_e),
            Fd=mk_stack(Fd_e),
            Gu=mk_stack(Gu_e),
            Gd=mk_stack(Gd_e),
            H=mk_stack(H_e),
        )
        pshapes = {p.name: p.shape for p in self.parameters}
        self._solve_raw = build_equilibrium_ipm(
            self._fns, dims, self.opts, param_shapes=pshapes
        )
        # structured-KKT planning: the stacked two-player system is
        # UNSYMMETRIC, so banded structure routes to the LU variants
        # (kkt/banded_lu.py) — tridiag_lu on CPU, the batch-in-lanes
        # banded LU fleet kernel on TPU
        self.kkt_plan = None
        self.kkt_backend_resolved = "dense"
        if self.opts.kkt_backend != "dense":
            from ..kkt.select import compute_banded_plan, select_game_backend

            nUu, nD, nX, nFu, nFd, nGu, nGd, nH = dims
            nK = (nUu + nD + 2 * nX) + (nGu + nGd + nH) + (nFu + nFd)

            def plan_fn():
                return compute_banded_plan(self._probe_assemble, nK)

            kkt_solver, name, plan = select_game_backend(
                self.opts, nK, plan_fn, symmetric=False
            )
            if kkt_solver is not None:
                self.kkt_plan = plan
                self.kkt_backend_resolved = name
                self._solve_raw = build_equilibrium_ipm(
                    self._fns, dims, self.opts, kkt_solver=kkt_solver,
                    param_shapes=pshapes,
                    # direct banded assembly needs a FromBand-capable
                    # backend (the fleet banded LU kernel)
                    band_plan=plan if name == "fleet_banded_lu" else None,
                )
        self._solve_jit = jax.jit(self._solve_raw)
        self._Solution = Solution
        self._env_of = env_of

    def _probe_assemble(self, trial: int):
        """Random-iterate KKT assembly for the structure probe."""
        dt = self.opts.np_dtype
        nUu, nD, nX, nFu, nFd, nGu, nGd, nH = self._ipm_dims
        nZ = nUu + nD + nX
        nF = nFu + nFd
        nNu = nGu + nH + nGd + nH
        rng = np.random.default_rng(trial)
        penv = {
            p.name: jnp.asarray(rng.standard_normal(p.shape), dt)
            for p in self.parameters
        }
        z = jnp.asarray(rng.standard_normal(nZ), dt)
        lam = jnp.asarray(rng.uniform(0.5, 1.5, nF), dt)
        nu = jnp.asarray(rng.standard_normal(nNu), dt)
        a = self._solve_raw._assemble_ww(
            z, nu, lam, penv,
            jnp.ones((nFu,), dt), jnp.ones((nFd,), dt), jnp.ones((), dt),
            jnp.asarray(1e-3, dt), jnp.asarray(1e-3, dt),
        )
        return a["WW"]

    def _param_env(self, parameters):
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
        return env

    def solve_many(self, parameters=None, inits=None, mu0: float = 1.0,
                   max_iter: Optional[int] = None):
        """Batched equilibrium solves (leading batch axis on every
        parameter/init leaf).  A parameter passed with its UNBATCHED
        declared shape is shared across the batch: vmap in_axes=None,
        so its contributions to the hoisted Jacobians and per-iteration
        KKT assembly are computed once, not per instance (round-4: the
        per-instance recompute was 367 ms of an 834 ms B=1024 MPC-MHE
        batch — the plant model is common across scenarios)."""
        dt = self.opts.np_dtype
        parameters = dict(parameters or {})
        penv = {}
        shared = set()
        B = None
        for p in self.parameters:
            v = jnp.asarray(parameters[p.name], dt)
            if tuple(v.shape) == p.shape:
                shared.add(p.name)
            elif B is None:
                B = v.shape[0]
            penv[p.name] = v
        inits = dict(inits or {})
        if B is None:
            for v in inits.values():
                B = np.asarray(v).shape[0]
                break
        if B is None:
            raise ValueError("need at least one batched parameter or init")
        env = {}
        for v in self.p1_vars + self.p2_vars + self.lat_vars:
            arr = jnp.asarray(
                inits.get(v.name, jnp.zeros((B,) + v.shape)), dt
            )
            env[v.name] = arr.reshape(B, -1)
        names = (
            self.pack_u.names + self.pack_d.names + self.pack_x.names
        )
        z0 = jnp.concatenate([env[n] for n in names], axis=1)
        key = frozenset(shared)
        cache = getattr(self, "_solve_many_jits", None)
        if cache is None:
            cache = self._solve_many_jits = {}
        fn = cache.get(key)
        if fn is None:
            penv_axes = {
                p.name: (None if p.name in shared else 0)
                for p in self.parameters
            }
            fn = cache[key] = jax.jit(
                jax.vmap(
                    self._solve_raw,
                    in_axes=(0, penv_axes, None, None, None, None),
                )
            )
        return fn(
            z0, penv, jnp.asarray(mu0, dt),
            self.opts.maxIter if max_iter is None else max_iter,
            1e-9, 1e-9,
        )

    def solve(self, parameters=None, init=None, mu0: float = 1.0,
              max_iter: Optional[int] = None):
        import time as _time

        dt = self.opts.np_dtype
        penv = self._param_env(parameters)
        init = dict(init or {})
        env = {
            v.name: jnp.asarray(init.get(v.name, jnp.zeros(v.shape)), dt)
            for v in self.p1_vars + self.p2_vars + self.lat_vars
        }
        z0 = jnp.concatenate(
            [
                self.pack_u.pack(env, dtype=dt),
                self.pack_d.pack(env, dtype=dt),
                self.pack_x.pack(env, dtype=dt),
            ]
        )
        t0 = _time.perf_counter()
        res = self._solve_jit(
            z0, penv, mu0, self.opts.maxIter if max_iter is None else max_iter
        )
        res = jax.tree.map(lambda x: x.block_until_ready(), res)
        elapsed = _time.perf_counter() - t0

        var_env = {
            k: v for k, v in self._env_of(res.u, penv).items()
            if k not in penv
        }
        out_env = {**penv, **var_env, "mu_": res.mu, "lambda_": res.lam, "nu_": res.nu}
        outputs = {
            name: np.asarray(e(out_env)) if isinstance(e, Expr) else e
            for name, e in self.outputExpressions.items()
        }
        return self._Solution(
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
        )
