"""Primal-dual interior-point method compiled end-to-end under jit.

This module is the TPU-native fusion of two reference layers:

* the symbolic IPM formulation — KKT assembly, Newton direction,
  fraction-to-boundary quantities (lib/ipmPD_CStimesLambda.m for the
  default multiplicative-lambda variant, lib/ipmPD_CS.m for the
  standard large/small Newton-matrix variants), and
* the compiled driver loop (lib/ipmPD_CSsolver.c): exit tests, adaptive
  ``addEye2Hessian`` with curvature/inertia + direction-error gating,
  optional Mehrotra affine step with sigma = rho^delta, backtracking
  fraction-to-boundary line search with stepback=0.99 and the
  ineq1 > ineq/10 re-check, aggressive/conservative/stall mu updates,
  and the status bitmask.

Where the reference's loop issues one ``get*``/``set*`` call at a time
into generated C (each lazily recomputing stale dependency groups), here
the entire iteration is one traced JAX program: the KKT factorization is
a blocked LDL^T, and the sequential backtracking line search becomes a
*batched* evaluation of min F(u + alpha dU) over a geometric alpha grid
(vmapped), followed by the same acceptance logic applied with masks.
The semantics (which alpha gets accepted) match the C loop exactly.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..kkt.dense import kkt_factorize, ldl_factor, ldl_inertia, ldl_solve
from .options import SolverOptions
from ..kkt.dense import hdot

STEPBACK = 0.99  # reference: stepback=.99, lib/ipmPD_CSsolver.c:174


class IPMFunctions(NamedTuple):
    """Problem callables: all take the packed primal vector u plus a
    parameter env (pytree) and return jnp arrays."""

    f: Callable  # (u, penv) -> scalar objective
    F: Callable  # (u, penv) -> (nF,) inequality constraints (>= 0)
    G: Callable  # (u, penv) -> (nG,) equality residuals (== 0)


class IPMState(NamedTuple):
    u: jax.Array
    nu: jax.Array
    lam: jax.Array
    mu: jax.Array
    addU: jax.Array       # regularization currently applied
    addEq: jax.Array
    addU_next: jax.Array  # delayed update, applied at next iteration start
    addEq_next: jax.Array
    alphaPrimal: jax.Array
    alphaDualIneq: jax.Array
    alphaDualEq: jax.Array
    status: jax.Array     # int32 bitmask
    it: jax.Array         # int32
    done: jax.Array       # bool
    hist: jax.Array       # [maxIter, 8] iteration trace (profiling only)
    snap: tuple           # allowSave snapshot (u,nu,lam,mu,addU,addEq) or ()
    # f32 cross-iteration progress guard for the delayed addEye2Hessian
    # increase: derr after the last iteration, and whether that
    # iteration raised the regularization (see _iterate)
    derr_prev: jax.Array = jnp.inf
    inc_prev: jax.Array = False


class IPMResult(NamedTuple):
    u: jax.Array
    nu: jax.Array
    lam: jax.Array
    mu: jax.Array
    status: jax.Array
    iters: jax.Array
    norminf_grad: jax.Array
    norminf_eq: jax.Array
    gap: jax.Array
    f: jax.Array
    addU: jax.Array
    addEq: jax.Array
    # per-iteration trace (profiling=True only): [maxIter, 8] rows of
    # (J, |grad|, |eq|, gap, mu, alphaPrimal, addU, derr) — the data
    # behind the reference's verboseLevel>=3 iteration table
    # (lib/ipmPD_CSsolver.c:247-276) and debugConvergence plots
    history: Optional[jax.Array] = None
    # scaling factors actually used (needed to unscale duals, e.g. for
    # post-hoc sensitivity analysis)
    scale_ineq: Optional[jax.Array] = None
    scale_cost: Optional[jax.Array] = None
    # allowSave snapshot of (u, nu, lam, mu, addU, addEq) at the
    # runtime-selected save_iter (reference: saveWW__/saveIter,
    # lib/ipmPD_CS.m:511-515) — () when allowSave is off
    saved: tuple = ()
    # profiling-only: ||residual||_inf of the CG nu-initializer (fleet
    # paths; None when CG did not run) — surfaces ill-conditioned inits
    # that would otherwise be invisible (ADVICE r2 item 4)
    nu_init_residual: Optional[jax.Array] = None


HISTORY_COLUMNS = (
    "J", "norminf_grad", "norminf_eq", "gap", "mu", "alphaPrimal",
    "addU", "directionError",
)


class Direction(NamedTuple):
    # NOTE: this tuple is the carry of the in-iteration adaptation
    # while_loop (solver._iterate) — at B=1024 every extra field is
    # copied in/out of the loop once per IPM iteration.  Keep it to
    # what the driver actually consumes (the round-4 ablation found
    # 1.1 ms/iteration of pure carry traffic in dead fields).
    dU: jax.Array
    dNu: jax.Array
    dLambda: jax.Array
    derr: jax.Array       # ||WW dx - b||_inf
    curvature: jax.Array  # dU' WW11 dU
    mp: jax.Array         # positive inertia count
    mn: jax.Array         # negative inertia count
    mu_new: jax.Array     # sigma-updated mu (Mehrotra); mu when skipAffine
    sigma_fired: jax.Array  # bool: the Mehrotra sigma update actually ran
    # (carried explicitly rather than inferred from mu_new != mu, which
    # misfires when the clamped sigma result coincides with mu, e.g. at
    # the mu_min floor — advisor round-3 low finding)
    bscale: jax.Array     # ||rhs||_inf of the combined system: the scale
    # the f32 direction-error gate must be relative to (see _iterate)


def _norminf(x):
    return jnp.max(jnp.abs(x)) if x.shape[0] > 0 else jnp.zeros((), x.dtype)


def _clp(x, dx):
    """max{alpha >= 0 : x + alpha dx >= 0}, x > 0 (lib/clp.m)."""
    if x.shape[0] == 0:
        return jnp.asarray(jnp.inf, x.dtype)
    ratio = jnp.where(dx < 0, -x / jnp.where(dx < 0, dx, -1.0), jnp.inf)
    return jnp.min(ratio)


def line_search_combined(minF_of_alpha, alpha_bt, opts: SolverOptions, dt):
    """Combined-direction backtracking search over a batched alpha grid.

    ``alpha_bt`` is alphaMax_ = min(stepback*maxAlpha, opts.alphaMax).
    Returns (alpha, nan_fail).  Replicates the acceptance logic of
    lib/ipmPD_CSsolver.c:679-756: try the max (with the stepback re-check
    ineq1 > ineq/10), then probe alphaMin, then walk a geometric grid.
    """
    s = STEPBACK
    K = opts.linesearch_points
    a1 = alpha_bt / s
    grid = alpha_bt * 0.95 / (2.0 ** jnp.arange(K, dtype=dt))
    cands = jnp.concatenate([jnp.array([a1, opts.alphaMin / s], dtype=dt), grid])
    # one batched sweep over candidates and their stepback re-checks
    both = jax.vmap(minF_of_alpha)(jnp.concatenate([cands, cands * s]))
    vals, vals_sb = both[: K + 2], both[K + 2 :]
    ineq_a1, ineq_min = vals[0], vals[1]
    ineq1_a1 = vals_sb[0]
    nan_fail = jnp.isnan(ineq_a1)
    accept_max = (ineq_a1 > 0) & (ineq1_a1 > ineq_a1 / 10.0)
    gv, gs = vals[2:], vals_sb[2:]
    ok = (gv > 0) & (gs > gv / 10.0) & (grid >= opts.alphaMin)
    has = jnp.any(ok)
    first = jnp.argmax(ok)
    grid_alpha = jnp.where(has, grid[first] * s, 0.0)
    alpha_else = jnp.where(ineq_min > 0, grid_alpha, 0.0)
    alpha = jnp.where(accept_max, a1 * s, alpha_else)
    alpha = jnp.where(alpha_bt >= opts.alphaMin, alpha, 0.0)
    return alpha.astype(dt), nan_fail


def line_search_affine(minF_of_alpha, alpha_max_, opts: SolverOptions, dt):
    """Affine-direction search (lib/ipmPD_CSsolver.c:583-631)."""
    K = opts.linesearch_points
    grid = alpha_max_ * 0.95 / (2.0 ** jnp.arange(K, dtype=dt))
    cands = jnp.concatenate(
        [jnp.array([alpha_max_, opts.alphaMin], dtype=dt), grid]
    )
    vals = jax.vmap(minF_of_alpha)(cands)
    ok_max = vals[0] >= 0
    ok_min = vals[1] > 0
    ok = (vals[2:] >= 0) & (grid >= opts.alphaMin)
    has = jnp.any(ok)
    first = jnp.argmax(ok)
    grid_alpha = jnp.where(has, grid[first], 0.0)
    alpha = jnp.where(ok_max, alpha_max_, jnp.where(ok_min, grid_alpha, 0.0))
    alpha = jnp.where(alpha_max_ >= opts.alphaMin, alpha, 0.0)
    return alpha.astype(dt)


class BandKKT:
    """Condensed KKT matrix in permuted lower-band storage with
    structured matvecs — the dense (nK, nK) matrix is NEVER
    materialized.

    Motivation (round-4 trace): at T=256/B=256 the batched dense
    assembly + permutation of a (B, 1279, 1279) tensor cost ~40 ms per
    IPM iteration while the banded factor kernel itself ran in 72 us.
    With hoisted H/Fu/Gu the per-iteration change to the KKT matrix is
    only the diagonal barrier weights lam/F, so the band is assembled
    directly in O(w * nF * nK) and every matvec (direction error,
    refinement residuals, curvature) uses the structured constituents
    in O(nU * (nF + nG)).
    """

    __slots__ = ("band", "P", "H", "Fu", "Gu", "dF", "addU", "addEq",
                 "nU", "nG")

    def __init__(self, band, P, H, Fu, Gu, dF, addU, addEq, nU, nG):
        self.band = band      # (nK, w+1) lower band, permuted order
        self.P = P            # (nK, nK) one-hot permutation
        self.H = H            # Hessian (unit scales; certified equal)
        self.Fu = Fu          # UNSCALED inequality Jacobian
        self.Gu = Gu
        # barrier diagonal weights WITH the inequality scaling folded
        # in: Fu_s' diag(lam/F) Fu_s = Fu' diag(dF) Fu, dF = lam/F s^2
        self.dF = dF
        self.addU = addU
        self.addEq = addEq
        self.nU = nU
        self.nG = nG

    def matvec(self, x):
        """WW @ x at HIGHEST precision via the constituents."""
        xu = x[: self.nU]
        xn = x[self.nU :]
        yu = hdot(self.H, xu) + self.addU * xu
        if self.dF.shape[0] > 0:
            yu = yu + hdot(self.Fu.T, self.dF * hdot(self.Fu, xu))
        if self.nG > 0:
            yu = yu + hdot(self.Gu.T, xn)
            yn = hdot(self.Gu, xu) - self.addEq * xn
            return jnp.concatenate([yu, yn])
        return yu

    def abs_rowsum_max(self):
        """Upper bound on max_i sum_j |WW[i, j]| (triangle inequality
        through the constituents) — the backward-error scale."""
        absFu = jnp.abs(self.Fu)
        ru = jnp.sum(jnp.abs(self.H), axis=1) + jnp.abs(self.addU)
        if self.dF.shape[0] > 0:
            ru = ru + absFu.T @ (self.dF * jnp.sum(absFu, axis=1))
        m = jnp.max(ru) if ru.shape[0] else jnp.zeros((), ru.dtype)
        if self.nG > 0:
            absGu = jnp.abs(self.Gu)
            ru_g = jnp.sum(absGu, axis=0)
            rn = jnp.sum(absGu, axis=1) + jnp.abs(self.addEq)
            m = jnp.maximum(m, jnp.max(ru + ru_g))
            m = jnp.maximum(m, jnp.max(rn))
        return m


class _Op11:
    """WW11 = H + addU I as a matvec-only operator (band mode)."""

    __slots__ = ("H", "addU")

    def __init__(self, H, addU):
        self.H = H
        self.addU = addU

    def __matmul__(self, x):
        return hdot(self.H, x) + self.addU * x


def _mvWW(WW, x):
    if isinstance(WW, BandKKT):
        return WW.matvec(x)
    return hdot(WW, x)


def _rough_solve(fac, rhs):
    """Unrefined f32 solve for the Mehrotra affine PREDICTOR: the
    affine direction only feeds the sigma heuristic and the second-order
    corrector, which tolerate predictor-level accuracy — skipping the
    refinement sweeps saves one kernel pass plus one exact matvec per
    iteration on the fleet backends."""
    f32 = getattr(fac, "_solve32", None)
    if f32 is not None:
        return f32(rhs).astype(rhs.dtype)
    return fac.solve(rhs)


def build_ipm(
    fns: IPMFunctions,
    nU: int,
    nF: int,
    nG: int,
    opts: SolverOptions,
    kkt_solver=None,
    hoist=(False, False, False),
    fleet_init=False,
    batch_guard=True,
    band_plan=None,
    hoist_scale_free=False,
    hoist_param_deps=None,
):
    """Build the jittable ``solve`` function for a problem instance.

    ``batch_guard=False`` drops the per-step ``lax.cond(st.done)``
    freeze wrapper: it exists ONLY so that vmapped lockstep fleets keep
    finished instances' iterates/status frozen while stragglers run; a
    single-instance solve exits through the while cond directly and the
    wrapper costs ~6 us/iteration of TPU sequencing (round-4 sls
    trace).  NEVER vmap a guard-less build.

    ``kkt_solver`` optionally overrides the dense KKT backend with a
    structured one (block-tridiagonal / arrow) exposing the same
    ``factor(WW_blocks) -> solve/derr/inertia`` contract.

    ``hoist`` = (H, Fu, Gu) iteration-invariance flags from
    :func:`tenscalc_tpu.ipm.hoist.analyze_hoistable`: flagged derivative
    matrices are computed once per solve before the while_loop instead
    of by AD in every iteration (the reference's reactive
    dependency-group behavior, lib/@csparse/dependencyGroups.m).

    ``fleet_init=True`` (set by the api layer when a Pallas fleet
    backend is installed) switches the nu initializer to a
    Jacobi-preconditioned CG on the normal equations, avoiding both a
    slow XLA batched dense LU and a second Mosaic kernel call site in
    the prologue.
    """
    hoist_H, hoist_Fu, hoist_Gu = hoist
    dt = opts.np_dtype
    variant = opts.variant
    small = bool(opts.smallerNewtonMatrix)  # None (unresolved) -> large
    nK = nU + nG + (0 if small else nF)
    # direct banded assembly (see BandKKT): possible when the KKT is
    # condensed, a banded plan exists, and every derivative matrix is
    # iteration-invariant (QP-like) so the band's constant part can be
    # extracted once per solve
    band_mode = (
        band_plan is not None
        and small
        and hoist_H
        and hoist_Fu
        and (nG == 0 or hoist_Gu)
        and nF > 0
        and kkt_solver is not None
        # the band-mode Hessian is evaluated at unit scales; requires
        # scale-independence when a scale actually varies at runtime
        and (hoist_scale_free or not (opts.scaleInequalities or
                                      opts.scaleCost > 0))
    )
    # per-iteration band assembly for NON-hoisted (nonlinear) problems:
    # the band STRUCTURE is certified by the planner even when the
    # values are iteration-dependent (the reference's ordering is
    # structural too, lib/@csparse/sparsity_ldl.m:40-62), so the band is
    # assembled from the per-iteration H/Fu/Gu without materializing the
    # dense (nK, nK) KKT: one row-permuting matmul + per-diagonal
    # masked row-sums replace the dense assembly + two-sided permutation
    # + extraction of FleetBandedFactorization (round-4 judge item #3).
    band_periter = (
        not band_mode
        and band_plan is not None
        and small
        and nF > 0
        and kkt_solver is not None
    )
    band_any = band_mode or band_periter

    # desired inertia (lib/ipmPD_CSsolver.c:164-169)
    mp_desired = float(nU)
    mn_desired = float(nG if small else nF + nG)

    I_U = jnp.eye(nU, dtype=dt)
    I_G = jnp.eye(nG, dtype=dt)

    # ------------------------------------------------------------------
    # scaled problem functions
    # ------------------------------------------------------------------
    def scaled_fns(penv, scale_ineq, scale_cost):
        def fs(u):
            return scale_cost * fns.f(u, penv)

        def Fs(u):
            if nF == 0:
                return jnp.zeros((0,), dt)
            return scale_ineq * fns.F(u, penv)

        def Gs(u):
            if nG == 0:
                return jnp.zeros((0,), dt)
            return fns.G(u, penv)

        def lagrangian(u, nu, lam):
            val = fs(u)
            if nF > 0:
                val = val - lam @ Fs(u)
            if nG > 0:
                val = val + nu @ Gs(u)
            return val

        return fs, Fs, Gs, lagrangian

    # ------------------------------------------------------------------
    # KKT assembly + direction (the formulation layer)
    # ------------------------------------------------------------------
    def assemble_ww(u, nu, lam, mu, addU, addEq, penv, scale_ineq, scale_cost,
                    pre=None, cached=None, band=False):
        """Derivatives + KKT matrix for the selected variant (no solves).

        Exposed for structure probing (kkt/structure.py plans the banded
        permutation from this matrix's sparsity pattern).  ``pre`` holds
        hoisted iteration-invariant derivative matrices (H/Fu/Gu);
        ``cached`` optionally carries (grad_u, Fval, Gval) already
        computed at this iterate by the driver's exit tests (the
        reference's reactive dependency groups evaluate these once per
        iteration for the same reason, writeCfunctionpergroup.m:44).
        """
        pre = pre or {}
        fs, Fs, Gs, lagr = scaled_fns(penv, scale_ineq, scale_cost)
        if cached is not None:
            grad_u, Fval_c, Gval_c = cached
        else:
            grad_u = jax.grad(lagr, argnums=0)(u, nu, lam)
            Fval_c = Gval_c = None
        H = pre.get("H")
        if H is None:
            H = jax.jacfwd(jax.grad(lagr, argnums=0), argnums=0)(u, nu, lam)
            H = 0.5 * (H + H.T)  # symmetrize AD jitter
        Fu = pre.get("Fu")
        if Fu is None:
            if band:
                # band modes carry the UNSCALED Jacobian (the scale
                # folds into the barrier diagonal / the operators)
                Fu = (
                    jax.jacfwd(lambda uu: fns.F(uu, penv))(u)
                    if nF > 0 else jnp.zeros((0, nU), dt)
                )
            else:
                Fu = jax.jacfwd(Fs)(u) if nF > 0 else jnp.zeros((0, nU), dt)
        Gu = pre.get("Gu")
        if Gu is None:
            Gu = jax.jacfwd(Gs)(u) if nG > 0 else jnp.zeros((0, nU), dt)
        Fval = Fs(u) if Fval_c is None else Fval_c
        Gval = Gs(u) if Gval_c is None else Gval_c
        # f_u is kept for out-of-loop callers (diagnostics.analyze_*);
        # the solver itself derives rhs terms from grad_u, so XLA
        # dead-code-eliminates this extra reverse pass inside the loop.
        f_u = jax.grad(fs)(u)

        WW11 = H + addU * I_U
        # f32 guard: the line search keeps F(u) > 0 in exact arithmetic
        # (for affine F it certifies Fval + alpha*Fu dU > 0), but the
        # re-evaluated F at the new iterate can ROUND to exactly 0 when
        # paired epigraph constraints both approach 0 (l1 problems:
        # |x| <= t with x, t -> 0) — and mu/0 = inf poisons the KKT
        # matrix into a NaN direction (reference f64 never sees this;
        # its floor is 1e-16-scale).  Clamp only the divisions: below
        # the floor the barrier term is saturated, and feasibility is
        # still enforced by fraction-to-boundary + the exit tests.
        # (floor 1e-8: after scaleInequalities the constraints are O(1),
        # so F below ~1e-7 is f32 rounding noise; a smaller floor would
        # turn a noise-negative F into an enormous barrier force)
        if nF > 0 and jnp.dtype(dt) != jnp.float64:
            Fdiv = jnp.maximum(Fval, jnp.asarray(1e-8, dt))
        else:
            Fdiv = Fval
        muF = mu / Fdiv if nF > 0 else jnp.zeros((0,), dt)

        if band:
            # direct banded assembly: band[c, i] = Wp[c+i, c] with
            # Wp = P W P^T.  Constant part (H, Gu blocks) extracted
            # once per solve (pre['band_const']); the per-iteration
            # change is only the barrier diagonal.  Fu here is the
            # UNSCALED Jacobian (prologue dummy hoist); the scaled
            # Fu_s' diag(dF) Fu_s equals Fu' diag(dF * s^2) Fu, so the
            # scale folds into the diagonal weights.
            dF = lam / Fdiv
            ds = dF * scale_ineq * scale_ineq
            if "band_const" in pre:
                # hoisted (QP-like): constant band + precomputed
                # per-diagonal pair products, once per solve
                w_band = pre["band_const"].shape[1] - 1
                cols = [
                    hdot(ds, pre["FuPP"][i]) for i in range(w_band + 1)
                ]
                bandv = pre["band_const"] + jnp.stack(cols, axis=1)
            else:
                # per-iteration (nonlinear): extract the band of
                # P [[H, Gu'], [Gu, 0]] P^T from the CURRENT H/Gu via
                # one-hot MXU permutation + strided jnp.diagonal views.
                # (A shifted-slice row-sum variant materialized w+1 full
                # (B, nK, nK) copies per iteration — ~750 ms/call at
                # B=512/nK=439 in the round-5 trace; diagonal extraction
                # is a layout-free strided read.)
                w_band = int(band_plan.bandwidth)
                Pm_ = pre["Pm"]
                hp_ = jax.lax.Precision.HIGHEST
                nK_ = nU + nG
                Wc = jnp.concatenate(
                    [
                        jnp.concatenate([H, Gu.T], axis=1),
                        jnp.concatenate(
                            [Gu, jnp.zeros((nG, nG), dt)], axis=1
                        ),
                    ],
                    axis=0,
                )
                Wp_ = jnp.matmul(
                    Pm_, jnp.matmul(Wc, Pm_.T, precision=hp_),
                    precision=hp_,
                )
                cols = []
                for i in range(w_band + 1):
                    d0 = jnp.diagonal(Wp_, offset=-i)
                    if i:
                        d0 = jnp.concatenate([d0, jnp.zeros((i,), dt)])
                    cols.append(d0)
                bandv = jnp.stack(cols, axis=1)
                # barrier band via per-diagonal pair products of the
                # permuted UNSCALED Jacobian (computed per iteration)
                Fubig = jnp.concatenate(
                    [Fu, jnp.zeros((nF, nG), dt)], axis=1
                )
                FuP = jnp.matmul(Fubig, Pm_.T, precision=hp_)
                bcols = []
                for i in range(w_band + 1):
                    gi = FuP[:, i:] * FuP[:, : nK_ - i]
                    if i:
                        gi = jnp.concatenate(
                            [gi, jnp.zeros((nF, i), dt)], axis=1
                        )
                    bcols.append(hdot(ds, gi))
                bandv = bandv + jnp.stack(bcols, axis=1)
            bandv = bandv.at[:, 0].add(
                addU * pre["bmask_u"] - addEq * pre["bmask_g"]
            )
            WWop = BandKKT(
                bandv, pre["Pm"], H, Fu, Gu, ds, addU, addEq, nU, nG
            )
            return dict(
                WW=WWop, WW11=_Op11(H, addU), grad_u=grad_u, f_u=f_u,
                Fu=Fu, Gu=Gu, Fval=Fval, Gval=Gval, muF=muF,
                LPG=None, Fdiv=Fdiv, dF=dF,
            )

        LPG = (lam / Fdiv)[:, None] * Fu if nF > 0 else jnp.zeros((0, nU), dt)

        if small:
            # condensed system (lib/ipmPD_CS.m:254-361): eliminate dLambda
            WWc = WW11 + (Fu.T @ LPG if nF > 0 else 0.0)
            WW = jnp.concatenate(
                [
                    jnp.concatenate([WWc, Gu.T], axis=1),
                    jnp.concatenate([Gu, -addEq * I_G], axis=1),
                ],
                axis=0,
            )
        elif variant == "timesLambda":
            # multiplicative-lambda KKT (ipmPD_CStimesLambda.m:235-252)
            row1 = jnp.concatenate([WW11, Gu.T, -(Fu.T * lam[None, :])], axis=1)
            row2 = jnp.concatenate(
                [Gu, -addEq * I_G, jnp.zeros((nG, nF), dt)], axis=1
            )
            row3 = jnp.concatenate(
                [
                    -(lam[:, None] * Fu),
                    jnp.zeros((nF, nG), dt),
                    -jnp.diag(Fval * lam),
                ],
                axis=1,
            )
            WW = jnp.concatenate([row1, row2, row3], axis=0)
        else:
            # standard large matrix (ipmPD_CS.m:362-434)
            row1 = jnp.concatenate([WW11, Gu.T, -Fu.T], axis=1)
            row2 = jnp.concatenate(
                [Gu, -addEq * I_G, jnp.zeros((nG, nF), dt)], axis=1
            )
            row3 = jnp.concatenate(
                [
                    -Fu,
                    jnp.zeros((nF, nG), dt),
                    -jnp.diag(Fval / lam) if nF > 0 else jnp.zeros((0, 0), dt),
                ],
                axis=1,
            )
            WW = jnp.concatenate([row1, row2, row3], axis=0)
        return dict(
            WW=WW, WW11=WW11, grad_u=grad_u, f_u=f_u, Fu=Fu, Gu=Gu,
            Fval=Fval, Gval=Gval, muF=muF, LPG=LPG, Fdiv=Fdiv,
        )

    def compute_direction(u, nu, lam, mu, addU, addEq, penv, scale_ineq,
                          scale_cost, pre=None, cached=None,
                          mehrotra_mu=None):
        """``mehrotra_mu``: optional callback
        ``(dU_a, dLambda_a, Fu, Fval) -> mu'`` invoked between the
        affine and combined solves.  The reference's reactive dataflow
        computes the affine direction, runs the affine line search,
        calls ``setMu__`` with the sigma-updated mu, and only then
        evaluates the combined direction — so the corrector rhs uses the
        NEW mu (lib/ipmPD_CSsolver.c:576-665 + the group invalidation of
        writeCfunctionpergroup.m:44).  Lagging the update by one
        iteration (the previous behavior) diverges on curvature-poor
        problems like robustRegressL1."""
        a = assemble_ww(u, nu, lam, mu, addU, addEq, penv, scale_ineq,
                        scale_cost, pre=pre, cached=cached, band=band_any)
        WW, WW11 = a["WW"], a["WW11"]
        grad_u, Fu, Gu = a["grad_u"], a["Fu"], a["Gu"]
        Fval, Gval, muF, LPG = a["Fval"], a["Gval"], a["muF"], a["LPG"]
        Fdiv = a["Fdiv"]
        mu_new = mu
        sigma_fired = jnp.asarray(False)

        if band_any:
            dF_w = a["dF"]

            def fu_mv(x):
                # scaled Jacobian as an operator: Fu_s @ x = s * (Fu x)
                return scale_ineq * hdot(Fu, x)

            def fuT_mv(y):
                return hdot(Fu.T, scale_ineq * y)

            def lpg_mv(x):
                # diag(lam/F) Fu_s @ x without materializing LPG
                return dF_w * fu_mv(x)
        else:
            def fu_mv(x):
                return Fu @ x

            def fuT_mv(y):
                return Fu.T @ y

            def lpg_mv(x):
                return LPG @ x

        if small:
            fac = _factor(WW)
            if not opts.skipAffine:
                b_a = jnp.concatenate(
                    [-grad_u - (fuT_mv(lam) if nF > 0 else 0.0), -Gval]
                )
                dx_a = _rough_solve(fac, b_a)
                dU_a = dx_a[:nU]
                dLambda_a = (
                    -lpg_mv(dU_a) - lam if nF > 0 else jnp.zeros((0,), dt)
                )
                use_corr = jnp.ones((), dt)
                if mehrotra_mu is not None:
                    mu_new, sigma_fired = mehrotra_mu(
                        dU_a, dLambda_a, fu_mv, Fval
                    )
                    use_corr = sigma_fired.astype(dt)
                muF_c = mu_new / Fdiv if nF > 0 else muF
                # Mehrotra correction (lib/ipmPD_CS.m:319-322), gated on
                # a useful affine step (see mehrotra_mu)
                Meh = (
                    use_corr * fu_mv(dU_a) * dLambda_a / Fdiv
                    if nF > 0 else jnp.zeros((0,), dt)
                )
                r1 = -grad_u - (fuT_mv(lam - muF_c + Meh) if nF > 0 else 0.0)
                b = jnp.concatenate([r1, -Gval])
            else:
                # rhs via the Lagrangian-gradient identity
                # f_u + Gu'nu = grad_u + Fu'lam  (one reverse pass, not two)
                muF_c = muF
                r1 = -grad_u - (fuT_mv(lam - muF) if nF > 0 else 0.0)
                b = jnp.concatenate([r1, -Gval])
            dx = fac.solve(b)
            dU = dx[:nU]
            dNu = dx[nU:]
            if nF > 0:
                dLambda = muF_c - lpg_mv(dU) - lam
                if not opts.skipAffine:
                    dLambda = dLambda - Meh
            else:
                dLambda = jnp.zeros((0,), dt)
            if opts.skipAffine:
                dU_a = jnp.zeros((nU,), dt)
                dLambda_a = jnp.zeros((nF,), dt)
        else:
            if variant == "timesLambda":
                b = jnp.concatenate([-grad_u, -Gval, lam * Fval - mu * jnp.ones((nF,), dt)])
                fac = _factor(WW)
                dx = fac.solve(b)
                dU_a = jnp.zeros((nU,), dt)
                dLambda_a = jnp.zeros((nF,), dt)
            else:
                fac = _factor(WW)
                if opts.skipAffine:
                    b = jnp.concatenate(
                        [-grad_u, -Gval, Fval - mu / lam if nF > 0 else jnp.zeros((0,), dt)]
                    )
                    dU_a = jnp.zeros((nU,), dt)
                    dLambda_a = jnp.zeros((nF,), dt)
                else:
                    b_a = jnp.concatenate([-grad_u, -Gval, Fval])
                    dx_a = _rough_solve(fac, b_a)
                    dU_a = dx_a[:nU]
                    dLambda_a = dx_a[nU + nG:]
                    use_corr = jnp.ones((), dt)
                    if mehrotra_mu is not None:
                        mu_new, sigma_fired = mehrotra_mu(
                            dU_a, dLambda_a, fu_mv, Fval
                        )
                        use_corr = sigma_fired.astype(dt)
                    corr = (
                        use_corr * (Fu @ dU_a) * dLambda_a / lam - mu_new / lam
                        if nF > 0
                        else jnp.zeros((0,), dt)
                    )
                    b = jnp.concatenate([-grad_u, -Gval, Fval + corr])
                dx = fac.solve(b)
            dU = dx[:nU]
            dNu = dx[nU : nU + nG]
            dLambda = dx[nU + nG :]

        derr = _norminf(_mvWW(WW, dx) - b)
        curvature = dU @ (WW11 @ dU)
        mp, mn = fac.inertia()
        if jnp.dtype(dt) == jnp.float64:
            bscale = _norminf(b)
        else:
            # backward-error scale bound ||WW||_inf ||dx||_inf + ||b||:
            # the f32 residual floor comes from cancellation against the
            # matvec's intermediate magnitudes, not the rhs size (the
            # lam/F rows of a warm-start KKT reach 1e6+ while b -> 0).
            # The row-sum norm bound costs one reduction instead of an
            # exact || |WW| |dx| || matvec per iteration.
            rs = (
                WW.abs_rowsum_max()
                if isinstance(WW, BandKKT)
                else jnp.max(jnp.sum(jnp.abs(WW), axis=-1))
            )
            bscale = rs * _norminf(dx) + _norminf(b)
        # slim the adaptation-loop carry: grad_u/Fval/Gval are the
        # cached exit-test values (identical across the loop) and a
        # hoisted Fu is loop-invariant — carrying them re-copies
        # B x (nF x nU + ...) per trip (round-4 ablation: ~1 ms/iter at
        # B=1024).  The driver reconstructs them (see _iterate).
        if cached is not None and (hoist_Fu or nF == 0):
            aux = ()
        else:
            aux = (grad_u, Fu, Fval, Gval)
        return Direction(dU, dNu, dLambda, derr, curvature, mp, mn,
                         mu_new, sigma_fired, bscale), aux

    def _factor(WW):
        if kkt_solver is not None:
            return kkt_solver(WW)
        return kkt_factorize(WW, need_inertia=opts.useInertia, block=opts.ldl_block,
                             n_refine=opts.refine_for("dense"))


    # ------------------------------------------------------------------
    # batched backtracking line search (lib/ipmPD_CSsolver.c:679-756)
    # ------------------------------------------------------------------
    def line_search_s(minF_of_alpha, alpha_bt):
        return line_search_combined(minF_of_alpha, alpha_bt, opts, dt)

    def line_search_a(minF_of_alpha, alpha_max_):
        return line_search_affine(minF_of_alpha, alpha_max_, opts, dt)

    # ------------------------------------------------------------------
    # the driver loop
    # ------------------------------------------------------------------
    def solve(
        u0,
        penv,
        mu0=1.0,
        max_iter: Optional[int] = None,
        addU0=1e-9,
        addEq0=1e-9,
        save_iter=-1,
    ) -> IPMResult:
        max_iter_v = jnp.asarray(
            opts.maxIter if max_iter is None else max_iter, jnp.int32
        )
        save_iter_v = jnp.asarray(save_iter, jnp.int32)
        u0 = jnp.asarray(u0, dt)
        mu0 = jnp.asarray(mu0, dt)
        addU0 = jnp.asarray(addU0 if opts.addEye2Hessian else 0.0, dt)
        addEq0 = jnp.asarray(addEq0 if opts.addEye2Hessian else 0.0, dt)

        # scaling factors, computed once at the initial point
        # (scaleIneq__/scaleCost__ copies, ipmPD_CStimesLambda.m:86-103)
        if nF > 0 and opts.scaleInequalities:
            scale_ineq = jnp.abs(1.0 / fns.F(u0, penv)).astype(dt)
        else:
            scale_ineq = jnp.ones((nF,), dt)
        if opts.scaleCost > 0:
            scale_cost = jnp.abs(opts.scaleCost / fns.f(u0, penv)).astype(dt)
        else:
            scale_cost = jnp.ones((), dt)

        fs, Fs, Gs, lagr = scaled_fns(penv, scale_ineq, scale_cost)

        desired_gap = jnp.where(
            opts.scaleCost > 0,
            opts.desiredDualityGap * scale_cost,
            jnp.asarray(opts.desiredDualityGap, dt),
        )
        mu_min = desired_gap / max(nF, 1) / 2.0

        # dual initialization (initDualIneq__ / initDualEqX__)
        nu_init_res = None  # set by the CG nu-initializer (fleet paths)
        lam0 = mu0 / Fs(u0) if nF > 0 else jnp.zeros((0,), dt)
        if nG > 0:
            # least-squares nu init (ipmPD_CStimesLambda.m:212-217)
            Gu0 = jax.jacfwd(Gs)(u0)
            Fu0 = jax.jacfwd(Fs)(u0) if nF > 0 else jnp.zeros((0, nU), dt)
            f_u0 = jax.grad(fs)(u0)
            WW0 = jnp.concatenate(
                [
                    jnp.concatenate([I_U, Gu0.T], axis=1),
                    jnp.concatenate([Gu0, -addEq0 * I_G], axis=1),
                ],
                axis=0,
            )
            b0 = jnp.concatenate(
                [(Fu0.T @ lam0 if nF > 0 else 0.0) - f_u0, jnp.zeros((nG,), dt)]
            )
            if fleet_init:
                # fleet path: eliminating x from
                # [I, Gu'; Gu, -eps I][x; nu] = [b; 0] gives the SPD
                # normal equations (Gu Gu' + eps I) nu = Gu b, solved by
                # fixed-iteration Jacobi-preconditioned CG — pure XLA
                # vector ops.  The dense batched LU here costs ~100 ms
                # at B=1024 (XLA batched small-matrix linalg is
                # uniformly slow on TPU), and adding a second Mosaic
                # kernel call site in the prologue hangs the remote
                # Mosaic compiler; nu0 is only an initializer so modest
                # CG accuracy is enough (ipmPD_CStimesLambda.m:212-217
                # solves the same regularized LS).  The diagonal
                # preconditioner keeps the squared condition number of
                # Gu from stalling the fixed iteration count.
                btop = b0[:nU]
                rhs0 = Gu0 @ btop
                eps0 = jnp.maximum(addEq0, jnp.asarray(1e-8, dt))
                Mdiag = jnp.sum(Gu0 * Gu0, axis=1) + eps0

                def Aop(v):
                    return Gu0 @ (Gu0.T @ v) + eps0 * v

                def cg_body(_, carry):
                    x, r, p, rz = carry
                    Ap = Aop(p)
                    alpha = rz / jnp.maximum(p @ Ap, jnp.asarray(1e-30, dt))
                    x = x + alpha * p
                    r = r - alpha * Ap
                    z = r / Mdiag
                    rz_new = r @ z
                    beta = rz_new / jnp.maximum(rz, jnp.asarray(1e-30, dt))
                    return (x, r, z + beta * p, rz_new)

                x0c = jnp.zeros((nG,), dt)
                z0c = rhs0 / Mdiag
                n_cg = min(2 * nG, 100)
                nu0, r_fin, *_ = lax.fori_loop(
                    0, n_cg, cg_body, (x0c, rhs0, z0c, rhs0 @ z0c)
                )
                nu_init_res = _norminf(r_fin)
                if opts.verboseLevel >= 4:
                    # surface ill-conditioned inits (ADVICE r2)
                    jax.debug.print(
                        "nu-init CG residual: {r:8.1e} (|rhs| {b:8.1e})",
                        r=nu_init_res, b=_norminf(rhs0),
                    )
            else:
                from ..kkt.dense import lu_solve_mixed

                nu0 = lu_solve_mixed(WW0, b0)[nU:]
        else:
            nu0 = jnp.zeros((0,), dt)

        # hoist iteration-invariant derivative matrices out of the loop
        # (QP-like problems: constant Hessian, linear constraints)
        pre = {}
        if band_mode:
            # Band mode evaluates the certified-invariant derivatives at
            # a CONSTANT dummy iterate and UNIT scales: the results are
            # then pure functions of the parameters, so a fleet with
            # shared parameters computes them once for the whole batch
            # (computed from the batched u0 they would carry a spurious
            # batch axis and every downstream matvec would broadcast the
            # Jacobian per instance — round-4 trace: ~60% of the
            # long-horizon iteration).  pre['Fu'] is the UNSCALED
            # Jacobian here; scaling is applied operator-style
            # (fu_mv/fuT_mv) everywhere downstream.
            u_d = jnp.zeros((nU,), dt)
            nu_d = jnp.zeros((nG,), dt)
            lam_d = jnp.ones((nF,), dt)
            ones_f = jnp.ones((nF,), dt)
            one_c = jnp.ones((), dt)

            def _mask_env(deps):
                # parameters the derivative's VALUE does not depend on
                # are replaced by constant zeros: under a vmapped fleet
                # the hoisted tensor then carries no spurious batch axis
                # (hoist.param_value_deps)
                if deps is None:
                    return penv
                return {
                    k: (v if k in deps else jnp.zeros_like(v))
                    for k, v in penv.items()
                }

            h_deps, fu_deps, gu_deps = (
                hoist_param_deps
                if hoist_param_deps is not None
                else (None, None, None)
            )
            _, _, _, lagr_d = scaled_fns(_mask_env(h_deps), ones_f, one_c)
            H0 = jax.jacfwd(jax.grad(lagr_d, argnums=0), argnums=0)(
                u_d, nu_d, lam_d
            )
            pre["H"] = 0.5 * (H0 + H0.T)
            penv_fu = _mask_env(fu_deps)
            pre["Fu"] = jax.jacfwd(lambda uu: fns.F(uu, penv_fu))(u_d)
            if nG > 0:
                penv_gu = _mask_env(gu_deps)
                pre["Gu"] = jax.jacfwd(lambda uu: fns.G(uu, penv_gu))(u_d)
        else:
            if hoist_H:
                H0 = jax.jacfwd(jax.grad(lagr, argnums=0), argnums=0)(
                    u0, nu0, lam0
                )
                pre["H"] = 0.5 * (H0 + H0.T)
            if hoist_Fu and nF > 0:
                # per-iteration band mode consumes the UNSCALED Jacobian
                # (the scale folds into the barrier diagonal weights)
                pre["Fu"] = (
                    jax.jacfwd(lambda uu: fns.F(uu, penv))(u0)
                    if band_periter
                    else jax.jacfwd(Fs)(u0)
                )
            if hoist_Gu and nG > 0:
                pre["Gu"] = jax.jacfwd(Gs)(u0)

        if band_periter:
            # structural band plan only: permutation + diagonal masks;
            # the band VALUES are extracted per iteration in assemble_ww
            import numpy as _np

            perm_np = _np.asarray(band_plan.perm)
            pre["Pm"] = jnp.asarray(
                _np.eye(nK, dtype=_np.float64)[perm_np], dt
            )
            pre["bmask_u"] = jnp.asarray(perm_np < nU, dt)
            pre["bmask_g"] = jnp.asarray(perm_np >= nU, dt)

        if band_mode:
            # banded-assembly precompute (once per solve; see BandKKT):
            # constant band of P [[H, Gu'], [Gu, 0]] P^T, the permuted
            # UNSCALED inequality Jacobian FuP[k, c] = Fu_big[k, perm[c]]
            # with its per-diagonal pair products, and the permuted
            # diagonal block masks
            import numpy as _np

            perm_np = _np.asarray(band_plan.perm)
            w_b = int(band_plan.bandwidth)
            Pm = jnp.asarray(_np.eye(nK, dtype=_np.float64)[perm_np], dt)
            hp_ = jax.lax.Precision.HIGHEST
            H0p = pre["H"]
            Gu0p = pre.get("Gu", jnp.zeros((nG, nU), dt))
            Wconst = jnp.concatenate(
                [
                    jnp.concatenate([H0p, Gu0p.T], axis=1),
                    jnp.concatenate(
                        [Gu0p, jnp.zeros((nG, nG), dt)], axis=1
                    ),
                ],
                axis=0,
            )
            Wp0 = jnp.matmul(
                Pm, jnp.matmul(Wconst, Pm.T, precision=hp_), precision=hp_
            )
            cols0 = []
            for i in range(w_b + 1):
                d0 = jnp.diagonal(Wp0, offset=-i)
                if i:
                    d0 = jnp.concatenate([d0, jnp.zeros((i,), dt)])
                cols0.append(d0)
            pre["band_const"] = jnp.stack(cols0, axis=1)
            Fubig = jnp.concatenate(
                [pre["Fu"], jnp.zeros((nF, nG), dt)], axis=1
            )
            FuP = jnp.matmul(Fubig, Pm.T, precision=hp_)
            # per-diagonal pair products: band_F[c, i] =
            # sum_k ds_k FuP[k, c+i] FuP[k, c] = (ds @ FuPP[i])[c] —
            # ONE vector-matrix product per diagonal at runtime (a GEMM
            # across a batch), no (nF, nK)-scale per-iteration tensors
            pads = []
            for i in range(w_b + 1):
                gi = FuP[:, i:] * FuP[:, : nK - i]
                if i:
                    gi = jnp.concatenate(
                        [gi, jnp.zeros((nF, i), dt)], axis=1
                    )
                pads.append(gi)
            pre["FuPP"] = jnp.stack(pads, axis=0)
            pre["bmask_u"] = jnp.asarray(perm_np < nU, dt)
            pre["bmask_g"] = jnp.asarray(perm_np >= nU, dt)
            pre["Pm"] = Pm

        hist0 = jnp.full(
            (opts.maxIter if opts.profiling else 0, 8), jnp.nan, dt
        )
        snap0 = (
            (
                jnp.zeros((nU,), dt), jnp.zeros((nG,), dt),
                jnp.zeros((nF,), dt), jnp.zeros((), dt),
                jnp.zeros((), dt), jnp.zeros((), dt),
            )
            if opts.allowSave
            else ()
        )
        state0 = IPMState(
            snap=snap0,
            u=u0,
            nu=nu0,
            lam=lam0,
            mu=mu0,
            addU=addU0,
            addEq=addEq0,
            addU_next=addU0,
            addEq_next=addEq0,
            alphaPrimal=jnp.zeros((), dt),
            alphaDualIneq=jnp.zeros((), dt),
            alphaDualEq=jnp.zeros((), dt),
            status=jnp.zeros((), jnp.int32),
            it=jnp.zeros((), jnp.int32),
            done=jnp.asarray(False),
            hist=hist0,
            derr_prev=jnp.asarray(jnp.inf, dt),
            inc_prev=jnp.asarray(False),
        )

        def exit_metrics(st: IPMState):
            grad_u = jax.grad(lagr, argnums=0)(st.u, st.nu, st.lam)
            norminf_grad = _norminf(grad_u)
            Gval = Gs(st.u)
            norminf_eq = _norminf(Gval)
            Fval = Fs(st.u)
            if nF > 0:
                gap = st.lam @ Fval
                ineq = jnp.min(Fval)
                dual = jnp.min(st.lam)
            else:
                gap = jnp.zeros((), dt)
                ineq = jnp.asarray(jnp.inf, dt)
                dual = jnp.asarray(jnp.inf, dt)
            return (norminf_grad, norminf_eq, gap, ineq, dual,
                    (grad_u, Fval, Gval))

        def body(st: IPMState) -> IPMState:
            # Under vmap, the batched while_loop keeps stepping until every
            # instance is done; finished instances must be frozen exactly
            # (iteration count, status, iterates all stay theirs).
            if not batch_guard:
                # single-instance build: the while cond (~st.done) already
                # guarantees st.done is False here
                return _step(st)
            return lax.cond(st.done, lambda s: s, _step, st)

        def _step(st: IPMState) -> IPMState:
            it = st.it + 1
            # apply delayed regularization updates
            # (lib/ipmPD_CSsolver.c:396-405)
            addU = st.addU_next
            addEq = st.addEq_next

            (norminf_grad, norminf_eq, gap, ineq, dual,
             cached_vals) = exit_metrics(st)

            # exit tests (lib/ipmPD_CSsolver.c:308-381)
            status = jnp.zeros((), jnp.int32)
            fail_maxiter = it > max_iter_v
            status = jnp.where(fail_maxiter, 8, status)
            fail_nan = jnp.isnan(norminf_grad)
            status = jnp.where(fail_nan & (status == 0), 4, status)
            # Feasibility failure tests.  The reference uses exact
            # ineq <= 0 in f64 (lib/ipmPD_CSsolver.c:323-360); in f32 a
            # legitimately-active constraint (l1 epigraph pairs at the
            # optimum) ROUNDS to 0 or to -eps-scale while the solve is
            # healthy, so the f32 test fails only on meaningfully
            # negative values (constraints are O(1) after
            # scaleInequalities; 1e-6 ~ 8 ulps at that scale).
            if jnp.dtype(dt) == jnp.float64:
                def _infeasible(v):
                    return v <= 0
            else:
                def _infeasible(v):
                    return v < -1e-6
            fail_ineq = (
                jnp.asarray(False) if nF == 0 else _infeasible(ineq)
            )
            status = jnp.where(fail_ineq & (status == 0), 1, status)
            fail_dual = (
                jnp.asarray(False) if nF == 0 else _infeasible(dual)
            )
            status = jnp.where(fail_dual & (status == 0), 2, status)

            converged = norminf_grad <= opts.gradTolerance
            if nF > 0:
                converged &= gap <= desired_gap
            if nG > 0:
                converged &= norminf_eq <= opts.equalTolerance
            if opts.addEye2Hessian and opts.adjustAddEye2Hessian:
                converged &= addU <= opts.addEye2HessianUtolerance
            early_exit = fail_maxiter | fail_nan | fail_ineq | fail_dual | converged

            def run_iteration(_):
                return _iterate(
                    st._replace(it=it, addU=addU, addEq=addEq),
                    norminf_grad,
                    norminf_eq,
                    gap,
                    cached_vals,
                )

            def stop(_):
                return st._replace(
                    it=it,
                    addU=addU,
                    addEq=addEq,
                    addU_next=addU,
                    addEq_next=addEq,
                    status=status,
                    done=jnp.asarray(True),
                )

            return lax.cond(early_exit, stop, run_iteration, None)

        def _iterate(st: IPMState, norminf_grad, norminf_eq, gap,
                     cached_vals) -> IPMState:
            u, nu, lam, mu = st.u, st.nu, st.lam, st.mu
            addU, addEq = st.addU, st.addEq

            def mehrotra_mu(dU_a, dLambda_a, fu_mv_, Fval_):
                # affine line search + sigma = rho^delta mu update,
                # applied BEFORE the combined solve exactly as the
                # reference's reactive groups do
                # (lib/ipmPD_CSsolver.c:579-665).  ``fu_mv_`` applies
                # the (scaled) inequality Jacobian as an operator.
                FdU_a = fu_mv_(dU_a)
                maxAlphaP_a = _clp(Fval_, FdU_a)
                maxAlphaDI_a = _clp(lam, dLambda_a)
                aMax = jnp.minimum(
                    jnp.minimum(maxAlphaP_a, opts.alphaMax), maxAlphaDI_a
                )
                if hoist_Fu and opts.linesearch_affine_F:
                    def minF_a(alpha):
                        return jnp.min(Fval_ + alpha * FdU_a)
                else:
                    def minF_a(alpha):
                        return jnp.min(Fs(u + alpha * dU_a))
                alpha_a = line_search_a(minF_a, aMax)
                newF_a = (
                    Fval_ + alpha_a * FdU_a
                    if hoist_Fu and opts.linesearch_affine_F
                    else Fs(u + alpha_a * dU_a)
                )
                newLam_a = lam + alpha_a * dLambda_a
                rho = (newF_a @ newLam_a) / gap
                sigma = jnp.clip(rho, 0.0, 1.0)
                sigma = sigma**2 if opts.delta == 2 else sigma**3
                eq_ok = (
                    jnp.asarray(True)
                    if nG == 0
                    else (norminf_eq < 100 * opts.equalTolerance)
                    | (norminf_eq < 1e-3)
                )
                do_sigma = (alpha_a > opts.alphaMax / 2) & eq_ok
                # rate-limit the sigma decrease to the aggressive
                # factor: sigma = rho^3 after one long affine step can
                # crush mu orders of magnitude while the iterate is
                # still far from optimal (sls cold start: mu hit 1e-5
                # at |grad| = 64, then ~25 fraction-to-boundary-limited
                # iterations), so one iteration may cut mu by at most
                # min(muFactorAggressive, sqrt(mu)) — the same bound the
                # reference's aggressive branch uses
                # (lib/ipmPD_CSsolver.c:787-800).
                mu_floor = mu * jnp.minimum(
                    opts.muFactorAggressive, jnp.sqrt(mu)
                )
                mu_c = jnp.where(
                    do_sigma,
                    jnp.maximum(
                        jnp.maximum(sigma * gap / nF, mu_floor), mu_min
                    ),
                    mu,
                )
                # the second-order corrector is only trustworthy when
                # the affine prediction was useful (long affine step):
                # an almost-rejected affine direction produces a
                # corrector that points far outside the trust region and
                # can diverge curvature-poor problems (robustRegressL1).
                # The same gate the reference applies to sigma is
                # applied to the corrector (production IPMs gate the
                # corrector similarly).
                return mu_c, do_sigma

            meh = (
                mehrotra_mu if (not opts.skipAffine and nF > 0) else None
            )

            def direction(aU, aE):
                # cached_vals (grad_u/Fval/Gval at this iterate, computed
                # by the exit tests) are independent of the aU/aE
                # regularizations, so they stay valid across the adapt loop
                return compute_direction(
                    u, nu, lam, mu, aU, aE, penv, scale_ineq, scale_cost,
                    pre=pre, cached=cached_vals, mehrotra_mu=meh,
                )

            addU_next, addEq_next = addU, addEq
            inc_state = jnp.asarray(False)
            if not (opts.addEye2Hessian and opts.adjustAddEye2Hessian):
                dirn, aux = direction(addU, addEq)
            else:
                # (lib/ipmPD_CSsolver.c:393-548) — phrased as a
                # solve-at-least-once while_loop so the KKT solve is traced
                # exactly once (compile time): when the direction is bad
                # (curvature <= 0 and, with useInertia, wrong inertia) the
                # regularization is increased immediately and the loop body
                # re-solves once with the larger epsilon.
                MIN, MAX = opts.addEye2HessianMIN, opts.addEye2HessianMAX

                shapes = jax.eval_shape(direction, addU, addEq)
                zeros = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes
                )

                def _derr_gate(d):
                    # reference: absolute 1e-6 in f64
                    # (lib/ipmPD_CSsolver.c:145-148); in f32 relative to
                    # the backward-error scale, since the f32 residual
                    # floor is ~eps32 * || |WW| |dx| || (see
                    # compute_direction's bscale)
                    if jnp.dtype(dt) == jnp.float64:
                        return jnp.asarray(opts.maxDirectionError, dt)
                    return opts.maxDirectionError * jnp.maximum(
                        jnp.ones((), dt), jnp.minimum(d.bscale, 1e30)
                    )

                def is_good(d):
                    g = d.curvature > 0
                    if opts.useInertia:
                        g |= (d.mp == mp_desired) & (d.mn == mn_desired)
                    # the reference ALSO re-solves in-iteration on a bad
                    # direction (ipmPD_CSsolver.c:393-548) — without
                    # this, a cond~1/eps KKT in f32 produces an inf
                    # direction whose NaN reaches lambda before the
                    # delayed next-iteration bump can act (round-4 l1l2
                    # finding).  Only NON-FINITE directions retry here:
                    # a finite direction with a large norm-wise residual
                    # on an IPM-endgame KKT is still a usable step
                    # (structured-perturbation sense) and the line
                    # search + delayed x10/x0.75 adjustment own that
                    # case; retrying on it pumps addU to its ceiling
                    # without improving derr (conditioning comes from
                    # the lam/F rows, which addU does not touch).
                    g &= jnp.isfinite(d.derr) & jnp.isfinite(d.bscale)
                    return g

                # enough x10 bumps to climb 1e-9 -> 1e2 in ONE iteration,
                # like the reference's bounded in-iteration loop
                K_ADAPT = 14

                def adapt_cond(carry):
                    k, need, *_ = carry
                    return need

                def adapt_body(carry):
                    k, _, aU, aE, _old = carry
                    res = direction(aU, aE)
                    d = res[0]
                    # finite-but-bad directions (wrong curvature/inertia)
                    # retry ONCE, as the delayed adjustment owns the
                    # slow path (a nonconvex problem may never reach
                    # curvature > 0 and K_ADAPT bumps would pin addU at
                    # its ceiling and stall the line search); NON-FINITE
                    # directions keep climbing — every bump is forced,
                    # the alternative is NaN reaching the iterate
                    finite = jnp.isfinite(d.derr) & jnp.isfinite(d.bscale)
                    retry = (~is_good(d)) & jnp.where(
                        finite, k == 0, k < K_ADAPT
                    )
                    if opts.useInertia:
                        not_enough_pos = d.mp < mp_desired
                        facU = jnp.where(not_enough_pos, 10.0, 2.0)
                        facE = jnp.where(not_enough_pos, 2.0, 10.0)
                    else:
                        facU, facE = 10.0, 10.0
                    aU2 = jnp.where(
                        retry & (aU < MAX),
                        jnp.minimum(facU * jnp.maximum(aU, MIN), MAX),
                        aU,
                    )
                    aE2 = jnp.where(
                        retry & (aE < MAX),
                        jnp.minimum(facE * jnp.maximum(aE, MIN), MAX),
                        aE,
                    )
                    return k + 1, retry, aU2, aE2, res

                k, _, addU, addEq, (dirn, aux) = lax.while_loop(
                    adapt_cond,
                    adapt_body,
                    (jnp.zeros((), jnp.int32), jnp.asarray(True), addU, addEq, zeros),
                )
                was_retry = k > 1

                # delayed adjustments for the next iteration, applied only
                # when the first direction was acceptable (the reference's
                # updateAddEye2Hessian* flags)
                derr = dirn.derr
                # Delayed next-iteration adjustment, gated the same way:
                # absolute 1e-6 in f64 (reference semantics); in f32
                # relative to the backward-error scale — the absolute
                # gate is unreachable on problems whose KKT magnitudes
                # are large (l1l2estimation: ~4e4) and addEye2Hessian
                # would ratchet x10 every iteration to its ceiling
                # (round-4 finding: status 1 in f32, clean in f64).
                derr_gate = _derr_gate(dirn)
                dec = derr < derr_gate
                inc_guard = jnp.asarray(True)
                if jnp.dtype(dt) != jnp.float64:
                    # cross-iteration progress guard (f32): if the
                    # PREVIOUS iteration already raised the
                    # regularization and derr did not improve 2x,
                    # raising further cannot help — the residual floor
                    # comes from the lam/F conditioning, which addU
                    # does not touch — and ratcheting to the ceiling
                    # blocks convergence via the
                    # addEye2HessianUtolerance test (round-4 l1l2:
                    # status 0x808 at the solution)
                    inc_guard = (~st.inc_prev) | (derr < 0.5 * st.derr_prev)
                # NaN-safe: a NaN direction error must count as "too
                # large" or a blown-up factorization escapes recovery
                inc = ~(derr <= derr_gate) & inc_guard
                addU_next = jnp.where(
                    dec & (addU > MIN), jnp.maximum(0.75 * addU, MIN), addU
                )
                addU_next = jnp.where(
                    inc & (addU < MAX),
                    jnp.minimum(10.0 * jnp.maximum(addU, MIN), MAX),
                    addU_next,
                )
                addEq_next = jnp.where(
                    dec & (addEq > MIN), jnp.maximum(0.75 * addEq, MIN), addEq
                )
                addEq_next = jnp.where(
                    inc & (addEq < MAX),
                    jnp.minimum(10.0 * jnp.maximum(addEq, MIN), MAX),
                    addEq_next,
                )
                addU_next = jnp.where(was_retry, addU, addU_next)
                addEq_next = jnp.where(was_retry, addEq, addEq_next)
                inc_state = inc

            if aux == ():
                # reconstructed: cached exit-test values + hoisted Fu
                grad_u, Fval, Gval = cached_vals
                Fu = pre.get("Fu", jnp.zeros((nF, nU), dt))
            else:
                grad_u, Fu, Fval, Gval = aux

            # allowSave snapshot at the selected iterate (post-adapt
            # regularizations — the state whose WW the reference's
            # saveWW__ would dump, lib/ipmPD_CS.m:511-515)
            snap = st.snap
            if opts.allowSave:
                take = st.it == save_iter_v
                cur = (u, nu, lam, mu, addU, addEq)
                snap = tuple(
                    jnp.where(take, c, s) for c, s in zip(cur, snap)
                )

            dU, dNu, dLambda = dirn.dU, dirn.dNu, dirn.dLambda

            # hoist_Fu == True certifies dF/du is u-independent, i.e. F is
            # affine in u, so F(u+a*dU) = Fval + a*(Fu@dU) exactly — the
            # line-search grid becomes one broadcast instead of
            # 2*(K+2) constraint-function evaluations (the reference's
            # reactive groups get the same effect from linear F rows
            # costing one I_sumprod each).
            F_affine = hoist_Fu and nF > 0 and opts.linesearch_affine_F
            if nF > 0:
                # band mode carries the UNSCALED Jacobian in aux
                FdU = (
                    scale_ineq * hdot(Fu, dU) if band_any else Fu @ dU
                )
            else:
                FdU = None

            if F_affine:
                def minF_at(alpha):
                    return jnp.min(Fval + alpha * FdU)
            else:
                def minF_at(alpha):
                    return (
                        jnp.min(Fs(u + alpha * dU))
                        if nF > 0
                        else jnp.asarray(jnp.inf, dt)
                    )

            nan_fail = jnp.asarray(False)

            if nF == 0:
                # no inequalities: full step (lib/ipmPD_CSsolver.c:550-569)
                alphaPrimal = jnp.asarray(opts.alphaMax, dt)
                alphaDualEq = jnp.asarray(opts.alphaMax, dt)
                alphaDualIneq = jnp.zeros((), dt)
                new_u = u + alphaPrimal * dU
                new_nu = nu + alphaDualEq * dNu
                new_lam = lam
                new_mu = mu
            else:
                # Mehrotra: mu was sigma-updated inside compute_direction
                # (before the combined solve); carry it into the state
                new_mu = dirn.mu_new

                # combined-direction fraction-to-boundary + backtracking
                maxAlphaPrimal = _clp(Fval, FdU)
                if variant == "timesLambda" and not small:
                    maxAlphaDualIneq = _clp(jnp.ones((nF,), dt), dLambda)
                else:
                    maxAlphaDualIneq = _clp(lam, dLambda)
                alphaP = maxAlphaPrimal
                if opts.coupledAlphas:
                    alphaP = jnp.minimum(alphaP, maxAlphaDualIneq)
                alpha_bt = jnp.minimum(alphaP * STEPBACK, opts.alphaMax)
                alphaPrimal, nan_fail = line_search_s(minF_at, alpha_bt)

                if opts.coupledAlphas:
                    alphaDualIneq = alphaPrimal
                    alphaDualEq = alphaPrimal
                else:
                    alphaDualIneq = jnp.minimum(
                        maxAlphaDualIneq * STEPBACK, alpha_bt
                    )
                    alphaDualEq = alphaDualIneq

                new_u = u + alphaPrimal * dU
                new_nu = nu + alphaDualEq * dNu
                if variant == "timesLambda" and not small:
                    new_lam = lam * (1.0 + alphaDualIneq * dLambda)
                else:
                    new_lam = lam + alphaDualIneq * dLambda

                # mu schedule (lib/ipmPD_CSsolver.c:782-859).  With
                # skipAffine this IS the mu update; with Mehrotra it is
                # the FALLBACK for iterations where the sigma update did
                # not fire (short affine step / large eq residual) — the
                # reference freezes mu there, which stalls cold starts
                # whose affine steps are fraction-to-boundary-limited
                # for many iterations (sls: 54 frozen vs 13 with the
                # fallback).
                th_grad = norminf_grad < jnp.maximum(1e-6, opts.gradTolerance)
                th_eq = (
                    jnp.asarray(True)
                    if nG == 0
                    else norminf_eq < jnp.maximum(1e-5, opts.equalTolerance)
                )
                aggressive = (alphaPrimal > alpha_bt / 2) & th_grad & th_eq
                mu_aggr = jnp.maximum(
                    mu * jnp.minimum(opts.muFactorAggressive, jnp.sqrt(mu)),
                    mu_min,
                )
                tiny_alpha = alphaPrimal < 0.1
                mu_tiny = jnp.minimum(mu * 1.1, mu0)
                conservative = (alphaPrimal > 0.99) & th_eq
                mu_cons = jnp.maximum(mu * opts.muFactorConservative, mu_min)
                mu_sched = jnp.where(
                    aggressive,
                    mu_aggr,
                    jnp.where(
                        tiny_alpha,
                        mu_tiny,
                        jnp.where(conservative, mu_cons, mu),
                    ),
                )
                if opts.skipAffine:
                    new_mu = mu_sched
                    # on tiny alpha the reference also re-initializes lambda
                    # (initDualIneq__, lib/ipmPD_CSsolver.c:816)
                    new_lam = jnp.where(
                        tiny_alpha, mu_tiny / Fs(new_u), new_lam
                    )
                else:
                    new_mu = jnp.where(dirn.sigma_fired, dirn.mu_new, mu_sched)

                # stall escape (lib/ipmPD_CSsolver.c:853-859)
                stalled = (
                    (alphaPrimal < opts.alphaMin)
                    & (alphaDualIneq < opts.alphaMin)
                    & (alphaDualEq < opts.alphaMin)
                )
                new_mu = jnp.where(
                    stalled,
                    jnp.maximum(
                        new_mu / opts.muFactorConservative**2, mu_min
                    ),
                    new_mu,
                )

            status = jnp.where(nan_fail, 4, 0).astype(jnp.int32)
            done = nan_fail

            hist = st.hist
            if opts.profiling:
                fs_, _, _, _ = scaled_fns(penv, scale_ineq, scale_cost)
                row = jnp.stack(
                    [
                        fs_(u) / scale_cost,
                        norminf_grad,
                        norminf_eq,
                        gap,
                        new_mu,
                        alphaPrimal if nF > 0 else jnp.asarray(opts.alphaMax, dt),
                        addU,
                        dirn.derr,
                    ]
                )
                hist = hist.at[jnp.minimum(st.it - 1, opts.maxIter - 1)].set(row)

            new_state = IPMState(
                hist=hist,
                snap=snap,
                u=jnp.where(done, u, new_u),
                nu=jnp.where(done, nu, new_nu) if nG > 0 else nu,
                lam=jnp.where(done, lam, new_lam) if nF > 0 else lam,
                mu=new_mu,
                addU=addU,
                addEq=addEq,
                addU_next=addU_next,
                addEq_next=addEq_next,
                alphaPrimal=alphaPrimal if nF > 0 else jnp.asarray(opts.alphaMax, dt),
                alphaDualIneq=alphaDualIneq if nF > 0 else jnp.zeros((), dt),
                alphaDualEq=alphaDualEq if nF > 0 else jnp.asarray(opts.alphaMax, dt),
                status=status,
                it=st.it,
                done=done,
                derr_prev=dirn.derr.astype(dt),
                inc_prev=inc_state,
            )

            if opts.verboseLevel >= 3:
                jax.debug.print(
                    "{it:4d}: |grad|={g:8.1e} |eq|={e:8.1e} gap={gp:8.1e} "
                    "mu={m:8.1e} addU={aU:8.1e} derr={de:8.1e} "
                    "alphaP={aP:8.1e}",
                    it=st.it,
                    g=norminf_grad,
                    e=norminf_eq,
                    gp=gap,
                    m=new_mu,
                    aU=addU,
                    de=dirn.derr,
                    aP=new_state.alphaPrimal,
                )
            return new_state

        final = lax.while_loop(lambda s: ~s.done, body, state0)

        # status completion when maxIter reached
        # (lib/ipmPD_CSsolver.c:885-920)
        norminf_grad, norminf_eq, gap, ineq, dual, _ = exit_metrics(final)
        status = final.status
        is8 = status == 8

        def add_flag(cond, flag, s):
            return jnp.where(is8 & cond, s | flag, s)

        status = add_flag(norminf_grad > opts.gradTolerance, 16, status)
        if nG > 0:
            status = add_flag(norminf_eq > opts.equalTolerance, 32, status)
        if nF > 0:
            status = add_flag(gap > desired_gap, 64, status)
            status = add_flag(final.mu > mu_min, 128, status)
            aP, aDI, aDE = (
                final.alphaPrimal,
                final.alphaDualIneq,
                final.alphaDualEq,
            )
            negl = (aP <= opts.alphaMin) & (aDI < opts.alphaMin) & (aDE < opts.alphaMin)
            small_a = (aP <= 0.1) & (aDI < 0.1) & (aDE < 0.1)
            med_a = (aP <= 0.5) & (aDI < 0.5) & (aDE < 0.5)
            status = add_flag(negl, 1792, status)
            status = add_flag(~negl & small_a, 1536, status)
            status = add_flag(~negl & ~small_a & med_a, 1024, status)
        if opts.addEye2Hessian and opts.adjustAddEye2Hessian:
            status = add_flag(
                final.addU > opts.addEye2HessianUtolerance, 2048, status
            )

        return IPMResult(
            u=final.u,
            nu=final.nu,
            lam=final.lam,
            mu=final.mu,
            status=status,
            iters=final.it,
            norminf_grad=norminf_grad,
            norminf_eq=norminf_eq,
            gap=gap,
            f=fs(final.u) / scale_cost,
            addU=final.addU,
            addEq=final.addEq,
            history=final.hist if opts.profiling else None,
            scale_ineq=scale_ineq,
            scale_cost=scale_cost,
            saved=final.snap,
            nu_init_residual=nu_init_res if opts.profiling else None,
        )

    solve._assemble_ww = assemble_ww  # exposed for structure probing
    # introspection for tests/diagnostics: which banded-assembly mode
    # the build resolved to ('hoisted' QP fast path, 'periter' nonlinear
    # direct band, or None = dense assembly)
    solve._band_mode = (
        "hoisted" if band_mode else ("periter" if band_periter else None)
    )
    return solve
