"""Solver option catalog.

The static/dynamic split mirrors the reference's compile-time ``#define``
vs runtime-argument distinction: everything in :class:`SolverOptions` is
static (jit-specialized, like the defines emitted at
lib/cmex2optimizeCS.m:303-331 from lib/private/parameters4all.m /
parameters4optimize.m), while ``mu0``, ``maxIter`` and the initial
``addEye2Hessian`` values stay runtime inputs of ``solve()`` exactly as in
lib/ipmPD_CSsolver.c:132-141.

Defaults replicate the reference's defaults (lib/private/parameters4all.m:
gradTolerance=1e-4, equalTolerance=1e-4, desiredDualityGap=1e-5,
maxIter=200, muFactorAggressive=.2, muFactorConservative=.95,
skipAffine=true, delta=3, alphaMin=1e-7, alphaMax=1, coupledAlphas=true;
parameters4optimize.m: addEye2Hessian=true, adjustAddEye2Hessian=true,
useInertia=false, addEye2HessianUtolerance=1e-6, smallerNewtonMatrix=false).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    # -- exit tolerances (parameters4all.m:45-62) ----------------------
    gradTolerance: float = 1e-4
    equalTolerance: float = 1e-4
    desiredDualityGap: float = 1e-5
    maxIter: int = 200

    # -- scaling (parameters4all.m:96-106) -----------------------------
    scaleInequalities: bool = True
    scaleCost: float = 0.0
    scaleEqualities: bool = False  # accepted but unused, as in reference

    # -- mu schedule (parameters4all.m:131-199) ------------------------
    muFactorAggressive: float = 0.2
    muFactorConservative: float = 0.95
    skipAffine: bool = True
    delta: int = 3  # sigma = rho^delta, delta in {2,3}
    alphaMin: float = 1e-7
    alphaMax: float = 1.0
    coupledAlphas: bool = True

    # -- Newton matrix / factorization (parameters4optimize.m) ---------
    smallerNewtonMatrix: bool = False
    useLDL: bool = True
    addEye2Hessian: bool = True
    adjustAddEye2Hessian: bool = True
    useInertia: bool = False
    addEye2HessianUtolerance: float = 1e-6
    # variant: 'timesLambda' (reference default, ipmPD_CStimesLambda.m),
    # or 'standard' (ipmPD_CS.m large/small Newton matrix)
    variant: str = "timesLambda"

    # -- regularization adaptation constants (ipmPD_CSsolver.c:145-148) -
    addEye2HessianMIN: float = 1e-20
    addEye2HessianMAX: float = 1e2
    maxDirectionError: float = 1e-6

    # -- numerics ------------------------------------------------------
    dtype: str = "float64"  # IPM conditioning ~1/mu needs f64 on TPU
    ldl_block: int = 64
    # iterative-refinement sweeps after the f32 factorization solve
    # (mixed-precision contract, kkt/dense.py); more sweeps cost one
    # matvec + one substitution pair each but cut direction error —
    # worth it when stragglers trip the addEye2Hessian adaptation
    kkt_refine: int = 2
    # KKT backend: 'dense', 'tridiag' (block-tridiagonal structured
    # elimination for MPC horizons), 'spike' (tridiag partitioned across
    # a device mesh — pass kkt_mesh to optimize()), or 'auto'
    kkt_backend: str = "dense"
    # number of line-search trial alphas evaluated in one batched sweep
    # (replaces the reference's sequential backtracking get/set loop,
    # lib/ipmPD_CSsolver.c:690-756)
    linesearch_points: int = 32
    # when True AND dF/du is iteration-invariant (affine F), the line
    # search evaluates min F(u + a dU) = min(F + a Fu dU) as one
    # broadcast instead of linesearch_points constraint evaluations.
    # Mathematically exact for affine F, but the different rounding
    # perturbs the iterate trajectory (same tolerance ball, different
    # point) — off by default to match the reference's exact-F
    # evaluation (lib/ipmPD_CSsolver.c:690-756); the flagship bench
    # enables it.
    linesearch_affine_F: bool = False

    # -- diagnostics ---------------------------------------------------
    verboseLevel: int = 0
    profiling: bool = False
    # allowSave (reference: lib/private/parameters4all.m allowSave +
    # saveIter runtime arg, lib/ipmPD_CS.m:511-515 saveWW__): when True
    # the solve carries a snapshot of (u, nu, lam, mu, addU, addEq)
    # captured at the runtime-selected iteration, from which the KKT
    # matrix at that iterate can be rebuilt post-mortem
    # (OptimizeSolver.capture_ww)
    allowSave: bool = False

    def __post_init__(self):
        if self.delta not in (2, 3):
            raise ValueError("delta must be 2 or 3 (parameters4all.m:171)")
        if self.variant not in ("timesLambda", "standard"):
            raise ValueError("variant must be 'timesLambda' or 'standard'")
        if self.variant == "timesLambda":
            # same restrictions the reference enforces
            # (ipmPD_CStimesLambda.m:34-48)
            if self.smallerNewtonMatrix:
                raise ValueError(
                    "variant='timesLambda' requires smallerNewtonMatrix=False"
                )
            if not self.skipAffine:
                raise ValueError("variant='timesLambda' requires skipAffine=True")
            if not self.useLDL:
                raise ValueError("variant='timesLambda' requires useLDL=True")
        if self.kkt_backend not in (
            "dense", "ldl", "tridiag", "cyclic", "auto", "spike", "pallas",
            "fleet", "fleet_banded",
        ):
            raise ValueError(
                "kkt_backend must be dense|ldl|tridiag|cyclic|auto|spike|"
                "pallas|fleet|fleet_banded"
            )

    @property
    def np_dtype(self):
        return jnp.dtype(self.dtype)

    def replace(self, **kw) -> "SolverOptions":
        return dataclasses.replace(self, **kw)
