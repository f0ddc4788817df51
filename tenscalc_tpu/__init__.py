"""tenscalc_tpu — a TPU-native nonlinear constrained-optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hespanha/tenscalc (a MATLAB symbolic-codegen toolbox for tensor-valued
nonlinear constrained optimization; see /root/reference):

  * tensor-valued symbolic problems: cost, inequality (``expr >= 0``) and
    equality (``expr == 0``) constraints over arbitrary-rank tensors
    (reference: lib/@Tcalculus/Tcalculus.m)
  * derivatives via jax.grad / jax.hessian (reference: symbolic forward-mode,
    lib/@Tcalculus/gradient.m)
  * primal-dual interior-point solvers compiled end-to-end under jit with
    lax.while_loop (reference: generated C + lib/ipmPD_CSsolver.c)
  * three problem classes: minimize, min-max, and two-player equilibrium with
    latent variables (reference: ipmPD_CS.m / ipmPDminmax_CS.m /
    ipmPDeqlat_CS.m)
  * KKT solves via unpivoted (blocked) LDL^T with inertia, exploiting
    block-banded structure for MPC horizons (reference: lib/@csparse/
    sparsity_ldl.m symbolic factorization unrolled to scalar C)
  * scale-out via vmap-batched solves + shard_map over device meshes.
"""

from .expr import (
    Expr,
    Variable,
    variable,
    parameter,
    constant,
    Tvariable,
    Tconstant,
    Tzeros,
    Tones,
    Teye,
    to_expr,
    Constraint,
    gradient,
    jacobian,
    hessian,
)
from .ops.fns import (
    norm1,
    norm2,
    norminf,
    logdet,
    traceinv,
    chol,
    ldl,
    ldl_l,
    ldl_d,
    lu,
    lu_l,
    lu_u,
    lu_d,
    pptrs,
    bitrate,
    relu,
    srelu,
    heaviside,
    sqr,
    cube,
    clp,
    vec2tensor,
    tprod,
    pdist2t,
    interpolate,
    Ginterpolate,
    Hinterpolate,
    round,
    ceil,
    floor,
    lngamma,
    sheaviside,
    dsheaviside,
    compose,
    min2,
    max2,
    allv,
    anyv,
    norm,
    repmat,
    permute,
)
from .ops.tseries import (
    tsDerivative,
    tsDerivative2,
    tsIntegral,
    tsIntegrate,
    tsODE,
    tsCross,
    tsDot,
    tsQdot,
    tsQdotStar,
    tsRotation,
    tsRotationT,
)
from .ipm.options import SolverOptions
from .ipm.status import SolverStatus, describe_status
from .api import optimize, minmax, equilibrium, compute, compute_object
from .apps.mpc import Mpc
from .apps.mpcmhe import Mpcmhe
from .apps.lasso import Lasso
from .apps.nlss import NLSS
from .apps.sysid import Sysid, ParameterSpec
from .introspect import spy, sparsity, op_tree

__version__ = "0.1.0"

__all__ = [
    "Expr",
    "Variable",
    "variable",
    "parameter",
    "constant",
    "Tvariable",
    "Tconstant",
    "Tzeros",
    "Tones",
    "Teye",
    "to_expr",
    "Constraint",
    "gradient",
    "jacobian",
    "hessian",
    "norm1",
    "norm2",
    "norminf",
    "logdet",
    "chol",
    "ldl",
    "ldl_l",
    "ldl_d",
    "lu",
    "lu_l",
    "lu_u",
    "lu_d",
    "pptrs",
    "bitrate",
    "traceinv",
    "relu",
    "srelu",
    "heaviside",
    "sqr",
    "cube",
    "clp",
    "vec2tensor",
    "tprod",
    "pdist2t",
    "interpolate",
    "Ginterpolate",
    "Hinterpolate",
    # NOTE: tc.round stays importable as an attribute but is kept out of
    # __all__ so `from tenscalc_tpu import *` does not shadow the Python
    # builtin (same reason all/any are exported as allv/anyv)
    "ceil",
    "floor",
    "lngamma",
    "sheaviside",
    "dsheaviside",
    "compose",
    "min2",
    "max2",
    "allv",
    "anyv",
    "norm",
    "repmat",
    "permute",
    "tsDerivative",
    "tsDerivative2",
    "tsIntegral",
    "tsIntegrate",
    "tsODE",
    "tsCross",
    "tsDot",
    "tsQdot",
    "tsQdotStar",
    "tsRotation",
    "tsRotationT",
    "SolverOptions",
    "SolverStatus",
    "describe_status",
    "optimize",
    "minmax",
    "equilibrium",
    "compute",
    "compute_object",
    "Mpc",
    "Mpcmhe",
    "Lasso",
    "NLSS",
    "Sysid",
    "ParameterSpec",
    "spy",
    "sparsity",
    "op_tree",
]
