"""Math function library mirroring TensCalc's operator set.

Each function works both on plain jnp arrays and on :class:`~tenscalc_tpu.expr.Expr`
objects (lifted through deferred evaluation).  Reference operators:
lib/@Tcalculus/Tcalculus.m:866-2109 (norms, logdet, traceinv, componentwise
functions, clp) and lib/norm2.m, lib/logdet.m, lib/relu.m, lib/srelu.m,
lib/sqr.m, lib/cube.m, lib/clp.m, lib/vec2tensor.m, lib/pdist2t.m,
lib/mytprod.m (generalized tensor product).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..expr import Expr, lift, to_expr, nary_op


def _lifted(f):
    return lift(f)


# ---------------------------------------------------------------------------
# norms (reference: Tcalculus.m:866-1044)
# ---------------------------------------------------------------------------

@_lifted
def norm1(x):
    """Sum of absolute values of all entries."""
    return jnp.sum(jnp.abs(x))


@_lifted
def norm2(x, S=None):
    """Squared Frobenius norm ``sum(x.^2)`` (reference lib/norm2.m —
    note: TensCalc's norm2 is the *square*, not the root), or the
    weighted quadratic form x'*S*x when S is given."""
    if S is None:
        return jnp.sum(x * x)
    return jnp.vdot(x, S @ x)


@_lifted
def norminf(x):
    """Max absolute value over all entries."""
    return jnp.max(jnp.abs(x))


# ---------------------------------------------------------------------------
# matrix functions (reference: Tcalculus.m:1697-1835)
# ---------------------------------------------------------------------------

@_lifted
def logdet(A):
    """log(det(A)) for symmetric positive-definite A (reference lib/logdet.m).

    Uses a Cholesky factorization so the gradient avoids forming inv(A)
    explicitly, the analog of the reference's factorization-aware gradient
    rules (lib/@Tcalculus/gradient.m:214-264).
    """
    L = jnp.linalg.cholesky(A)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))


@_lifted
def traceinv(A):
    """trace(inv(A)) (reference lib/traceinv.m)."""
    return jnp.trace(jnp.linalg.inv(A))


@_lifted
def det(A):
    return jnp.linalg.det(A)


@_lifted
def inv(A):
    return jnp.linalg.inv(A)


@_lifted
def mldivide(A, b):
    """MATLAB ``A\\b``."""
    return jnp.linalg.solve(A, b)


@_lifted
def trace(A):
    return jnp.trace(A)


@_lifted
def diag(x):
    return jnp.diag(x)


# ---------------------------------------------------------------------------
# componentwise scalar functions (reference: Tcalculus.m:1836-2109)
# ---------------------------------------------------------------------------

@_lifted
def relu(x):
    return jnp.maximum(x, 0.0)


@_lifted
def srelu(x):
    """Smooth relu log(1+exp(x)) (reference lib/srelu.m)."""
    return jax.nn.softplus(x)


@_lifted
def heaviside(x):
    """1 for x>0, 1/2 at 0, 0 for x<0 (reference Tcalculus heaviside)."""
    return jnp.where(x > 0, 1.0, jnp.where(x < 0, 0.0, 0.5))


@_lifted
def sqr(x):
    return x * x


@_lifted
def cube(x):
    return x * x * x


@_lifted
def sign(x):
    return jnp.sign(x)


@_lifted
def sqrt(x):
    return jnp.sqrt(x)


@_lifted
def exp(x):
    return jnp.exp(x)


@_lifted
def log(x):
    return jnp.log(x)


@_lifted
def sin(x):
    return jnp.sin(x)


@_lifted
def cos(x):
    return jnp.cos(x)


@_lifted
def tan(x):
    return jnp.tan(x)


@_lifted
def atan(x):
    return jnp.arctan(x)


@_lifted
def normpdf(x):
    return jnp.exp(-0.5 * x * x) / np.sqrt(2 * np.pi)


@_lifted
def absv(x):
    return jnp.abs(x)


@_lifted
def round(x):  # noqa: A001 - mirrors the reference name (Tcalculus round)
    return jnp.round(x)


@_lifted
def ceil(x):
    return jnp.ceil(x)


@_lifted
def floor(x):
    return jnp.floor(x)


@_lifted
def lngamma(x):
    """log(gamma(x)) with digamma gradient (reference Tcalculus.m:2105-2108)."""
    return jax.scipy.special.gammaln(x)


@_lifted
def sheaviside(x):
    """Soft heaviside 1/(1+exp(-x)) (reference Tcalculus.m:2074-2082)."""
    return jax.nn.sigmoid(x)


@_lifted
def dsheaviside(x):
    """Derivative of the soft heaviside, 1/(2+exp(x)+exp(-x))
    (reference Tcalculus.m:2083-2091)."""
    s = jax.nn.sigmoid(x)
    return s * (1.0 - s)


def compose(x, fun):
    """Apply an elementwise jax-traceable function to every entry of ``x``
    (reference Tcalculus compose, Tcalculus.m:2110-2180).  Unlike the
    reference there is no need to supply derivative handles — jax
    autodiff differentiates through ``fun``.  If ``fun`` maps a scalar to
    a tensor, the extra axes are appended at the end, matching
    ``y_{ijklm} = fun(x_{ijk})_{lm}``."""

    def impl(_x):
        flat = jnp.ravel(_x)
        out = jax.vmap(fun)(flat)
        return jnp.reshape(out, jnp.shape(_x) + out.shape[1:])

    return lift(impl)(x)


def min2(a, b):
    """Entrywise minimum of two tensors (reference Tcalculus min(a,b),
    Tcalculus.m:1135-1180 two-argument form)."""
    return lift(jnp.minimum)(a, b)


def max2(a, b):
    """Entrywise maximum of two tensors (reference Tcalculus max(a,b))."""
    return lift(jnp.maximum)(a, b)


def allv(x, axis=None):
    """1.0 where all entries (along ``axis``) are nonzero (reference
    Tcalculus all, Tcalculus.m:1213-1224).  Smooth-free indicator —
    constant gradients, as in the reference."""
    return lift(lambda _x: jnp.all(_x != 0, axis=axis).astype(jnp.result_type(float)))(x)


def anyv(x, axis=None):
    """1.0 where any entry (along ``axis``) is nonzero (reference
    Tcalculus any, Tcalculus.m:1226-1238)."""
    return lift(lambda _x: jnp.any(_x != 0, axis=axis).astype(jnp.result_type(float)))(x)


def norm(x, p=2):
    """``norm(x, p)`` for p in {1, 2, inf} (reference Tcalculus norm,
    Tcalculus.m:866-905).  NOTE: unlike :func:`norm2` (which follows the
    reference's squared semantics) this is the true p-norm of vec(x).

    WARNING: the p=2 norm (like p=1 and inf) is not differentiable at
    x = 0 — its gradient is NaN there, which poisons an IPM whose
    iterates cross zero.  For smooth objectives use :func:`norm2`
    (the squared norm), as the reference's examples do."""
    if p == 1:
        return norm1(x)
    if p == 2:
        return lift(lambda _x: jnp.sqrt(jnp.sum(_x * _x)))(x)
    if p in (jnp.inf, np.inf, "inf"):
        return norminf(x)
    raise ValueError(f"norm: unsupported order {p!r}")


def repmat(x, *reps):
    """Tile a tensor (reference Tcalculus repmat, Tcalculus.m:719-771)."""
    if len(reps) == 1 and isinstance(reps[0], (tuple, list)):
        reps = tuple(reps[0])
    return lift(lambda _x: jnp.tile(_x, reps))(x)


def permute(x, order):
    """Permute axes with MATLAB 1-based ``order`` (reference Tcalculus
    permute, Tcalculus.m:1310-1345).  Also accepts 0-based orders."""
    order = list(order)
    if order and min(order) == 1:
        order = [o - 1 for o in order]
    return lift(lambda _x: jnp.transpose(_x, order))(x)


# ---------------------------------------------------------------------------
# fraction-to-boundary (reference: Tcalculus clp, lib/clp.m and
# Tcalculus.m:2722 — largest alpha>=0 with x+alpha*dx>=0)
# ---------------------------------------------------------------------------

@_lifted
def clp(x, dx):
    """max { alpha >= 0 : x + alpha*dx >= 0 } assuming x > 0.

    Entries with dx >= 0 impose no limit; the result is +inf when no entry
    limits the step.  Matches the reference semantics used for the IPM
    fraction-to-boundary rule (lib/ipmPD_CS.m:308-309).
    """
    ratio = jnp.where(dx < 0, -x / jnp.where(dx < 0, dx, -1.0), jnp.inf)
    return jnp.min(ratio) if ratio.ndim > 0 else ratio


# ---------------------------------------------------------------------------
# shaping helpers
# ---------------------------------------------------------------------------

@_lifted
def vec2tensor(x, shape):
    """Reshape a vector into a tensor (reference lib/vec2tensor.m).

    Uses Fortran (column-major) order to match MATLAB reshape semantics.
    """
    return jnp.reshape(x, tuple(shape), order="F")


@_lifted
def full(x):
    """No-op densify (reference Tcalculus.m:1045) — arrays are dense here."""
    return x


@_lifted
def pdist2t(x, y):
    """Pairwise squared distances between columns (reference lib/pdist2t.m)."""
    d = x[:, :, None] - y[:, None, :]
    return jnp.sum(d * d, axis=0)


# ---------------------------------------------------------------------------
# tprod — TensCalc's generalized tensor product
# ---------------------------------------------------------------------------

def tprod(*args):
    """Generalized tensor product with signed index lists.

    ``tprod(A, ia, B, ib, ...)`` where each ``ia`` is a list of integers,
    one per axis of the factor: positive k means the axis maps to output
    axis k (1-based, as in the reference), negative means the axis is
    summed over (matching negatives across factors are contracted
    together).  Reference: lib/@Tcalculus/tprod.m, lib/mytprod.m.

    Example: ``tprod(A, [1, -1], B, [-1, 2])`` is A @ B.
    """
    if len(args) % 2 != 0:
        raise ValueError("tprod expects (tensor, index-list) pairs")
    tensors = list(args[0::2])
    indices = [list(ix) if isinstance(ix, (list, tuple)) else [ix] for ix in args[1::2]]

    # map signed indices to einsum letters
    letters: dict[int, str] = {}

    def letter(ix: int) -> str:
        if ix not in letters:
            letters[ix] = chr(ord("a") + len(letters))
        return letters[ix]

    in_specs = []
    out_axes: dict[int, str] = {}
    for t, ixs in zip(tensors, indices):
        spec = ""
        for ix in ixs:
            spec += letter(ix)
            if ix > 0:
                out_axes[ix] = letters[ix]
        in_specs.append(spec)
    if out_axes and sorted(out_axes) != list(range(1, max(out_axes) + 1)):
        raise ValueError(f"tprod: output indices must be 1..k, got {sorted(out_axes)}")
    out_spec = "".join(out_axes[k] for k in sorted(out_axes))
    einsum_str = ",".join(in_specs) + "->" + out_spec

    if any(isinstance(t, Expr) for t in tensors):
        return nary_op(lambda *xs: jnp.einsum(einsum_str, *xs), *tensors)
    return jnp.einsum(einsum_str, *tensors)


def _gauss_interp_fn(method, n_query_axes):
    """Gaussian-kernel table interpolation (reference
    Tcalculus.m:2866-2919 'convert' path).

    Table points ``Xi`` have shape ``[*sx, K]``, table values ``Yi``
    shape ``[*sy, K]``, query ``x`` shape ``sx`` (``n_query_axes``
    axes), smoothing scale ``S`` scalar.  Returns shape ``sy``:
      ugaussian:  F(x) = sum_k Yi_k exp(-||x-Xi_k||^2 / (2 S^2))
      ngaussian:  F(x) / sum_k exp(-||x-Xi_k||^2 / (2 S^2))
        (Nadaraya-Watson normalized kernel regression)
    """

    def impl(_x, _Xi, _Yi, _S):
        D = _Xi - _x[..., None]                       # [*sx, K]
        D2 = jnp.sum(D * D, axis=tuple(range(n_query_axes)))  # [K]
        ED2 = jnp.exp(-D2 / (2.0 * _S * _S))
        F = jnp.tensordot(_Yi, ED2, axes=[[-1], [0]])
        if method == "ngaussian":
            F = F / jnp.sum(ED2)
        elif method != "ugaussian":
            raise ValueError(f"unknown interpolation method '{method}'")
        return F

    return impl


def interpolate(x, Xi, Yi, S=None, method="linear"):
    """Table interpolation (reference Tcalculus.m:2866-2919).

    ``method='linear'`` (TPU-idiomatic extra): 1-D piecewise-linear
    ``jnp.interp`` over a sorted table, ``interpolate(x, Xi, Yi)``.
    ``method='ugaussian' | 'ngaussian'`` (reference semantics): smooth
    Gaussian-kernel interpolation over scattered multi-dimensional
    tables; requires the scale ``S``."""
    if method == "linear":
        return lift(lambda _x, _Xi, _Yi: jnp.interp(_x, _Xi, _Yi))(x, Xi, Yi)
    nq = len(getattr(x, "shape", np.shape(x)))
    return lift(_gauss_interp_fn(method, nq))(x, Xi, Yi, S)


def Ginterpolate(x, Xi, Yi, S=None, method="linear"):
    """Gradient of the interpolant wrt the query point (reference
    Tcalculus.m:2921-2977).  Output shape ``[*sy, *sx]``."""
    if method == "linear":
        def impl(_x, _Xi, _Yi):
            g = jax.grad(lambda q: jnp.interp(q, _Xi, _Yi))
            return jax.vmap(g)(jnp.atleast_1d(_x)).reshape(jnp.shape(_x))

        return lift(impl)(x, Xi, Yi)
    nq = len(getattr(x, "shape", np.shape(x)))
    base = _gauss_interp_fn(method, nq)

    def impl(_x, _Xi, _Yi, _S):
        return jax.jacfwd(lambda q: base(q, _Xi, _Yi, _S))(_x)

    return lift(impl)(x, Xi, Yi, S)


def Hinterpolate(x, Xi, Yi, S=None, method="linear"):
    """Hessian of the interpolant wrt the query point (reference
    Tcalculus.m:2980-3043).  Output shape ``[*sy, *sx, *sx]``; zero
    a.e. for the piecewise-linear method."""
    if method == "linear":
        def impl(_x, _Xi, _Yi):
            h = jax.grad(jax.grad(lambda q: jnp.interp(q, _Xi, _Yi)))
            return jax.vmap(h)(jnp.atleast_1d(_x)).reshape(jnp.shape(_x))

        return lift(impl)(x, Xi, Yi)
    nq = len(getattr(x, "shape", np.shape(x)))
    base = _gauss_interp_fn(method, nq)

    def impl(_x, _Xi, _Yi, _S):
        return jax.jacfwd(jax.jacfwd(lambda q: base(q, _Xi, _Yi, _S)))(_x)

    return lift(impl)(x, Xi, Yi, S)


# ---------------------------------------------------------------------------
# user-facing factorization expressions (reference: Tcalculus.m:1373-1696
# chol/ldl/ldl_l/ldl_d/lu/lu_l/lu_u/lu_d/pptrs).  The reference emits
# these as symbolic sparse factorization nodes; here each is an ordinary
# differentiable expression (XLA cholesky / an unpivoted scan
# elimination matching the reference's no-pivoting symbolic LDL/LU,
# lib/@csparse/sparsity_ldl.m:161-222, sparsity_lu.m), so they compose
# inside objectives/constraints and jax AD provides the
# factorization-aware gradients the reference hand-codes
# (lib/@Tcalculus/gradient.m:214-264).
# ---------------------------------------------------------------------------

def _lu_unpivoted_combined(A):
    """Unpivoted Doolittle elimination -> combined factor matrix C with
    U on/above the diagonal and the unit-lower multipliers strictly
    below (exactly the data the reference's symbolic lu node carries).
    Implemented as a lax.scan over columns so reverse-mode AD works."""
    n = A.shape[-1]
    ar = jnp.arange(n)

    def step(M, k):
        d = M[k, k]
        l = jnp.where(ar > k, M[:, k] / d, 0.0)
        row = jnp.where(ar >= k, M[k, :], 0.0)
        M2 = M - jnp.outer(l, row)
        # store the multipliers in column k below the diagonal
        M2 = jnp.where(
            (ar[:, None] > k) & (ar[None, :] == k), l[:, None], M2
        )
        return M2, None

    C, _ = jax.lax.scan(step, A, ar)
    return C


@_lifted
def chol(A):
    """Lower Cholesky factor of a symmetric PD matrix
    (Tcalculus.m:1373-1416; the reference's chol is usable inside
    objectives, e.g. via pptrs solves or 2*sum(log(diag(chol(A))))."""
    return jnp.linalg.cholesky(A)


@_lifted
def ldl(A):
    """Combined LDL^T factor of a symmetric matrix: strictly-lower part
    holds the unit-lower L, the diagonal holds d (no pivoting, exactly
    the reference's symbolic ldl semantics — sparsity_ldl.m:161-222).
    Extract with :func:`ldl_l` / :func:`ldl_d`."""
    C = _lu_unpivoted_combined(A)
    return C


@_lifted
def ldl_l(F):
    """Unit-lower L from a combined :func:`ldl` factor
    (Tcalculus.m ldl_l)."""
    n = F.shape[-1]
    return jnp.tril(F, -1) + jnp.eye(n, dtype=F.dtype)


@_lifted
def ldl_d(F):
    """Diagonal d from a combined :func:`ldl` factor (Tcalculus.m
    ldl_d; the reference computes det/logdet as prod/sum over this)."""
    return jnp.diagonal(F, axis1=-2, axis2=-1)


@_lifted
def lu(A):
    """Combined unpivoted LU factor (unit-lower multipliers strictly
    below the diagonal, U on/above — Tcalculus.m lu:1545-1607).
    Extract with :func:`lu_l` / :func:`lu_u` / :func:`lu_d`."""
    return _lu_unpivoted_combined(A)


@_lifted
def lu_l(F):
    """Unit-lower L from a combined :func:`lu` factor."""
    n = F.shape[-1]
    return jnp.tril(F, -1) + jnp.eye(n, dtype=F.dtype)


@_lifted
def lu_u(F):
    """Upper U from a combined :func:`lu` factor."""
    return jnp.triu(F)


@_lifted
def lu_d(F):
    """Diagonal of U from a combined :func:`lu` factor (the reference
    computes det_lu/logdet_lu over this)."""
    return jnp.diagonal(F, axis1=-2, axis2=-1)


@_lifted
def pptrs(L, b):
    """Solve A x = b given the Cholesky factor L = chol(A)
    (Tcalculus.m pptrs:1676-1696, LAPACK-pptrs semantics)."""
    return jax.scipy.linalg.cho_solve((L, True), b)


@_lifted
def bitrate(snr):
    """Shannon bitrate log2(1 + snr) (reference lib/bitrate.m:1-19)."""
    return jnp.log2(1.0 + snr)
