"""Loop-invariant derivative hoisting for the IPM.

TensCalc's generated code is *reactive*: expressions are grouped by
dependency signature and a group only re-executes when one of its
inputs changed (lib/@csparse/dependencyGroups.m,
writeCfunctionpergroup.m:44 groupStatus dirty bits) — so for a QP the
Hessian and constraint Jacobians are computed once per parameter set,
not once per iteration.  Under jit the AD recipe for H = d2L/du2
formally depends on the carried iterates even when the value does not
(quadratic objective, linear constraints), so XLA's loop-invariant code
motion cannot hoist it out of the ``lax.while_loop``.

This module recovers the reference's behavior with a build-time jaxpr
taint analysis: trace the derivative function once with dummy inputs
and check whether any output actually *depends* on the iterate
arguments.  If not, the solver computes it once per solve, before the
loop.  The analysis is conservative (any equation touching a tainted
variable taints all its outputs, including through nested jaxprs), so a
false "depends" only costs performance, never correctness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.tree_util import tree_flatten

try:  # jax >= 0.4.x moved core types under jax.extend
    from jax.extend.core import Literal as _Literal
except Exception:  # pragma: no cover
    from jax.core import Literal as _Literal  # type: ignore


# Primitives whose inner jaxpr maps the equation's inputs 1:1 onto the
# body's invars.  ONLY these may be recursed with per-input taint:
# arity matching alone is NOT a safe test — lax.scan's body jaxpr takes
# exactly consts+carry+xs, matching eqn.invars, yet taint flows through
# the carry *across iterations* and a single pass under-approximates it
# (advisor round-3 repro: a scan emitting the pre-update carry).
_CALL_PRIMITIVES = frozenset(
    {
        "pjit",
        "jit",
        "closed_call",
        "core_call",
        "custom_jvp_call",
        "custom_vjp_call",
        "custom_jvp_call_jaxpr",
        "custom_vjp_call_jaxpr",
        "remat",
        "remat2",
        "checkpoint",
    }
)


def _sub_jaxpr(eqn):
    """The inner jaxpr of a whitelisted 1:1 call-like equation
    (pjit/remat/custom_*_call), or None.  Everything else — notably
    scan/while/cond, whose carries need a fixpoint — stays opaque and
    falls back to the sound "any tainted input taints all outputs"."""
    if eqn.primitive.name not in _CALL_PRIMITIVES:
        return None
    j = eqn.params.get("jaxpr")
    if j is None:
        j = eqn.params.get("call_jaxpr")
    if j is None:
        j = eqn.params.get("fun_jaxpr")
    if j is None:
        return None
    inner = j.jaxpr if hasattr(j, "jaxpr") else j
    if len(inner.invars) != len(eqn.invars):
        return None
    return inner


def _propagate(jaxpr, in_taint):
    """Per-output taint flags for ``jaxpr`` given per-input flags.

    Call-like equations (pjit — e.g. the jnp helpers jax wraps in jit)
    are recursed into with their actual per-input taint: treating them
    opaquely would let an untouched *primal* operand taint the tangent
    outputs of the same call, killing certification of perfectly linear
    functions (observed on the equilibrium MPC-MHE dynamics, where
    ``concatenate([x0, x1])`` routes through a jitted broadcast)."""
    tainted = {id(v) for v, t in zip(jaxpr.invars, in_taint) if t}
    for eqn in jaxpr.eqns:
        tin = [
            (not isinstance(v, _Literal)) and id(v) in tainted
            for v in eqn.invars
        ]
        sub = _sub_jaxpr(eqn)
        if sub is not None:
            tout = _propagate(sub, tin)
            if len(tout) != len(eqn.outvars):  # pragma: no cover
                tout = [any(tin)] * len(eqn.outvars)
        elif (
            eqn.primitive.name == "integer_pow"
            and eqn.params.get("y") == 0
        ):
            # x**0 == 1 regardless of x: appears in second derivatives
            # of integer powers (d2(x^2) emits 2*x^0) and would
            # structurally taint every Hessian of a quadratic written
            # with ** — the single value-level fact this otherwise
            # purely structural analysis needs
            tout = [False] * len(eqn.outvars)
        else:
            tout = [any(tin)] * len(eqn.outvars)
        for v, t in zip(eqn.outvars, tout):
            if t:
                tainted.add(id(v))
    return [
        (not isinstance(v, _Literal)) and id(v) in tainted
        for v in jaxpr.outvars
    ]


def output_independent_of(fn, n_tainted: int, *example_args) -> bool:
    """True if every output of ``fn(*example_args)`` is independent of
    the first ``n_tainted`` (pytree) arguments.

    Equations are walked in order (jaxprs are topologically sorted);
    taint propagates through every primitive; call-like sub-jaxprs are
    recursed with per-input precision, everything else uses the sound
    over-approximation "any tainted input taints all outputs"."""
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    leaf_counts = [len(tree_flatten(a)[0]) for a in example_args]
    k = sum(leaf_counts[:n_tainted])
    in_taint = [i < k for i in range(len(jaxpr.invars))]
    return not any(_propagate(jaxpr, in_taint))


def param_value_deps(fn, penv_example, *args):
    """The set of parameter names (keys of the dict first argument)
    whose VALUES the outputs of ``fn(penv, *args)`` depend on.

    A hoisted derivative can be independent of a parameter's value
    (e.g. an MPC tracking Hessian vs the reference trajectory) while
    its AD graph still touches it — under vmap that spurious dataflow
    batches the whole computation per instance.  Evaluating with the
    value-irrelevant parameters replaced by constant zeros makes the
    hoisted tensor a function of only its true dependencies, so a fleet
    whose true dependencies are shared computes it ONCE (round-4:
    per-instance (B, nU, nU) Hessian hoists survived dummy-iterate
    evaluation through exactly this path).

    One jaxpr build + one cheap taint propagation per parameter.
    """
    closed = jax.make_jaxpr(fn)(penv_example, *args)
    jaxpr = closed.jaxpr
    keys = sorted(penv_example)  # jax flattens dicts in sorted key order
    n_in = len(jaxpr.invars)
    deps = set()
    for idx, key in enumerate(keys):
        in_taint = [i == idx for i in range(n_in)]
        if any(_propagate(jaxpr, in_taint)):
            deps.add(key)
    return deps


def analyze_scale_free(fns, nU: int, nF: int, nG: int, dt, param_shapes,
                       taint_ineq: bool, taint_cost: bool) -> bool:
    """True if the Lagrangian Hessian d2L/du2 is independent of the
    runtime scaling factors (scale_ineq, scale_cost) IN ADDITION to the
    iterates.

    Scale-independence holds exactly when the scaled terms contribute
    no curvature — linear inequality constraints under
    ``scaleInequalities`` (their Hessian is structurally zero) and
    ``scaleCost == 0`` (unit cost scale).  When certified, the hoisted
    Hessian can be evaluated at UNIT scales and a constant dummy
    iterate, making it a pure function of the parameters: a fleet with
    shared parameters then computes it once for the whole batch instead
    of per instance (round-4: per-instance (B, nF, nU) Jacobian
    broadcasts were ~60% of the long-horizon MPC iteration).

    ``taint_ineq`` / ``taint_cost``: whether the respective scale
    actually varies at runtime (static solver options); a statically
    constant scale needs no certification.
    """
    penv = {k: jnp.zeros(s, dt) for k, s in param_shapes.items()}
    u = jnp.zeros((nU,), dt)
    nu = jnp.zeros((nG,), dt)
    lam = jnp.ones((nF,), dt)
    s_ineq = jnp.ones((nF,), dt)
    s_cost = jnp.ones((), dt)

    def lagr(u, nu, lam, s_ineq, s_cost):
        val = s_cost * fns.f(u, penv)
        if nF > 0:
            val = val - lam @ (s_ineq * fns.F(u, penv))
        if nG > 0:
            val = val + nu @ fns.G(u, penv)
        return val

    n_taint = 3 + (1 if taint_ineq else 0) + (1 if taint_cost else 0)
    # argument order puts the tainted scales right after the iterates
    args = [u, nu, lam]
    if taint_ineq:
        args.append(s_ineq)
    if taint_cost:
        args.append(s_cost)

    def Hfun(*a):
        uu, nn, ll = a[0], a[1], a[2]
        k = 3
        si = a[k] if taint_ineq else s_ineq
        k += 1 if taint_ineq else 0
        sc = a[k] if taint_cost else s_cost
        return jax.jacfwd(jax.grad(lagr, argnums=0), argnums=0)(
            uu, nn, ll, si, sc
        )

    try:
        return output_independent_of(Hfun, n_taint, *args)
    except Exception:  # pragma: no cover - non-differentiable corner
        return False


def analyze_hoistable(fns, nU: int, nF: int, nG: int, dt, param_shapes):
    """Decide which IPM derivative matrices are iteration-invariant.

    Returns ``(h_const, fu_const, gu_const)`` for the Lagrangian Hessian
    d2L/du2 (wrt u, nu, lam jointly) and the constraint Jacobians dF/du,
    dG/du (wrt u).  ``param_shapes`` maps parameter name -> shape; dummy
    zeros stand in for runtime values (the analysis is shape-only).
    """
    penv = {k: jnp.zeros(s, dt) for k, s in param_shapes.items()}
    u = jnp.zeros((nU,), dt)
    nu = jnp.zeros((nG,), dt)
    lam = jnp.ones((nF,), dt)
    s_ineq = jnp.ones((nF,), dt)
    s_cost = jnp.ones((), dt)

    def lagr(u, nu, lam, s_ineq, s_cost):
        val = s_cost * fns.f(u, penv)
        if nF > 0:
            val = val - lam @ (s_ineq * fns.F(u, penv))
        if nG > 0:
            val = val + nu @ fns.G(u, penv)
        return val

    try:
        Hfun = jax.jacfwd(jax.grad(lagr, argnums=0), argnums=0)
        h_const = output_independent_of(Hfun, 3, u, nu, lam, s_ineq, s_cost)
    except Exception:  # pragma: no cover - non-differentiable corner
        h_const = False
    fu_const = False
    if nF > 0:
        try:
            fu_const = output_independent_of(
                lambda uu: jax.jacfwd(lambda v: fns.F(v, penv))(uu), 1, u
            )
        except Exception:  # pragma: no cover
            fu_const = False
    gu_const = False
    if nG > 0:
        try:
            gu_const = output_independent_of(
                lambda uu: jax.jacfwd(lambda v: fns.G(v, penv))(uu), 1, u
            )
        except Exception:  # pragma: no cover
            gu_const = False
    return h_const, fu_const, gu_const
