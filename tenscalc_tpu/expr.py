"""Deferred tensor expressions traced through JAX.

This is the TPU-native replacement for TensCalc's symbolic tensor layer
(reference: lib/@Tcalculus/Tcalculus.m, lib/Tvariable.m).  Instead of
maintaining a hash-consed symbolic DAG with hand-written chain rules
(reference: lib/@Tcalculus/gradient.m), an :class:`Expr` is a *deferred
jnp computation*: a pure function from an environment (dict of named
arrays) to a jnp array.  Differentiation, common-subexpression
elimination and code generation are all delegated to JAX tracing and
XLA — jaxpr CSE plays the role of the reference's ``appendUniqueInstruction``
hash-consing (reference: lib/csparse/instructionsTableUTHash.c).

The operator surface mirrors TensCalc's Tcalculus overloads: arithmetic,
matmul, indexing, reshape, concatenation, reductions, comparisons
producing :class:`Constraint` objects (reference ``iszero``/``ispositive``
nodes, lib/@Tcalculus/Tcalculus.m:2327-2421), and the math function
library in :mod:`tenscalc_tpu.ops.fns`.
"""

from __future__ import annotations

import operator
from typing import Any, Callable, Dict, FrozenSet, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Env = Dict[str, jax.Array]

_COUNTER = [0]


def _fresh_name(prefix: str) -> str:
    _COUNTER[0] += 1
    return f"{prefix}{_COUNTER[0]}__"


def _normalize_shape(shape) -> Tuple[int, ...]:
    if shape is None:
        return ()
    if isinstance(shape, (int, np.integer)):
        return (int(shape),)
    return tuple(int(s) for s in shape)


class Expr:
    """A deferred tensor computation: ``env -> jnp array`` with static shape.

    ``fn`` must be a pure function of the environment.  ``deps`` is the set
    of variable/parameter names the expression reads; it bounds which
    entries of ``env`` matter (useful for dependency-aware caching and for
    validation, the analog of the reference's dependency groups,
    lib/@csparse/dependencyGroups.m).
    """

    __slots__ = ("fn", "shape", "deps", "name")
    __array_priority__ = 100  # win ufunc dispatch against numpy arrays

    def __init__(
        self,
        fn: Callable[[Env], jax.Array],
        shape: Tuple[int, ...],
        deps: FrozenSet[str],
        name: str = "",
    ):
        self.fn = fn
        self.shape = _normalize_shape(shape)
        self.deps = frozenset(deps)
        self.name = name

    # -- evaluation ---------------------------------------------------
    def __call__(self, env: Env) -> jax.Array:
        return self.fn(env)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    def __len__(self) -> int:
        if not self.shape:
            raise TypeError("len() of scalar Expr")
        return self.shape[0]

    def __repr__(self) -> str:
        nm = f" {self.name}" if self.name else ""
        return f"Expr{nm}[{','.join(map(str, self.shape))} deps={sorted(self.deps)}]"

    # -- arithmetic ---------------------------------------------------
    def __add__(self, other):
        return binary_op(operator.add, self, other)

    def __radd__(self, other):
        return binary_op(operator.add, other, self)

    def __sub__(self, other):
        return binary_op(operator.sub, self, other)

    def __rsub__(self, other):
        return binary_op(operator.sub, other, self)

    def __mul__(self, other):
        return binary_op(operator.mul, self, other)

    def __rmul__(self, other):
        return binary_op(operator.mul, other, self)

    def __truediv__(self, other):
        return binary_op(operator.truediv, self, other)

    def __rtruediv__(self, other):
        return binary_op(operator.truediv, other, self)

    def __pow__(self, other):
        return binary_op(operator.pow, self, other)

    def __rpow__(self, other):
        return binary_op(operator.pow, other, self)

    def __neg__(self):
        return unary_op(operator.neg, self)

    def __pos__(self):
        return self

    def __abs__(self):
        return unary_op(jnp.abs, self)

    def __matmul__(self, other):
        return binary_op(jnp.matmul, self, other)

    def __rmatmul__(self, other):
        return binary_op(jnp.matmul, other, self)

    # -- indexing / shaping -------------------------------------------
    def __getitem__(self, idx):
        return unary_op(lambda x: x[idx], self)

    @property
    def at(self):
        """Indexed assignment, the analog of the reference's subsasgn
        (lib/@Tcalculus/Tcalculus.m:590-667 ``x(I)=y``) in jax's
        functional ``x.at[I].set(y)`` / ``.add(y)`` idiom."""
        return _AtHelper(self)

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return unary_op(lambda x: jnp.reshape(x, shape), self)

    def ravel(self):
        return unary_op(jnp.ravel, self)

    def flatten(self):
        return self.ravel()

    @property
    def T(self):
        return unary_op(lambda x: jnp.swapaxes(x, -1, -2) if x.ndim >= 2 else x, self)

    def transpose(self, *axes):
        if not axes:
            return self.T
        if len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            axes = tuple(axes[0])
        return unary_op(lambda x: jnp.transpose(x, axes), self)

    def sum(self, axis=None, keepdims=False):
        return unary_op(lambda x: jnp.sum(x, axis=axis, keepdims=keepdims), self)

    def min(self, axis=None, keepdims=False):
        return unary_op(lambda x: jnp.min(x, axis=axis, keepdims=keepdims), self)

    def max(self, axis=None, keepdims=False):
        return unary_op(lambda x: jnp.max(x, axis=axis, keepdims=keepdims), self)

    def trace(self):
        return unary_op(jnp.trace, self)

    def diag(self):
        return unary_op(jnp.diag, self)

    # -- comparisons create constraints -------------------------------
    # (reference: Tcalculus eq/ge/le creating iszero/ispositive nodes,
    #  lib/@Tcalculus/Tcalculus.m:2327-2421)
    def __ge__(self, other) -> "Constraint":
        return Constraint("ineq", binary_op(operator.sub, self, other))

    def __le__(self, other) -> "Constraint":
        return Constraint("ineq", binary_op(operator.sub, other, self))

    def __gt__(self, other) -> "Constraint":
        return self.__ge__(other)

    def __lt__(self, other) -> "Constraint":
        return self.__le__(other)

    def __eq__(self, other) -> "Constraint":  # type: ignore[override]
        return Constraint("eq", binary_op(operator.sub, self, other))

    def __ne__(self, other):  # type: ignore[override]
        raise TypeError("!= is not a valid constraint; use ==, >= or <=")

    def __hash__(self):
        return id(self)


class _AtHelper:
    """``expr.at[idx]`` accessor (see :attr:`Expr.at`)."""

    def __init__(self, expr: "Expr"):
        self._expr = expr

    def __getitem__(self, idx):
        return _AtIndexed(self._expr, idx)


class _AtIndexed:
    def __init__(self, expr: "Expr", idx):
        self._expr = expr
        self._idx = idx

    def set(self, value):
        idx = self._idx
        return binary_op(lambda x, v: x.at[idx].set(v), self._expr, value)

    def add(self, value):
        idx = self._idx
        return binary_op(lambda x, v: x.at[idx].add(v), self._expr, value)

    def multiply(self, value):
        idx = self._idx
        return binary_op(lambda x, v: x.at[idx].multiply(v), self._expr, value)


class Variable(Expr):
    """A named leaf: reads its value from the environment.

    Plays both TensCalc roles — optimization variable and parameter — the
    split into roles happens at problem-construction time, exactly like the
    reference's ``optimizationVariables`` vs ``parameters`` lists
    (lib/cmex2optimizeCS.m:10-24).
    """

    __slots__ = ()

    def __init__(self, name: str, shape=()):
        shape = _normalize_shape(shape)
        super().__init__(lambda env, _n=name: jnp.asarray(env[_n]), shape, {name}, name)

    def __repr__(self) -> str:
        return f"Variable {self.name}[{','.join(map(str, self.shape))}]"

    def __hash__(self):
        return id(self)


def variable(name: str, shape=()) -> Variable:
    """Create a named tensor variable (reference: lib/Tvariable.m)."""
    return Variable(name, shape)


def parameter(name: str, shape=()) -> Variable:
    """Alias of :func:`variable`; role is decided by the problem builder."""
    return Variable(name, shape)


# MATLAB-flavored aliases for API parity with the reference
Tvariable = variable


def constant(value, shape=None) -> Expr:
    """Embed a constant array (reference: lib/Tconstant.m)."""
    arr = jnp.asarray(value)
    if shape is not None:
        arr = jnp.broadcast_to(arr, _normalize_shape(shape))
    return Expr(lambda env, _a=arr: _a, arr.shape, frozenset(), "const")


Tconstant = constant


def Tzeros(shape=()) -> Expr:
    shape = _normalize_shape(shape)
    return Expr(lambda env: jnp.zeros(shape), shape, frozenset(), "zeros")


def Tones(shape=()) -> Expr:
    shape = _normalize_shape(shape)
    return Expr(lambda env: jnp.ones(shape), shape, frozenset(), "ones")


def Teye(n, m=None) -> Expr:
    m = n if m is None else m
    return Expr(lambda env: jnp.eye(n, m), (n, m), frozenset(), "eye")


def to_expr(x) -> Expr:
    """Coerce scalars/arrays to Expr (reference: lib/toCalculus.m)."""
    if isinstance(x, Expr):
        return x
    return constant(x)


def _shape_of(fn: Callable[[Env], jax.Array], deps: FrozenSet[str]) -> Tuple[int, ...]:
    """Compute the static output shape by abstract evaluation.

    Uses jax.eval_shape with zero-cost abstract leaf arrays; requires every
    dependency to be a registered Variable so its shape is known.
    """
    from jax import eval_shape

    specs = {n: jax.ShapeDtypeStruct(_VARIABLE_SHAPES[n], jnp.float32) for n in deps}

    out = eval_shape(fn, specs)
    return tuple(out.shape)


# Registry of declared variable shapes so eval_shape can build abstract envs.
_VARIABLE_SHAPES: Dict[str, Tuple[int, ...]] = {}

_orig_variable_init = Variable.__init__


def _variable_init(self, name: str, shape=()):  # noqa: D401
    _orig_variable_init(self, name, shape)
    prev = _VARIABLE_SHAPES.get(name)
    if prev is not None and prev != self.shape:
        raise ValueError(
            f"variable {name!r} re-declared with shape {self.shape}, "
            f"previously {prev}"
        )
    _VARIABLE_SHAPES[name] = self.shape


Variable.__init__ = _variable_init  # type: ignore[method-assign]


def clear_variables() -> None:
    """Forget all declared variable shapes (reference: Tcalculus.clear)."""
    _VARIABLE_SHAPES.clear()


def unary_op(f: Callable, a) -> Expr:
    a = to_expr(a)

    def fn(env, _f=f, _a=a):
        return _f(_a(env))

    return Expr(fn, _shape_of(fn, a.deps), a.deps)


def binary_op(f: Callable, a, b) -> Expr:
    a = to_expr(a)
    b = to_expr(b)
    deps = a.deps | b.deps

    def fn(env, _f=f, _a=a, _b=b):
        return _f(_a(env), _b(env))

    return Expr(fn, _shape_of(fn, deps), deps)


def nary_op(f: Callable, *args) -> Expr:
    exprs = [to_expr(a) for a in args]
    deps = frozenset().union(*[e.deps for e in exprs]) if exprs else frozenset()

    def fn(env, _f=f, _es=tuple(exprs)):
        return _f(*[e(env) for e in _es])

    return Expr(fn, _shape_of(fn, deps), deps)


def lift(f: Callable) -> Callable:
    """Lift a jnp function to operate on Expr arguments.

    Non-Expr args pass through untouched; keyword args must be static.
    """

    def wrapped(*args, **kwargs):
        if not any(isinstance(a, Expr) for a in args):
            return f(*args, **kwargs)
        exprs = [to_expr(a) for a in args]
        deps = frozenset().union(*[e.deps for e in exprs])

        def fn(env, _f=f, _es=tuple(exprs), _kw=kwargs):
            return _f(*[e(env) for e in _es], **_kw)

        return Expr(fn, _shape_of(fn, deps), deps)

    wrapped.__name__ = getattr(f, "__name__", "lifted")
    return wrapped


def concat(exprs: Sequence, axis: int = 0) -> Expr:
    return nary_op(lambda *xs: jnp.concatenate([jnp.atleast_1d(x) for x in xs], axis=axis), *exprs)


def vertcat(*exprs) -> Expr:
    return concat(exprs, axis=0)


def horzcat(*exprs) -> Expr:
    return concat(exprs, axis=-1)


def stack(exprs: Sequence, axis: int = 0) -> Expr:
    return nary_op(lambda *xs: jnp.stack(xs, axis=axis), *exprs)


def substitute(expr: Expr, old: Union[Variable, Sequence[Variable]], new) -> Expr:
    """Replace variable(s) by expression(s) (reference:
    lib/@Tcalculus/Tcalculus.m:3106 ``substitute``).

    Because Exprs read leaves from the environment, substitution is simply
    environment rebinding: evaluate ``new`` in the outer env and override
    the entries named by ``old``.
    """
    if isinstance(old, Variable):
        olds, news = [old], [to_expr(new)]
    else:
        olds = list(old)
        news = [to_expr(n) for n in new]
    if len(olds) != len(news):
        raise ValueError("substitute: mismatched variable/value lists")
    deps = (expr.deps - {o.name for o in olds}) | frozenset().union(
        *[n.deps for n in news]
    )

    def fn(env, _e=expr, _olds=tuple(olds), _news=tuple(news)):
        env2 = dict(env)
        for o, n in zip(_olds, _news):
            env2[o.name] = n(env)
        return _e(env2)

    return Expr(fn, expr.shape, deps)


def gradient(f, x: "Variable") -> Expr:
    """Partial derivatives of ``f`` w.r.t. the variable ``x``.

    Matches the reference's user-facing symbolic gradient
    (lib/@Tcalculus/gradient.m:1-16): when ``f`` has shape
    ``[n1,...,nN]`` and ``x`` shape ``[m1,...,mM]`` the result has shape
    ``[n1,...,nN,m1,...,mM]`` with
    ``g[i..., j...] = d f[i...] / d x[j...]``.

    Differentiation is delegated to JAX (reverse mode when ``f`` is
    smaller than ``x`` — e.g. scalar losses — else forward mode); the
    reference instead applies hand-written chain rules over its symbolic
    DAG.
    """
    f = to_expr(f)
    if not isinstance(x, Variable):
        raise TypeError("gradient: second argument must be a Variable")
    deps = f.deps | {x.name}
    mode = jax.jacrev if f.size <= x.size else jax.jacfwd

    def fn(env, _f=f, _n=x.name, _mode=mode):
        def g(xv):
            env2 = dict(env)
            env2[_n] = xv
            return _f(env2)

        return _mode(g)(jnp.asarray(env[_n]))

    return Expr(fn, f.shape + x.shape, deps, "gradient")


def jacobian(f, x: "Variable") -> Expr:
    """Alias of :func:`gradient` (the reference uses ``gradient`` for
    tensor-valued ``f`` too)."""
    return gradient(f, x)


def hessian(f, x: "Variable", y: "Variable" = None) -> Expr:
    """Second derivatives: ``hessian(f, x[, y]) = gradient(gradient(f, x),
    y or x)`` with shape ``f.shape + x.shape + y.shape`` (reference:
    lib/@Tcalculus/Tcalculus.m:3049-3101)."""
    return gradient(gradient(f, x), x if y is None else y)


class Constraint:
    """A parsed constraint: ``expr >= 0`` (ineq) or ``expr == 0`` (eq).

    Reference: lib/private/parseConstraints.m:74-135 splits ``iszero`` /
    ``ispositive`` nodes and creates one dual variable per constraint.
    """

    __slots__ = ("kind", "expr")

    def __init__(self, kind: str, expr: Expr):
        assert kind in ("ineq", "eq")
        self.kind = kind
        self.expr = expr

    def __repr__(self) -> str:
        op = ">= 0" if self.kind == "ineq" else "== 0"
        return f"Constraint[{','.join(map(str, self.expr.shape))}] {op}"

    def __bool__(self):
        raise TypeError(
            "Constraint is not a boolean; pass it in the `constraints` list"
        )
