"""Taint-analysis soundness tests for ipm/hoist.py.

The hoist pass (role of TensCalc's reactive dependency groups,
lib/@csparse/dependencyGroups.m) must NEVER certify a z-dependent
output as constant — a false "constant" silently freezes a Jacobian
outside the IPM loop and produces wrong answers reported as converged.
"""

import jax
import jax.numpy as jnp
import pytest

from tenscalc_tpu.ipm.hoist import output_independent_of


def test_scan_carry_taint_is_not_lost():
    # Round-3 advisor repro: scan emitting the PRE-update carry of
    # c += z_i**2.  The true Jacobian of the summed output w.r.t. z is
    # 2*z_j != const, but a single non-fixpoint pass over the scan body
    # sees the output slot fed only by the untainted incoming carry.
    def f(z):
        def body(c, zi):
            return c + zi**2, c

        _, ys = jax.lax.scan(body, jnp.zeros(()), z)
        return ys.sum()

    z = jnp.zeros((4,))
    assert not output_independent_of(f, 1, z)
    # sanity: the Jacobian really is z-dependent
    j0 = jax.jacobian(f)(jnp.ones((4,)))
    j1 = jax.jacobian(f)(2.0 * jnp.ones((4,)))
    assert not jnp.allclose(j0, j1)


def test_scan_any_tainted_input_taints_outputs():
    # Opaque treatment: tainted xs must taint every scan output.
    def f(z):
        def body(c, zi):
            return c + zi, c + zi

        cf, ys = jax.lax.scan(body, jnp.zeros(()), z)
        return cf + ys.sum()

    assert not output_independent_of(f, 1, jnp.zeros((3,)))


def test_scan_untainted_is_still_certified():
    # A scan fed only by untainted data must not block certification.
    w = jnp.arange(3.0)

    def f(z):
        def body(c, wi):
            return c + wi, wi

        cf, _ = jax.lax.scan(body, jnp.zeros(()), w)
        return cf  # z unused: output must certify

    assert output_independent_of(f, 1, jnp.zeros(()))


def test_while_loop_stays_opaque():
    def f(z):
        def cond(s):
            return s[0] < 3

        def body(s):
            return (s[0] + 1, s[1] * z[0])

        _, v = jax.lax.while_loop(cond, body, (0, 1.0))
        return v

    assert not output_independent_of(f, 1, jnp.ones((2,)))


def test_pjit_recursion_keeps_precision():
    # A jitted linear helper must not taint outputs through an
    # untouched operand (the round-2 precision motivation).
    @jax.jit
    def helper(a, b):
        return jnp.concatenate([a, b])

    c = jnp.ones((2,))

    def jac(z):
        return jax.jacfwd(lambda v: helper(v, c))(z)

    assert output_independent_of(jac, 1, jnp.zeros((2,)))


def test_quadratic_hessian_certified():
    def hess(z):
        return jax.hessian(lambda v: 0.5 * v @ v + v.sum())(z)

    assert output_independent_of(hess, 1, jnp.zeros((3,)))


def test_cubic_hessian_not_certified():
    def hess(z):
        return jax.hessian(lambda v: (v**3).sum())(z)

    assert not output_independent_of(hess, 1, jnp.zeros((3,)))


def test_lifted_scan_dynamics_jacobian_not_hoisted():
    # End-to-end shape of the advisor's concern: a user embeds a
    # scan-based rollout via lift(); its Jacobian w.r.t. the input must
    # not be certified iteration-invariant.
    def rollout(x0):
        def body(x, _):
            return x + 0.1 * x**2, x

        xf, _ = jax.lax.scan(body, x0, None, length=5)
        return xf

    def jac(z):
        return jax.jacfwd(rollout)(z)

    assert not output_independent_of(jac, 1, jnp.ones((2,)))
