"""Math library tests against numpy/scipy oracles (reference analog:
examples/testing/testNorms.m, testLogdet.m, testTprod.m)."""

import jax.numpy as jnp
import numpy as np
import scipy.linalg

import tenscalc_tpu as tc
from tenscalc_tpu.ops import fns


def test_norms(rng):
    v = rng.standard_normal((3, 4))
    np.testing.assert_allclose(fns.norm1(v), np.abs(v).sum(), rtol=1e-12)
    np.testing.assert_allclose(fns.norm2(v), (v**2).sum(), rtol=1e-12)
    np.testing.assert_allclose(fns.norminf(v), np.abs(v).max(), rtol=1e-12)


def test_norms_on_expr(rng):
    x = tc.variable("x", (4,))
    v = rng.standard_normal(4)
    np.testing.assert_allclose(tc.norm2(x)({"x": v}), (v**2).sum(), rtol=1e-12)


def test_logdet_traceinv(rng):
    A = rng.standard_normal((5, 5))
    A = A @ A.T + 5 * np.eye(5)
    np.testing.assert_allclose(fns.logdet(A), np.linalg.slogdet(A)[1], rtol=1e-10)
    np.testing.assert_allclose(
        fns.traceinv(A), np.trace(np.linalg.inv(A)), rtol=1e-10
    )


def test_componentwise(rng):
    v = rng.standard_normal(6)
    np.testing.assert_allclose(fns.relu(v), np.maximum(v, 0))
    np.testing.assert_allclose(fns.srelu(v), np.log1p(np.exp(v)), rtol=1e-10)
    np.testing.assert_allclose(fns.sqr(v), v * v)
    np.testing.assert_allclose(fns.cube(v), v**3, rtol=1e-12)
    np.testing.assert_allclose(
        fns.heaviside(np.array([-1.0, 0.0, 2.0])), [0.0, 0.5, 1.0]
    )


def test_clp():
    # max alpha such that x + alpha*dx >= 0
    x = np.array([1.0, 2.0, 3.0])
    dx = np.array([-1.0, 1.0, -6.0])
    np.testing.assert_allclose(fns.clp(x, dx), 0.5)
    # no limiting direction
    assert np.isinf(float(fns.clp(x, np.abs(dx))))


def test_tprod_matmul(rng):
    A = rng.standard_normal((4, 3))
    B = rng.standard_normal((3, 5))
    np.testing.assert_allclose(fns.tprod(A, [1, -1], B, [-1, 2]), A @ B, rtol=1e-12)


def test_tprod_inner(rng):
    a = rng.standard_normal(7)
    b = rng.standard_normal(7)
    np.testing.assert_allclose(fns.tprod(a, [-1], b, [-1]), a @ b, rtol=1e-12)


def test_tprod_transpose_outer(rng):
    A = rng.standard_normal((4, 3))
    np.testing.assert_allclose(fns.tprod(A, [2, 1]), A.T, rtol=1e-12)
    a = rng.standard_normal(3)
    b = rng.standard_normal(5)
    np.testing.assert_allclose(fns.tprod(a, [1], b, [2]), np.outer(a, b), rtol=1e-12)


def test_tprod_on_expr(rng):
    x = tc.variable("x", (3,))
    A = rng.standard_normal((3, 3))
    e = fns.tprod(x, [-1], fns.tprod(tc.constant(A), [1, -1], x, [-1]), [-1])
    v = rng.standard_normal(3)
    np.testing.assert_allclose(e({"x": v}), v @ A @ v, rtol=1e-12)


def test_vec2tensor(rng):
    v = np.arange(6.0)
    out = fns.vec2tensor(v, (2, 3))
    np.testing.assert_allclose(out, v.reshape((2, 3), order="F"))


def test_pdist2t(rng):
    x = rng.standard_normal((3, 4))
    y = rng.standard_normal((3, 5))
    expected = ((x[:, :, None] - y[:, None, :]) ** 2).sum(0)
    np.testing.assert_allclose(fns.pdist2t(x, y), expected, rtol=1e-12)


def test_interpolate_linear(rng):
    xs = np.linspace(0.0, 1.0, 11)
    ys = np.sin(xs)
    q = rng.uniform(0.05, 0.95, 7)
    np.testing.assert_allclose(
        fns.interpolate(q, xs, ys), np.interp(q, xs, ys), rtol=1e-6
    )
    # derivative = slope of the active segment
    g = fns.Ginterpolate(np.array(0.123), xs, ys)
    seg = int(0.123 * 10)
    slope = (ys[seg + 1] - ys[seg]) / (xs[seg + 1] - xs[seg])
    np.testing.assert_allclose(g, slope, rtol=1e-5)


def test_interpolate_gaussian_oracle(rng):
    """ugaussian/ngaussian against the reference formulas
    (Tcalculus.m:2900-2911): F = sum_k Yi_k exp(-||x-Xi_k||^2/(2S^2)),
    ngaussian normalizes by sum_k of the kernel."""
    nq, K, m = 2, 9, 3
    Xi = rng.standard_normal((nq, K))
    Yi = rng.standard_normal((m, K))
    x = rng.standard_normal(nq)
    S = 0.7
    w = np.exp(-((Xi - x[:, None]) ** 2).sum(0) / (2 * S**2))
    np.testing.assert_allclose(
        fns.interpolate(x, Xi, Yi, S, method="ugaussian"), Yi @ w, rtol=1e-5
    )
    np.testing.assert_allclose(
        fns.interpolate(x, Xi, Yi, S, method="ngaussian"),
        Yi @ w / w.sum(),
        rtol=1e-5,
    )


def test_ginterpolate_hinterpolate_fd(rng):
    """G/Hinterpolate (shape [sy,sx] / [sy,sx,sx], Tcalculus.m:2946,3005)
    vs central finite differences of interpolate."""
    nq, K, m = 2, 6, 2
    Xi = rng.standard_normal((nq, K))
    Yi = rng.standard_normal((m, K))
    x = 0.3 * rng.standard_normal(nq)
    S = 1.1
    for method in ("ugaussian", "ngaussian"):
        f = lambda q: np.asarray(fns.interpolate(q, Xi, Yi, S, method=method))
        G = np.asarray(fns.Ginterpolate(x, Xi, Yi, S, method=method))
        H = np.asarray(fns.Hinterpolate(x, Xi, Yi, S, method=method))
        assert G.shape == (m, nq) and H.shape == (m, nq, nq)
        eps = 1e-4
        for j in range(nq):
            e = np.zeros(nq)
            e[j] = eps
            fd = (f(x + e) - f(x - e)) / (2 * eps)
            np.testing.assert_allclose(G[:, j], fd, rtol=2e-3, atol=1e-6)
            gd = (
                np.asarray(fns.Ginterpolate(x + e, Xi, Yi, S, method=method))
                - np.asarray(fns.Ginterpolate(x - e, Xi, Yi, S, method=method))
            ) / (2 * eps)
            np.testing.assert_allclose(H[:, :, j], gd, rtol=2e-3, atol=1e-6)


def test_interpolate_on_expr(rng):
    """interpolate lifts through Expr (usable inside objectives)."""
    K = 8
    Xi = np.linspace(-1, 1, K).reshape(1, K)
    Yi = (Xi**2).reshape(1, K)
    x = tc.variable("itp_x", (1,))
    e = fns.interpolate(x, Xi, Yi, 0.5, method="ngaussian")
    val = e({"itp_x": np.array([0.2])})
    w = np.exp(-((Xi - 0.2) ** 2).sum(0) / (2 * 0.25))
    np.testing.assert_allclose(val, Yi @ w / w.sum(), rtol=1e-5)


def test_componentwise_extras(rng):
    """round/ceil/floor/lngamma/sheaviside/dsheaviside vs numpy/scipy
    (reference Tcalculus.m:2050-2108)."""
    import scipy.special

    x = rng.standard_normal((3, 4)) * 2
    np.testing.assert_allclose(fns.round(x), np.round(x))
    np.testing.assert_allclose(fns.ceil(x), np.ceil(x))
    np.testing.assert_allclose(fns.floor(x), np.floor(x))
    xp = np.abs(x) + 0.5
    np.testing.assert_allclose(fns.lngamma(xp), scipy.special.gammaln(xp), rtol=1e-6)
    np.testing.assert_allclose(fns.sheaviside(x), 1 / (1 + np.exp(-x)), rtol=1e-7)
    np.testing.assert_allclose(
        fns.dsheaviside(x), 1 / (2 + np.exp(x) + np.exp(-x)), rtol=1e-6, atol=1e-12
    )


def test_compose(rng):
    """compose applies an elementwise fn; tensor-valued fns append axes
    (reference Tcalculus compose, Tcalculus.m:2110-2180)."""
    x = rng.standard_normal((2, 3))
    y = fns.compose(x, lambda s: jnp.sin(s) + s)
    np.testing.assert_allclose(y, np.sin(x) + x, rtol=1e-7)
    # scalar -> vector fn: output axes appended
    y2 = fns.compose(x, lambda s: jnp.stack([s, s * s]))
    assert y2.shape == (2, 3, 2)
    np.testing.assert_allclose(y2[..., 1], x * x, rtol=1e-7)
    # lifts through Expr and differentiates
    v = tc.variable("cmp_x", (3,))
    e = fns.norm2(fns.compose(v, jnp.tanh))
    import jax

    g = jax.grad(lambda val: e({"cmp_x": val}))(jnp.array([0.1, -0.2, 0.4]))
    xd = np.array([0.1, -0.2, 0.4])
    np.testing.assert_allclose(g, 2 * np.tanh(xd) * (1 - np.tanh(xd) ** 2), rtol=1e-6)


def test_minmax_all_any_norm_repmat_permute(rng):
    x = rng.standard_normal((3, 4))
    y = rng.standard_normal((3, 4))
    np.testing.assert_allclose(fns.min2(x, y), np.minimum(x, y))
    np.testing.assert_allclose(fns.max2(x, y), np.maximum(x, y))
    b = (x > 0).astype(float)
    np.testing.assert_allclose(fns.allv(b, axis=0), b.all(axis=0).astype(float))
    np.testing.assert_allclose(fns.anyv(b, axis=1), b.any(axis=1).astype(float))
    np.testing.assert_allclose(fns.norm(x, 1), np.abs(x).sum(), rtol=1e-12)
    np.testing.assert_allclose(fns.norm(x, 2), np.linalg.norm(x.ravel()), rtol=1e-12)
    np.testing.assert_allclose(fns.norm(x, np.inf), np.abs(x).max(), rtol=1e-12)
    np.testing.assert_allclose(fns.repmat(x, 2, 3), np.tile(x, (2, 3)))
    z = rng.standard_normal((2, 3, 4))
    np.testing.assert_allclose(fns.permute(z, [3, 1, 2]), np.transpose(z, (2, 0, 1)))
    np.testing.assert_allclose(fns.permute(z, [2, 0, 1]), np.transpose(z, (2, 0, 1)))


# ---------------------------------------------------------------------------
# user-facing factorization expressions (Tcalculus.m:1373-1696; oracle
# pattern of examples/testing/testFactorizations.m: L*D*L' == A and
# L*U == A to ~1e3*eps)
# ---------------------------------------------------------------------------

def test_factorization_expressions(rng):
    import jax
    import jax.numpy as jnp
    import tenscalc_tpu as tc

    n = 7
    M = rng.standard_normal((n, n))
    A_spd = M @ M.T + n * np.eye(n)
    Asym = 0.5 * (M + M.T) + n * np.eye(n)  # symmetric, not nec. PD ordering
    Agen = M + n * np.eye(n)                # diagonally dominant general

    Av = tc.parameter("fac_A", (n, n))
    env_spd = {"fac_A": A_spd}
    env_sym = {"fac_A": Asym}
    env_gen = {"fac_A": Agen}

    # chol: L L' == A, and pptrs solves through it
    L = tc.chol(Av)
    Lv = np.asarray(L(env_spd))
    np.testing.assert_allclose(Lv @ Lv.T, A_spd, rtol=0, atol=1e-10)
    b = rng.standard_normal(n)
    bv = tc.parameter("fac_b", (n,))
    x = tc.pptrs(tc.chol(Av), bv)
    np.testing.assert_allclose(
        np.asarray(x({**env_spd, "fac_b": b})),
        np.linalg.solve(A_spd, b), rtol=0, atol=1e-10,
    )

    # ldl: L D L' == A (symmetric), logdet via sum(log(ldl_d))
    F = tc.ldl(Av)
    Lu_ = np.asarray(tc.ldl_l(F)(env_sym))
    d_ = np.asarray(tc.ldl_d(F)(env_sym))
    np.testing.assert_allclose(
        Lu_ @ np.diag(d_) @ Lu_.T, Asym, rtol=0, atol=1e-9
    )
    ld = tc.ldl_d(tc.ldl(Av))
    logdet_ldl = np.sum(np.log(np.asarray(ld(env_spd))))
    np.testing.assert_allclose(
        logdet_ldl, np.linalg.slogdet(A_spd)[1], rtol=1e-10
    )

    # lu: L U == A (general)
    Fg = tc.lu(Av)
    Lg = np.asarray(tc.lu_l(Fg)(env_gen))
    Ug = np.asarray(tc.lu_u(Fg)(env_gen))
    np.testing.assert_allclose(Lg @ Ug, Agen, rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        np.prod(np.asarray(tc.lu_d(Fg)(env_gen))),
        np.linalg.det(Agen), rtol=1e-8,
    )

    # differentiable inside an objective: grad of sum(log(ldl_d(A + x I)))
    # equals trace(inv(A + x I)) — the factorization-aware gradient the
    # reference hand-codes (gradient.m:214-264)
    def f(xs):
        C = jnp.asarray(A_spd) + xs * jnp.eye(n)
        from tenscalc_tpu.ops.fns import _lu_unpivoted_combined

        return jnp.sum(jnp.log(jnp.diagonal(_lu_unpivoted_combined(C))))

    g = float(jax.grad(f)(0.5))
    np.testing.assert_allclose(
        g, np.trace(np.linalg.inv(A_spd + 0.5 * np.eye(n))), rtol=1e-8
    )
