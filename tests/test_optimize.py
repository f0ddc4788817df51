"""End-to-end IPM solver tests replicating the reference's example-driven
oracles: mls (examples/mls.m — constrained least squares vs closed form),
sls slack-variable formulations (examples/sls.m), and simple analytic QPs.
Tolerances follow the reference defaults: gradTolerance=1e-4,
desiredDualityGap=1e-5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tenscalc_tpu as tc


def _mls_data(rng, N=40, n=8, k=3):
    A = rng.random((N, n))
    B = rng.random((N, k))
    X0 = 0.025 + 0.02 * rng.random((n, k))
    return A, B, X0


def test_unconstrained_mls(rng):
    """minimize ||A X - B||_F^2 / N — optimum is the LS solution
    (examples/mls.m:56-83)."""
    N, n, k = 40, 8, 3
    A, B, X0 = _mls_data(rng, N, n, k)
    Av = tc.variable("A", (N, n))
    Bv = tc.variable("B", (N, k))
    X = tc.variable("X", (n, k))
    J = tc.norm2(Av @ X - Bv) / N

    solver = tc.optimize(
        objective=J,
        optimizationVariables=[X],
        parameters=[Av, Bv],
        outputExpressions={"J": J, "X": X},
    )
    sol = solver.solve({"A": A, "B": B}, init={"X": X0})
    assert sol.ok, sol.describe()
    Xstar = np.linalg.lstsq(A, B, rcond=None)[0]
    np.testing.assert_allclose(sol.outputs["X"], Xstar, atol=1e-4)
    assert sol.norminf_grad <= 1e-4


def test_constrained_mls(rng):
    """minimize ||A X - B||_F^2/N s.t. 0 <= X <= .05
    (examples/mls.m:88-124).  Oracle: scipy box-constrained lsq."""
    N, n, k = 40, 8, 3
    A, B, X0 = _mls_data(rng, N, n, k)
    Av = tc.variable("A", (N, n))
    Bv = tc.variable("B", (N, k))
    X = tc.variable("X", (n, k))
    J = tc.norm2(Av @ X - Bv) / N

    solver = tc.optimize(
        objective=J,
        optimizationVariables=[X],
        constraints=[X >= 0, X <= 0.05],
        parameters=[Av, Bv],
        outputExpressions={"J": J, "X": X},
    )
    sol = solver.solve({"A": A, "B": B}, init={"X": X0})
    assert sol.ok, sol.describe()

    from scipy.optimize import lsq_linear

    Xref = np.column_stack(
        [
            lsq_linear(A, B[:, j], bounds=(0, 0.05), tol=1e-12).x
            for j in range(k)
        ]
    )
    np.testing.assert_allclose(sol.outputs["X"], Xref, atol=2e-4)
    assert 0 <= sol.outputs["X"].min() + 1e-9
    assert sol.outputs["X"].max() <= 0.05 + 1e-9
    assert sol.gap <= 1e-5 * 1.01


def test_equality_constrained_qp(rng):
    """minimize ||x||^2 s.t. a'x = 1 — analytic optimum a/||a||^2."""
    n = 6
    a = rng.standard_normal(n)
    av = tc.variable("a", (n,))
    x = tc.variable("x", (n,))
    J = tc.norm2(x)
    con = tc.tprod(av, [-1], x, [-1]) == 1.0

    solver = tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[con],
        parameters=[av],
        outputExpressions={"x": x},
    )
    sol = solver.solve({"a": a}, init={"x": np.ones(n)})
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.outputs["x"], a / (a @ a), atol=1e-5)
    assert abs(a @ sol.outputs["x"] - 1.0) <= 1e-4


def test_slack_variable_formulation(rng):
    """minimize v s.t. v >= ||Ax-b||^2 (examples/sls.m:86-124)."""
    N, n = 30, 6
    A = rng.random((N, n))
    b = rng.random(N)
    Av = tc.variable("A", (N, n))
    bv = tc.variable("b", (N,))
    x = tc.variable("x", (n,))
    v = tc.variable("v", ())
    J = tc.norm2(Av @ x - bv) / N

    solver = tc.optimize(
        objective=v,
        optimizationVariables=[x, v],
        constraints=[v >= J],
        parameters=[Av, bv],
        outputExpressions={"J": J, "x": x},
    )
    x0 = 0.02 * rng.random(n)
    J0 = np.sum((A @ x0 - b) ** 2) / N
    sol = solver.solve({"A": A, "b": b}, init={"x": x0, "v": J0 + 1})
    assert sol.ok, sol.describe()
    xstar = np.linalg.lstsq(A, b, rcond=None)[0]
    Jstar = np.sum((A @ xstar - b) ** 2) / N
    np.testing.assert_allclose(sol.outputs["J"], Jstar, atol=1e-4)


@pytest.mark.parametrize("variant,smaller", [
    ("timesLambda", False),
    ("standard", False),
    ("standard", True),
])
def test_variants_agree(rng, variant, smaller):
    """All three Newton-matrix variants converge to the same optimum
    (reference: ipmPD_CStimesLambda vs ipmPD_CS large/small)."""
    n = 5
    Q = rng.standard_normal((n, n))
    Q = Q @ Q.T + n * np.eye(n)
    c = rng.standard_normal(n)
    Qv = tc.variable("Q", (n, n))
    cv = tc.variable("c", (n,))
    x = tc.variable("x", (n,))
    J = 0.5 * tc.tprod(x, [-1], Qv @ x, [-1]) + tc.tprod(cv, [-1], x, [-1])

    solver = tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= -10.0, x <= 10.0, x.sum() == 1.0],
        parameters=[Qv, cv],
        outputExpressions={"x": x},
        variant=variant,
        smallerNewtonMatrix=smaller,
        skipAffine=True,
    )
    sol = solver.solve({"Q": Q, "c": c}, init={"x": np.ones(n) / n})
    assert sol.ok, f"{variant}/{smaller}: {sol.describe()}"
    # KKT oracle: equality-constrained QP (inactive box)
    K = np.block([[Q, np.ones((n, 1))], [np.ones((1, n)), np.zeros((1, 1))]])
    sol_ref = np.linalg.solve(K, np.concatenate([-c, [1.0]]))
    np.testing.assert_allclose(sol.outputs["x"], sol_ref[:n], atol=1e-4)


def test_mehrotra_affine_path(rng):
    """skipAffine=False exercises the affine direction + sigma=rho^delta
    mu update (lib/ipmPD_CSsolver.c:579-665)."""
    n = 5
    Q = rng.standard_normal((n, n))
    Q = Q @ Q.T + n * np.eye(n)
    c = rng.standard_normal(n)
    Qv = tc.variable("Q", (n, n))
    cv = tc.variable("c", (n,))
    x = tc.variable("x", (n,))
    J = 0.5 * tc.tprod(x, [-1], Qv @ x, [-1]) + tc.tprod(cv, [-1], x, [-1])

    solver = tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= -1.0, x <= 1.0],
        parameters=[Qv, cv],
        outputExpressions={"x": x},
        variant="standard",
        skipAffine=False,
    )
    sol = solver.solve({"Q": Q, "c": c}, init={"x": np.zeros(n)})
    assert sol.ok, sol.describe()
    from scipy.optimize import minimize as sp_minimize

    ref = sp_minimize(
        lambda xv: 0.5 * xv @ Q @ xv + c @ xv,
        np.zeros(n),
        jac=lambda xv: Q @ xv + c,
        bounds=[(-1, 1)] * n,
        method="L-BFGS-B",
        tol=1e-12,
    )
    np.testing.assert_allclose(sol.outputs["x"], ref.x, atol=1e-4)


def test_status_max_iter(rng):
    """maxIter exhaustion sets status 8 plus completion flags
    (lib/ipmPD_CSsolver.c:885-920)."""
    n = 4
    x = tc.variable("x", (n,))
    # Rosenbrock-flavored nonconvex objective, few iterations allowed
    J = tc.norm2(x - 1.0) + 100.0 * tc.norm2(x[1:] - x[:-1] ** 2)
    solver = tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= -5.0, x <= 5.0],
        outputExpressions={"x": x},
    )
    sol = solver.solve({}, init={"x": np.full(n, -2.0)}, max_iter=2)
    assert sol.status & 8
    assert sol.iters == 3  # iter increments past maxIter, as in reference


def test_nonconvex_converges(rng):
    """Nonconvex problem relying on the adaptive addEye2Hessian loop
    (lib/ipmPD_CSsolver.c:393-548)."""
    n = 4
    x = tc.variable("x", (n,))
    J = tc.norm2(x - 1.0) + 100.0 * tc.norm2(x[1:] - x[:-1] ** 2)
    solver = tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= -5.0, x <= 5.0],
        outputExpressions={"J": J, "x": x},
    )
    sol = solver.solve({}, init={"x": np.full(n, -2.0)}, max_iter=300)
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(sol.outputs["x"], np.ones(n), atol=1e-3)


def test_compute(rng):
    """cmex2compute analog: compiled multi-output evaluation."""
    x = tc.variable("x", (3,))
    y = tc.variable("y", (3,))
    fn = tc.compute(
        inputs=[x, y],
        outputs={"dot": tc.tprod(x, [-1], y, [-1]), "sum": x + y},
    )
    xv, yv = rng.standard_normal(3), rng.standard_normal(3)
    out = fn(x=xv, y=yv)
    np.testing.assert_allclose(out["dot"], xv @ yv, rtol=1e-12)
    np.testing.assert_allclose(out["sum"], xv + yv, rtol=1e-12)


def test_ldl_backend_matches_dense(rng):
    """kkt_backend='ldl' (batched-fleet backend) matches the default."""
    n = 6
    Q = rng.standard_normal((n, n))
    Q = Q @ Q.T + n * np.eye(n)
    c = rng.standard_normal(n)
    Qv = tc.variable("lb_Q", (n, n))
    cv = tc.variable("lb_c", (n,))
    x = tc.variable("lb_x", (n,))
    J = 0.5 * tc.tprod(x, [-1], Qv @ x, [-1]) + tc.tprod(cv, [-1], x, [-1])

    def build(backend):
        return tc.optimize(
            objective=J,
            optimizationVariables=[x],
            constraints=[x >= -1.0, x <= 1.0],
            parameters=[Qv, cv],
            outputExpressions={"x": x},
            kkt_backend=backend,
        )

    s1 = build("dense").solve({"lb_Q": Q, "lb_c": c}, init={"lb_x": np.zeros(n)})
    s2 = build("ldl").solve({"lb_Q": Q, "lb_c": c}, init={"lb_x": np.zeros(n)})
    assert s1.ok and s2.ok
    np.testing.assert_allclose(s2.outputs["x"], s1.outputs["x"], atol=1e-8)
    assert s1.iters == s2.iters


def test_rank3_tensor_variables_and_constraints(rng):
    """Tensor-valued problems over rank-3 variables with tensor
    constraints — the reference's headline capability (SURVEY.md §1:
    'tensor-valued variables', constraints over arbitrary-rank
    tensors)."""
    a, b, c = 3, 4, 2
    T0 = rng.random((a, b, c))
    Tv = tc.variable("r3_T", (a, b, c))
    X = tc.variable("r3_X", (a, b, c))
    # fit X to T0 under a box and a per-slice sum equality
    J = tc.norm2(X - Tv)
    cons = [
        X >= 0.0,
        X <= 1.0,
        X.sum(axis=(1, 2)) == 1.0,  # rank-1 equality over a rank-3 var
    ]
    solver = tc.optimize(
        objective=J,
        optimizationVariables=[X],
        constraints=cons,
        parameters=[Tv],
        outputExpressions={"X": X},
    )
    assert solver.nU == a * b * c and solver.nF == 2 * a * b * c
    assert solver.nG == a
    sol = solver.solve(
        {"r3_T": T0}, init={"r3_X": np.full((a, b, c), 1.0 / (b * c))}
    )
    assert sol.ok, sol.describe()
    X = sol.outputs["X"]
    np.testing.assert_allclose(X.sum(axis=(1, 2)), 1.0, atol=1e-6)
    assert X.min() >= -1e-8 and X.max() <= 1 + 1e-8
    # KKT: projection of T0 onto the constraint set — check optimality
    # via scipy on the flattened problem
    from scipy.optimize import minimize as sp_minimize

    res = sp_minimize(
        lambda z: np.sum((z.reshape(a, b, c) - T0) ** 2),
        np.full(a * b * c, 1.0 / (b * c)),
        jac=lambda z: 2 * (z - T0.ravel()),
        bounds=[(0, 1)] * (a * b * c),
        constraints=[
            {"type": "eq",
             "fun": (lambda z, i=i: z.reshape(a, b, c)[i].sum() - 1.0)}
            for i in range(a)
        ],
        method="SLSQP",
        options={"ftol": 1e-12, "maxiter": 500},
    )
    np.testing.assert_allclose(sol.objective, res.fun, atol=1e-5)
