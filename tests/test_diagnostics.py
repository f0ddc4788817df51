"""Profiling history, diagnostics, and sensitivity tests (reference:
verboseLevel>=3 iteration table, debugConvergenceAnalysis.m,
analyzeHess.m, sensitivityVariables)."""

import numpy as np
import pytest

import tenscalc_tpu as tc
from tenscalc_tpu.diagnostics import (
    analyze_hessian,
    debug_convergence_analysis,
    plot_convergence,
    print_iteration_table,
)
from tenscalc_tpu.ipm.solver import HISTORY_COLUMNS


@pytest.fixture
def qp(rng):
    n = 5
    Q = rng.standard_normal((n, n))
    Q = Q @ Q.T + n * np.eye(n)
    c = rng.standard_normal(n)
    Qv = tc.variable("dg_Q", (n, n))
    cv = tc.variable("dg_c", (n,))
    x = tc.variable("dg_x", (n,))
    J = 0.5 * tc.tprod(x, [-1], Qv @ x, [-1]) + tc.tprod(cv, [-1], x, [-1])
    solver = tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= -1.0, x <= 1.0],
        parameters=[Qv, cv],
        outputExpressions={"x": x},
        profiling=True,
        maxIter=100,
    )
    return solver, Q, c, n


def test_history_recorded(qp):
    solver, Q, c, n = qp
    sol = solver.solve({"dg_Q": Q, "dg_c": c}, init={"dg_x": np.zeros(n)})
    assert sol.ok
    h = sol.history
    # the exit iteration runs only the convergence tests -> iters-1 rows
    assert h is not None and h.shape == (sol.iters - 1, len(HISTORY_COLUMNS))
    # rows record the pre-step metrics, so the final (converged) gap shows
    # in sol.gap; the recorded trace must still collapse by orders of
    # magnitude and mu must decrease
    gap = h[:, HISTORY_COLUMNS.index("gap")]
    assert gap[-1] < gap[0] * 1e-2
    assert sol.gap <= 1e-5 * 1.5
    mu = h[:, HISTORY_COLUMNS.index("mu")]
    assert mu[-1] < mu[0]
    assert not np.isnan(h).any()


def test_iteration_table_and_analysis(qp, capsys):
    solver, Q, c, n = qp
    sol = solver.solve({"dg_Q": Q, "dg_c": c}, init={"dg_x": np.zeros(n)})
    print_iteration_table(sol)
    out = capsys.readouterr().out
    assert "Iter" in out and len(out.splitlines()) == sol.iters

    rep = debug_convergence_analysis(sol)
    assert rep["iters"] == sol.iters - 1  # exit iteration records no row
    assert isinstance(rep["findings"], list)


def test_plot_convergence(qp, capsys):
    solver, Q, c, n = qp
    sol = solver.solve({"dg_Q": Q, "dg_c": c}, init={"dg_x": np.zeros(n)})
    plot_convergence(sol)
    out = capsys.readouterr().out
    # one panel per rendered quantity, each with a title + axis marks
    assert "gap" in out and "mu" in out and "alphaPrimal" in out
    assert out.count("*") >= 4 * (sol.iters - 1)  # several curves drawn

    class NoHist:
        history = None

    plot_convergence(NoHist())
    assert "no history" in capsys.readouterr().out


def test_analyze_hessian(qp):
    solver, Q, c, n = qp
    rep = analyze_hessian(
        solver, {"dg_Q": Q, "dg_c": c}, init={"dg_x": np.zeros(n)}
    )
    assert rep["nU"] == n and rep["nF"] == 2 * n
    assert "dg_x" in rep["variables"]
    assert rep["kkt_cond"] > 1.0


def test_sensitivity_unconstrained_ls(rng):
    """d x*/d b for min ||Ax-b||^2: x* = (A'A)^-1 A' b, so
    dx*/db = (A'A)^-1 A' — checked against the closed form."""
    N, n = 12, 4
    A = rng.standard_normal((N, n))
    b = rng.standard_normal(N)
    Av = tc.variable("sv_A", (N, n))
    bv = tc.variable("sv_b", (N,))
    x = tc.variable("sv_x", (n,))
    J = tc.norm2(Av @ x - bv)
    solver = tc.optimize(
        objective=J,
        optimizationVariables=[x],
        parameters=[Av, bv],
        outputExpressions={"x": x},
        gradTolerance=1e-10,
    )
    sol = solver.solve({"sv_A": A, "sv_b": b}, init={"sv_x": np.zeros(n)})
    assert sol.ok
    sens = solver.sensitivity(sol, {"sv_A": A, "sv_b": b}, wrt=["sv_b"])
    dxdb = sens["sv_x"]["sv_b"]
    expected = np.linalg.solve(A.T @ A, A.T)
    np.testing.assert_allclose(dxdb, expected, atol=1e-6)


def test_sensitivity_with_active_constraint(rng):
    """Bound-constrained QP: the sensitivity of an *active-at-bound*
    variable to the linear term must be ~0 (it stays pinned), while free
    variables move — finite-difference cross-check."""
    n = 3
    Q = np.eye(n)
    c = np.array([-5.0, 0.3, 0.2])  # x0 hits upper bound 1
    Qv = tc.variable("sva_Q", (n, n))
    cv = tc.variable("sva_c", (n,))
    x = tc.variable("sva_x", (n,))
    J = 0.5 * tc.tprod(x, [-1], Qv @ x, [-1]) + tc.tprod(cv, [-1], x, [-1])
    solver = tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= -1.0, x <= 1.0],
        parameters=[Qv, cv],
        outputExpressions={"x": x},
        desiredDualityGap=1e-9,
        gradTolerance=1e-8,
    )

    def solve_for(cval):
        return solver.solve(
            {"sva_Q": Q, "sva_c": cval}, init={"sva_x": np.zeros(n)}
        )

    sol = solve_for(c)
    assert sol.ok
    sens = solver.sensitivity(sol, {"sva_Q": Q, "sva_c": c}, wrt=["sva_c"])
    dxdc = sens["sva_x"]["sva_c"]
    # finite-difference oracle
    eps = 1e-5
    fd = np.zeros((n, n))
    for j in range(n):
        cp = c.copy(); cp[j] += eps
        cm = c.copy(); cm[j] -= eps
        fd[:, j] = (
            solve_for(cp).outputs["x"] - solve_for(cm).outputs["x"]
        ) / (2 * eps)
    np.testing.assert_allclose(dxdc, fd, atol=1e-2)
    # pinned variable barely moves; free variables follow -Q^{-1}
    assert abs(dxdc[0, 0]) < 1e-2
    np.testing.assert_allclose(dxdc[1, 1], -1.0, atol=1e-2)


def test_cg_export(tmp_path, rng):
    """Computation-graph export (reference: saveVectorized/.cg files)."""
    import json

    from tenscalc_tpu.cgexport import export_computation_graph

    n = 4
    Q = tc.variable("cg_Q", (n, n))
    x = tc.variable("cg_x", (n,))
    J = tc.tprod(x, [-1], Q @ x, [-1])
    solver = tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= -1.0, x <= 1.0],
        parameters=[Q],
    )
    meta = export_computation_graph(solver, tmp_path / "qp", include_hlo=True)
    assert (tmp_path / "qp.jaxpr.txt").exists()
    assert (tmp_path / "qp.hlo.txt").exists()
    saved = json.loads((tmp_path / "qp.meta.json").read_text())
    assert saved["nU"] == n and saved["nF"] == 2 * n
    assert saved["primitive_counts"].get("while", 0) >= 1
    assert "dot_general" in saved["primitive_counts"] or "pjit" in saved["primitive_counts"]
    txt = (tmp_path / "qp.jaxpr.txt").read_text()
    assert "while" in txt


def test_capture_ww_localizes_misscaled_variable():
    """allowSave/saveIter post-mortem (saveWW__ analog,
    lib/ipmPD_CS.m:511-515): capture the KKT matrix at the iterate with
    the worst direction error of an actual solve, and localize a
    deliberately mis-scaled variable from the per-variable report."""
    n = 4
    good = tc.variable("cw_good", (n,))
    bad = tc.variable("cw_bad", (n,))   # lives on a 1e6-worse scale
    pvar = tc.variable("cw_p", (n,))
    J = tc.norm2(good - pvar) + 1e10 * tc.norm2(bad) + tc.norm2(
        good - 1e4 * bad
    )
    solver = tc.optimize(
        objective=J,
        optimizationVariables=[good, bad],
        constraints=[good >= -2.0, good <= 2.0],
        parameters=[pvar],
        allowSave=True,
        profiling=True,
        maxIter=40,
    )
    params = {"cw_p": np.array([0.5, -0.25, 1.0, 0.1])}
    cap = solver.capture_ww(params, mu0=1.0)
    assert cap["it"] >= 1
    nK = solver.nU + solver.nG + (
        0 if solver.opts.smallerNewtonMatrix else solver.nF
    )
    assert cap["WW"].shape[0] == nK
    rep = cap["report"]["variables"]
    # the mis-scaled variable's Hessian diagonal dwarfs the healthy one
    assert (
        rep["cw_bad"]["hess_diag_range"][1]
        > 1e6 * rep["cw_good"]["hess_diag_range"][1]
    )
    assert any("rescal" in a for a in cap["report"]["advice"])
    # explicit-iterate capture matches the solver state at that iterate
    cap2 = solver.capture_ww(params, it=2, mu0=1.0)
    assert cap2["it"] == 2
    assert cap2["state"]["mu"] > 0
