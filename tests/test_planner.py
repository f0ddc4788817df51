"""Auto-planner behavior on non-MPC problem classes (round-4 VERDICT
item 5): assert what kkt_backend='auto' resolves to across the example
suite, that a chosen structured plan is never worse-than-dense by the
planner's own flop model, that probe failures are LOUD (RuntimeWarning,
not a silent dense fallback — the reference planner errors loudly,
lib/@csparse/sparsity_ldl.m:188), and that verboseLevel>=2 prints the
kkt-plan statistics line (analog of sparsity_ldl.m:290-297)."""

import sys
import warnings
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import tenscalc_tpu as tc
from examples import dist2convex, l1l2estimation, mls, slseq


@pytest.fixture(autouse=True)
def _no_fleet(monkeypatch):
    # pin the CPU decision so assertions don't depend on the test host
    monkeypatch.setenv("TENSCALC_AUTO_FLEET", "0")


def _assert_not_worse_than_dense(solver):
    """A structured pick must be justified by the planner's flop model;
    a dense pick must carry no plan."""
    name = solver.kkt_backend_resolved
    if name in ("tridiag", "fleet_banded", "cyclic"):
        plan = solver.kkt_plan
        assert plan is not None and plan.worthwhile
        n = plan.n
        assert plan.n_blocks * 7 * plan.block**3 < n**3
    elif name == "arrow":
        assert solver.kkt_plan is not None
        assert solver.kkt_plan.worthwhile
    else:
        assert name in ("dense", "ldl", "fleet")


def test_auto_sysid_picks_arrow():
    # global physical parameters couple every stage of the horizon:
    # band fails, arrow-plus-band is the right structure
    sysid = tc.Sysid(
        f=lambda x, u, a, b: a * x + b * u,
        g=lambda x, a, b: x,
        n_states=1,
        n_outputs=1,
        n_inputs=1,
        horizon=40,
        parameters=[
            tc.ParameterSpec("a", (), lower=0.0, upper=1.0),
            tc.ParameterSpec("b", (), lower=-2.0, upper=2.0),
        ],
    )
    assert sysid.solver.kkt_backend_resolved == "arrow"
    _assert_not_worse_than_dense(sysid.solver)

    # ... and the pick actually solves (planner correctness, not just
    # selection): recover a, b from clean data
    rng = np.random.default_rng(0)
    N = 40
    a_true, b_true = 0.8, 0.5
    u_seq = rng.standard_normal((1, N))
    x_seq = np.zeros((1, N))
    for k in range(N - 1):
        x_seq[0, k + 1] = a_true * x_seq[0, k] + b_true * u_seq[0, k]
    y_seq = x_seq + 1e-3 * rng.standard_normal((1, N))
    sol, est = sysid.fit(u_seq, y_seq, x0=y_seq)
    assert sol.ok, sol.describe()
    np.testing.assert_allclose(float(est["a"]), a_true, atol=5e-3)


def test_auto_dist2convex_picks_dense():
    s = dist2convex.build_solver(N=60, d=9)
    assert s.kkt_backend_resolved == "dense"
    assert s.kkt_plan is None


def test_auto_lasso_picks_dense():
    lasso = tc.Lasso(n_features=8, n_points=60)
    assert lasso.solver.kkt_backend_resolved == "dense"


def test_auto_slseq_picks_dense():
    s = slseq.build_solver(N=200, n=60, m=8)
    assert s.kkt_backend_resolved == "dense"
    _assert_not_worse_than_dense(s)


def test_auto_l1l2_picks_tridiag():
    s = l1l2estimation.build_l1l2(N=60)
    assert s.kkt_backend_resolved == "tridiag"
    _assert_not_worse_than_dense(s)


def test_auto_mls_picks_structured_and_solves():
    s = mls.build_solver(N=40, n=24, k=12)
    assert s.kkt_backend_resolved == "tridiag"
    _assert_not_worse_than_dense(s)


def test_probe_failure_warns_and_falls_back(monkeypatch):
    """A broken assemble/probe must degrade LOUDLY."""
    def boom(*a, **k):
        raise RuntimeError("synthetic probe failure")

    import tenscalc_tpu.kkt.structure as structure_mod

    monkeypatch.setattr(structure_mod, "probe_pattern", boom)
    tc.expr.clear_variables()
    x = tc.variable("plnw_x", (80,))
    J = tc.norm2(x - 1.0)
    with pytest.warns(RuntimeWarning, match="structure probe failed"):
        s = tc.optimize(J, [x], constraints=[x >= -2.0, x <= 2.0])
    assert s.kkt_backend_resolved in ("dense", "fleet")


def test_game_probe_failure_warns(monkeypatch):
    from tenscalc_tpu.kkt import select as select_mod
    import tenscalc_tpu.kkt.structure as structure_mod

    def boom(*a, **k):
        raise RuntimeError("synthetic probe failure")

    monkeypatch.setattr(structure_mod, "probe_pattern", boom)
    with pytest.warns(RuntimeWarning, match="structure probe failed"):
        plan = select_mod.compute_banded_plan(lambda t: None, 128)
    assert plan is None


def test_verbose_plan_report(capsys):
    tc.expr.clear_variables()
    s = l1l2estimation.build_l1l2(N=60)
    # report is printed at build when verboseLevel >= 2; rebuild with it
    tc.expr.clear_variables()
    s = l1l2estimation.build_l1l2(N=61)
    s.opts = s.opts.replace(verboseLevel=2)
    s._report_kkt_plan()
    out = capsys.readouterr().out
    assert "[kkt plan]" in out
    assert "backend=tridiag" in out
    assert "bandwidth=" in out
