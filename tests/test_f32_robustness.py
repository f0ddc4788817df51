"""f32-native robustness on an ill-conditioned l1 problem (round-4
findings): l1l2estimation drives paired epigraph constraints to 0, the
condensed KKT to cond ~1e16, and the f32 arithmetic floor above the
reference's absolute thresholds.  The solver must (a) never NaN — the
barrier divisions are floored, non-finite directions retry in-iteration
with escalating regularization, (b) not ratchet addEye2Hessian on the
unreachable absolute derr gate (the f32 gate is relative to the
backward-error scale), and (c) converge cleanly on the clamped
structured backends (tridiag block-pivot clamp, fleet equilibration).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import tenscalc_tpu as tc
from examples import l1l2estimation as l1l2


def _solve(ns, **opts):
    N = 200
    t_, true_pos, meas, dt1, outliers = l1l2.make_data(N=N)
    s = l1l2.build_l1l2(
        N=N, ns=ns, dtype="float32", gradTolerance=0.2,
        desiredDualityGap=5e-3, **opts,
    )
    params = {
        ns + "measurement": meas,
        ns + "dt1": dt1,
        ns + "weight2acceleration": 10.0,
        ns + "weight1acceleration": 2.0,
        ns + "weight1noise": 2.0,
    }
    init = {
        ns + "position": np.zeros(N),
        ns + "noise1": np.zeros(N),
        ns + "acceleration1": np.zeros(N - 2),
        ns + "noise1abs": np.ones(N),
        ns + "acceleration1abs": np.ones(N - 2),
    }
    sol = s.solve(params, init=init, mu0=1.0, max_iter=60)
    err = float(np.abs(np.asarray(sol.outputs["position"]) - true_pos).mean())
    return s, sol, err


def test_l1l2_f32_tridiag_converges(monkeypatch):
    monkeypatch.setenv("TENSCALC_AUTO_FLEET", "0")
    s, sol, err = _solve("f32t_")
    assert s.kkt_backend_resolved == "tridiag"
    assert sol.ok, sol.describe()
    assert err < 0.6  # matches the f64 solve's ~0.476
    assert np.isfinite(np.asarray(sol.lam)).all()


def test_l1l2_f32_dense_converges(monkeypatch):
    monkeypatch.setenv("TENSCALC_AUTO_FLEET", "0")
    s, sol, err = _solve("f32d_", kkt_backend="dense")
    assert sol.ok, sol.describe()
    assert err < 0.6
    # no NaN anywhere in the result
    for leaf in (sol.lam, sol.nu, sol.gap, sol.norminf_grad):
        assert np.isfinite(np.asarray(leaf)).all()


def test_l1l2_f64_reference_semantics(monkeypatch):
    """f64 keeps the reference's absolute gates and converges at the
    default tolerances."""
    monkeypatch.setenv("TENSCALC_AUTO_FLEET", "0")
    N = 200
    t_, true_pos, meas, dt1, outliers = l1l2.make_data(N=N)
    ns = "f64r_"
    s = l1l2.build_l1l2(N=N, ns=ns)
    params = {
        ns + "measurement": meas,
        ns + "dt1": dt1,
        ns + "weight2acceleration": 10.0,
        ns + "weight1acceleration": 2.0,
        ns + "weight1noise": 2.0,
    }
    init = {
        ns + "position": np.zeros(N),
        ns + "noise1": np.zeros(N),
        ns + "acceleration1": np.zeros(N - 2),
        ns + "noise1abs": np.ones(N),
        ns + "acceleration1abs": np.ones(N - 2),
    }
    sol = s.solve(params, init=init, mu0=1.0, max_iter=60)
    assert sol.ok, sol.describe()
