"""Profiling counters and phase timers (reference: the 17 flop-class
counters + per-group timers baked into generated code,
lib/csparse/instructionsTableTypes.h:107-125, report via
lib/@csparse/writeCprofiling.c)."""

import io

import numpy as np

import tenscalc_tpu as tc
from tenscalc_tpu.profiling import flop_counts, phase_times, print_profile, xla_cost


def _solver(ns="pf_", **opts):
    n = 8
    A = tc.variable(ns + "A", (20, n))
    b = tc.variable(ns + "b", (20,))
    x = tc.variable(ns + "x", (n,))
    J = tc.norm2(A @ x - b)
    return tc.optimize(
        objective=J,
        optimizationVariables=[x],
        constraints=[x >= -1.0, x <= 1.0],
        parameters=[A, b],
        **opts,
    )


def test_flop_counts_phases():
    s = _solver("pfa_")
    c = flop_counts(s)
    # default variant resolves to the condensed Newton matrix
    nK = s.nU + s.nG + (0 if s.opts.smallerNewtonMatrix else s.nF)
    assert c["kkt_size"] == nK
    # dense LU: nK^3/3 * 2
    np.testing.assert_allclose(c["factorization"], 2 * nK**3 / 3)
    # QP: Hessian + Jacobians hoisted out of the loop
    assert c["hessian"] == 0.0 and c["ineq_jacobian"] == 0.0
    assert c["total_per_iteration"] > c["factorization"]


def test_flop_counts_banded_backend_scales_linearly():
    # banded backend flops are n*w^2-ish, far below dense
    T = 30
    from examples import mpc_dcmotor

    s = mpc_dcmotor.build_solver(
        T=T, namespace="pfb_", dtype="float32",
        variant="standard", smallerNewtonMatrix=True,
        kkt_backend="fleet_banded",
    )
    c = flop_counts(s)
    nK = c["kkt_size"]
    assert c["factorization"] < 0.02 * (2 * nK**3 / 3)


def test_xla_cost_and_phase_times():
    s = _solver("pfc_")
    rng = np.random.default_rng(0)
    params = {"pfc_A": rng.random((20, 8)), "pfc_b": rng.random(20)}
    cost = xla_cost(s, params)
    assert cost.get("flops", 0) > 0
    times = phase_times(s, params, iters=5)
    assert times["factor_plus_solve"] > 0
    assert times["iteration_estimate"] >= times["factor_plus_solve"]


def test_print_profile_report():
    s = _solver("pfd_")
    buf = io.StringIO()
    rep = print_profile(s, file=buf)
    out = buf.getvalue()
    assert "factorization" in out and "TOTAL" in out
    assert rep["flops"]["total_per_iteration"] > 0
